"""Data generator tests: SDE/ODE systems, datasets, gridworld."""

import numpy as np
import pytest

from deeptime_spark.data.datasets import DrunkardsWalk, Ellipsoids, sqrt_model, swissroll_model
from deeptime_spark.data.systems import (
    abc_flow,
    custom_ode,
    double_well_2d,
    lorenz_system,
    ornstein_uhlenbeck,
    prinz_potential,
    quadruple_well,
    triple_well_1d,
)


def test_ou_stationary_statistics():
    # OU with alpha=1, sigma=2/beta=0.5: stationary var = sigma^2/(2 alpha)
    sys = ornstein_uhlenbeck(h=1e-3, n_steps=100)
    traj = sys.trajectory([1.0], 20000, seed=3)
    tail = traj[2000:, 0]
    assert abs(tail.mean()) < 0.05
    np.testing.assert_allclose(tail.var(), 0.5**2 / 2.0, rtol=0.15)


def test_quadruple_well_metastability():
    sys = quadruple_well(h=1e-3, n_steps=100)
    traj = sys.trajectory([1.0, 1.0], 3000, seed=5)
    # stays near well centers (+-1, +-1): mean abs coordinate ~ 1
    assert 0.6 < np.abs(traj[:, 0]).mean() < 1.3
    assert 0.6 < np.abs(traj[:, 1]).mean() < 1.3
    # potential evaluates
    assert sys.potential([[1.0, 1.0]])[0] < sys.potential([[0.0, 0.0]])[0]


def test_prinz_and_triple_well_sample_their_wells():
    p = prinz_potential(h=1e-5, n_steps=100)
    traj = p.trajectory([0.0], 2000, seed=9)
    assert np.all(np.abs(traj) < 1.5)  # bounded by the x^8 wall
    t = triple_well_1d(h=1e-3, n_steps=50)
    traj3 = t.trajectory([2.0], 2000, seed=9)
    assert np.all((traj3 > -1.0) & (traj3 < 7.0))


def test_lorenz_attractor_bounded_and_deterministic():
    sys = lorenz_system(h=1e-3, n_steps=10)
    a = sys.trajectory([1.0, 1.0, 1.0], 2000, seed=1)
    b = sys.trajectory([1.0, 1.0, 1.0], 2000, seed=2)  # ODE: seed-independent
    np.testing.assert_allclose(a, b, atol=1e-12)
    assert np.all(np.abs(a) < 100)
    # z stays positive on the attractor after transient
    assert a[500:, 2].min() > 0


def test_abc_flow_and_custom_ode_agree():
    ref = abc_flow(h=1e-3, n_steps=17)
    a, b, c = np.sqrt(3.0), np.sqrt(2.0), 1.0
    custom = custom_ode(
        3,
        lambda x: np.array(
            [
                a * np.sin(x[2]) + c * np.cos(x[1]),
                b * np.sin(x[0]) + a * np.cos(x[2]),
                c * np.sin(x[1]) + b * np.cos(x[0]),
            ]
        ),
        h=1e-3,
        n_steps=17,
    )
    x0 = [0.3, 0.2, 0.1]
    np.testing.assert_allclose(ref.trajectory(x0, 100), custom.trajectory(x0, 100), atol=1e-12)


def test_trajectory_df_ensemble(spark):
    sys = double_well_2d(h=1e-3, n_steps=20)
    x0s = [[-1.0, 0.0], [1.0, 0.0], [0.0, 0.0], [0.5, 0.5]]
    df = sys.trajectory_df(spark, x0s, length=50, seed=11)
    rows = df.collect()
    assert len(rows) == 4 * 50
    by_traj = {}
    for r in rows:
        by_traj.setdefault(r["traj_id"], []).append(r)
    assert set(by_traj) == {0, 1, 2, 3}
    # frame 0 is the initial condition; executor-side result matches the
    # driver integration for the same per-trajectory seed
    t0 = sorted(by_traj[1], key=lambda r: r["t"])
    np.testing.assert_allclose(t0[0]["x"], [1.0, 0.0], atol=1e-12)
    driver = sys.trajectory([1.0, 0.0], 50, seed=11 + 1)
    got = np.array([r["x"] for r in t0])
    np.testing.assert_allclose(got, driver, atol=1e-10)


def test_sqrt_model_shapes_and_separation():
    dtraj, traj = sqrt_model(5000, seed=13)
    assert dtraj.shape == (5000,) and traj.shape == (5000, 2)
    # the sqrt mask makes the mean y of both states overlap less than the
    # unmasked -1/1 separation but states still differ in distribution
    m0 = traj[dtraj == 0, 1].mean()
    m1 = traj[dtraj == 1, 1].mean()
    assert m0 > m1


def test_swissroll_model_shapes():
    dtraj, traj = swissroll_model(2000, seed=17)
    assert traj.shape == (2000, 3)
    assert dtraj.max() <= 3


def test_ellipsoids_emissions():
    ell = Ellipsoids(laziness=0.97, seed=7)
    obs, dtraj = ell.observations(4000)
    m0 = obs[dtraj == 0].mean(axis=0)
    m1 = obs[dtraj == 1].mean(axis=0)
    np.testing.assert_allclose(m0, [0.0, 0.0], atol=0.4)
    np.testing.assert_allclose(m1, [0.0, 5.0], atol=0.4)


def test_drunkards_walk_absorbing_and_barriers():
    walk = DrunkardsWalk(grid_size=(8, 8), bar_location=(7, 7), home_location=(0, 0))
    P = walk.msm.transition_matrix
    np.testing.assert_allclose(P.sum(axis=1), 1.0, atol=1e-12)
    assert P[walk.coordinate_to_state((0, 0)), walk.coordinate_to_state((0, 0))] == 1.0
    assert P[walk.coordinate_to_state((7, 7)), walk.coordinate_to_state((7, 7))] == 1.0
    # interior cell: 8 uniform neighbors
    s = walk.coordinate_to_state((3, 3))
    np.testing.assert_allclose(P[s][P[s] > 0], 1.0 / 8.0)
    # a hard barrier wall removes transitions into its cells
    walk.add_barrier((4, 0), (4, 6))
    P2 = walk.msm.transition_matrix
    blocked = walk.coordinate_to_state((4, 3))
    assert P2[:, blocked].sum() == 0.0
    path = walk.walk((1, 1), 500, seed=5)
    assert len(path) <= 500
    end = tuple(path[-1])
    # walk ends at an absorbing state or ran its course
    if len(path) < 500:
        assert end in ((0, 0), (7, 7))


def test_bickley_jet_bounded_meander():
    from deeptime_spark.data.systems import bickley_jet

    sys = bickley_jet(h=1e-2, n_steps=10)
    traj = sys.trajectory([0.0, 0.5], 300, seed=1)
    # the flow keeps meridional excursions within the jet domain scale
    assert np.all(np.abs(traj[:, 1]) < 4.0)
    # deterministic flow: same result regardless of seed
    traj2 = sys.trajectory([0.0, 0.5], 300, seed=99)
    np.testing.assert_allclose(traj, traj2, atol=1e-12)
    # zonal advection moves particles downstream
    assert traj[-1, 0] > traj[0, 0] + 1.0


def test_time_dependent_quintuple_well_stays_on_ring():
    from deeptime_spark.data.systems import time_dependent_quintuple_well

    sys = time_dependent_quintuple_well(h=1e-5, n_steps=500)
    traj = sys.trajectory([1.5, 0.0], 300, seed=4)
    r = np.linalg.norm(traj, axis=1)
    # breathing ring keeps the particle near radius ~1.5 +- 0.5
    assert np.all((r > 0.5) & (r < 2.8))
    assert sys.has_potential_function


def test_double_well_discrete():
    from deeptime_spark.data.datasets import DoubleWellDiscrete

    dw = DoubleWellDiscrete(n_steps=20000, seed=3)
    assert dw.dtraj.shape == (20000,)
    assert 0 <= dw.dtraj.min() and dw.dtraj.max() < 100
    # both wells visited: bins populated on both sides of the barrier
    assert (dw.dtraj < 40).sum() > 1000 and (dw.dtraj > 60).sum() > 1000
    assert dw.dtraj_n6good.max() <= 5
    msm = dw.analytic_msm(lagtime=5)
    # slowest timescale = barrier crossing, much longer than the lag
    assert msm.timescales(1)[0] > 50
