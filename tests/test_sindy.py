"""SINDy tests (reference tests/sindy/test_sindy.py strategy: recover the
known coefficients of a linear and a cubic 2-d system)."""

import numpy as np
import pytest

from deeptime_spark.data.schema import trajectory_from_arrays
from deeptime_spark.sindy import (
    STLSQ,
    SINDy,
    finite_difference_coefficients,
    with_derivative,
)


def _integrate(rhs, x0, n, dt):
    xs = np.empty((n + 1, len(x0)))
    xs[0] = x0
    for k in range(n):
        x = xs[k]
        k1, k2 = rhs(x), rhs(x + 0.5 * dt * rhs(x))
        k3 = rhs(x + 0.5 * dt * k2)
        k4 = rhs(x + dt * k3)
        xs[k + 1] = x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
    return xs


def test_fd_coefficients_standard_stencils():
    np.testing.assert_allclose(
        finite_difference_coefficients(1, np.array([-1, 0, 1])), [-0.5, 0.0, 0.5], atol=1e-12
    )
    np.testing.assert_allclose(
        finite_difference_coefficients(1, np.array([0, 1, 2])), [-1.5, 2.0, -0.5], atol=1e-12
    )
    np.testing.assert_allclose(
        finite_difference_coefficients(2, np.array([-1, 0, 1])), [1.0, -2.0, 1.0], atol=1e-12
    )


def test_with_derivative_quadratic_exact(spark):
    # x(t) = (t^2, 3t): 2nd-order FD is exact for polynomials of degree 2,
    # including the one-sided edge stencils
    t = np.arange(20, dtype=float)
    traj = np.stack([t**2, 3 * t], axis=1)
    df = trajectory_from_arrays(spark, [traj])
    out = with_derivative(df, dt=1.0).orderBy("t").collect()
    got = np.array([r["x_dot"] for r in out])
    expected = np.stack([2 * t, np.full_like(t, 3.0)], axis=1)
    np.testing.assert_allclose(got, expected, atol=1e-9)


def test_sindy_recovers_linear_system(spark):
    # x' = -0.1 x + 2 y ; y' = -2 x - 0.1 y (reference test system)
    A = np.array([[-0.1, 2.0], [-2.0, -0.1]])

    def rhs(x):
        return A @ x

    dt = 0.01
    trajs = []
    for x0 in ([2.0, 0.0], [0.0, 1.5], [1.0, 1.0]):
        trajs.append(_integrate(rhs, np.array(x0), 1500, dt))
    df = trajectory_from_arrays(spark, trajs)
    model = SINDy(optimizer=STLSQ(threshold=0.09, alpha=1e-8)).fit(df, dt=dt).fetch_model()
    # features: [1, x0, x1, x0^2, x0*x1, x1^2]
    Xi = model.coefficients
    expected = np.zeros((2, 6))
    expected[0, 1], expected[0, 2] = -0.1, 2.0
    expected[1, 1], expected[1, 2] = -2.0, -0.1
    np.testing.assert_allclose(Xi, expected, atol=5e-3)
    assert model.score(with_derivative(df, dt=dt)) > 0.999


def test_sindy_with_exact_derivatives_and_simulate(spark):
    # cubic damped oscillator: x' = -0.1 x^3 + 2 y^3 ; y' = -2 x^3 - 0.1 y^3
    def rhs(x):
        return np.array([-0.1 * x[0] ** 3 + 2 * x[1] ** 3, -2 * x[0] ** 3 - 0.1 * x[1] ** 3])

    dt = 0.01
    xs = _integrate(rhs, np.array([2.0, 0.0]), 3000, dt)
    xdot = np.array([rhs(x) for x in xs])
    # provide exact derivatives through a second array column
    rows = [(0, t, xs[t].tolist(), xdot[t].tolist()) for t in range(len(xs))]
    df = spark.createDataFrame(rows, ["traj_id", "t", "x", "x_dot"])
    from deeptime_spark.basis import Monomials

    model = (
        SINDy(library=Monomials(p=3, d=2), optimizer=STLSQ(threshold=0.05, alpha=1e-10))
        .fit(df, xdot_col="x_dot")
        .fetch_model()
    )
    names = model.feature_names
    coef = {n: model.coefficients[:, i] for i, n in enumerate(names)}
    np.testing.assert_allclose(coef["x0*x0*x0"], [-0.1, -2.0], atol=1e-3)
    np.testing.assert_allclose(coef["x1*x1*x1"], [2.0, -0.1], atol=1e-3)
    # simulate from the identified model and compare short-horizon dynamics
    sim = model.simulate(np.array([2.0, 0.0]), 200, dt=dt)
    np.testing.assert_allclose(sim, xs[:201], atol=1e-3)
    eqs = model.equations()
    assert len(eqs) == 2 and "x0*x0*x0" in eqs[0]


def test_tv_derivative_denoises(spark, rng):
    from deeptime_spark.sindy import tv_derivative, tv_derivative_df

    # piecewise-linear signal (derivative = step function) + noise
    t = np.arange(200, dtype=float)
    true_d = np.where(t < 100, 1.0, -1.0)
    y = np.concatenate([t[:100], 200 - t[100:]]) + 0.5 * rng.normal(size=200)
    d_tv = tv_derivative(t, y, alpha=50.0, maxit=60, tol=1e-8)
    d_fd = np.gradient(y, t, edge_order=2)
    err_tv = np.abs(d_tv[5:-5] - true_d[5:-5]).mean()
    err_fd = np.abs(d_fd[5:-5] - true_d[5:-5]).mean()
    # TV regularization drastically denoises vs the raw finite difference
    assert err_tv < 0.35 * err_fd
    assert err_tv < 0.15
    # distributed variant matches the driver computation
    df = spark.createDataFrame(
        [(0, int(ti), float(yi)) for ti, yi in zip(t, y)], ["traj_id", "t", "value"]
    )
    rows = tv_derivative_df(df, alpha=50.0, maxit=60, tol=1e-8).orderBy("t").collect()
    got = np.array([r["dvalue_tv"] for r in rows])
    np.testing.assert_allclose(got, d_tv, atol=1e-8)


def test_sindy_harness_query_layout_independent(spark):
    # the harness sindy_events coefficients must not depend on how the
    # event rows were partitioned: round-6 output identical under a
    # 13-way scrambling repartition of the feature frame
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from deeptime_spark.sindy import SINDy, STLSQ

    traj = entrymod._event_traj(spark, "/root/testdata/sf0.001")
    feat = traj.select("traj_id", "t", F.array(F.col("value") / 100.0).alias("x"))

    def coefs(frame):
        m = SINDy(optimizer=STLSQ(threshold=0.0, alpha=0.0)).fit(frame, dt=1.0).fetch_model()
        return [round(float(c), 6) for c in m.coefficients[0]]

    assert coefs(feat) == coefs(feat.repartition(13, "t"))
