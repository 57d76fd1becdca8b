"""Effective counts / statistical inefficiency tests (reference
tests/markov/tools/estimation behavior)."""

import numpy as np

from deeptime_spark.data.schema import dtraj_from_arrays
from deeptime_spark.markov.effective_counts import (
    effective_count_matrix,
    statistical_inefficiency,
    statistical_inefficiencies_df,
)
from deeptime_spark.markov.transition_counting import TransitionCountEstimator


def test_statistical_inefficiency_iid_is_one(rng):
    # iid samples: inefficiency ~ 1 (all samples effective)
    x = rng.normal(size=5000)
    ineff = statistical_inefficiency(x)
    assert 0.8 < ineff <= 1.05


def test_statistical_inefficiency_correlated_below_one(rng):
    # strongly autocorrelated AR(1): far fewer effective samples
    a = 0.95
    x = np.empty(5000)
    x[0] = 0.0
    for t in range(1, len(x)):
        x[t] = a * x[t - 1] + np.sqrt(1 - a * a) * rng.normal()
    ineff = statistical_inefficiency(x)
    # theoretical I = 1/(2*tau) with tau ~ (1+a)/(2(1-a)) ~ 19.5 -> ~0.026
    assert ineff < 0.1


def test_inefficiencies_df_iid_transitions(spark, rng):
    # memoryless uniform dtraj: transitions are iid -> inefficiency ~ 1
    dtrajs = [rng.integers(0, 3, size=3000) for _ in range(2)]
    df = dtraj_from_arrays(spark, dtrajs)
    rows = statistical_inefficiencies_df(df, lag=1).collect()
    assert len(rows) == 9
    vals = np.array([r["ineff"] for r in rows])
    assert np.all(vals > 0.6) and np.all(vals <= 1.1)


def test_effective_counts_bounded_by_sliding(spark, rng):
    # at lag >> 1 sliding windows overlap and consecutive conditional
    # targets of a slowly-mixing chain are strongly correlated -> the
    # effective counts must be sharply smaller than the sliding counts.
    # (At lag 1 on Markovian data the conditional targets are iid and the
    # inefficiency is correctly ~1.)
    from deeptime_spark.data.generators import simulate_msm

    T = np.array([[0.98, 0.02], [0.02, 0.98]])
    dtrajs = [simulate_msm(T, 5000, start=0, seed=s) for s in range(2)]
    df = dtraj_from_arrays(spark, dtrajs)
    C_eff = effective_count_matrix(df, lag=10, average="row")
    C_sliding = (
        TransitionCountEstimator(lagtime=10, count_mode="sliding").fit(df).fetch_model().count_matrix
    )
    assert C_eff.shape == C_sliding.shape
    assert C_eff.sum() < 0.5 * C_sliding.sum()
    assert np.all(C_eff >= 0)
    # row proportions preserved under 'row' averaging
    i = 0
    np.testing.assert_allclose(
        C_eff[i] / C_eff[i].sum(), C_sliding[i] / C_sliding[i].sum(), atol=1e-12
    )


def test_estimator_effective_mode(spark, rng):
    from deeptime_spark.data.generators import simulate_msm

    T = np.array([[0.9, 0.1], [0.1, 0.9]])
    df = dtraj_from_arrays(spark, [simulate_msm(T, 3000, start=0, seed=1)])
    model = TransitionCountEstimator(lagtime=2, count_mode="effective").fit(df).fetch_model()
    assert model.counting_mode == "effective"
    assert model.count_matrix.sum() > 0
