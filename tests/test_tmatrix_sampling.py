"""Exact reversible posterior sampler tests (reference
tests/markov/tools/estimation sampler behavior: statistical CI checks)."""

import numpy as np

from deeptime_spark.data.schema import dtraj_from_arrays
from deeptime_spark.markov.msm import BayesianMSM
from deeptime_spark.markov.tmatrix_sampling import sample_tmatrix_reversible
from deeptime_spark.markov.transition_counting import TransitionCountEstimator


def test_samples_are_reversible_stochastic():
    C = np.array([[80.0, 12.0, 3.0], [11.0, 40.0, 6.0], [4.0, 7.0, 50.0]])
    samples, pis = sample_tmatrix_reversible(C, n_samples=20, n_steps=4, seed=1, return_statdist=True)
    assert len(samples) == 20
    for T, pi in zip(samples, pis):
        np.testing.assert_allclose(T.sum(axis=1), 1.0, atol=1e-10)
        assert np.all(T >= 0)
        # detailed balance by construction
        np.testing.assert_allclose(pi[:, None] * T, (pi[:, None] * T).T, atol=1e-12)


def test_posterior_concentrates_with_data():
    rng = np.random.default_rng(5)
    T_true = np.array([[0.9, 0.1], [0.2, 0.8]])
    # large counts drawn from the true model
    C = 5000 * np.array([[0.9, 0.1], [0.2, 0.8]]) * np.array([[2 / 3], [1 / 3]])
    samples = sample_tmatrix_reversible(C, n_samples=200, n_steps=2, seed=7)
    arr = np.array(samples)
    mean = arr.mean(axis=0)
    std = arr.std(axis=0)
    np.testing.assert_allclose(mean, T_true, atol=0.02)
    assert np.all(std < 0.02)
    # true values inside the central 98% band
    lo, hi = np.percentile(arr, [1, 99], axis=0)
    assert np.all(T_true >= lo - 1e-9) and np.all(T_true <= hi + 1e-9)


def test_bayesian_msm_end_to_end(spark):
    from deeptime_spark.data.generators import simulate_msm

    T_true = np.array([[0.92, 0.08], [0.15, 0.85]])
    df = dtraj_from_arrays(spark, [simulate_msm(T_true, 8000, start=0, seed=s) for s in range(3)])
    counts = TransitionCountEstimator(lagtime=1, count_mode="sliding").fit(df).fetch_model()
    posterior = BayesianMSM(n_samples=60, seed=11).fit(counts).fetch_model()
    stats = posterior.gather_stats("transition_matrix")
    # posterior mean near truth, truth inside the CI band
    np.testing.assert_allclose(stats["mean"], T_true, atol=0.03)
    assert np.all(stats["L"] <= T_true + 1e-6) and np.all(T_true - 1e-6 <= stats["R"])
    # timescale uncertainty is finite and positive
    ts_stats = posterior.gather_stats("timescales", 1)
    assert np.isfinite(ts_stats["mean"]).all() and (ts_stats["std"] > 0).all()
