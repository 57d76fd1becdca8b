"""AMM tests: biasing an MSM toward an experimental observable target."""

import numpy as np

from deeptime_spark.data.schema import dtraj_from_arrays
from deeptime_spark.markov.amm import AugmentedMSMEstimator
from deeptime_spark.markov.msm import MaximumLikelihoodMSM
from deeptime_spark.markov.transition_counting import TransitionCountEstimator


def _counts(spark, T, n=8000, n_traj=3):
    from deeptime_spark.data.generators import simulate_msm

    dtrajs = [simulate_msm(T, n, start=s % T.shape[0], seed=s) for s in range(n_traj)]
    df = dtraj_from_arrays(spark, dtrajs)
    return TransitionCountEstimator(lagtime=1).fit(df).fetch_model()


def test_amm_pulls_expectation_toward_measurement(spark):
    T_true = np.array([[0.9, 0.1, 0.0], [0.1, 0.8, 0.1], [0.0, 0.1, 0.9]])
    counts = _counts(spark, T_true)
    mle = MaximumLikelihoodMSM(reversible=True).fit_from_counts(counts).fetch_model()
    E = np.array([[0.0], [1.0], [2.0]])  # observable per state
    m_unbiased = float(mle.stationary_distribution @ E[:, 0])
    target = m_unbiased + 0.3  # experiment says the observable is higher
    amm = (
        AugmentedMSMEstimator(E, [target], [50.0])
        .fit(counts)
        .fetch_model()
    )
    m_amm = float(amm.m_hat[0])
    # AMM expectation moves from the unbiased value toward the measurement
    assert m_unbiased < m_amm <= target + 0.05
    assert abs(m_amm - target) < abs(m_unbiased - target)
    # result is a valid reversible MSM
    np.testing.assert_allclose(amm.transition_matrix.sum(axis=1), 1.0, atol=1e-8)
    pi = amm.stationary_distribution
    flux = pi[:, None] * amm.transition_matrix
    np.testing.assert_allclose(flux, flux.T, atol=1e-6)


def test_amm_zero_weight_recovers_mle(spark):
    T_true = np.array([[0.85, 0.15], [0.2, 0.8]])
    counts = _counts(spark, T_true)
    mle = MaximumLikelihoodMSM(reversible=True).fit_from_counts(counts).fetch_model()
    E = np.array([[0.0], [1.0]])
    amm = AugmentedMSMEstimator(E, [0.9], [0.0]).fit(counts).fetch_model()
    np.testing.assert_allclose(amm.transition_matrix, mle.transition_matrix, atol=1e-4)
