"""OOM-reweighted MSM (reference tests/markov/msm strategy: on exactly
Markovian equilibrium data the OOM estimate agrees with the MLE)."""

import numpy as np

from deeptime_spark.data.schema import dtraj_from_arrays
from deeptime_spark.markov.msm import MaximumLikelihoodMSM
from deeptime_spark.markov.oom import OOMReweightedMSM


def test_oom_matches_mle_on_markovian_data(spark):
    from deeptime_spark.data.generators import simulate_msm

    T_true = np.array(
        [[0.85, 0.1, 0.05], [0.1, 0.8, 0.1], [0.05, 0.1, 0.85]]
    )
    dtrajs = [simulate_msm(T_true, 6000, start=s % 3, seed=s) for s in range(4)]
    df = dtraj_from_arrays(spark, dtrajs)
    oom = OOMReweightedMSM(lagtime=1, nbs=100, seed=3).fit(df).fetch_model()
    mle = MaximumLikelihoodMSM(reversible=True, lagtime=1).fit(df, lagtime=1).fetch_model()
    assert oom.n_states == 3
    np.testing.assert_allclose(oom.transition_matrix, mle.transition_matrix, atol=0.05)
    np.testing.assert_allclose(oom.transition_matrix, T_true, atol=0.05)
    np.testing.assert_allclose(
        oom.stationary_distribution, mle.stationary_distribution, atol=0.03
    )


def test_oom_components_shapes(spark):
    from deeptime_spark.data.generators import simulate_msm

    T_true = np.array([[0.9, 0.1], [0.2, 0.8]])
    df = dtraj_from_arrays(spark, [simulate_msm(T_true, 5000, start=0, seed=7)])
    est = OOMReweightedMSM(lagtime=2, nbs=50)
    model = est.fit(df).fetch_model()
    assert est.oom_eigenvalues_ is not None
    assert np.abs(est.oom_eigenvalues_[0] - 1.0) < 0.1
    np.testing.assert_allclose(model.transition_matrix.sum(axis=1), 1.0, atol=1e-10)
