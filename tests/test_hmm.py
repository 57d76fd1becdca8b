"""HMM suite tests (SURVEY.md §2.9; reference tests/markov/hmm/).

Strategy mirrors the reference: generate data from a KNOWN HMM, fit from a
perturbed/heuristic init, and require recovery of transition matrix and
emissions up to hidden-state permutation (test_mlhmm.py style).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from deeptime_spark.data.schema import dtraj_from_arrays, trajectory_from_arrays
from deeptime_spark.hmm import (
    DiscreteOutputModel,
    GaussianOutputModel,
    HiddenMarkovModel,
    MaximumLikelihoodHMM,
    forward_backward,
    init_discrete_metastable_from_data,
    init_gaussian_from_data,
    lag_observations_df,
    viterbi,
)
from deeptime_spark.markov.msm import MarkovStateModel


def _make_hmm(T, B=None, means=None, sigmas=None, pi=None):
    tm = MarkovStateModel(np.asarray(T, dtype=float), lagtime=1)
    if B is not None:
        om = DiscreteOutputModel(np.asarray(B, dtype=float))
    else:
        om = GaussianOutputModel(len(means), means=means, sigmas=sigmas)
    return HiddenMarkovModel(tm, om, initial_distribution=pi)


@pytest.fixture(scope="module")
def discrete_ground_truth():
    T = np.array([[0.9, 0.1], [0.1, 0.9]])
    B = np.array([[0.85, 0.1, 0.05], [0.05, 0.1, 0.85]])
    return _make_hmm(T, B=B, pi=np.array([0.5, 0.5]))


def test_forward_backward_sums_to_one(discrete_ground_truth):
    hmm = discrete_ground_truth
    _, obs = hmm.simulate(500, seed=7)
    pobs = hmm.output_model.to_state_probability_trajectory(obs.astype(int))
    loglik, gamma, counts = forward_backward(hmm.transition_matrix, pobs, hmm.initial_distribution)
    assert np.isfinite(loglik) and loglik < 0
    np.testing.assert_allclose(gamma.sum(axis=1), 1.0, atol=1e-12)
    # Baum-Welch counts total = T - 1 transitions
    assert abs(counts.sum() - (len(obs) - 1)) < 1e-8


def test_viterbi_recovers_clean_path():
    # near-deterministic emissions: viterbi must equal the hidden path
    T = np.array([[0.95, 0.05], [0.05, 0.95]])
    B = np.array([[0.99, 0.01], [0.01, 0.99]])
    hmm = _make_hmm(T, B=B, pi=np.array([0.5, 0.5]))
    hidden, obs = hmm.simulate(1000, seed=3)
    path = viterbi(T, hmm.output_model.to_state_probability_trajectory(obs.astype(int)),
                   hmm.initial_distribution)
    assert np.mean(path == hidden) > 0.98


def test_mlhmm_discrete_recovers_parameters(spark, discrete_ground_truth):
    hmm = discrete_ground_truth
    rng = np.random.default_rng(11)
    dtrajs = []
    for seed in range(8):
        _, obs = hmm.simulate(2000, seed=100 + seed)
        dtrajs.append(obs.astype(int))
    df = dtraj_from_arrays(spark, dtrajs)
    init = init_discrete_metastable_from_data(df, n_hidden_states=2, lagtime=1)
    est = MaximumLikelihoodHMM(init, lagtime=1, maxit=50).fit(df)
    model = est.fetch_model()
    # likelihood must be monotonically non-decreasing (EM invariant)
    dl = np.diff(est.likelihoods_)
    assert np.all(dl > -1e-6)
    # match up to permutation of hidden states
    B = model.output_model.output_probabilities
    perm = [0, 1] if B[0, 0] > B[1, 0] else [1, 0]
    np.testing.assert_allclose(
        model.transition_matrix[np.ix_(perm, perm)], hmm.transition_matrix, atol=0.05
    )
    np.testing.assert_allclose(B[perm], hmm.output_model.output_probabilities, atol=0.05)


def test_mlhmm_gaussian_recovers_means(spark):
    hmm = _make_hmm(
        np.array([[0.95, 0.05], [0.05, 0.95]]),
        means=np.array([-1.0, 1.0]),
        sigmas=np.array([0.4, 0.4]),
        pi=np.array([0.5, 0.5]),
    )
    trajs = []
    for seed in range(6):
        _, obs = hmm.simulate(1500, seed=50 + seed)
        trajs.append(obs.reshape(-1, 1))
    df = trajectory_from_arrays(spark, trajs).select(
        "traj_id", "t", F.col("x")[0].alias("obs")
    )
    init = init_gaussian_from_data(df, n_hidden_states=2, obs_col="obs")
    est = MaximumLikelihoodHMM(init, lagtime=1, maxit=60, obs_col="obs").fit(df)
    model = est.fetch_model()
    means = np.sort(model.output_model.means)
    np.testing.assert_allclose(means, [-1.0, 1.0], atol=0.1)
    sigmas = model.output_model.sigmas
    np.testing.assert_allclose(sigmas, [0.4, 0.4], atol=0.1)
    perm = np.argsort(model.output_model.means)
    np.testing.assert_allclose(
        model.transition_matrix[np.ix_(perm, perm)], hmm.transition_matrix, atol=0.06
    )


def test_viterbi_df_and_gamma_df(spark, discrete_ground_truth):
    hmm = discrete_ground_truth
    hidden, obs = hmm.simulate(800, seed=21)
    df = dtraj_from_arrays(spark, [obs.astype(int)])
    vit = hmm.viterbi_df(df).orderBy("t").collect()
    path = np.array([r["hidden_state"] for r in vit])
    assert np.mean(path == hidden) > 0.8
    gdf = hmm.state_probabilities_df(df).orderBy("t").collect()
    gam = np.array([r["state_probabilities"] for r in gdf])
    np.testing.assert_allclose(gam.sum(axis=1), 1.0, atol=1e-10)
    # gamma argmax should broadly agree with the viterbi path
    assert np.mean(np.argmax(gam, axis=1) == path) > 0.9


def test_lag_observations_df_semantics(spark):
    # trajectory 0..9 at lag 3 -> (0,3,6,9), (1,4,7), (2,5,8)
    df = dtraj_from_arrays(spark, [np.arange(10)])
    lagged = lag_observations_df(df, lag=3)
    subs = {}
    for r in lagged.collect():
        subs.setdefault(r["traj_id"], []).append((r["t"], r["state"]))
    seqs = sorted(tuple(s for _, s in sorted(v)) for v in subs.values())
    assert seqs == [(0, 3, 6, 9), (1, 4, 7), (2, 5, 8)]


def test_bayesian_hmm_posterior(spark, discrete_ground_truth):
    from deeptime_spark.hmm import BayesianHMM, MaximumLikelihoodHMM, init_discrete_metastable_from_data

    hmm = discrete_ground_truth
    dtrajs = []
    for seed in range(4):
        _, obs = hmm.simulate(1500, seed=200 + seed)
        dtrajs.append(obs.astype(int))
    df = dtraj_from_arrays(spark, dtrajs)
    init = init_discrete_metastable_from_data(df, n_hidden_states=2, lagtime=1)
    mlhmm = MaximumLikelihoodHMM(init, lagtime=1, maxit=30).fit(df).fetch_model()
    posterior = BayesianHMM(mlhmm, n_samples=15, seed=5).fit(df).fetch_model()
    assert len(posterior.samples) == 15
    stats = posterior.gather_stats("transition_matrix")
    B = posterior.samples[0].output_model.output_probabilities
    perm = [0, 1] if B[0, 0] > B[1, 0] else [1, 0]
    # posterior mean of T near the ground truth (up to permutation)
    np.testing.assert_allclose(
        stats["mean"][np.ix_(perm, perm)], hmm.transition_matrix, atol=0.08
    )
    # nontrivial posterior spread with CI covering the truth
    assert np.all(stats["std"] > 0)
    T_true = hmm.transition_matrix
    assert np.all(stats["L"][np.ix_(perm, perm)] <= T_true + 0.05)
    assert np.all(T_true - 0.05 <= stats["R"][np.ix_(perm, perm)])
    # every sample is a valid stochastic matrix
    for s in posterior.samples:
        np.testing.assert_allclose(s.transition_matrix.sum(axis=1), 1.0, atol=1e-8)


def test_batched_kernels_match_single(discrete_ground_truth):
    from deeptime_spark.hmm.hmm_model import (
        forward_backward,
        forward_backward_batch,
        viterbi,
        viterbi_batch,
    )

    hmm = discrete_ground_truth
    A, pi, om = hmm.transition_matrix, hmm.initial_distribution, hmm.output_model
    rng = np.random.default_rng(7)
    obs_list = [rng.integers(0, om.n_observable_states, size=n) for n in (83, 7, 151, 2)]
    pobs_list = [om.to_state_probability_trajectory(o) for o in obs_list]
    # batched sufficient statistics == sum of per-trajectory results
    ll_b, g0_b, c_b, gammas_b = forward_backward_batch(A, pobs_list, pi)
    ll_s, g0_s, c_s = 0.0, np.zeros(len(pi)), np.zeros_like(A)
    for pobs, gam_b in zip(pobs_list, gammas_b):
        ll, gamma, counts = forward_backward(A, pobs, pi)
        ll_s += ll
        g0_s += gamma[0]
        c_s += counts
        np.testing.assert_allclose(gam_b, gamma, atol=1e-10)
    assert abs(ll_b - ll_s) < 1e-8
    np.testing.assert_allclose(g0_b, g0_s, atol=1e-10)
    np.testing.assert_allclose(c_b, c_s, atol=1e-10)
    # batched viterbi == per-trajectory viterbi
    paths_b = viterbi_batch(A, pobs_list, pi)
    for pobs, p_b in zip(pobs_list, paths_b):
        np.testing.assert_array_equal(p_b, viterbi(A, pobs, pi))


def test_batched_kernels_property(discrete_ground_truth):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from deeptime_spark.hmm.hmm_model import (
        forward_backward,
        forward_backward_batch,
        viterbi,
        viterbi_batch,
    )

    hmm = discrete_ground_truth
    A, pi, om = hmm.transition_matrix, hmm.initial_distribution, hmm.output_model

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=6),
           st.integers(min_value=0, max_value=2**31 - 1))
    def check(lengths, seed):
        rng = np.random.default_rng(seed)
        obs_list = [rng.integers(0, om.n_observable_states, size=n) for n in lengths]
        pobs_list = [om.to_state_probability_trajectory(o) for o in obs_list]
        ll_b, g0_b, c_b, gammas_b = forward_backward_batch(A, pobs_list, pi)
        ll_s = 0.0
        for pobs, gam_b in zip(pobs_list, gammas_b):
            ll, gamma, _ = forward_backward(A, pobs, pi)
            ll_s += ll
            np.testing.assert_allclose(gam_b, gamma, atol=1e-9)
        assert abs(ll_b - ll_s) < 1e-7
        for pobs, p_b in zip(pobs_list, viterbi_batch(A, pobs_list, pi)):
            np.testing.assert_array_equal(p_b, viterbi(A, pobs, pi))

    check()


def test_mlhmm_assume_colocated_equivalent(spark, discrete_ground_truth):
    """The lag-1 co-located fast path (no lag_observations_df join, no
    second repartition/persist, E-step-level singleton drop) must produce
    the exact same model as the default path, including with a length-1
    trajectory present (which the default path drops up front)."""
    hmm = discrete_ground_truth
    dtrajs = [hmm.simulate(400, seed=200 + s)[1].astype(int) for s in range(4)]
    dtrajs.append(np.array([1]))  # singleton: dropped either way
    df = dtraj_from_arrays(spark, dtrajs)
    coloc = df.repartition(4, "traj_id").persist()
    try:
        init = init_discrete_metastable_from_data(coloc, n_hidden_states=2, lagtime=1)
        base = (
            MaximumLikelihoodHMM(init, lagtime=1, maxit=4, per_traj_stats=True)
            .fit(df)
            .fetch_model()
        )
        fast = (
            MaximumLikelihoodHMM(
                init, lagtime=1, maxit=4, per_traj_stats=True, assume_colocated=True
            )
            .fit(coloc)
            .fetch_model()
        )
        np.testing.assert_array_equal(base.transition_matrix, fast.transition_matrix)
        np.testing.assert_array_equal(
            base.initial_distribution, fast.initial_distribution
        )
        np.testing.assert_array_equal(
            base.output_model.output_probabilities,
            fast.output_model.output_probabilities,
        )
        # decode parity on the colocated frame without the extra shuffle
        a = base.viterbi_df(df).orderBy("traj_id", "t").collect()
        b = fast.viterbi_df(coloc, colocated=True).orderBy("traj_id", "t").collect()
        assert [r["hidden_state"] for r in a] == [r["hidden_state"] for r in b]
    finally:
        coloc.unpersist()
