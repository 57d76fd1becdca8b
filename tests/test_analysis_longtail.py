"""Analysis long-tail: hitting probability, fingerprints, stationary
expected counts, pathway decomposition, state sampling."""

import numpy as np
import pytest

from deeptime_spark.data.schema import dtraj_from_arrays
from deeptime_spark.markov import analysis
from deeptime_spark.markov.tpt import pathways


def test_hitting_probability_chain():
    # 0 -> 1 -> 2 absorbing both ends: h to {2} from 1 is p/(p+q) pattern
    P = np.array([[1.0, 0.0, 0.0], [0.3, 0.4, 0.3], [0.0, 0.0, 1.0]])
    h = analysis.hitting_probability(P, [2])
    np.testing.assert_allclose(h, [0.0, 0.5, 1.0], atol=1e-12)


def test_fingerprint_correlation_reference_doctest():
    # pinned to the reference doctest (_api.py:948-959)
    T = np.array([[0.9, 0.1, 0.0], [0.5, 0.0, 0.5], [0.0, 0.1, 0.9]])
    a = np.array([1.0, 0.0, 0.0])
    ts, amp = analysis.fingerprint_correlation(T, a)
    np.testing.assert_allclose(ts, [np.inf, 9.49122158, 0.43429448], rtol=1e-6)
    np.testing.assert_allclose(amp, [0.20661157, 0.22727273, 0.02066116], rtol=1e-6)


def test_fingerprint_relaxation_recovers_decay():
    T = np.array([[0.9, 0.1, 0.0], [0.5, 0.0, 0.5], [0.0, 0.1, 0.9]])
    p0 = np.array([1.0, 0.0, 0.0])
    obs = np.array([0.0, 0.0, 1.0])
    ts, amp = analysis.fingerprint_relaxation(T, p0, obs)
    # t -> inf: relaxation converges to stationary expectation = amp[0]
    pi = analysis.stationary_distribution(T)
    np.testing.assert_allclose(amp[0], float(pi @ obs), rtol=1e-8)


def test_fingerprint_correlation_rejects_nonreversible():
    T = np.array([[0.5, 0.5, 0.0], [0.0, 0.5, 0.5], [0.5, 0.0, 0.5]])
    with pytest.raises(ValueError, match="reversible"):
        analysis.fingerprint_correlation(T, np.array([1.0, 0.0, 0.0]))


def test_expected_counts_stationary():
    T = np.array([[0.9, 0.1], [0.2, 0.8]])
    pi = analysis.stationary_distribution(T)
    EC = analysis.expected_counts_stationary(T, 50)
    np.testing.assert_allclose(EC, 50 * pi[:, None] * T, atol=1e-12)
    assert abs(EC.sum() - 50.0) < 1e-9


def test_is_rate_matrix():
    K = np.array([[-0.5, 0.5], [0.3, -0.3]])
    assert analysis.is_rate_matrix(K)
    assert not analysis.is_rate_matrix(np.array([[0.9, 0.1], [0.1, 0.9]]))


def test_pathway_decomposition_reference_fixture():
    # flux network of the reference test (tests/markov/tools/flux/
    # test_pathways.py) with the known dominant decomposition
    F = np.zeros((8, 8))
    F[0, 2] = 10.0
    F[2, 6] = 10.0
    F[1, 3] = 100.0
    F[3, 4] = 30.0
    F[3, 5] = 70.0
    F[4, 6] = 5.0
    F[4, 7] = 25.0
    F[5, 6] = 30.0
    F[5, 7] = 40.0
    paths, caps = pathways(F, [0, 1], [6, 7])
    expected_paths = [[1, 3, 5, 7], [1, 3, 5, 6], [1, 3, 4, 7], [0, 2, 6], [1, 3, 4, 6]]
    expected_caps = [40.0, 30.0, 25.0, 10.0, 5.0]
    assert [list(p) for p in paths] == expected_paths
    np.testing.assert_allclose(caps, expected_caps, atol=1e-12)
    # fraction=0.5 keeps the two dominant paths
    paths2, caps2 = pathways(F, [0, 1], [6, 7], fraction=0.5)
    assert len(paths2) == 2 and caps2 == [40.0, 30.0]


def test_state_indices_and_sampling(spark, rng):
    from deeptime_spark.markov.sample import (
        compute_state_indices_df,
        indices_by_distribution_df,
        sample_by_state_df,
    )

    dtrajs = [rng.integers(0, 3, size=500) for _ in range(2)]
    df = dtraj_from_arrays(spark, dtrajs)
    idx = {r["state"]: r for r in compute_state_indices_df(df).collect()}
    assert set(idx) == {0, 1, 2}
    assert sum(r["n_frames"] for r in idx.values()) == 1000
    # every index points at a frame that really has that state
    flat = {(r["traj_id"], r["t"]): r["state"] for r in df.collect()}
    for s, r in idx.items():
        for pair in r["indices"][:10]:
            assert flat[(pair["traj_id"], pair["t"])] == s

    sampled = sample_by_state_df(df, n_samples=20, seed=7).collect()
    per_state = {}
    for r in sampled:
        per_state.setdefault(r["state"], 0)
        per_state[r["state"]] += 1
        assert flat[(r["traj_id"], r["t"])] == r["state"]
    assert all(v == 20 for v in per_state.values())

    dists = np.array([[1.0, 0.0, 0.0], [0.0, 0.5, 0.5]])
    drawn = indices_by_distribution_df(df, dists, n_samples=30, seed=3).collect()
    d0 = [r for r in drawn if r["dist_id"] == 0]
    d1 = [r for r in drawn if r["dist_id"] == 1]
    assert len(d0) == 30 and all(r["state"] == 0 for r in d0)
    assert len(d1) == 30 and all(r["state"] in (1, 2) for r in d1)
