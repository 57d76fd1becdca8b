"""Sensitivities validated against central finite differences of the
defining computations (stronger than golden values)."""

import numpy as np
import pytest

from deeptime_spark.markov import analysis
from deeptime_spark.markov.sensitivity import (
    eigenvalue_sensitivity,
    expectation_sensitivity,
    forward_committor_sensitivity,
    mfpt_sensitivity,
    stationary_distribution_sensitivity,
    timescale_sensitivity,
)

T = np.array(
    [
        [0.8, 0.15, 0.05, 0.0],
        [0.1, 0.75, 0.1, 0.05],
        [0.05, 0.1, 0.8, 0.05],
        [0.0, 0.1, 0.2, 0.7],
    ]
)
EPS = 1e-7


def _fd(fn, a, b):
    Tp, Tm = T.copy(), T.copy()
    Tp[a, b] += EPS
    Tm[a, b] -= EPS
    return (fn(Tp) - fn(Tm)) / (2 * EPS)


def _leading_eigs(M, k):
    vals = np.linalg.eigvals(M)
    return np.sort(vals.real)[::-1][k]


def test_eigenvalue_sensitivity_fd():
    for k in (0, 1):
        S = eigenvalue_sensitivity(T, k)
        for a, b in ((0, 1), (2, 3), (1, 1)):
            assert abs(S[a, b] - _fd(lambda M: _leading_eigs(M, k), a, b)) < 1e-5


def test_timescale_sensitivity_fd():
    def ts(M):
        lam = _leading_eigs(M, 1)
        return -1.0 / np.log(lam)

    S = timescale_sensitivity(T, 1)
    for a, b in ((0, 1), (3, 2)):
        assert abs(S[a, b] - _fd(ts, a, b)) < 1e-4


def test_stationary_sensitivity_fd():
    def pi_j(M, j):
        # same definition the sensitivity differentiates: leading left
        # eigenvector normalized to unit sum (matrix not re-normalized)
        vals, vecs = np.linalg.eig(M.T)
        i = np.argmin(np.abs(vals - 1.0))
        v = np.real(vecs[:, i])
        return (v / v.sum())[j]

    for j in range(4):
        S = stationary_distribution_sensitivity(T, j)
        for a, b in ((0, 1), (1, 2), (3, 3)):
            assert abs(S[a, b] - _fd(lambda M: pi_j(M, j), a, b)) < 1e-5


def test_committor_sensitivity_fd():
    A, B = [0], [3]

    def q_idx(M, idx):
        return analysis.committor(M, A, B, forward=True)[idx]

    for idx in (1, 2):
        S = forward_committor_sensitivity(T, A, B, idx)
        for a, b in ((1, 2), (2, 1), (1, 3)):
            assert abs(S[a, b] - _fd(lambda M: q_idx(M, idx), a, b)) < 1e-5


def test_mfpt_sensitivity_fd():
    target = 3

    def mfpt_j(M, j):
        n = M.shape[0]
        A = M - np.eye(n)
        A[target] = 0.0
        A[target, target] = 1.0
        rhs = -np.ones(n)
        rhs[target] = 0.0
        return np.linalg.solve(A, rhs)[j]

    for j in (0, 2):
        S = mfpt_sensitivity(T, target, j)
        for a, b in ((0, 1), (2, 2)):
            assert abs(S[a, b] - _fd(lambda M: mfpt_j(M, j), a, b)) < 1e-4


def test_expectation_sensitivity_linearity():
    a = np.array([0.0, 1.0, 2.0, -1.0])
    S = expectation_sensitivity(T, a)
    expected = sum(a[i] * stationary_distribution_sensitivity(T, i) for i in range(4))
    np.testing.assert_allclose(S, expected, atol=1e-12)
