"""Sensitivity (perturbation) matrices of MSM observables.

Reference: sensitivity API (/root/reference/src/deeptime/markov/tools/
analysis/_api.py:1452-1622, dense _sensitivity.py). Standard first-order
perturbation theory of the respective defining equations — eigen-pair
perturbation for eigenvalues/timescales, adjoint linear solves for
committor/MFPT, and the normalized-left-eigenvector derivative for the
stationary vector. All driver-side (n, n); validated against central
finite differences in the tests.
"""

from __future__ import annotations

import numpy as np

from deeptime_spark.markov import analysis


def _sorted_eig(T: np.ndarray):
    vals, R = np.linalg.eig(T)
    order = np.argsort(vals.real)[::-1]
    vals, R = vals[order], R[:, order]
    L = np.linalg.inv(R)
    return vals, L, R


def eigenvalue_sensitivity(T: np.ndarray, k: int) -> np.ndarray:
    """d lambda_k / d T = l_k r_k^T (biorthonormal pair)."""
    vals, L, R = _sorted_eig(np.asarray(T, dtype=np.float64))
    return np.real(np.outer(L[k], R[:, k]))


def timescale_sensitivity(T: np.ndarray, k: int) -> np.ndarray:
    """Chain rule through t_k = -1/ln lambda_k."""
    vals, L, R = _sorted_eig(np.asarray(T, dtype=np.float64))
    lam = np.real(vals[k])
    S = np.real(np.outer(L[k], R[:, k]))
    factor = 1.0 / (np.log(lam) ** 2) / lam if lam < 1.0 else 0.0
    return S * factor


def stationary_distribution_sensitivity(T: np.ndarray, j: int) -> np.ndarray:
    """d pi_j / d T via the adjoint of the stationarity system with the
    sum-to-one normalization."""
    T = np.asarray(T, dtype=np.float64)
    n = T.shape[0]
    pi = analysis.stationary_distribution(T)
    one = np.ones(n)
    e_j = np.zeros(n)
    e_j[j] = 1.0
    # adjoint solve of [T^T - I; 1^T] phi = e_j (least squares, consistent)
    matA = np.concatenate([T.T - np.eye(n), [one]])
    phi, *_ = np.linalg.lstsq(matA.T, e_j, rcond=-1)
    phi = phi[:n]
    return -np.outer(pi, phi) + np.dot(phi, pi) * np.outer(pi, one)


def forward_committor_sensitivity(T: np.ndarray, A, B, index: int) -> np.ndarray:
    """d q+_index / d T via the adjoint of the committor linear system."""
    T = np.asarray(T, dtype=np.float64)
    n = T.shape[0]
    A = np.unique(np.atleast_1d(A))
    B = np.unique(np.atleast_1d(B))
    notAB = np.setdiff1d(np.arange(n), np.union1d(A, B))
    K = T - np.eye(n)
    U = K[np.ix_(notAB, notAB)]
    v = -K[np.ix_(notAB, B)].sum(axis=1)
    qI = np.linalg.solve(U, v)
    q = np.zeros(n)
    q[B] = 1.0
    q[notAB] = qI
    target = np.zeros(n)
    target[index] = 1.0
    adj = np.linalg.solve(U.T, target[notAB])
    S = np.zeros((n, n))
    for row, a in zip(notAB, adj):
        S[row] = -a * q
    return S


def backward_committor_sensitivity(T: np.ndarray, A, B, index: int) -> np.ndarray:
    """d q-_index / d T — forward sensitivity of the time-reversed chain
    plus the induced stationary-vector variation (reference
    _sensitivity.py:71-134 construction)."""
    T = np.asarray(T, dtype=np.float64)
    n = T.shape[0]
    one = np.ones(n)
    pi = analysis.stationary_distribution(T)
    mEQ = np.diag(pi)
    mIEQ = np.diag(1.0 / pi)
    mSEQ = np.diag(1.0 / pi / pi)
    backT = mIEQ @ T.T @ mEQ
    qMat = forward_committor_sensitivity(backT, A, B, index)
    matA = np.concatenate([T.T - np.eye(n), [one]])
    phiM = np.linalg.pinv(matA)[:, :n]
    trQ = qMat.T
    d1 = mSEQ @ np.diagonal(T.T @ mEQ @ trQ)
    d2 = np.diagonal(trQ @ mIEQ @ T.T)
    psi1 = d1 @ phiM
    psi2 = -d2 @ phiM
    v1 = psi1 - one * np.dot(psi1, pi)
    v3 = psi2 - one * np.dot(psi2, pi)
    return np.outer(pi, v1) + mEQ @ trQ @ mIEQ + np.outer(pi, v3)


def mfpt_sensitivity(T: np.ndarray, target: int, j: int) -> np.ndarray:
    """d mfpt_j(target) / d T via the adjoint of the MFPT linear system."""
    T = np.asarray(T, dtype=np.float64)
    n = T.shape[0]
    matA = T - np.eye(n)
    matA[target] = 0.0
    matA[target, target] = 1.0
    rhs = -np.ones(n)
    rhs[target] = 0.0
    m = np.linalg.solve(matA, rhs)
    e_j = np.zeros(n)
    e_j[j] = 1.0
    phi = np.linalg.solve(matA.T, e_j)
    S = -np.outer(phi, m)
    S[target] = 0.0
    return S


def expectation_sensitivity(T: np.ndarray, a: np.ndarray) -> np.ndarray:
    """d <a>_pi / d T = sum_i a_i d pi_i / d T."""
    a = np.asarray(a, dtype=np.float64)
    S = np.zeros_like(np.asarray(T, dtype=np.float64))
    for i, ai in enumerate(a):
        if ai != 0.0:
            S += ai * stationary_distribution_sensitivity(T, i)
    return S
