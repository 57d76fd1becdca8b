"""Estimation utilities: likelihood, posterior covariance, disconnected MLE.

Reference: ``log_likelihood``/``tmatrix_cov``/``error_perturbation``
(/root/reference/src/deeptime/markov/tools/estimation/api.py:957-1117),
``estimate_P``/``transition_matrix_partial_rev``/``stationary_distribution``
(markov/_transition_matrix.py:6-172). All driver-side (n, n) math.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from deeptime_spark.markov import analysis
from deeptime_spark.markov.msm import (
    transition_matrix_nonreversible,
    transition_matrix_reversible,
    transition_matrix_reversible_fixed_pi,
)
from deeptime_spark.numeric.graph import connected_components


def log_likelihood(C: np.ndarray, T: np.ndarray) -> float:
    """l(C|T) = sum c_ij ln t_ij over nonzero t_ij (reference api.py:957)."""
    C = np.asarray(C, dtype=np.float64)
    T = np.asarray(T, dtype=np.float64)
    nz = np.nonzero(T)
    return float(np.dot(C[nz], np.log(T[nz])))


def tmatrix_cov(C: np.ndarray, k: Optional[int] = None) -> np.ndarray:
    """Covariance tensor of the nonreversible (row-Dirichlet) posterior
    (reference api.py:1030-1065): row i ~ Dirichlet(c_i.), with
    cov[p_ij, p_il] = (delta_jl a_j a0 - a_j a_l) / (a0^2 (a0 + 1))."""
    C = np.asarray(C, dtype=np.float64)

    def row_cov(alpha: np.ndarray) -> np.ndarray:
        a0 = alpha.sum()
        norm = a0 * a0 * (a0 + 1.0)
        return (np.diag(alpha) * a0 - np.outer(alpha, alpha)) / norm

    if k is not None:
        return row_cov(C[k])
    return np.stack([row_cov(C[i]) for i in range(C.shape[0])])


def error_perturbation(C: np.ndarray, sensitivity: np.ndarray) -> np.ndarray:
    """Error propagation sigma^2(f) = sum_ijl S_ij cov[p_ij, p_il] S_il for
    sensitivity matrices of observables f(T) (reference api.py:1066-1117).
    ``sensitivity`` is (M, M) for a single observable or (K, M, M)."""
    C = np.asarray(C, dtype=np.float64)
    S = np.asarray(sensitivity, dtype=np.float64)
    single = S.ndim == 2
    S = S[None] if single else S
    K = S.shape[0]
    cov = tmatrix_cov(C)  # (M, M, M)
    out = np.zeros((K, K))
    for a in range(K):
        for b in range(K):
            acc = 0.0
            for i in range(C.shape[0]):
                acc += S[a, i] @ cov[i] @ S[b, i]
            out[a, b] = acc
    return float(out[0, 0]) if single else out


def transition_matrix_partial_rev(C: np.ndarray, P: np.ndarray, S: np.ndarray,
                                  maxiter: int = 1_000_000, maxerr: float = 1e-8) -> None:
    """Reversible-on-a-subset MLE for strongly connected sets with
    outgoing transitions (reference _transition_matrix.py:64-130):
    detailed balance on the S-block, free outgoing block, fixed point on
    the row sums. Writes P[S] in place."""
    A = C[S][:, S]
    B = C[S][:, ~S]
    ATA = A + A.T
    countsums = C[S].sum(axis=1)
    X = 0.5 * ATA
    Y = B.astype(np.float64).copy()
    total = X.sum() + Y.sum()
    X /= total
    Y /= total
    rowsums = X.sum(axis=1) + Y.sum(axis=1)
    for _ in range(maxiter):
        with np.errstate(divide="ignore", invalid="ignore"):
            d = countsums / rowsums
            X = np.where(ATA > 0, ATA / (d[:, None] + d[None, :]), 0.0)
            Y = np.where(B > 0, B / d[:, None], 0.0)
        total = X.sum() + Y.sum()
        X /= total
        Y /= total
        rowsums_new = X.sum(axis=1) + Y.sum(axis=1)
        err = float(np.max(np.abs(rowsums_new - rowsums)))
        rowsums = rowsums_new
        if err <= maxerr:
            break
    P[np.ix_(S, S)] = X
    P[np.ix_(S, ~S)] = Y
    P[S] /= P[S].sum(axis=1)[:, None]


def estimate_P(C: np.ndarray, reversible: bool = True, fixed_statdist: Optional[np.ndarray] = None,
               maxiter: int = 1_000_000, maxerr: float = 1e-8,
               mincount_connectivity: float = 0.0) -> np.ndarray:
    """Full-matrix MLE for arbitrary (dis)connectivity (reference
    _transition_matrix.py:6-61): per-connected-set estimation; empty
    states stay identity rows."""
    C = np.asarray(C, dtype=np.float64)
    n = C.shape[0]
    P = np.eye(n)
    Cmask = C > mincount_connectivity
    if reversible and fixed_statdist is None:
        for s in connected_components(Cmask, directed=True):
            mask = np.zeros(n, dtype=bool)
            mask[s] = True
            if C[np.ix_(mask, ~mask)].sum() > np.finfo(np.float64).eps:
                transition_matrix_partial_rev(C, P, mask, maxiter=maxiter, maxerr=maxerr)
            elif s.size > 1:
                idx = np.ix_(mask, mask)
                P[idx] = transition_matrix_reversible(C[idx], maxiter=maxiter, maxerr=maxerr)
    else:
        for s in connected_components(Cmask, directed=False):
            idx = np.ix_(s, s)
            if not reversible:
                Csub = C[idx].copy()
                zero_rows = np.where(Csub.sum(axis=1) == 0)[0]
                Csub[zero_rows, zero_rows] = 1.0
                P[idx] = transition_matrix_nonreversible(Csub)
            else:
                pi_sub = np.asarray(fixed_statdist)[s]
                P[idx] = transition_matrix_reversible_fixed_pi(
                    C[idx], pi_sub / pi_sub.sum(), maxiter=maxiter, maxerr=maxerr
                )
    return P


def stationary_distribution_disconnected(P: np.ndarray, C: np.ndarray,
                                         mincount_connectivity: float = 0.0) -> np.ndarray:
    """Count-weighted stationary distribution across weakly connected sets
    (reference _transition_matrix.py:150-172)."""
    P = np.asarray(P, dtype=np.float64)
    C = np.asarray(C, dtype=np.float64)
    n = C.shape[0]
    ctot = C.sum()
    pi = np.zeros(n)
    for s in connected_components(C > mincount_connectivity, directed=False):
        w = C[s].sum() / ctot
        pi[s] = w * analysis.stationary_distribution(P[np.ix_(s, s)])
    return pi / pi.sum()
