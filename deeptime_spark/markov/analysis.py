"""MSM analysis — driver-side small-matrix math.

Functional parity with /root/reference/src/deeptime/markov/tools/analysis
(_api.py): validation predicates, stationary distribution, spectral
decomposition, timescales, MFPT, committors, expectations, correlations.
All implemented from the standard published formulas (linear solves /
eigendecompositions on the (n, n) transition matrix); they never touch
Spark — inputs are matrices collected from the counting layer.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from deeptime_spark.numeric.graph import connected_components


def _dense(T) -> np.ndarray:
    return np.asarray(T, dtype=np.float64)


def _check_states(n: int, states: np.ndarray, name: str) -> None:
    """State-index bounds check. Catches the common pitfall of passing
    original state *symbols* to a connected submodel that reindexed them
    (use TransitionCountModel.symbols_to_states to translate)."""
    if states.size == 0:
        raise ValueError(f"{name} must be non-empty")
    if np.any(states < 0) or np.any(states >= n):
        raise ValueError(
            f"{name} contains states outside [0, {n}); if this model is a "
            f"connected submodel, translate symbols via symbols_to_states first"
        )


def is_transition_matrix(T, tol: float = 1e-12) -> bool:
    """Row-stochastic, non-negative (reference _api.py:45-84)."""
    Td = _dense(T)
    return bool(np.all(Td >= -tol) and np.allclose(Td.sum(axis=1), 1.0, atol=1e-8))


def is_connected(T, directed: bool = True) -> bool:
    """Single (strongly) connected component (reference _api.py:125-184)."""
    return len(connected_components(_dense(T) > 0, directed=directed)) == 1

def is_reversible(T, mu: Optional[np.ndarray] = None, tol: float = 1e-10) -> bool:
    """Detailed balance check (reference _api.py:185-230)."""
    Td = _dense(T)
    if mu is None:
        mu = stationary_distribution(Td)
    flux = mu[:, None] * Td
    return bool(np.allclose(flux, flux.T, atol=tol))


def stationary_distribution(T) -> np.ndarray:
    """Left Perron eigenvector, normalized (reference
    _stationary_vector.py:76-130). Uses the eigendecomposition of T^T at
    eigenvalue 1 (n is small by construction)."""
    Td = _dense(T)
    vals, vecs = np.linalg.eig(Td.T)
    i = int(np.argmin(np.abs(vals - 1.0)))
    pi = np.real(vecs[:, i])
    pi = np.abs(pi)
    return pi / pi.sum()


def eigenvalues(T, k: Optional[int] = None) -> np.ndarray:
    """Eigenvalues sorted by decreasing |.| (reference _api.py:260-309)."""
    Td = _dense(T)
    vals = np.linalg.eigvals(Td)
    vals = vals[np.argsort(-np.abs(vals))]
    return vals[:k] if k is not None else vals


def _rdl_reversible(Td: np.ndarray, pi: np.ndarray):
    """Reversible spectral decomposition via the symmetrized matrix
    S = D^{1/2} T D^{-1/2} (standard similarity trick; reference
    _decomposition.py rdl_decomposition norm='reversible')."""
    sq = np.sqrt(pi)
    S = (sq[:, None] * Td) / sq[None, :]
    S = 0.5 * (S + S.T)
    vals, V = np.linalg.eigh(S)
    order = np.argsort(-np.abs(vals))
    vals, V = vals[order], V[:, order]
    # right eigenvectors of T: R = D^{-1/2} V; left: L = D^{1/2} V
    R = V / sq[:, None]
    L = V * sq[:, None]
    # normalize sign: first component of stationary right eigenvector positive
    return vals, L, R


def rdl_decomposition(T, k: Optional[int] = None, reversible: bool = False):
    """(R, D, L) with T = R D L, L R = I (reference _api.py:446-526)."""
    Td = _dense(T)
    if reversible:
        pi = stationary_distribution(Td)
        vals, L, R = _rdl_reversible(Td, pi)
        if k is not None:
            vals, L, R = vals[:k], L[:, :k], R[:, :k]
        return R, np.diag(vals), L.T
    vals, R = np.linalg.eig(Td)
    order = np.argsort(-np.abs(vals))
    vals, R = vals[order], R[:, order]
    L = np.linalg.inv(R)
    if k is not None:
        vals, R, L = vals[:k], R[:, :k], L[:k]
    return R, np.diag(vals), L


def timescales(T, tau: float = 1.0, k: Optional[int] = None) -> np.ndarray:
    """t_i = -tau / ln|lambda_i|; infinite for |lambda|=1
    (reference _api.py:310-365)."""
    vals = eigenvalues(T, k)
    ts = np.full(len(vals), np.inf)
    mag = np.abs(vals)
    mask = mag < 1.0 - 1e-12
    with np.errstate(divide="ignore"):
        ts[mask] = -tau / np.log(mag[mask])
    return ts


def mfpt(T, target, origin=None, tau: float = 1.0, mu: Optional[np.ndarray] = None) -> np.ndarray | float:
    """Mean first passage time to ``target`` (reference _api.py:527-604).

    Solves (I - T_{CC}) m_C = tau * 1 on C = complement(target); m=0 on
    target. With ``origin`` given, returns the mu-weighted average MFPT from
    the origin set (reference semantics).
    """
    Td = _dense(T)
    n = Td.shape[0]
    target = np.atleast_1d(np.asarray(target, dtype=int))
    _check_states(n, target, "target")
    if origin is not None:
        _check_states(n, np.atleast_1d(np.asarray(origin, dtype=int)), "origin")
    m = np.zeros(n)
    C = np.setdiff1d(np.arange(n), target)
    if len(C) > 0:
        A = np.eye(len(C)) - Td[np.ix_(C, C)]
        m[C] = np.linalg.solve(A, tau * np.ones(len(C)))
    if origin is None:
        return m
    origin = np.atleast_1d(np.asarray(origin, dtype=int))
    if mu is None:
        mu = stationary_distribution(Td)
    w = mu[origin] / mu[origin].sum()
    return float(w @ m[origin])


def committor(T, A: Sequence[int], B: Sequence[int], forward: bool = True, mu=None) -> np.ndarray:
    """Committor probabilities between sets A and B (reference
    _api.py:641-757). Forward: Lq=0 on transition region, q=0 on A, q=1 on
    B, L = T - I. Backward uses the time-reversed chain."""
    Td = _dense(T)
    n = Td.shape[0]
    A = np.atleast_1d(np.asarray(A, dtype=int))
    B = np.atleast_1d(np.asarray(B, dtype=int))
    _check_states(n, A, "A")
    _check_states(n, B, "B")
    if np.intersect1d(A, B).size:
        raise ValueError("A and B must be disjoint")
    X = np.setdiff1d(np.arange(n), np.concatenate([A, B]))
    q = np.zeros(n)
    if forward:
        q[B] = 1.0
        if len(X):
            L = Td - np.eye(n)
            q[X] = np.linalg.solve(L[np.ix_(X, X)], -L[np.ix_(X, B)] @ np.ones(len(B)))
    else:
        if mu is None:
            mu = stationary_distribution(Td)
        # time-reversed chain: Trev_ij = mu_j T_ji / mu_i
        Trev = (Td.T * mu[None, :]) / mu[:, None]
        q[A] = 1.0
        if len(X):
            L = Trev - np.eye(n)
            q[X] = np.linalg.solve(L[np.ix_(X, X)], -L[np.ix_(X, A)] @ np.ones(len(A)))
    return q


def expectation(T, a: np.ndarray, mu: Optional[np.ndarray] = None) -> float:
    """Stationary expectation sum_i pi_i a_i (reference _api.py:1058)."""
    if mu is None:
        mu = stationary_distribution(T)
    return float(np.dot(mu, a))


def expected_counts(T, p0: np.ndarray, n_steps: int) -> np.ndarray:
    """E[C(N)] = sum_{k<N} diag(p_k) T (reference _api.py:758-806)."""
    Td = _dense(T)
    p = np.asarray(p0, dtype=np.float64)
    EC = np.zeros_like(Td)
    for _ in range(n_steps):
        EC += p[:, None] * Td
        p = p @ Td
    return EC


def correlation(T, a: np.ndarray, b: Optional[np.ndarray] = None, times: Sequence[int] = (1,), tau: float = 1.0) -> np.ndarray:
    """Stationary time-correlation E_pi[a(x_0) b(x_t)] evaluated spectrally
    (reference _api.py:1111-1197)."""
    Td = _dense(T)
    if b is None:
        b = a
    pi = stationary_distribution(Td)
    out = []
    for time in times:
        k = int(round(time / tau))
        Tk = np.linalg.matrix_power(Td, k)
        out.append(float((pi * a) @ Tk @ b))
    return np.array(out)


def relaxation(T, p0: np.ndarray, obs: np.ndarray, times: Sequence[int] = (1,), tau: float = 1.0) -> np.ndarray:
    """E_{p0}[obs(x_t)] over times (reference _api.py:1198-1260)."""
    Td = _dense(T)
    out = []
    for time in times:
        k = int(round(time / tau))
        out.append(float(np.asarray(p0) @ np.linalg.matrix_power(Td, k) @ obs))
    return np.array(out)
