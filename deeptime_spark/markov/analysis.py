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


def is_rate_matrix(K, tol: float = 1e-12) -> bool:
    """Off-diagonal >= 0, rows sum to zero (reference _api.py:85-124)."""
    Kd = _dense(K)
    off = Kd - np.diag(np.diag(Kd))
    return bool(np.all(off >= -tol) and np.all(np.abs(Kd.sum(axis=1)) < tol))


def hitting_probability(T, target) -> np.ndarray:
    """Probability to ever hit ``target`` before getting stuck elsewhere
    (reference _api.py:605-640, dense _hitting_probability.py:10-48):
    minimal non-negative solution of h=1 on A, h = sum_j p_ij h_j off A;
    absorbing non-target states get 0."""
    P = _dense(T)
    n = P.shape[0]
    target = np.atleast_1d(np.asarray(target, dtype=int))
    nontarget = np.setdiff1d(np.arange(n), target)
    stable = np.where(np.isclose(np.diag(P), 1.0))[0]
    origin = np.setdiff1d(nontarget, stable)
    A = P[np.ix_(origin, origin)] - np.eye(len(origin))
    b = -P[np.ix_(origin, target)].sum(axis=1)
    x = np.linalg.solve(A, b) if len(origin) else np.empty(0)
    h = np.ones(n)
    h[origin] = x
    h[target] = 1.0
    h[np.setdiff1d(stable, target)] = 0.0
    return h


def expected_counts_stationary(T, n_steps: int, mu: Optional[np.ndarray] = None) -> np.ndarray:
    """E[C(n)] in equilibrium: n * diag(pi) T (reference _api.py:807-863)."""
    Td = _dense(T)
    if mu is None:
        mu = stationary_distribution(Td)
    return n_steps * (mu[:, None] * Td)


def fingerprint(T, obs1: np.ndarray, obs2: Optional[np.ndarray] = None,
                p0: Optional[np.ndarray] = None, tau: float = 1.0, k: Optional[int] = None):
    """Timescale/amplitude spectrum (reference _fingerprints.py:92-138):
    amplitudes gamma_i = <w * obs1, r_i> <l_i, obs2> with w = mu (equilib.)
    or p0 (relaxation); timescales -tau/ln|lambda_i|."""
    R, D, L = rdl_decomposition(T, k=k)
    mu = stationary_distribution(T)
    vals = np.diagonal(D)
    ts = np.full(len(vals), np.inf)
    mag = np.abs(vals)
    mask = mag < 1.0 - 1e-12
    with np.errstate(divide="ignore"):
        ts[mask] = -tau / np.log(mag[mask])
    obs2 = obs1 if obs2 is None else obs2
    w = mu if p0 is None else np.asarray(p0, dtype=np.float64)
    amplitudes = np.real((w * np.asarray(obs1)) @ R) * np.real(L @ np.asarray(obs2))
    return ts, amplitudes


def fingerprint_correlation(T, obs1: np.ndarray, obs2: Optional[np.ndarray] = None,
                            tau: float = 1.0, k: Optional[int] = None):
    """Equilibrium correlation fingerprint (reference _api.py:864-970);
    requires a reversible transition matrix, as the reference does."""
    if not is_reversible(T):
        raise ValueError("fingerprint calculation requires a reversible transition matrix")
    return fingerprint(T, obs1, obs2=obs2, tau=tau, k=k)


def fingerprint_relaxation(T, p0: np.ndarray, obs: np.ndarray,
                           tau: float = 1.0, k: Optional[int] = None):
    """Relaxation-experiment fingerprint from initial distribution p0
    (reference _api.py:971-1057): fingerprint of (1, obs) weighted by p0."""
    one = np.ones(_dense(T).shape[0])
    return fingerprint(T, one, obs2=obs, p0=p0, tau=tau, k=k)


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
