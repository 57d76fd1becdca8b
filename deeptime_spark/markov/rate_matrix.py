"""Continuous-time rate-matrix estimation.

Reference: ``rate_matrix`` (/root/reference/src/deeptime/markov/tools/
estimation/api.py:1239-1338, dense impl estimation/dense/ratematrix.py):
'pseudo' (pseudo-generator), 'truncated_log' (truncated matrix logarithm,
Davies 2010), and 'KL' (Kalbfleisch-Lawless 1985 likelihood maximization,
ratematrix.py:361-492 — objective/gradient reimplemented in numpy with a
projected Barzilai-Borwein optimizer replacing scipy's L-BFGS-B), and
'CVE' (Crommelin-Vanden-Eijnden spectral matching, ratematrix.py:239-357).

Driver-side numpy: rate matrices live at the (n, n) model layer.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _fix_generator(K: np.ndarray) -> np.ndarray:
    """Clip negative off-diagonal rates to zero and restore zero row sums
    (the standard correction of Davies 2010)."""
    K = K.copy()
    off = K - np.diag(np.diag(K))
    off[off < 0.0] = 0.0
    np.fill_diagonal(off, 0.0)
    out = off.copy()
    np.fill_diagonal(out, -off.sum(axis=1))
    return out


def _matrix_log(P: np.ndarray) -> np.ndarray:
    """Principal matrix logarithm via eigendecomposition (P must be
    diagonalizable with eigenvalues off the negative real axis — true for
    lazy transition matrices)."""
    vals, vecs = np.linalg.eig(P)
    if np.any(np.abs(vals) < 1e-14):
        raise ValueError("transition matrix is singular — no real logarithm")
    logm = vecs @ np.diag(np.log(vals.astype(complex))) @ np.linalg.inv(vecs)
    if np.max(np.abs(logm.imag)) > 1e-8:
        raise ValueError("matrix logarithm has a significant imaginary part")
    return logm.real


def rate_matrix(T: np.ndarray, dt: float = 1.0, method: str = "truncated_log") -> np.ndarray:
    """Estimate the generator K with expm(K dt) ~ T.

    - 'pseudo': K = (T - I)/dt, negatives clipped (first-order; exact as
      dt -> 0).
    - 'truncated_log': K = logm(T)/dt, negatives clipped (exact when T is
      embeddable).
    """
    T = np.asarray(T, dtype=np.float64)
    if method == "pseudo":
        K = (T - np.eye(T.shape[0])) / dt
    elif method == "truncated_log":
        K = _matrix_log(T) / dt
    else:
        raise ValueError(
            f"method {method!r} not available here — rate_matrix(T) supports "
            f"'pseudo'/'truncated_log'; use estimate_rate_matrix(C, method='KL'|'CVE') "
            f"for the likelihood/spectral optimizers (they need the count matrix)"
        )
    return _fix_generator(K)


def _exprel(x: np.ndarray) -> np.ndarray:
    """(e^x - 1)/x with the x -> 0 limit (scipy.special.exprel)."""
    out = np.ones_like(x)
    nz = np.abs(x) > 1e-12
    out[nz] = np.expm1(x[nz]) / x[nz]
    return out


def _getV(lam: np.ndarray, tau: float) -> np.ndarray:
    """Divided differences of exp for the Frechet derivative of expm
    (reference ratematrix.py:33-46)."""
    n = len(lam)
    V = np.zeros((n, n))
    ones = np.ones((n, n))
    delta = tau * (lam - lam[:, None])
    positive = delta >= 0
    negative = delta < 0
    a1 = tau * np.exp(tau * lam)[:, None] * ones
    V[negative] = a1[negative] * _exprel(delta)[negative]
    a2 = tau * np.exp(tau * lam)[None, :] * ones
    V[positive] = a2[positive] * _exprel(-delta)[positive]
    return V


def _reversible_eigen(K: np.ndarray, pi: np.ndarray):
    """Real eigendecomposition of a pi-reversible generator via the
    symmetrized similarity transform (reference ratematrix.py:49-64)."""
    sqrt_pi = np.sqrt(pi)
    Ksym = sqrt_pi[:, None] * K / sqrt_pi
    lam, B = np.linalg.eigh(0.5 * (Ksym + Ksym.T))
    A = B / sqrt_pi[:, None]
    Ainv = B.T * sqrt_pi
    return lam, A, Ainv


def _projected_bb_minimize(fg, x0: np.ndarray, lb: np.ndarray, maxiter: int = 2000,
                           gtol: float = 1e-9):
    """Projected-gradient minimization with Barzilai-Borwein steps and
    backtracking — the scipy-free stand-in for L-BFGS-B with lower
    bounds (adequate for the small smooth rate-matrix objectives)."""
    x = np.maximum(np.asarray(x0, dtype=np.float64), lb)
    f, g = fg(x)
    step = 1.0 / max(float(np.abs(g).max()), 1.0)
    for _ in range(maxiter):
        x_new = np.maximum(x - step * g, lb)
        f_new, g_new = fg(x_new)
        bt = 0
        while f_new > f and bt < 40:
            step *= 0.5
            x_new = np.maximum(x - step * g, lb)
            f_new, g_new = fg(x_new)
            bt += 1
        s = x_new - x
        if float(np.abs(s).max()) < 1e-16:
            break
        y = g_new - g
        sy = float(s @ y)
        step = float(s @ s) / sy if sy > 1e-300 else min(step * 2.0, 1e6)
        step = float(np.clip(step, 1e-14, 1e8))
        x, f, g = x_new, f_new, g_new
        proj_grad = x - np.maximum(x - g, lb)
        if float(np.abs(proj_grad).max()) < gtol:
            break
    return x, f


def estimate_rate_matrix_kl(
    C: np.ndarray,
    dt: float = 1.0,
    pi: Optional[np.ndarray] = None,
    K0: Optional[np.ndarray] = None,
    maxiter: int = 2000,
) -> np.ndarray:
    """Kalbfleisch-Lawless reversible MLE: maximize
    sum_ij C_ij log(expm(K dt))_ij over pi-reversible generators
    (reference ratematrix.py:361-492; parameterization x_p = pi_i K_ij
    over the i<j pairs so reversibility is structural).
    """
    from deeptime_spark.markov.analysis import stationary_distribution
    from deeptime_spark.markov.msm import transition_matrix_reversible

    C = np.asarray(C, dtype=np.float64)
    n = C.shape[0]
    if pi is None or K0 is None:
        T_rev = transition_matrix_reversible(C)
        if pi is None:
            pi = stationary_distribution(T_rev)
        if K0 is None:
            K0 = _fix_generator((T_rev - np.eye(n)) / dt)
    pi = np.asarray(pi, dtype=np.float64)
    I, J = np.triu_indices(n, 1)
    zero = (C == 0) & (C.T == 0)

    def fg(x: np.ndarray):
        K = np.zeros((n, n))
        K[I, J] = x / pi[I]
        K[J, I] = x / pi[J]
        np.fill_diagonal(K, -K.sum(axis=1))
        lam, A, Ainv = _reversible_eigen(K, pi)
        T = (A * np.exp(dt * lam)[None, :]) @ Ainv
        T[zero] = 1.0
        T = np.where((C > 0) & (T < 1e-20), 1e-20, T)
        f = float(np.sum(C * np.log(np.maximum(T, 1e-300))))
        V = _getV(lam, dt)
        M = (Ainv @ np.ascontiguousarray(C.T / T.T) @ A) * V.T
        H = A @ M @ Ainv
        grad = (
            H[J, I] / pi[I] + H[I, J] / pi[J] - H[I, I] / pi[I] - H[J, J] / pi[J]
        )
        return -f, -grad

    x0 = np.maximum(pi[I] * K0[I, J], 0.0)
    x, _ = _projected_bb_minimize(fg, x0, np.zeros_like(x0), maxiter=maxiter)
    K = np.zeros((n, n))
    K[I, J] = x / pi[I]
    K[J, I] = x / pi[J]
    np.fill_diagonal(K, -K.sum(axis=1))
    return K


def estimate_rate_matrix_cve(
    C: np.ndarray,
    dt: float = 1.0,
    pi: Optional[np.ndarray] = None,
    K0: Optional[np.ndarray] = None,
    maxiter: int = 2000,
) -> np.ndarray:
    """Crommelin-Vanden-Eijnden estimator: minimize the spectrally-weighted
    distance || Uinv K U - L ||^2_c with U, Lambda from the reversible MLE
    transition matrix and L = diag(log|Lambda|)/dt (reference
    ratematrix.py:239-357)."""
    from deeptime_spark.markov.analysis import stationary_distribution
    from deeptime_spark.markov.msm import transition_matrix_reversible

    C = np.asarray(C, dtype=np.float64)
    n = C.shape[0]
    T_rev = transition_matrix_reversible(C)
    if pi is None:
        pi = stationary_distribution(T_rev)
    pi = np.asarray(pi, dtype=np.float64)
    if K0 is None:
        K0 = _fix_generator((T_rev - np.eye(n)) / dt)
    evals, U, Uinv = _reversible_eigen(T_rev, pi)
    if not np.all(np.abs(evals) > 0.0):
        raise ValueError("T has eigenvalues exactly zero — CVE cannot proceed")
    c = np.abs(evals)
    L = np.diag(np.log(np.abs(evals)) / dt)
    I, J = np.triu_indices(n, 1)

    def fg(x: np.ndarray):
        K = np.zeros((n, n))
        K[I, J] = x / pi[I]
        K[J, I] = x / pi[J]
        np.fill_diagonal(K, -K.sum(axis=1))
        delta = Uinv @ K @ U - L
        f = float(c @ (delta * delta) @ c)
        X = 2.0 * c[:, None] * delta * c
        Y = (U @ X.T @ Uinv).T
        grad = Y[I, J] / pi[I] + Y[J, I] / pi[J] - Y[I, I] / pi[I] - Y[J, J] / pi[J]
        return f, grad

    x0 = np.maximum(pi[I] * K0[I, J], 0.0)
    x, _ = _projected_bb_minimize(fg, x0, np.zeros_like(x0), maxiter=maxiter)
    K = np.zeros((n, n))
    K[I, J] = x / pi[I]
    K[J, I] = x / pi[J]
    np.fill_diagonal(K, -K.sum(axis=1))
    return K


def estimate_rate_matrix(C: np.ndarray, dt: float = 1.0, method: str = "KL",
                         pi: Optional[np.ndarray] = None, K0: Optional[np.ndarray] = None,
                         maxiter: int = 2000) -> np.ndarray:
    """Reference ``estimate_rate_matrix`` API surface (api.py:1239-1338)
    from a count matrix: reversible MLE transition matrix feeds 'pseudo' /
    'truncated_log'; 'KL' runs the likelihood optimizer."""
    from deeptime_spark.markov.msm import transition_matrix_reversible

    if method == "KL":
        return estimate_rate_matrix_kl(C, dt=dt, pi=pi, K0=K0, maxiter=maxiter)
    if method == "CVE":
        return estimate_rate_matrix_cve(C, dt=dt, pi=pi, K0=K0, maxiter=maxiter)
    T = transition_matrix_reversible(np.asarray(C, dtype=np.float64))
    return rate_matrix(T, dt=dt, method=method)


def expm(K: np.ndarray, t: float = 1.0) -> np.ndarray:
    """Matrix exponential via eigendecomposition (diagonalizable K)."""
    vals, vecs = np.linalg.eig(np.asarray(K, dtype=np.float64) * t)
    out = vecs @ np.diag(np.exp(vals)) @ np.linalg.inv(vecs)
    return out.real
