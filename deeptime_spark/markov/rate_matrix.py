"""Continuous-time rate-matrix estimation from transition matrices.

Reference: ``rate_matrix`` (/root/reference/src/deeptime/markov/tools/
estimation/api.py:1239-1338, dense impl estimation/dense/ratematrix.py):
methods 'pseudo' (pseudo-generator) and 'truncated_log' (truncated matrix
logarithm, Davies 2010) are implemented here; the KL/CVE likelihood
optimizers are scipy-dependent and out of scope (documented — this
environment has no scipy, and both reduce to small dense optimizations a
user can run offline on the collected count matrix).

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
        raise NotImplementedError(
            f"method {method!r} not available (KL/CVE optimizers require scipy; "
            f"use 'pseudo' or 'truncated_log')"
        )
    return _fix_generator(K)


def expm(K: np.ndarray, t: float = 1.0) -> np.ndarray:
    """Matrix exponential via eigendecomposition (diagonalizable K)."""
    vals, vecs = np.linalg.eig(np.asarray(K, dtype=np.float64) * t)
    out = vecs @ np.diag(np.exp(vals)) @ np.linalg.inv(vecs)
    return out.real
