"""Driver-side regularized symmetric eigen utilities.

API parity with /root/reference/src/deeptime/numeric/_eigen.py
(spd_eig:82, spd_inv:157, spd_inv_sqrt:196, spd_inv_split:240, eig_corr:316,
sort_eigs:13). These operate on small (d x d) matrices collected from Spark
aggregates — exactly where the reference calls LAPACK. Implemented from the
standard linear-algebra definitions (rank-truncated symmetric
eigendecomposition), not copied.
"""

from __future__ import annotations

import numpy as np


def sort_eigs(eigenvalues: np.ndarray, eigenvectors: np.ndarray):
    """Sort eigenpairs by descending |eigenvalue| (reference: _eigen.py:13)."""
    order = np.argsort(-np.abs(eigenvalues))
    return eigenvalues[order], eigenvectors[:, order]


def _symmetrize(M: np.ndarray) -> np.ndarray:
    return 0.5 * (M + M.T)


def spd_eig(M: np.ndarray, epsilon: float = 1e-10, canonical_signs: bool = False):
    """Eigendecomposition of a symmetric PSD matrix with epsilon-rank
    truncation: keep eigenpairs with lambda > epsilon * lambda_max
    (reference: _eigen.py:82-155). Returns (s, V) with s descending."""
    s, V = np.linalg.eigh(_symmetrize(M))
    order = np.argsort(-s)
    s, V = s[order], V[:, order]
    if len(s) == 0 or s[0] <= 0:
        raise ValueError("matrix is not positive semi-definite")
    cutoff = max(epsilon * abs(s[0]), 0.0)
    keep = s > cutoff
    s, V = s[keep], V[:, keep]
    if canonical_signs:
        # largest-|.| component of each vector made positive
        for j in range(V.shape[1]):
            i = int(np.argmax(np.abs(V[:, j])))
            if V[i, j] < 0:
                V[:, j] = -V[:, j]
    return s, V


def spd_inv(M: np.ndarray, epsilon: float = 1e-10) -> np.ndarray:
    """Regularized inverse via truncated eigendecomposition (_eigen.py:157)."""
    s, V = spd_eig(M, epsilon)
    return V @ np.diag(1.0 / s) @ V.T


def spd_inv_sqrt(M: np.ndarray, epsilon: float = 1e-10, return_rank: bool = False):
    """M^{-1/2} on the retained rank (_eigen.py:196)."""
    s, V = spd_eig(M, epsilon)
    W = V @ np.diag(s ** -0.5) @ V.T
    return (W, len(s)) if return_rank else W


def spd_inv_split(M: np.ndarray, epsilon: float = 1e-10, canonical_signs: bool = False) -> np.ndarray:
    """Split factor L with L L^T = M^{-1} (d x rank), i.e. V s^{-1/2}
    (_eigen.py:240). Used for half-weighted Koopman matrices."""
    s, V = spd_eig(M, epsilon, canonical_signs=canonical_signs)
    return V @ np.diag(s ** -0.5)


def eig_corr(C0: np.ndarray, Ct: np.ndarray, epsilon: float = 1e-10, canonical_signs: bool = True):
    """Generalized symmetric eigenproblem Ct r = C0 lambda r with rank
    deficiency handled by whitening (reference: _eigen.py:316-391).

    Solve in the whitened space: L = spd_inv_split(C0); eig of L^T Ct L;
    back-transform eigenvectors r = L u. Returns (eigenvalues desc,
    eigenvectors as columns), both real (Ct assumed symmetric, e.g. the
    reversible C0t estimate).
    """
    L = spd_inv_split(C0, epsilon=epsilon)
    Ct_white = _symmetrize(L.T @ Ct @ L)
    s, U = np.linalg.eigh(Ct_white)
    order = np.argsort(-s)
    s, U = s[order], U[:, order]
    R = L @ U
    if canonical_signs:
        for j in range(R.shape[1]):
            i = int(np.argmax(np.abs(R[:, j])))
            if R[i, j] < 0:
                R[:, j] = -R[:, j]
    return s, R
