"""PCCA+ — fuzzy metastable coarse-graining.

Reference: markov/_pcca.py:9-69 and the dense algorithm
markov/tools/analysis/dense/_pcca.py (584 LoC). Implemented here from the
published inner-simplex/fill algorithm (Deuflhard & Weber, "Robust Perron
cluster analysis in conformation dynamics", LAA 398 (2005)): select the m
most spread rows of the dominant eigenvector matrix as simplex vertices,
map to barycentric coordinates, clip and renormalize. Driver-side (n x n).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from deeptime_spark.base import Model
from deeptime_spark.markov import analysis


class PCCAModel(Model):
    """Memberships + coarse-grained quantities (reference markov/_pcca.py:71-140)."""

    def __init__(self, transition_matrix_coarse, pi_coarse, memberships, metastable_distributions):
        self.transition_matrix_coarse = transition_matrix_coarse
        self.coarse_stationary_distribution = pi_coarse
        self.memberships = memberships
        self.metastable_distributions = metastable_distributions

    @property
    def n_metastable(self) -> int:
        return self.memberships.shape[1]

    @property
    def assignments(self) -> np.ndarray:
        """Crisp assignment = argmax membership (reference _pcca.py:120-140)."""
        return np.argmax(self.memberships, axis=1)

    def sets(self) -> list[np.ndarray]:
        a = self.assignments
        return [np.where(a == i)[0] for i in range(self.n_metastable)]


def _inner_simplex_vertices(X: np.ndarray, m: int) -> np.ndarray:
    """Pick m rows of X spanning the largest simplex (spread pivoting)."""
    n = X.shape[0]
    vertices = np.zeros(m, dtype=int)
    # first vertex: farthest from the centroid
    c = X.mean(axis=0)
    vertices[0] = int(np.argmax(np.linalg.norm(X - c, axis=1)))
    Y = X - X[vertices[0]]
    for k in range(1, m):
        # next vertex: farthest from the affine span of chosen vertices
        Q, _ = np.linalg.qr(Y[vertices[:k]].T, mode="reduced")
        resid = Y - Y @ Q @ Q.T
        vertices[k] = int(np.argmax(np.linalg.norm(resid, axis=1)))
    return vertices


def pcca(T: np.ndarray, m: int, pi: Optional[np.ndarray] = None) -> PCCAModel:
    """PCCA+ with m metastable sets (reference markov/_pcca.py:9-69)."""
    T = np.asarray(T, dtype=np.float64)
    n = T.shape[0]
    if not 1 < m <= n:
        raise ValueError(f"need 1 < m <= n_states, got m={m}, n={n}")
    if pi is None:
        pi = analysis.stationary_distribution(T)
    # dominant right eigenvectors of the reversible symmetrization
    vals, L, R = analysis._rdl_reversible(T, pi)
    X = R[:, :m].copy()
    # normalize first column to 1 (Perron vector)
    X[:, 0] = 1.0
    verts = _inner_simplex_vertices(X, m)
    A = np.linalg.inv(X[verts])
    chi = X @ A
    # clip tiny negatives from the linear map, renormalize rows
    chi = np.clip(chi, 0.0, None)
    rowsum = chi.sum(axis=1, keepdims=True)
    rowsum[rowsum == 0.0] = 1.0
    chi = chi / rowsum
    # coarse-grained stationary distribution and transition matrix:
    # pi_c = M^T pi;  T_c = (M^T diag(pi) M)^{-1} M^T diag(pi) T M
    pi_c = chi.T @ pi
    W = chi.T @ (pi[:, None] * chi)
    T_c = np.linalg.solve(W, chi.T @ (pi[:, None] * (T @ chi)))
    # metastable output distributions: P(state | metastable set)
    dist = (chi * pi[:, None]).T
    dist = dist / dist.sum(axis=1, keepdims=True)
    return PCCAModel(T_c, pi_c, chi, dist)
