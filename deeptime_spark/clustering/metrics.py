"""Pluggable clustering metrics.

Reference: ``MetricRegistry`` (/root/reference/src/deeptime/clustering/
_metric.py:6, C API metric.h / register_clustering.h). The reference lets
users register C implementations; here a metric is a vectorized numpy
``pairwise(X, C) -> (n, k)`` distance function executed inside the
Arrow-batched assignment UDF — same per-batch BLAS shape, Python-level
plugins instead of C plugins (documented deviation; arbitrary user C
extensions are out of scope)."""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

PairwiseMetric = Callable[[np.ndarray, np.ndarray], np.ndarray]


def _euclidean_sq(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    return (
        np.einsum("ij,ij->i", X, X)[:, None]
        - 2.0 * (X @ C.T)
        + np.einsum("ij,ij->i", C, C)[None, :]
    )


def _euclidean(X, C):
    return np.sqrt(np.clip(_euclidean_sq(X, C), 0.0, None))


def _manhattan(X, C):
    return np.abs(X[:, None, :] - C[None, :, :]).sum(axis=-1)


def _chebyshev(X, C):
    return np.abs(X[:, None, :] - C[None, :, :]).max(axis=-1)


def _cosine(X, C):
    xn = np.linalg.norm(X, axis=1, keepdims=True)
    cn = np.linalg.norm(C, axis=1, keepdims=True)
    sim = (X @ C.T) / np.clip(xn * cn.T, 1e-300, None)
    return 1.0 - sim


def _euclidean_batch_invariant(X, C):
    """Euclidean distance with a per-(row,center) sequential reduction.

    ``_euclidean_sq``'s ``X @ C.T`` goes through BLAS, whose blocking (and
    therefore fp rounding) depends on the batch shape — two different
    partitionings of the same data can disagree by an ulp and flip an
    argmin near a tie. This kernel contracts the feature axis with a
    plain einsum loop whose summation order depends only on ``d``, so the
    distance of a given (row, center) pair is bit-identical no matter how
    rows are batched. Used by DeterministicKMeans for reproducible
    assignment; O(n*k*d) without gemm, so reserve it for when
    bit-reproducibility matters."""
    diff = X[:, None, :].astype(np.float64) - C[None, :, :].astype(np.float64)
    return np.sqrt(np.einsum("nkd,nkd->nk", diff, diff))


def minkowski(p: float) -> PairwiseMetric:
    def fn(X, C):
        return np.power(
            np.power(np.abs(X[:, None, :] - C[None, :, :]), p).sum(axis=-1), 1.0 / p
        )

    return fn


class MetricRegistry:
    """Name -> pairwise distance; mirrors the reference registry surface
    (register / lookup by name)."""

    def __init__(self):
        self._metrics: Dict[str, PairwiseMetric] = {}
        self.register("euclidean", _euclidean)
        self.register("manhattan", _manhattan)
        self.register("chebyshev", _chebyshev)
        self.register("cosine", _cosine)
        self.register("euclidean-deterministic", _euclidean_batch_invariant)

    def register(self, name: str, pairwise: PairwiseMetric) -> None:
        self._metrics[name] = pairwise

    def __getitem__(self, name: str) -> PairwiseMetric:
        if name not in self._metrics:
            raise ValueError(f"unknown metric {name!r}; available: {sorted(self._metrics)}")
        return self._metrics[name]

    def __contains__(self, name: str) -> bool:
        return name in self._metrics

    @property
    def available(self):
        return sorted(self._metrics)


metrics = MetricRegistry()
