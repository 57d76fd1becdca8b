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


def simplified_silhouette_df(
    df,
    centers: np.ndarray,
    features_col: str = "x",
    id_col: str = "vec_id",
):
    """Simplified silhouette per point (Hruschka et al. 2004; the
    sklearn "silhouette with centroids" variant): ``a`` is the distance
    to the own centroid, ``b`` the minimum distance to any other
    centroid, ``s = (b - a) / max(a, b)`` — O(n·k), the scalable form
    of the O(n²) silhouette, computable in one broadcast pass.

    Returns (id, cluster, s_ppm) with ``s_ppm = round(s * 1e6)`` as a
    LONG: per-row fp math over the batch-shape-invariant distance
    kernel is deterministic, and the integer scaling makes downstream
    aggregation exact across engines. Arrow-batched pandas UDF with the
    centers broadcast as a closure constant, same shape as
    ClusterModel.transform.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    C = np.asarray(centers, dtype=np.float64)
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("cluster", LongType()),
            StructField("s_ppm", LongType()),
        ]
    )

    def work(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(pdf[features_col].tolist(), dtype=np.float64)
            D = _euclidean_batch_invariant(X, C)
            own = np.argmin(D, axis=1)
            a = D[np.arange(len(X)), own]
            Dm = D.copy()
            Dm[np.arange(len(X)), own] = np.inf
            b = Dm.min(axis=1)
            denom = np.maximum(a, b)
            s = np.where(denom > 0, (b - a) / np.where(denom > 0, denom, 1.0), 0.0)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "cluster": own.astype(np.int64),
                    "s_ppm": np.round(s * 1e6).astype(np.int64),
                }
            )

    return df.select(id_col, features_col).mapInPandas(work, schema=schema)
