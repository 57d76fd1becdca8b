"""Voronoi assignment model shared by all clustering estimators.

Reference: ``ClusterModel`` (/root/reference/src/deeptime/clustering/
_cluster_model.py:8-130): nearest-center assignment under a metric.

Spark realization: centers are broadcast (they are O(k*d) floats); the
assignment is an Arrow-vectorized pandas UDF doing one numpy cdist-argmin
per batch — the distributed analogue of the reference's OpenMP
frame-parallel loop (kmeans_bits.h:67). No shuffle: assignment is a map.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from deeptime_spark.base import Model, Transformer


def _pairwise_sq_dists(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """||x - c||^2 via the expansion trick (no scipy in env)."""
    return (
        np.einsum("ij,ij->i", X, X)[:, None]
        - 2.0 * (X @ C.T)
        + np.einsum("ij,ij->i", C, C)[None, :]
    )


class ClusterModel(Model, Transformer):
    """Cluster centers + metric; ``transform`` adds a ``state`` column.

    ``metric`` is any name in the clustering MetricRegistry
    (metrics.py — euclidean/manhattan/chebyshev/cosine built in, numpy
    plugins registrable); the registry replaces the reference's C-plugin
    API (documented deviation)."""

    def __init__(self, cluster_centers: np.ndarray, metric: str = "euclidean", converged: bool = True):
        from deeptime_spark.clustering.metrics import metrics

        if metric not in metrics:
            raise ValueError(f"unsupported metric {metric!r}; available: {metrics.available}")
        self.cluster_centers = np.asarray(cluster_centers, dtype=np.float64)
        self.metric = metric
        self.converged = converged

    @property
    def n_clusters(self) -> int:
        return self.cluster_centers.shape[0]

    def transform(self, df: DataFrame, x_col: str = "x", out_col: str = "state") -> DataFrame:
        from deeptime_spark.clustering.metrics import metrics

        centers = self.cluster_centers
        if self.metric == "euclidean":
            pairwise = _pairwise_sq_dists  # argmin-equivalent, no sqrt
        else:
            pairwise = metrics[self.metric]

        @F.pandas_udf(IntegerType())
        def assign(xs: pd.Series) -> pd.Series:
            X = np.stack(xs.to_numpy())
            d = pairwise(X, centers)
            return pd.Series(np.argmin(d, axis=1).astype(np.int32))

        return df.withColumn(out_col, assign(F.col(x_col)))

    def transform_onehot(self, df: DataFrame, x_col: str = "x", out_col: str = "onehot") -> DataFrame:
        """One-hot membership array (reference _box.py transform_onehot)."""
        k = self.n_clusters
        assigned = self.transform(df, x_col=x_col, out_col="_state")
        onehot = F.array(*[(F.col("_state") == i).cast("double") for i in range(k)])
        return assigned.withColumn(out_col, onehot).drop("_state")
