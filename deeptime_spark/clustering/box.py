"""Uniform n-d grid discretization — pure column math.

Reference: ``BoxDiscretization``
(/root/reference/src/deeptime/clustering/_box.py:51-121, model :9-49):
per-dimension uniform bins over [v0, v1], state = row-major raveled index,
centers = bin midpoints. Everything here is Catalyst expressions (floor /
clip / ravel) — whole-stage codegen, zero Python, zero shuffle.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deeptime_spark.base import Estimator
from deeptime_spark.clustering.cluster_model import ClusterModel


class BoxDiscretizationModel(ClusterModel):
    """Grid model; transform uses closed-form binning, not nearest-center
    search (equivalent result, O(d) instead of O(k*d))."""

    def __init__(self, dim: int, n_boxes: Sequence[int], v0: np.ndarray, v1: np.ndarray):
        self.dim = dim
        self.n_boxes = list(n_boxes)
        self.v0 = np.asarray(v0, dtype=np.float64)
        self.v1 = np.asarray(v1, dtype=np.float64)
        # centers: row-major meshgrid midpoints (reference _box.py:20-35)
        edges = [np.linspace(self.v0[i], self.v1[i], self.n_boxes[i] + 1) for i in range(dim)]
        mids = [0.5 * (e[:-1] + e[1:]) for e in edges]
        grids = np.meshgrid(*mids, indexing="ij")
        centers = np.stack([g.ravel() for g in grids], axis=1)
        super().__init__(centers)

    def transform(self, df: DataFrame, x_col: str = "x", out_col: str = "state") -> DataFrame:
        """state = ravel(clip(floor((x - v0)/width)))  — column expressions."""
        expr = F.lit(0).cast("int")
        for i in range(self.dim):
            width = (self.v1[i] - self.v0[i]) / self.n_boxes[i]
            idx = F.floor((F.col(x_col)[i] - F.lit(float(self.v0[i]))) / F.lit(float(width)))
            idx = F.greatest(F.lit(0), F.least(F.lit(self.n_boxes[i] - 1), idx)).cast("int")
            expr = expr * F.lit(self.n_boxes[i]) + idx
        return df.withColumn(out_col, expr)


class BoxDiscretization(Estimator):
    """ctor mirrors reference (:51-80): dim, n_boxes (int or per-dim list),
    optional v0/v1 (estimated from data min/max in one agg when absent)."""

    def __init__(
        self,
        dim: int,
        n_boxes: int | Sequence[int],
        v0: Optional[Sequence[float]] = None,
        v1: Optional[Sequence[float]] = None,
        x_col: str = "x",
    ):
        super().__init__()
        self.dim = dim
        self.n_boxes = [n_boxes] * dim if np.isscalar(n_boxes) else list(n_boxes)
        if len(self.n_boxes) != dim:
            raise ValueError("n_boxes must be scalar or length-dim")
        self.v0 = v0
        self.v1 = v1
        self.x_col = x_col

    def fit(self, df: DataFrame) -> "BoxDiscretization":
        if self.v0 is None or self.v1 is None:
            aggs = []
            for i in range(self.dim):
                aggs += [
                    F.min(F.col(self.x_col)[i]).alias(f"lo_{i}"),
                    F.max(F.col(self.x_col)[i]).alias(f"hi_{i}"),
                ]
            row = df.agg(*aggs).first()
            v0 = np.array([row[f"lo_{i}"] for i in range(self.dim)])
            v1 = np.array([row[f"hi_{i}"] for i in range(self.dim)])
        else:
            v0, v1 = np.asarray(self.v0, float), np.asarray(self.v1, float)
        self._model = BoxDiscretizationModel(self.dim, self.n_boxes, v0, v1)
        return self
