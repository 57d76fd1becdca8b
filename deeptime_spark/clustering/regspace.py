"""Regular-space clustering — two-level leader algorithm.

Reference: ``RegularSpace``
(/root/reference/src/deeptime/clustering/_regspace.py:14-175): scan frames
in order, admit a frame as a new center if it is farther than dmin from all
existing centers, cap at max_centers. The scan is inherently sequential;
the *result contract* is only "a valid dmin-packing that covers the data"
(SURVEY.md §7.4 item 1), which a two-level leader pass preserves:

  level 1 (distributed): per-partition leader scan via mapInPandas — each
      partition emits its local centers (<= max_centers each);
  level 2 (driver): leader scan over the concatenated local centers.

Every point is within dmin of some local center (level 1), and every local
center is within dmin of some final center or is one (level 2), so every
point is within 2*dmin of a final center and all final centers are pairwise
> dmin apart — the packing invariant tests assert (exact center identity is
order-dependent even in the reference).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

from deeptime_spark.base import Estimator
from deeptime_spark.clustering.cluster_model import ClusterModel, _pairwise_sq_dists


def _leader_scan(X: np.ndarray, dmin: float, max_centers: int, centers: list) -> None:
    d2min = dmin * dmin
    for row in X:
        if len(centers) >= max_centers:
            break
        if not centers:
            centers.append(row.copy())
            continue
        C = np.asarray(centers)
        d2 = _pairwise_sq_dists(row[None, :], C)
        if float(d2.min()) > d2min:
            centers.append(row.copy())


class RegularSpace(Estimator):
    """ctor mirrors reference (:14-80): dmin, max_centers.

    ``exact=True`` reproduces the reference's strictly order-dependent
    center set by streaming frames through the driver in (traj_id, t)
    order — partition-at-a-time via toLocalIterator, never a full collect.
    Exact center identity is inherently sequential; use it when center
    reproducibility against the reference matters more than throughput.
    The default two-level mode is the distributed path (packing invariant
    preserved, centers order-dependent-but-different).
    """

    def __init__(self, dmin: float, max_centers: int = 500, x_col: str = "x", exact: bool = False):
        super().__init__()
        if dmin <= 0:
            raise ValueError("dmin must be positive")
        self.dmin = dmin
        self.max_centers = max_centers
        self.x_col = x_col
        self.exact = exact

    def _fit_exact(self, df: DataFrame) -> None:
        order = [c for c in ("traj_id", "t") if c in df.columns]
        src = df.orderBy(*order) if order else df
        centers: list = []
        for row in src.select(self.x_col).toLocalIterator(prefetchPartitions=True):
            if len(centers) >= self.max_centers:
                break
            _leader_scan(
                np.asarray(row[self.x_col], dtype=np.float64)[None, :],
                self.dmin,
                self.max_centers,
                centers,
            )
        if not centers:
            raise ValueError("no data")
        self._model = ClusterModel(np.asarray(centers), converged=True)

    def fit(self, df: DataFrame) -> "RegularSpace":
        import pandas as pd

        if self.exact:
            self._fit_exact(df)
            return self

        dmin, max_centers, x_col = self.dmin, self.max_centers, self.x_col
        schema = StructType([StructField("center", ArrayType(DoubleType()))])

        def local_leaders(batches):
            centers: list = []
            for pdf in batches:
                if len(pdf):
                    _leader_scan(np.stack(pdf[x_col].to_numpy()), dmin, max_centers, centers)
            if centers:
                yield pd.DataFrame({"center": [c.tolist() for c in centers]})

        local = df.select(x_col).mapInPandas(local_leaders, schema=schema).collect()
        final: list = []
        _leader_scan(np.array([r["center"] for r in local]), dmin, max_centers, final)
        if not final:
            raise ValueError("no data")
        self._model = ClusterModel(np.asarray(final), converged=True)
        return self
