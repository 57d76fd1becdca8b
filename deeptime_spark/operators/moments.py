"""Single-pass weighted moment accumulation (the engine's aggregation core).

Reference semantics: ``moments_XX`` / ``moments_XXXY``
(/root/reference/src/deeptime/covariance/util/_moments.py:594-833) compute
``(w, sx, sy, Mxx, Mxy, Myy)`` in one pass; chunk results are merged pairwise
with the Chan/Golub/LeVeque rule (``Moments.combine``,
covariance/util/_running_moments.py:37-59).

Spark realization — two physical strategies behind one logical op:

1. **Expression path** (d <= EXPR_MAX_DIM): flatten the feature array into
   columns and emit ``sum(w*x_i*x_j)`` expressions. Everything stays inside
   whole-stage codegen with map-side partial aggregation; the shuffle moves
   exactly one row of O(d^2) floats per partition. This is the plan you want
   at 100 TB: a single scan, no Python, no skew (global agg).

2. **Arrow path** (large d): ``mapInPandas`` accumulates the per-partition
   outer-product partials in numpy (BLAS ``X.T @ X`` per batch — same
   algebra the reference's C++ uses), yielding one flattened row per
   partition; the driver sums the ~num_partitions partial rows. Raw-moment
   sums commute, so merge order is irrelevant (the Chan mean-free form is
   only needed for streaming mean-removed accumulation; at fp64 with
   tree-style partial sums raw moments are numerically adequate, matching
   the reference's own fp64 policy in _moments.py:1-13).

Both strategies return identical ``MomentsResult`` sufficient statistics;
mean removal, Bessel correction (_running_moments.py:69-83) and
symmetrization (covariance/_covariance.py:517-519) are O(d^2) driver-side
finalizers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

EXPR_MAX_DIM = 24  # above this, d^2 codegen expressions stop paying off


@dataclass
class MomentsResult:
    """Sufficient statistics of one pass: weights, first and second raw moments."""

    weight_sum: float
    sx: np.ndarray  # (d,)  sum w*x
    mxx: np.ndarray  # (d, d) sum w*x x^T
    sy: Optional[np.ndarray] = None  # (d,)  sum w*y   (lagged leg)
    mxy: Optional[np.ndarray] = None  # (d, d) sum w*x y^T
    myy: Optional[np.ndarray] = None  # (d, d) sum w*y y^T

    @property
    def mean_x(self) -> np.ndarray:
        return self.sx / self.weight_sum

    @property
    def mean_y(self) -> Optional[np.ndarray]:
        return None if self.sy is None else self.sy / self.weight_sum

    def combine(self, other: "MomentsResult") -> "MomentsResult":
        """Merge two accumulators (raw moments are additive — this is the
        commutative-monoid property treeAggregate relies on; the reference's
        Chan combine (_running_moments.py:37-59) is the mean-free variant of
        the same merge)."""

        def add(a, b):
            if a is None and b is None:
                return None
            return a + b

        return MomentsResult(
            weight_sum=self.weight_sum + other.weight_sum,
            sx=self.sx + other.sx,
            mxx=self.mxx + other.mxx,
            sy=add(self.sy, other.sy),
            mxy=add(self.mxy, other.mxy),
            myy=add(self.myy, other.myy),
        )

    def covariances(
        self,
        remove_mean: bool = True,
        bessels_correction: bool = True,
        symmetrize: bool = False,
    ):
        """Finalize to (c00, c0t, ctt, mean_x, mean_y).

        Mean removal converts raw to central moments:
        ``C = (M - w * mean_x mean_y^T) / denom`` with denom = w-1 (Bessel,
        _running_moments.py:69-83) or w. ``symmetrize`` implements the
        reversible/symmetric estimate (covariance/_covariance.py:517-519):
        means of both legs are pooled and C0t is averaged with its transpose.
        """
        w = self.weight_sum
        denom = w - 1.0 if bessels_correction else w
        has_y = self.sy is not None

        if symmetrize and has_y:
            mean = 0.5 * (self.mean_x + self.mean_y)
            mean_x = mean_y = mean
            mxx = 0.5 * (self.mxx + self.myy)
            mxy = 0.5 * (self.mxy + self.mxy.T)
            myy = mxx
        else:
            mean_x = self.mean_x
            mean_y = self.mean_y
            mxx, mxy, myy = self.mxx, self.mxy, self.myy

        def central(m, mu_a, mu_b):
            if m is None:
                return None
            if remove_mean:
                m = m - w * np.outer(mu_a, mu_b)
            return m / denom

        c00 = central(mxx, mean_x, mean_x)
        c0t = central(mxy, mean_x, mean_y) if has_y else None
        ctt = central(myy, mean_y, mean_y) if has_y else None
        return c00, c0t, ctt, mean_x, (mean_y if has_y else None)


def feature_dim(df: DataFrame, col: str = "x") -> int:
    """Probe the array width from one row (tiny limit-1 job)."""
    row = df.select(F.size(F.col(col)).alias("d")).first()
    if row is None:
        raise ValueError("empty DataFrame")
    return int(row["d"])


def compute_moments(
    df: DataFrame,
    x_col: str = "x",
    y_col: Optional[str] = None,
    weight_col: Optional[str] = None,
    d: Optional[int] = None,
    d_y: Optional[int] = None,
    compute_xx: bool = True,
    compute_yy: bool = True,
    force_arrow: bool = False,
) -> MomentsResult:
    """One Spark job -> MomentsResult. Strategy chosen by feature dim.

    ``d_y`` allows a rectangular cross moment (x and y of different widths,
    e.g. SINDy's Theta'Xdot); it defaults to ``d``.
    """
    if d is None:
        d = feature_dim(df, x_col)
    if d_y is None:
        d_y = feature_dim(df, y_col) if y_col else d
    if not force_arrow and max(d, d_y) <= EXPR_MAX_DIM:
        return _moments_expr(df, x_col, y_col, weight_col, d, d_y, compute_xx, compute_yy)
    return _moments_arrow(df, x_col, y_col, weight_col, d, d_y, compute_xx, compute_yy)


def _moments_expr(df, x_col, y_col, weight_col, d, d_y, compute_xx, compute_yy) -> MomentsResult:
    """Codegen path: one global agg of sum-of-product expressions."""
    x = [F.col(x_col)[i] for i in range(d)]
    y = [F.col(y_col)[i] for i in range(d_y)] if y_col else None
    w = F.col(weight_col) if weight_col else F.lit(1.0)

    aggs = [F.sum(w).alias("w")]
    aggs += [F.sum(w * x[i]).alias(f"sx_{i}") for i in range(d)]
    if y is not None:
        aggs += [F.sum(w * y[i]).alias(f"sy_{i}") for i in range(d_y)]
    if compute_xx:
        # symmetric: only upper triangle crosses the shuffle
        aggs += [
            F.sum(w * x[i] * x[j]).alias(f"mxx_{i}_{j}") for i in range(d) for j in range(i, d)
        ]
    if y is not None:
        aggs += [F.sum(w * x[i] * y[j]).alias(f"mxy_{i}_{j}") for i in range(d) for j in range(d_y)]
        if compute_yy:
            aggs += [
                F.sum(w * y[i] * y[j]).alias(f"myy_{i}_{j}") for i in range(d_y) for j in range(i, d_y)
            ]
    row = df.agg(*aggs).first().asDict()

    def sym(prefix, n):
        m = np.zeros((n, n))
        for i in range(n):
            for j in range(i, n):
                m[i, j] = m[j, i] = row[f"{prefix}_{i}_{j}"]
        return m

    sx = np.array([row[f"sx_{i}"] for i in range(d)])
    res = MomentsResult(
        weight_sum=float(row["w"]),
        sx=sx,
        mxx=sym("mxx", d) if compute_xx else np.zeros((d, d)),
    )
    if y is not None:
        res.sy = np.array([row[f"sy_{i}"] for i in range(d_y)])
        mxy = np.zeros((d, d_y))
        for i in range(d):
            for j in range(d_y):
                mxy[i, j] = row[f"mxy_{i}_{j}"]
        res.mxy = mxy
        res.myy = sym("myy", d_y) if compute_yy else None
    return res


def _moments_arrow(df, x_col, y_col, weight_col, d, d_y, compute_xx, compute_yy) -> MomentsResult:
    """Arrow path: per-partition BLAS partials, driver-side merge.

    Emits ONE row per partition (a few thousand rows even on a 1000-executor
    cluster), each O(d^2) — the classic treeAggregate shape.
    """
    has_y = y_col is not None
    cols = [x_col] + ([y_col] if has_y else []) + ([weight_col] if weight_col else [])
    narrow = df.select(*cols)

    out_schema = StructType(
        [
            StructField("w", DoubleType()),
            StructField("sx", ArrayType(DoubleType())),
            StructField("sy", ArrayType(DoubleType())),
            StructField("mxx", ArrayType(DoubleType())),
            StructField("mxy", ArrayType(DoubleType())),
            StructField("myy", ArrayType(DoubleType())),
        ]
    )

    def acc(batches: Iterator) -> Iterator:
        import pandas as pd

        w_sum = 0.0
        sx = np.zeros(d)
        sy = np.zeros(d_y)
        mxx = np.zeros((d, d))
        mxy = np.zeros((d, d_y))
        myy = np.zeros((d_y, d_y))
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            seen = True
            X = np.stack(pdf[x_col].to_numpy())
            wv = pdf[weight_col].to_numpy() if weight_col else None
            if wv is None:
                w_sum += len(X)
                Xw = X
            else:
                w_sum += float(wv.sum())
                Xw = X * wv[:, None]
            sx += Xw.sum(axis=0)
            if compute_xx:
                mxx += Xw.T @ X
            if has_y:
                Y = np.stack(pdf[y_col].to_numpy())
                Yw = Y if wv is None else Y * wv[:, None]
                sy += Yw.sum(axis=0)
                mxy += Xw.T @ Y
                if compute_yy:
                    myy += Yw.T @ Y
        if seen:
            yield pd.DataFrame(
                {
                    "w": [w_sum],
                    "sx": [sx.tolist()],
                    "sy": [sy.tolist()],
                    "mxx": [mxx.ravel().tolist()],
                    "mxy": [mxy.ravel().tolist()],
                    "myy": [myy.ravel().tolist()],
                }
            )

    partials = narrow.mapInPandas(acc, schema=out_schema).collect()
    if not partials:
        raise ValueError("empty DataFrame")
    res = MomentsResult(weight_sum=0.0, sx=np.zeros(d), mxx=np.zeros((d, d)))
    if has_y:
        res.sy = np.zeros(d_y)
        res.mxy = np.zeros((d, d_y))
        res.myy = np.zeros((d_y, d_y)) if compute_yy else None
    for p in partials:
        res.weight_sum += p["w"]
        res.sx += np.array(p["sx"])
        res.mxx += np.array(p["mxx"]).reshape(d, d)
        if has_y:
            res.sy += np.array(p["sy"])
            res.mxy += np.array(p["mxy"]).reshape(d, d_y)
            if compute_yy:
                res.myy += np.array(p["myy"]).reshape(d_y, d_y)
    return res
