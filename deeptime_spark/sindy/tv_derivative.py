"""Total-variation regularized derivatives for noisy series.

Reference: ``tv_derivative`` (/root/reference/src/deeptime/util/diff.py:
138-257; Chartrand, "Numerical differentiation of noisy, nonsmooth data",
ISRN Appl. Math. 2011): minimize
``alpha * TV(u) + 1/2 ||A u - (y - y_0)||^2`` over derivative values ``u``
on staggered midpoints, by lagged-diffusivity fixed point — each iteration
solves ``(alpha D^T E D + A^T A) s = -g`` with the TV diffusivity
``E = diag(1/sqrt((Du)^2 + eps))``.

Spark shape (SURVEY.md §2.10): one sequential numpy solve per series,
parallel across trajectories via grouped-map Arrow UDF
(``tv_derivative_df``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def _cumtrapz_matrix(xs: np.ndarray) -> np.ndarray:
    """(m-1, m) matrix form of the cumulative trapezoidal rule."""
    m = len(xs)
    A = np.zeros((m - 1, m))
    dx = np.diff(xs)
    for r in range(m - 1):
        A[r, 0] = dx[0] / 2
        if r > 0:
            A[r, 1 : r + 1] += (dx[:r] + dx[1 : r + 1]) / 2
        A[r, r + 1] = dx[r] / 2
    return A


def tv_derivative(
    xs: np.ndarray,
    ys: np.ndarray,
    u0: np.ndarray | None = None,
    alpha: float = 10.0,
    tol: float | None = None,
    maxit: int = 1000,
    epsilon: float = 1e-6,
) -> np.ndarray:
    """TV-regularized derivative of ``ys`` on grid ``xs`` (1-d)."""
    if alpha <= 0:
        raise ValueError("regularization parameter must be positive")
    ys = np.asarray(ys, dtype=np.float64).squeeze()
    xs = np.asarray(xs, dtype=np.float64).squeeze()
    n = len(ys)
    midpoints = np.concatenate(
        ([xs[0] - 0.5 * (xs[1] - xs[0])], 0.5 * (xs[1:] + xs[:-1]), [xs[-1] + 0.5 * (xs[-1] - xs[-2])])
    )
    # D: derivative-at-grid-node from midpoint values (n, n+1)
    dm = np.diff(midpoints)
    D = np.zeros((n, n + 1))
    for i in range(n):
        D[i, i] = -1.0 / dm[i]
        D[i, i + 1] = 1.0 / dm[i]
    A = _cumtrapz_matrix(midpoints)  # (n, n+1)
    ATA = A.T @ A
    if u0 is None:
        df = np.gradient(ys, xs, edge_order=2)
        u = np.concatenate(([0.0], 0.5 * (df[1:] + df[:-1]), [0.0]))
    else:
        u0 = np.asarray(u0, dtype=np.float64)
        u = u0 if len(u0) == n + 1 else np.concatenate(([0.0], 0.5 * (u0[1:] + u0[:-1]), [0.0]))
    Aadj_offset = A.T @ (ys[0] - ys)
    for _ in range(maxit):
        du = D @ u
        E = 1.0 / np.sqrt(du * du + epsilon)
        L = D.T @ (E[:, None] * D)
        g = ATA @ u + Aadj_offset + alpha * (L @ u)
        lhs = alpha * L + ATA
        s = np.linalg.solve(lhs, -g)
        u = u + s
        if tol is not None and np.linalg.norm(s) / max(np.linalg.norm(u), 1e-300) < tol:
            break
    return 0.5 * (u[1:] + u[:-1])


def tv_derivative_df(
    df: DataFrame,
    alpha: float = 10.0,
    maxit: int = 100,
    tol: float | None = 1e-6,
    value_col: str = "value",
    out_col: str = "dvalue_tv",
) -> DataFrame:
    """Per-trajectory TV derivative: grouped-map Arrow UDF, sequential
    per series, parallel across series."""
    schema = StructType(
        [
            StructField("traj_id", LongType()),
            StructField("t", LongType()),
            StructField(out_col, DoubleType()),
        ]
    )

    def per_traj(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t")
        ys = pdf[value_col].to_numpy(dtype=np.float64)
        xs = pdf["t"].to_numpy(dtype=np.float64)
        d = tv_derivative(xs, ys, alpha=alpha, maxit=maxit, tol=tol)
        return pd.DataFrame({"traj_id": pdf["traj_id"].to_numpy(), "t": pdf["t"].to_numpy(), out_col: d})

    # The grouped-map exchange is few bytes (3 narrow columns) but each
    # row costs maxit Newton solves downstream, so AQE coalesces it to
    # 1-3 partitions and the solver serializes (measured 3.2 s on 3 of
    # 32 cores at sf0.1). Pin the exchange at cluster width while the
    # input is small in bytes (no-op at scale); applyInPandas reuses
    # that clustering, so the pass count is unchanged.
    from deeptime_spark.operators.layout import pin_width_for_cpu_dense

    sel = pin_width_for_cpu_dense(
        df.select("traj_id", "t", value_col), "traj_id"
    )
    return sel.groupBy("traj_id").applyInPandas(per_traj, schema=schema)
