"""Numeric aggregates: distributed log-space summation.

Reference: ``logsumexp``/``logsumexp_pair``/``kdot``/``ksum``
(/root/reference/src/deeptime/numeric/__init__.py:38-39, C++ Kahan
kahan_summation.h). Spark's fp64 tree-reduced ``sum`` already covers the
compensated-summation use cases (SURVEY §4.1); what the JVM lacks is a
log-space sum — needed by TRAM-scale free-energy accumulations — which is
the classic two-pass max-shift formulation here: one aggregate for the
per-group max, one for the shifted exponential sum. Both passes are
map-side partial aggregations."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_logsumexp(
    df: DataFrame, value_col: str, group_cols: Sequence[str], out_col: str = "logsumexp"
) -> DataFrame:
    """ln sum exp(value) per group, numerically shifted by the group max."""
    group_cols = list(group_cols)
    m = df.groupBy(*group_cols).agg(F.max(value_col).alias("_m"))
    joined = df.join(m, group_cols)
    return joined.groupBy(*group_cols).agg(
        (F.max("_m") + F.log(F.sum(F.exp(F.col(value_col) - F.col("_m"))))).alias(out_col)
    )


def logsumexp(df: DataFrame, value_col: str) -> float:
    """Global log-space sum (driver scalar)."""
    m = df.agg(F.max(value_col).alias("m")).first()["m"]
    row = df.agg(F.sum(F.exp(F.col(value_col) - F.lit(float(m)))).alias("s")).first()
    import math

    return float(m) + math.log(row["s"])
