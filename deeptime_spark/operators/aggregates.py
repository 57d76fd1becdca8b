"""Numeric aggregates: distributed log-space summation.

Reference: ``logsumexp``/``logsumexp_pair``/``kdot``/``ksum``
(/root/reference/src/deeptime/numeric/__init__.py:38-39, C++ Kahan
kahan_summation.h). Spark's fp64 tree-reduced ``sum`` already covers the
compensated-summation use cases (SURVEY §4.1); what the JVM lacks is a
log-space sum — needed by TRAM-scale free-energy accumulations. The
grouped form is the classic max-shift formulation (per-group max, then
shifted exponential sum — both map-side partial aggregations in one
plan); the global scalar uses per-partition shifted partials combined on
the driver, so it costs a single action."""

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
    """Global log-space sum (driver scalar) in ONE action.

    Per-partition max-shifted partials (a window partitioned by
    ``spark_partition_id`` — no cross-partition shuffle of the values)
    combine on the driver with a second max-shift over the tiny
    (n_partitions)-row result. Same overflow safety as the classic
    two-pass global-shift formulation, half the job count — relevant
    when this lands inside an iteration loop (TRAM-style)."""
    import math

    from pyspark.sql import Window

    w = Window.partitionBy("_p")
    parts = (
        df.where(F.col(value_col).isNotNull())
        .select(F.spark_partition_id().alias("_p"), F.col(value_col).alias("_v"))
        .withColumn("_m", F.max("_v").over(w))
        .groupBy("_p")
        .agg(
            F.max("_m").alias("m"),
            F.sum(F.exp(F.col("_v") - F.col("_m"))).alias("s"),
        )
        .collect()
    )
    # SQL max() skips nulls, but an ALL-null partition yields m = NULL and
    # an empty input yields zero partition rows — match the classic
    # global-shift formulation: logsumexp of nothing is -inf
    parts = [r for r in parts if r["m"] is not None]
    if not parts:
        return float("-inf")
    gm = max(float(r["m"]) for r in parts)
    total = sum(float(r["s"]) * math.exp(float(r["m"]) - gm) for r in parts)
    return gm + math.log(total)
