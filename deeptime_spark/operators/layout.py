"""Scan-layout guard for CPU-heavy map stages.

Spark parallelizes a parquet scan by file split, and a split can't cross
a row-group boundary — so a table written as one file with one row group
scans as ONE task no matter how many cores the cluster has. Per-document
kernels whose cost lives in the map stage (shingle hashing, bit votes,
gram explosion, Arrow encodes) then serialize on a single core while the
rest of the cluster idles.

``spread_for_map_parallelism`` is the conditional fix: if the input
already has at least as many partitions as cores (the 100 TB regime —
thousands of row groups), it is a NO-OP and the plan is untouched. Only
when the scan yields fewer splits than cores — which by construction
means the input is small relative to the cluster — does it insert one
hash repartition on the operator's grouping key. Keyed (not round-robin)
so every downstream groupBy/window clustered by that key is satisfied by
the repartition and needs no further exchange: the shuffle doesn't add a
pass, it MOVES the operator's existing pass from after the heavy map
work (where it only balances the reduce) to before it (where it also
balances the map).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def estimated_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's optimized-plan size estimate (bytes), or None if the
    stats are unavailable. Plan metadata only — never runs a job."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None


def spread_for_map_parallelism(
    df: DataFrame,
    *key_cols: str,
    target: int | None = None,
    min_bytes_per_partition: int | None = None,
) -> DataFrame:
    """Repartition ``df`` by ``key_cols`` onto ``target`` partitions iff it
    currently has fewer partitions than ``target`` (default: the session's
    ``sparkContext.defaultParallelism``). See module docstring.

    ``min_bytes_per_partition`` caps the target so each partition carries
    at least that much estimated input — for kernels whose per-byte CPU
    cost is ordinary (BLAS over packed doubles), where slicing a tiny
    input across every core costs more in task scheduling than the map
    work saved. Leave unset for CPU-dense text kernels (gram explosion,
    n x hashing), where even kilobytes of input are worth a core."""
    spark = df.sparkSession
    if target is None:
        target = spark.sparkContext.defaultParallelism
    if min_bytes_per_partition:
        est = estimated_size_bytes(df)
        if est is not None:
            target = min(target, max(1, est // min_bytes_per_partition))
    if target <= 1:
        return df
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        # physical planning can fail for exotic logical plans (e.g. some
        # streaming sources); the guard is an optimization, never a gate
        return df
    if n >= target:
        return df
    if key_cols:
        return df.repartition(target, *[F.col(c) for c in key_cols])
    return df.repartition(target)
