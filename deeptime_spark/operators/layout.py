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


def pin_width_for_cpu_dense(
    df: DataFrame,
    *key_cols: str,
    target: int | None = None,
    max_bytes: int = 1 << 30,
    size_probe: DataFrame | None = None,
) -> DataFrame:
    """Pin a CPU-dense stage's exchange at cluster width when its input
    is SMALL in bytes.

    ``spread_for_map_parallelism`` guards the static scan layout, but an
    exchange that plans at full width can still be coalesced by AQE at
    runtime when its shuffle BYTES are small — and for stages whose rows
    are expensive (per-row Newton solves, levenshtein fan-out, grouped
    Arrow kernels) that strands the work on 1-3 tasks while the cluster
    idles. This inserts a USER-pinned keyed repartition (which AQE must
    respect) iff Catalyst's size estimate for ``df`` is under
    ``max_bytes`` — i.e. exactly when the data is small enough that AQE
    would coalesce AND the shuffle itself is cheap. Above ``max_bytes``
    (any real at-scale input) it is a NO-OP and the natural exchange
    stands. Downstream groupBy/window/applyInPandas keyed the same way
    reuse the pinned exchange, so the pass count never changes.

    ``size_probe``: gate the decision on ANOTHER frame's estimate
    instead of ``df``'s own. Catalyst's estimate for a post-explode /
    post-join pair relation is fan-out-inflated (it can exceed
    ``max_bytes`` by orders of magnitude on kilobytes of real data, so
    the pin silently never fires); gating on the SCAN-rooted relation
    the pairs were derived from (whose estimate comes from parquet
    stats) keeps the regime decision accurate at both ends of the
    scale."""
    spark = df.sparkSession
    if target is None:
        target = spark.sparkContext.defaultParallelism
    if target <= 1:
        return df
    est = estimated_size_bytes(size_probe if size_probe is not None else df)
    if est is None or est > max_bytes:
        return df
    if key_cols:
        return df.repartition(target, *[F.col(c) for c in key_cols])
    return df.repartition(target)


def zorder_key(
    bucket_cols: "list",
    bits: int = 16,
):
    """Morton (Z-order) interleave of pre-bucketized integer columns —
    the multi-dimensional clustering key behind ZORDER BY in lakehouse
    table formats (public Delta Lake OPTIMIZE ZORDER semantics): rows
    close in every bucketized dimension land close in the 1-D key, so
    range-partitioning + min/max footer stats prune scans on ANY keyed
    column, not just the leading one.

    ``bucket_cols`` are Column expressions already in ``[0, 2**bits)``
    (see :func:`zorder_bucket`). The key places bit ``b`` of column
    ``c`` at position ``b * n_cols + c`` — pure integer shifts/ors,
    whole-stage codegen, byte-identical in any engine.
    """
    from pyspark.sql import functions as F

    n = len(bucket_cols)
    if not 1 <= n * bits <= 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed 64-bit key")
    key = F.lit(0).cast("long")
    for c_idx, col in enumerate(bucket_cols):
        v = col.cast("long")
        for b in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(v, b).bitwiseAND(F.lit(1)), b * n + c_idx
                )
            )
    return key


def zorder_bucket(col, lo: int, hi: int, bits: int = 16):
    """Power-of-two bucketization of an integer column onto
    ``[0, 2**bits)`` with ONLY subtraction and a right shift: values
    are clamped to ``[lo, hi]`` and mapped by ``(v - lo) >> s`` where
    ``s`` is the smallest shift that fits the span into ``bits`` bits.
    No multiplication or division — overflow-free for the full int64
    range and byte-identical in any engine (a deliberate contrast to
    fp-scaled bucketing, whose rounding is engine-dependent).
    ``lo``/``hi`` come from one driver-side min/max agg over the frame
    — the only non-expression step."""
    from pyspark.sql import functions as F

    span = max(int(hi) - int(lo), 0)
    s = max(0, span.bit_length() - bits)
    v = F.greatest(F.least(col.cast("long"), F.lit(int(hi))), F.lit(int(lo)))
    return F.shiftright(v - F.lit(int(lo)), s)


def zorder_repartition(
    df: DataFrame,
    cols: "list[str]",
    n_partitions: int | None = None,
    bits: int = 16,
) -> DataFrame:
    """Cluster ``df`` for multi-column scan pruning: bucketize each key
    column by its global [min, max] (ONE tiny agg action), compute the
    Morton key, range-partition on it and sort within partitions — the
    write-side layout pass a 100 TB table runs so that parquet
    row-group min/max stats prune selective filters on EVERY key
    column. Returns the clustered frame with a ``_zkey`` column
    (drop it before writing if undesired).
    """
    from pyspark.sql import functions as F

    spark = df.sparkSession
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("long")).alias(f"_lo_{c}"),
                 F.max(F.col(c).cast("long")).alias(f"_hi_{c}")]
    g = df.agg(*aggs).first()
    buckets = [
        zorder_bucket(F.col(c), g[f"_lo_{c}"] or 0, g[f"_hi_{c}"] or 0, bits)
        for c in cols
    ]
    keyed = df.withColumn("_zkey", zorder_key(buckets, bits))
    n_part = n_partitions or spark.sparkContext.defaultParallelism
    return keyed.repartitionByRange(n_part, "_zkey").sortWithinPartitions("_zkey")
