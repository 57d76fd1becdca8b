"""Mergeable sketches: HyperLogLog distinct counting and Bloom-filter
membership — the fixed-memory primitives a 100 TB corpus pipeline needs
when exact ``COUNT(DISTINCT)`` / exact probe-set semi-joins stop fitting.

Both sketches are **deterministic by construction** (every hash is Spark's
``xxhash64``, bit-exactly replicated in :mod:`deeptime_spark.spark_hashes`),
so results are layout-independent and oracle-checkable — unlike Spark's
built-in ``approx_count_distinct`` (HLL++ with opaque internal state) these
can be pinned value-for-value against an independent replica.

Spark shapes
------------
* **HLL**: one codegen ``xxhash64`` per value; register index = top ``p``
  bits (``shiftrightunsigned``), sub-hash = low ``64-p`` bits
  (``bitwiseAND``).  The per-register aggregate is ``min(w)`` — a plain
  codegen long ``min`` with map-side partial aggregation — because
  ``rho = W - bitlen(w) + 1`` is antitone in ``w``, so the expensive-ish
  bit-length (one ``conv``-to-binary per register) runs once per
  *register*, never per value.  Register relations merge by ``max(rho)``
  (set union of the underlying streams), which is what makes the sketch a
  distributed-friendly commutative monoid: shards sketch independently,
  merge is a tiny groupBy.
* **Bloom**: the filter is represented as the *relation of set bit
  positions* (``pos: long``, at most ``m_bits`` rows ~ 8 B each), built
  with one ``xxhash64`` + Kirsch–Mitzenmacher double hashing
  (``pos_i = (h_lo32 + i*h_hi32 + i^2) mod m``) — k positions from ONE
  hash invocation.  Membership is a broadcast ``left_semi`` join against
  that relation plus a ``count == k`` check: fully codegen, no UDF, and
  the broadcast payload is bounded by ``m_bits`` **regardless of how many
  values were inserted** — the property that makes it beat the exact
  probe-set broadcast of :func:`deeptime_spark.operators.dedup.decontaminate`
  when the probe corpus itself is web-scale.  (A packed ``array<long>``
  bit-vector — m/64 longs — is the classic alternative; the positions
  relation is the Spark-first formulation: same semantics, same memory
  bound, and the join stays inside whole-stage codegen.)

Reference parity: the deeptime reference has no sketch layer (its
counting is exact, in-memory: ``markov/tools/estimation``); this module is
part of the beyond-reference large-scale-pipeline surface, alongside
operators/dedup.py and operators/mixing.py.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_registers",
    "hll_merge",
    "hll_estimate_rows",
    "hll_count_distinct",
    "bloom_bit_positions",
    "bloom_build",
    "bloom_probe",
    "bloom_decontaminate",
]

_MASK32 = 0xFFFFFFFF


# ----------------------------------------------------------------- HLL


def hll_registers(
    df: DataFrame,
    value_col: str | Column,
    group_cols: list[str] | None = None,
    p: int = 12,
) -> DataFrame:
    """Per-group HyperLogLog register relation
    ``(*group_cols, reg_idx, rho)`` with ``m = 2**p`` registers.

    ``rho`` is the classic Flajolet rank: 1 + the number of leading zero
    bits of the low ``W = 64 - p`` hash bits (``W + 1`` when they are all
    zero).  Only *touched* registers appear; absent rows mean register
    value 0.  One shuffle of at most ``n_groups * m`` rows after map-side
    partial ``min``.
    """
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    group_cols = list(group_cols or [])
    W = 64 - p
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    h = F.xxhash64(c.cast("string"))
    regs = (
        df.select(
            *group_cols,
            F.shiftrightunsigned(h, W).alias("reg_idx"),
            h.bitwiseAND(F.lit((1 << W) - 1)).alias("_w"),
        )
        .groupBy(*group_cols, "reg_idx")
        .agg(F.min("_w").alias("_min_w"))
    )
    # bit length via base-2 string render — one conv per REGISTER (<= m
    # rows per group), not per value; rho = W - bitlen(min_w) + 1
    bitlen = F.when(F.col("_min_w") == 0, F.lit(0)).otherwise(
        F.length(F.conv(F.col("_min_w").cast("string"), 10, 2))
    )
    return regs.select(
        *group_cols,
        "reg_idx",
        (F.lit(W) - bitlen + F.lit(1)).cast("int").alias("rho"),
    )


def hll_merge(reg_dfs: list[DataFrame], group_cols: list[str] | None = None) -> DataFrame:
    """Merge register relations (sketches of a set union): union all,
    ``max(rho)`` per register — the HLL monoid combine."""
    group_cols = list(group_cols or [])
    u = reduce(DataFrame.unionByName, reg_dfs)
    return u.groupBy(*group_cols, "reg_idx").agg(F.max("rho").alias("rho"))


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate_rows(
    regs: DataFrame, group_cols: list[str] | None = None, p: int = 12
) -> list[dict]:
    """Finish the estimate from a register relation.

    The distributed part reduces each group to TWO numbers — an exact
    integer register sum (``sum 2**(SCALE - rho)`` at scale ``2**SCALE``,
    accumulated as DECIMAL(38,0) so it is order-independent and exact) and
    the touched-register count — so the driver sees exactly one row per
    group.  The final Flajolet formula (harmonic mean + linear-counting
    small-range correction) runs here in Python: it needs ``ln``, whose
    last-ulp behavior differs between JVM and libm, and a per-group scalar
    is the one place that can't matter for scale.
    """
    group_cols = list(group_cols or [])
    W = 64 - p
    scale = W + 1  # max rho; term = 2**(scale - rho) is an exact long
    m = 1 << p
    alpha = _hll_alpha(m)
    summ = (
        regs.groupBy(*group_cols)
        .agg(
            F.sum(
                F.expr(
                    f"CAST(shiftleft(CAST(1 AS BIGINT), CAST({scale} - rho AS INT)) AS DECIMAL(38,0))"
                )
            ).alias("_S"),
            F.count(F.lit(1)).alias("n_registers"),
        )
        .collect()
    )
    out = []
    for r in summ:
        S = int(r["_S"])
        n_present = int(r["n_registers"])
        V = m - n_present  # untouched registers, each contributing 2**-0
        Z = V + S / float(1 << scale)
        E = alpha * m * m / Z
        if E <= 2.5 * m and V > 0:
            E = m * math.log(m / V)  # linear counting, small range
        d = {c: r[c] for c in group_cols}
        d["n_registers"] = n_present
        d["est_distinct"] = E
        out.append(d)
    return out


def hll_count_distinct(
    df: DataFrame,
    value_col: str | Column,
    group_cols: list[str] | None = None,
    p: int = 12,
) -> list[dict]:
    """Sketch + finish in one call: approximate ``COUNT(DISTINCT value)``
    per group with standard error ``~1.04 / sqrt(2**p)`` (≈1.6 % at the
    default p=12), one pass, ``O(2**p)`` state per group."""
    return hll_estimate_rows(
        hll_registers(df, value_col, group_cols, p), group_cols, p
    )


# --------------------------------------------------------------- Bloom


def bloom_bit_positions(value_col: str | Column, m_bits: int, k: int) -> Column:
    """Array of the ``k`` (not-necessarily-distinct) bit positions for a
    value: Kirsch–Mitzenmacher double hashing off one ``xxhash64`` —
    ``pos_i = (h_lo32 + i * h_hi32 + i^2) mod m_bits`` (the ``i^2`` term
    breaks the degenerate ``h_hi32 == 0`` cycle).  All long arithmetic,
    no overflow for ``k < 2**26``."""
    if m_bits <= 0 or k <= 0:
        raise ValueError("m_bits and k must be positive")
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    h = F.xxhash64(c.cast("string"))
    h1 = h.bitwiseAND(F.lit(_MASK32))
    h2 = F.shiftrightunsigned(h, 32)
    return F.array(
        *[
            F.pmod(h1 + F.lit(i) * h2 + F.lit(i * i), F.lit(m_bits))
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame, value_col: str | Column, m_bits: int = 1 << 20, k: int = 5
) -> DataFrame:
    """Build the filter from a value relation: the distinct set-bit
    positions (``pos: long``).  At most ``m_bits`` rows no matter how many
    values are inserted — the broadcastable fixed-memory bound."""
    return (
        df.select(F.explode(bloom_bit_positions(value_col, m_bits, k)).alias("pos"))
        .distinct()
    )


def bloom_probe(
    df: DataFrame,
    bits: DataFrame,
    value_col: str,
    key_cols: list[str],
    m_bits: int = 1 << 20,
    k: int = 5,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Membership probe: appends ``out_col`` (1 = possibly-inserted,
    0 = definitely-not) to the distinct ``(*key_cols, value_col)`` rows of
    ``df``.  A row hits iff ALL its distinct positions appear in ``bits``
    — implemented as explode → broadcast ``left_semi`` join →
    ``count == size`` (duplicate positions from double-hash collisions are
    de-duplicated first so the count is well-defined).  No false
    negatives, false-positive rate ``(1 - e^{-kn/m})^k``."""
    base = df.select(*key_cols, value_col).distinct()
    pos = base.select(
        *key_cols,
        value_col,
        F.array_distinct(bloom_bit_positions(value_col, m_bits, k)).alias("_ps"),
    ).select(
        *key_cols,
        value_col,
        F.size("_ps").alias("_np"),
        F.explode("_ps").alias("pos"),
    )
    present = (
        pos.join(F.broadcast(bits), "pos", "left_semi")
        .groupBy(*key_cols, value_col, "_np")
        .agg(F.count(F.lit(1)).alias("_nh"))
    )
    hits = present.select(
        *key_cols,
        value_col,
        (F.col("_nh") == F.col("_np")).cast("long").alias(out_col),
    )
    return base.join(hits, [*key_cols, value_col], "left").select(
        *key_cols,
        value_col,
        F.coalesce(F.col(out_col), F.lit(0)).alias(out_col),
    )


def bloom_decontaminate(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 8,
    m_bits: int = 1 << 16,
    k: int = 4,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_text_col: str = "text",
) -> DataFrame:
    """Fixed-memory benchmark decontamination: like
    :func:`deeptime_spark.operators.dedup.decontaminate` (word-n-gram
    collision against an eval/probe corpus) but the probe side is folded
    into a Bloom filter, so the broadcast is bounded by ``m_bits`` bits'
    worth of positions even when the probe corpus has billions of grams.
    Conservative by construction: no false negatives (every truly
    contaminated gram is flagged), a tunable false-positive rate flags a
    few clean grams — the safe direction for decontamination.  Returns
    ``(id_col, n_grams, n_bloom_hits, contaminated)``.
    """
    from deeptime_spark.operators.text import word_ngrams

    bits = bloom_build(
        probes.select(
            F.explode(word_ngrams(F.col(probe_text_col), n)).alias("_g")
        ),
        "_g",
        m_bits,
        k,
    )
    doc_grams = docs.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("_g")
    )
    probed = bloom_probe(doc_grams, bits, "_g", [id_col], m_bits, k)
    per_doc = probed.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("bloom_hit").alias("n_bloom_hits"),
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(F.col("n_bloom_hits"), F.lit(0))
            .cast("long")
            .alias("n_bloom_hits"),
            (F.coalesce(F.col("n_bloom_hits"), F.lit(0)) >= min_hits)
            .cast("long")
            .alias("contaminated"),
        )
    )
