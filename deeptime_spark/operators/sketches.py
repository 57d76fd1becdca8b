"""Mergeable sketches: HyperLogLog distinct counting, Bloom-filter
membership, and count-min frequency estimation — the fixed-memory
primitives a 100 TB corpus pipeline needs when exact ``COUNT(DISTINCT)``
/ exact probe-set semi-joins / exact frequency tables stop fitting.

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
    "cms_positions",
    "cms_build",
    "cms_estimate",
    "bottomk_sample",
    "bottomk_quantiles",
    "bottomk_rollup_quantiles",
    "kmv_sketch",
    "kmv_overlap_pairs",
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
    0 = definitely-not) to ``(*key_cols, value_col)``.  A row hits iff
    ALL ``k`` of its positions appear in ``bits`` — implemented as ``k``
    broadcast LEFT joins (one per hash) whose null-flags AND together,
    so the probe side is **map-only**: no explode, no distinct, no
    shuffle of the corpus relation, which is what keeps the probe linear
    when the filter saturates (an explode + groupBy(count==k)
    formulation re-shuffles every surviving position row — measurably
    superlinear on duplicate-dense corpora).  No false negatives,
    false-positive rate ``(1 - e^{-kn/m})^k``."""
    h = F.xxhash64(F.col(value_col).cast("string"))
    probe = df.select(
        *key_cols,
        value_col,
        h.bitwiseAND(F.lit(_MASK32)).alias("_h1"),
        F.shiftrightunsigned(h, 32).alias("_h2"),
    )
    flags = []
    for i in range(k):
        b_i = F.broadcast(bits.select(F.col("pos").alias(f"_bp{i}")))
        probe = probe.join(
            b_i,
            F.pmod(
                F.col("_h1") + F.lit(i) * F.col("_h2") + F.lit(i * i),
                F.lit(m_bits),
            )
            == F.col(f"_bp{i}"),
            "left",
        )
        flags.append(F.col(f"_bp{i}").isNotNull())
    hit = reduce(lambda a, b: a & b, flags).cast("long").alias(out_col)
    return probe.select(*key_cols, value_col, hit)


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


# ----------------------------------------------------------- count-min


def cms_positions(value_col: str | Column, width: int, depth: int) -> Column:
    """Array of ``depth`` (row, col) cells for a value — row r probes
    column ``(h_lo32 + r * h_hi32 + r^2) mod width`` (same
    Kirsch–Mitzenmacher scheme as the Bloom filter, one xxhash64)."""
    if width <= 0 or depth <= 0:
        raise ValueError("width and depth must be positive")
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    h = F.xxhash64(c.cast("string"))
    h1 = h.bitwiseAND(F.lit(_MASK32))
    h2 = F.shiftrightunsigned(h, 32)
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                F.pmod(h1 + F.lit(r) * h2 + F.lit(r * r), F.lit(width)).alias("col"),
            )
            for r in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    value_col: str | Column,
    width: int = 1 << 12,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch as a relation ``(row, col, cnt)`` — at most
    ``depth * width`` rows regardless of stream length, built in one
    explode + hash-aggregate pass with map-side partials.  Counts are
    exact integers, so the sketch is deterministic and mergeable by
    cell-wise sum (``groupBy(row, col).sum``).  ``weight_col`` counts
    each value row with a long weight instead of 1 (e.g. token mass)."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    cell = F.explode(cms_positions(value_col, width, depth)).alias("_c")
    return (
        df.select(cell, w.alias("_w"))
        .select(F.col("_c.row").alias("row"), F.col("_c.col").alias("col"), "_w")
        .groupBy("row", "col")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_estimate(
    df: DataFrame,
    sketch: DataFrame,
    value_col: str,
    width: int = 1 << 12,
    depth: int = 4,
    out_col: str = "cms_est",
) -> DataFrame:
    """Point-query the sketch for each distinct value in ``df``:
    ``min`` over the value's ``depth`` cells (a never-undercounting
    estimate: ``true <= est <= true + eps * N`` w.h.p.).  The sketch is
    bounded by ``depth * width`` cells, so it joins as a broadcast; an
    absent cell means 0."""
    base = df.select(value_col).distinct()
    probes = base.select(
        value_col, F.explode(cms_positions(value_col, width, depth)).alias("_c")
    ).select(value_col, F.col("_c.row").alias("row"), F.col("_c.col").alias("col"))
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col))
    )


# ------------------------------------------------- bottom-k (KMV) sample


def bottomk_sample(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic uniform sample without replacement: the ``k`` rows
    with the smallest ``xxhash64(key)`` per group — a content-addressed
    reservoir (KMV bottom-k sketch).  Reruns, layout changes, and
    incremental recomputes all pick the SAME sample; two shards' samples
    merge by re-applying bottom-k to their union (the sketch is a
    monoid under that combine).

    Spark shape: ``row_number`` over (hash, key) per group + ``<= k``
    filter.  Spark's rank-limit pushdown (WindowGroupLimit) inserts a
    per-partition partial top-k BEFORE the shuffle, so each map task
    ships at most ``k`` rows per group — pinned in tests/test_plans.py.

    ``key_col`` must be unique per row within each group: the total
    order is (hash(key), key), so duplicate keys make membership among
    those duplicates tie-broken arbitrarily (everything else stays
    deterministic).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    from pyspark.sql import Window

    group_cols = list(group_cols or [])
    payload_cols = list(payload_cols or [c for c in df.columns if c not in group_cols])
    h = F.xxhash64(F.col(key_col).cast("string"))
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select(*group_cols, *payload_cols)
    )


def bottomk_quantiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
    quantiles: tuple = (0.25, 0.5, 0.75, 0.9),
) -> list[dict]:
    """Approximate per-group quantiles of ``value_col`` from the
    deterministic bottom-k sample: nearest-rank (ceil) quantiles of the
    sorted sample values, computed on the driver over the ≤ ``k * groups``
    collected sample rows.  Error is the sampling error of a uniform
    k-sample — distribution-free, and reproducible to the last bit
    because the sample itself is content-addressed."""
    import math as _math

    group_cols = list(group_cols or [])
    sample = bottomk_sample(df, key_col, group_cols, k, [value_col])
    by_group: dict = {}
    for r in sample.collect():
        gkey = tuple(r[c] for c in group_cols)
        by_group.setdefault(gkey, []).append(r[value_col])
    out = []
    for gkey in sorted(by_group):
        vals = sorted(by_group[gkey])
        n = len(vals)
        d = dict(zip(group_cols, gkey))
        d["n_sample"] = n
        for q in quantiles:
            d[f"q{int(q * 100)}"] = vals[max(_math.ceil(q * n) - 1, 0)]
        out.append(d)
    return out


# ------------------------------------------- KMV set operations (overlap)


def kmv_sketch(
    df: DataFrame,
    key_col: str | Column,
    group_cols: list[str] | None = None,
    k: int = 256,
) -> DataFrame:
    """Per-group KMV (bottom-k) sketch of the DISTINCT ``key_col``
    values: the ``k`` smallest ``xxhash64(key)`` values per group
    (Beyer et al., SIGMOD'07 "On Synopses for Distinct-Value Estimation
    under Multiset Operations").  Returns ``(group_cols..., h)``.

    Unlike HLL registers (union-only), a KMV sketch supports
    INTERSECTION estimates — see :func:`kmv_overlap_pairs` — because it
    keeps sample identities, not just extrema.

    Spark shape: distinct on (group, hash) is the one corpus-scale
    shuffle (map-side combined); the bottom-k cut is a rank-limit
    window, and Spark's WindowGroupLimit rewrite inserts a partial
    per-partition top-k BEFORE the second exchange, so it ships at most
    ``k`` rows per group per task — the same pinned plan shape as
    ``bottomk_sample``.
    """
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError("k must be positive")
    group_cols = list(group_cols or [])
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    hashed = df.select(
        *group_cols, F.xxhash64(key.cast("string")).alias("h")
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("h").asc())
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_overlap_pairs(
    sketch: DataFrame,
    group_col: str,
    k: int = 256,
) -> DataFrame:
    """Pairwise set-overlap estimates between every pair of groups from
    their KMV sketches — the sketch algebra of Beyer et al. SIGMOD'07:
    the k smallest hashes of ``A ∪ B`` are computable from the two
    bottom-k sketches alone (any union-bottom-k element is bottom-k in
    its own set), Jaccard is estimated by the match fraction within
    that union sketch, and the union cardinality by the k-th smallest
    value's position in the hash space.

    Returns per unordered pair (group_a < group_b):
      - ``k_used``      — union-sketch size actually available (= k
                          unless both sets are tiny);
      - ``tau``         — the k_used-th smallest hash of A ∪ B (signed);
      - ``n_common``    — union-sketch members present in BOTH sketches;
      - ``jaccard_est`` — n_common / k_used;
      - ``union_est``   — (k_used - 1) * 2^64 / (tau + 2^63), the KMV
                          distinct-count estimator in unsigned space,
                          applied only in the SATURATED regime
                          (k_used == k); when k_used < k the union
                          sketch holds the entire distinct union and
                          union_est is the exact cardinality k_used;
      - ``intersection_est`` — jaccard_est * union_est.

    Everything is exact integer arithmetic until the three final float
    expressions, each a fixed IEEE-754 op sequence an independent SQL
    engine replays bit-identically from the integer columns.

    Spark shape: the sketch relation is O(groups * k) rows; pair
    expansion is a broadcast join against the O(groups²) pair frame,
    then one aggregate — nothing here rescans the corpus.
    """
    from pyspark.sql import Window

    groups = sketch.select(F.col(group_col)).distinct()
    pairs = (
        groups.alias("ga")
        .crossJoin(groups.alias("gb"))
        .where(F.col(f"ga.{group_col}") < F.col(f"gb.{group_col}"))
        .select(
            F.col(f"ga.{group_col}").alias("group_a"),
            F.col(f"gb.{group_col}").alias("group_b"),
        )
    )
    # explode each pair into one row per member so the sketch joins by
    # EQUI-join on the group key (hash join, linear in |sketch| x pair
    # fan-out) — an OR-condition join would plan as a nested-loop over
    # sketch x pairs, quadratic in the group count
    membership = pairs.select(
        "group_a",
        "group_b",
        F.explode(F.array("group_a", "group_b")).alias(group_col),
    )
    tagged = sketch.join(F.broadcast(membership), group_col)
    # distinct union hashes per pair; a hash present in both sketches
    # contributes two rows here
    union = tagged.groupBy("group_a", "group_b", "h").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    w = Window.partitionBy("group_a", "group_b").orderBy(F.col("h").asc())
    kept = union.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    agg = kept.groupBy("group_a", "group_b").agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("h").alias("tau"),
        F.sum(F.when(F.col("_cnt") == 2, 1).otherwise(0)).alias("n_common"),
    )
    ku_d = F.col("k_used").cast("double")
    jac = F.col("n_common").cast("double") / ku_d
    # saturated regime only: with k_used < k the union sketch holds the
    # ENTIRE distinct union, so the exact cardinality is k_used — the
    # (k-1)/tau estimator would bias small groups low
    union_est = F.when(
        F.col("k_used") < F.lit(int(k)),
        ku_d,
    ).otherwise(
        (ku_d - F.lit(1.0))
        * F.lit(18446744073709551616.0)
        / (F.col("tau").cast("double") + F.lit(9223372036854775808.0))
    )
    return agg.select(
        "group_a",
        "group_b",
        F.col("k_used").cast("long").alias("k_used"),
        F.col("tau").cast("long").alias("tau"),
        F.col("n_common").cast("long").alias("n_common"),
        jac.alias("jaccard_est"),
        union_est.alias("union_est"),
        (jac * union_est).alias("intersection_est"),
    )


def bottomk_rollup_quantiles(
    samples: DataFrame,
    key_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
    quantiles: tuple = (25, 50, 75, 90),
) -> DataFrame:
    """Merge persisted per-slice bottom-k samples and compute per-group
    nearest-rank quantiles — the quantile twin of the HLL register
    rollup (hll_merge): a sketch TABLE is written once per
    slice (day/shard), and any cross-slice rollup is answered from the
    bounded sketch rows without rescanning history.

    Monoid property (why this is exact, not an approximation of the
    sketch): any row among the k smallest hashes of the UNION is among
    the k smallest of its own slice, so re-applying bottom-k
    (:func:`bottomk_sample`) to the concatenated slice samples yields
    EXACTLY the bottom-k sample of the union — the rollup is
    bit-identical to a one-shot sketch over the full data. Quantiles
    are nearest-rank (ceil(q·n/100), all-integer index arithmetic) over
    the merged sample's values, so with an integer ``value_col`` every
    output cell is exact-integer and engine-replayable.

    Spark shape: the merge is one rank-limit window over
    O(slices · k · groups) sketch rows (WindowGroupLimit partial
    top-k), then one collect_list aggregate of ≤ k values per group —
    nothing rescans the underlying corpus.
    """
    group_cols = list(group_cols or [])
    merged = bottomk_sample(samples, key_col, group_cols, k, [value_col])
    agg = merged.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list(F.col(value_col))).alias("_vals")
    )
    n = F.size("_vals")
    out_cols = [
        *group_cols,
        n.cast("long").alias("n_sample"),
    ]
    for q in quantiles:
        idx = F.greatest(F.expr(f"({int(q)} * size(_vals) + 99) div 100"), F.lit(1))
        out_cols.append(F.element_at("_vals", idx.cast("int")).alias(f"q{int(q)}"))
    return agg.select(*out_cols)
