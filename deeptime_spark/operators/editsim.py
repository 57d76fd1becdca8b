"""Edit-distance self-join with segment-pigeonhole blocking (PassJoin).

Near-dup detection by MinHash/SimHash (operators/dedup.py) targets
set-resemblance of shingles; it is blind to SMALL EDITS on SHORT
strings — titles, names, normalized URLs, product identifiers — where
one typo moves several shingles at once. The classic exact tool there
is the edit-distance similarity join, and the published scalable
algorithm is segment blocking: Li, Deng, Feng, "PassJoin: A
Partition-based Method for Similarity Joins" (PVLDB 5(3), 2012).

Pigeonhole lemma: if ``ed(r, s) <= t`` and ``s`` is split into ``t+1``
contiguous segments, then ``r`` contains at least one segment as an
EXACT substring, starting within ``±t`` of the segment's position in
``s``. So an equi-join on ``(indexed_length, segment_idx, substring)``
keys has 100% recall, and exact Levenshtein verification of the
candidates gives the precise answer — no all-pairs step anywhere.

Scale shape: the index side emits ``t+1`` keys per string, the probe
side ``(t+1)^2 * (2t+1)`` bounded substring keys (45 for t=2) — both
via codegen ``explode`` + integer arithmetic + ``substring``, no Python
UDFs. Candidate volume is linear in the corpus times the true
near-match density; the only quadratic pocket is strings sharing an
identical ``(length, segment)`` key, which on DISTINCT strings means
genuinely edit-close families (the output itself). Verification uses
Spark's threshold-bounded ``levenshtein(a, b, t)`` (banded DP, early
exit) over a pair-restricted join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _segment_arith(L, i, tau):
    """Start position and length of segment ``i`` (0-based) in an
    ``L``-char string split into ``tau+1`` even segments — the short
    segments first convention: ``L mod (tau+1)`` trailing segments get
    the extra character. Pure Column integer arithmetic (codegen)."""
    k = F.lit(tau + 1)
    q = (L / k).cast("int")  # floor for non-negative L
    n_small = k - (L % k)
    length = q + F.when(i >= n_small, F.lit(1)).otherwise(F.lit(0))
    start = i * q + F.greatest(F.lit(0), i - n_small)
    return start, length


def edit_distance_pairs(
    df: DataFrame,
    max_distance: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    distinct_texts: bool = True,
) -> DataFrame:
    """All pairs of rows whose ``text_col`` values are within Levenshtein
    distance ``max_distance``, as (id_a, id_b, distance) with
    ``id_a < id_b``.

    ``distinct_texts=True`` (default) first collapses identical strings
    to their minimum id — exact duplicates are ``exact_duplicates``'s
    job, and keeping them here would make every segment bucket quadratic
    in copy count for pairs of distance 0. Strings shorter than
    ``max_distance + 1`` cannot be segmented into non-empty pieces; they
    are routed through a broadcast short-bucket (partners are at most
    ``2*max_distance`` chars, so the bucket is tiny in any real corpus).
    """
    tau = int(max_distance)
    if tau < 1:
        raise ValueError(f"max_distance must be >= 1, got {tau}")
    s = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("s"),
    )
    if distinct_texts:
        s = s.groupBy("s").agg(F.min("id").alias("id"))
    s = s.select("id", "s", F.length("s").alias("len")).persist()
    s.count()

    long_side = s.where(F.col("len") >= tau + 1)
    # ---- index: t+1 segment keys per string -------------------------
    i_col = F.explode(F.sequence(F.lit(0), F.lit(tau))).alias("i")
    seg_start, seg_len = _segment_arith(F.col("len"), F.col("i"), tau)
    index = long_side.select("id", "s", "len", i_col).select(
        F.col("id").alias("id_s"),
        F.col("len").alias("L"),
        "i",
        F.substring("s", (seg_start + 1).cast("int"), seg_len.cast("int")).alias(
            "sub"
        ),
    )
    # ---- probe: bounded (dL, i, shift) substring keys ---------------
    combos = F.array(
        *[
            F.struct(
                F.lit(dL).alias("dL"), F.lit(i).alias("i"), F.lit(sh).alias("sh")
            )
            for dL in range(tau + 1)
            for i in range(tau + 1)
            for sh in range(-tau, tau + 1)
        ]
    )
    probe = long_side.select("id", "s", "len", F.explode(combos).alias("c"))
    L = F.col("len") - F.col("c.dL")
    p_start, p_len = _segment_arith(L, F.col("c.i"), tau)
    start = p_start + F.col("c.sh")
    probe = probe.where(
        (L >= tau + 1) & (start >= 0) & (start + p_len <= F.col("len"))
    ).select(
        F.col("id").alias("id_r"),
        L.alias("L"),
        F.col("c.i").alias("i"),
        F.substring("s", (start + 1).cast("int"), p_len.cast("int")).alias("sub"),
    )
    cand_long = (
        index.join(probe, ["L", "i", "sub"])
        .where(F.col("id_s") != F.col("id_r"))
        .select(
            F.least("id_s", "id_r").alias("id_a"),
            F.greatest("id_s", "id_r").alias("id_b"),
        )
        .distinct()
    )
    # ---- short bucket: strings too short to segment ------------------
    shorts = s.where(F.col("len") <= tau)
    partners = s.where(F.col("len") <= 2 * tau)
    cand_short = (
        F.broadcast(shorts.select(F.col("id").alias("id_s")))
        .crossJoin(partners.select(F.col("id").alias("id_r")))
        .where(F.col("id_s") != F.col("id_r"))
        .select(
            F.least("id_s", "id_r").alias("id_a"),
            F.greatest("id_s", "id_r").alias("id_b"),
        )
        .distinct()
    )
    # the two candidate sets are disjoint by construction (long path:
    # both >= tau+1 chars; short path: one side <= tau), so plain union
    cands = cand_long.union(cand_short)
    # ---- verify: threshold-banded Levenshtein over candidates only ---
    ta = s.select(F.col("id").alias("id_a"), F.col("s").alias("_sa"))
    tb = s.select(F.col("id").alias("id_b"), F.col("s").alias("_sb"))
    dist = F.levenshtein("_sa", "_sb", tau)
    out = (
        cands.join(ta, "id_a")
        .join(tb, "id_b")
        .select("id_a", "id_b", dist.alias("distance"))
        .where(F.col("distance") >= 0)
    )
    return out
