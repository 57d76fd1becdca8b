"""Blocked record linkage (entity resolution) over structured records.

The structured-data twin of the document dedup family
(operators/dedup.py): a 100 TB warehouse deduplicates ENTITIES —
customers, suppliers, hosts — whose rows differ by typos and partial
fields, not by token sets. The published shape (Fellegi & Sunter, JASA
1969, for the scoring model; Christen, "Data Matching", 2012, for
blocking) is exactly the LSH pipeline's: candidate generation by
BLOCKING (cheap equi-joins on coarse keys — never all-pairs), then
field-by-field comparison on the candidate pairs only, then a weighted
match score and a threshold.

Spark shape, scale-first:

- **blocking = a union of equi-joins**, one per blocking key; each join
  is shuffle/broadcast-planned by Catalyst and its worst case is
  bounded by ``max_block`` (deterministic per-block cap by id order —
  the dedup family's ``DEFAULT_MAX_BUCKET`` policy: a hot block like a
  NULL zip code would otherwise go quadratic). Profile candidate keys
  with :func:`deeptime_spark.operators.profile.skew_profile` before
  choosing them;
- **comparison stays codegen**: string similarity is
  ``1 - levenshtein/max(len)`` (Spark's built-in JVM levenshtein;
  integers + one division, so scores are bit-portable), exact fields
  are null-safe equality — no Python anywhere;
- **score** = weight-normalized sum of field similarities, a pure
  column expression.

Everything is a deterministic function of the input rows: candidate
pairs are order-normalized and distinct, caps break ties on id, and
every similarity is integer-derived — an independent SQL engine replays
the whole pipeline bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_MAX_BLOCK = 1000


def blocked_candidates(
    records: DataFrame,
    id_col: str,
    block_keys: list,
    max_block: int | None = DEFAULT_MAX_BLOCK,
) -> DataFrame:
    """Self-linkage candidate pairs (id_a < id_b) from a union of
    blocking passes. ``block_keys`` is a list of blocking specs, each a
    column name or list of column names; records agreeing on ALL
    columns of ANY spec become candidates. NULL block values never
    match (a NULL zip is missing data, not a block).

    Each pass caps its blocks at ``max_block`` members (deterministic
    by id) before pairing, so the pair fan-out is O(max_block) per
    member per pass regardless of block-size skew.
    """
    if not block_keys:
        raise ValueError("block_keys must be non-empty")
    pair_frames = []
    for spec in block_keys:
        cols = [spec] if isinstance(spec, str) else list(spec)
        blk = records.select(
            F.col(id_col).alias("_id"),
            *[F.col(c).alias(f"_b{i}") for i, c in enumerate(cols)],
        )
        for i in range(len(cols)):
            blk = blk.where(F.col(f"_b{i}").isNotNull())
        if max_block is not None:
            w = Window.partitionBy(
                *[F.col(f"_b{i}") for i in range(len(cols))]
            ).orderBy(F.col("_id"))
            blk = (
                blk.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") <= int(max_block))
                .drop("_rn")
            )
        a = blk.select(
            F.col("_id").alias("id_a"),
            *[F.col(f"_b{i}") for i in range(len(cols))],
        )
        b = blk.select(
            F.col("_id").alias("id_b"),
            *[F.col(f"_b{i}") for i in range(len(cols))],
        )
        pair_frames.append(
            a.join(b, [f"_b{i}" for i in range(len(cols))])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
    out = pair_frames[0]
    for p in pair_frames[1:]:
        out = out.unionByName(p)
    return out.distinct()


def string_similarity(a, b) -> "F.Column":
    """``1 - levenshtein/max(len)`` on coalesced-to-empty strings —
    JVM-side integers plus ONE division, bit-portable across engines.
    Two empty strings score 1.0 (identical)."""
    ca, cb = F.coalesce(a, F.lit("")), F.coalesce(b, F.lit(""))
    denom = F.greatest(F.length(ca), F.length(cb), F.lit(1))
    return F.lit(1.0) - F.levenshtein(ca, cb).cast("double") / denom.cast(
        "double"
    )


def blocked_record_linkage(
    records: DataFrame,
    id_col: str,
    block_keys: list,
    string_fields: list | None = None,
    exact_fields: list | None = None,
    weights: dict | None = None,
    threshold: float = 0.8,
    max_block: int | None = DEFAULT_MAX_BLOCK,
) -> DataFrame:
    """Self-linkage: blocked candidates -> per-field similarities ->
    weight-normalized score, pairs scoring >= ``threshold`` kept.

    Returns (id_a, id_b, sim_<field> per compared field, score),
    id_a < id_b. Feed the pair set to
    :func:`deeptime_spark.operators.dedup.connected_components` /
    ``drop_near_duplicates`` for canonical-entity election — the same
    composition the document pipeline uses.
    """
    string_fields = list(string_fields or [])
    exact_fields = list(exact_fields or [])
    fields = string_fields + exact_fields
    if not fields:
        raise ValueError("need at least one compared field")
    wmap = {f: float((weights or {}).get(f, 1.0)) for f in fields}
    wsum = sum(wmap.values())
    if wsum <= 0:
        raise ValueError("weights must sum positive")
    cands = blocked_candidates(records, id_col, block_keys, max_block)
    payload = records.select(
        F.col(id_col), *[F.col(f) for f in fields]
    )
    ja = payload.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f).alias(f"_a_{f}") for f in fields],
    )
    jb = payload.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f).alias(f"_b_{f}") for f in fields],
    )
    out = cands.join(ja, "id_a").join(jb, "id_b")
    sims = {}
    for f in string_fields:
        sims[f] = string_similarity(F.col(f"_a_{f}"), F.col(f"_b_{f}"))
    for f in exact_fields:
        # missing data is UNINFORMATIVE, not agreeing (Fellegi-Sunter):
        # a NULL on either side scores 0 — matching the SQL '=' the
        # oracles replay (eqNullSafe would count two missing fields as
        # a full-weight match and inflate false links)
        sims[f] = (
            F.when(
                F.col(f"_a_{f}").isNotNull()
                & F.col(f"_b_{f}").isNotNull()
                & (F.col(f"_a_{f}") == F.col(f"_b_{f}")),
                1.0,
            ).otherwise(0.0)
        )
    score = None
    for f in fields:
        term = sims[f] * F.lit(wmap[f] / wsum)
        score = term if score is None else score + term
    for f in fields:
        out = out.withColumn(f"sim_{f}", sims[f])
    out = out.withColumn("score", score)
    return out.where(F.col("score") >= F.lit(float(threshold))).select(
        "id_a", "id_b", *[f"sim_{f}" for f in fields], "score"
    )


def record_linkage_probe(
    master: DataFrame,
    delta: DataFrame,
    id_col: str,
    block_keys: list,
    string_fields: list | None = None,
    exact_fields: list | None = None,
    weights: dict | None = None,
    threshold: float = 0.8,
    max_block: int | None = DEFAULT_MAX_BLOCK,
) -> DataFrame:
    """Incremental linkage — the daily-delta face of
    :func:`blocked_record_linkage`, mirroring the dedup family's
    persisted-index probe (operators/dedup.py:probe_signature_index):
    a batch of NEW records probes the existing master/golden dimension;
    per delta record the BEST master match at or above ``threshold`` is
    returned (ties break to the smaller master id — deterministic).
    Deltas with no qualifying match are absent from the output: the
    caller inserts them as new entities (and the SCD2 merge is the
    natural next stage for the matched ones).

    Scale shape: per blocking spec one equi-join of the delta against
    the master's blocks — work proportional to the DELTA, the master
    never self-joins; master blocks are capped at ``max_block``
    (deterministic by id) so a hot block cannot go quadratic; scoring
    is the same codegen levenshtein/equality expressions; best-match
    election is one per-delta-id window over the bounded candidate set.

    Returns (id_delta, id_master, sim_<field>..., score).
    """
    string_fields = list(string_fields or [])
    exact_fields = list(exact_fields or [])
    fields = string_fields + exact_fields
    if not fields:
        raise ValueError("need at least one compared field")
    if not block_keys:
        raise ValueError("block_keys must be non-empty")
    wmap = {f: float((weights or {}).get(f, 1.0)) for f in fields}
    wsum = sum(wmap.values())
    if wsum <= 0:
        raise ValueError("weights must sum positive")
    cand_frames = []
    for spec in block_keys:
        cols = [spec] if isinstance(spec, str) else list(spec)
        m = master.select(
            F.col(id_col).alias("id_master"),
            *[F.col(c).alias(f"_b{i}") for i, c in enumerate(cols)],
        )
        d = delta.select(
            F.col(id_col).alias("id_delta"),
            *[F.col(c).alias(f"_b{i}") for i, c in enumerate(cols)],
        )
        for i in range(len(cols)):
            m = m.where(F.col(f"_b{i}").isNotNull())
            d = d.where(F.col(f"_b{i}").isNotNull())
        if max_block is not None:
            w = Window.partitionBy(
                *[F.col(f"_b{i}") for i in range(len(cols))]
            ).orderBy(F.col("id_master"))
            m = (
                m.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") <= int(max_block))
                .drop("_rn")
            )
        cand_frames.append(
            d.join(m, [f"_b{i}" for i in range(len(cols))]).select(
                "id_delta", "id_master"
            )
        )
    cands = cand_frames[0]
    for c in cand_frames[1:]:
        cands = cands.unionByName(c)
    cands = cands.distinct()
    jm = master.select(
        F.col(id_col).alias("id_master"),
        *[F.col(f).alias(f"_m_{f}") for f in fields],
    )
    jd = delta.select(
        F.col(id_col).alias("id_delta"),
        *[F.col(f).alias(f"_d_{f}") for f in fields],
    )
    out = cands.join(jd, "id_delta").join(jm, "id_master")
    sims = {}
    for f in string_fields:
        sims[f] = string_similarity(F.col(f"_d_{f}"), F.col(f"_m_{f}"))
    for f in exact_fields:
        # NULL on either side scores 0 — see blocked_record_linkage
        sims[f] = (
            F.when(
                F.col(f"_d_{f}").isNotNull()
                & F.col(f"_m_{f}").isNotNull()
                & (F.col(f"_d_{f}") == F.col(f"_m_{f}")),
                1.0,
            ).otherwise(0.0)
        )
    score = None
    for f in fields:
        term = sims[f] * F.lit(wmap[f] / wsum)
        score = term if score is None else score + term
    for f in fields:
        out = out.withColumn(f"sim_{f}", sims[f])
    out = out.withColumn("score", score).where(
        F.col("score") >= F.lit(float(threshold))
    )
    best = Window.partitionBy("id_delta").orderBy(
        F.col("score").desc(), F.col("id_master")
    )
    return (
        out.withColumn("_rk", F.row_number().over(best))
        .where(F.col("_rk") == 1)
        .drop("_rk")
        .select("id_delta", "id_master", *[f"sim_{f}" for f in fields], "score")
    )
