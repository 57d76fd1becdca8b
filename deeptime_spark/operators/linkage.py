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

from deeptime_spark.local_relation import local_df as _local_df
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
        # pin the block-cap window's exchange at cluster width while the
        # projection is small in bytes (no-op at scale): the window AND
        # the pair fan-out join both reuse this exchange, and AQE would
        # otherwise coalesce the few-MB shuffle to 2-3 tasks right where
        # the quadratic-in-block pair expansion runs
        from deeptime_spark.operators.layout import pin_width_for_cpu_dense

        blk = pin_width_for_cpu_dense(blk, *[f"_b{i}" for i in range(len(cols))])
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
    # The dedup exchange doubles as the LAYOUT of the downstream scoring
    # stage (payload joins broadcast at this size, so whatever width this
    # exchange ends with is the width levenshtein scoring runs at). The
    # candidate relation is few BYTES but expensive ROWS, so AQE
    # coalesces it to 1-3 partitions and the scoring serializes on a
    # near-idle cluster (measured 2.5 s on 3 of 32 cores at sf0.1).
    # Pinning the exchange (size-gated, no-op at scale) keeps distinct's
    # single exchange, just at a width AQE must respect.
    from deeptime_spark.operators.layout import pin_width_for_cpu_dense

    return pin_width_for_cpu_dense(out, "id_a", "id_b").distinct()


def string_similarity(a, b) -> "F.Column":
    """``1 - levenshtein/max(len)`` on coalesced-to-empty strings —
    JVM-side integers plus ONE division, bit-portable across engines.
    Two empty strings score 1.0 (identical)."""
    ca, cb = F.coalesce(a, F.lit("")), F.coalesce(b, F.lit(""))
    denom = F.greatest(F.length(ca), F.length(cb), F.lit(1))
    return F.lit(1.0) - F.levenshtein(ca, cb).cast("double") / denom.cast(
        "double"
    )


def _field_scores(
    string_fields: list,
    exact_fields: list,
    wmap: dict,
    wsum: float,
    left_prefix: str,
    right_prefix: str,
) -> tuple[dict, "F.Column"]:
    """Shared per-field similarity + weight-normalized score expressions
    over a joined pair frame whose compared columns are named
    ``{left_prefix}{field}`` / ``{right_prefix}{field}`` — ONE
    definition so the linkage pipeline, the incremental probe, and the
    blocking gate's exact truth can never drift from each other."""
    sims: dict = {}
    for f in string_fields:
        sims[f] = string_similarity(
            F.col(f"{left_prefix}{f}"), F.col(f"{right_prefix}{f}")
        )
    for f in exact_fields:
        # missing data is UNINFORMATIVE, not agreeing (Fellegi-Sunter):
        # a NULL on either side scores 0 — matching the SQL '=' the
        # oracles replay (eqNullSafe would count two missing fields as
        # a full-weight match and inflate false links)
        sims[f] = (
            F.when(
                F.col(f"{left_prefix}{f}").isNotNull()
                & F.col(f"{right_prefix}{f}").isNotNull()
                & (F.col(f"{left_prefix}{f}") == F.col(f"{right_prefix}{f}")),
                1.0,
            ).otherwise(0.0)
        )
    score = None
    for f in list(string_fields) + list(exact_fields):
        term = sims[f] * F.lit(wmap[f] / wsum)
        score = term if score is None else score + term
    return sims, score


def _implied_exact_prefilter(
    string_fields: list,
    exact_fields: list,
    wmap: dict,
    wsum: float,
    threshold: float,
    left_prefix: str,
    right_prefix: str,
) -> "F.Column | None":
    """Conjunction of exact-field equalities IMPLIED by
    ``score >= threshold`` — a cheap integer/equality pre-filter that
    lets the codegen And skip the levenshtein terms for pairs that
    cannot reach the threshold (guide §1.2: don't compute what you
    throw away; the §13-dedup length-prefilter pattern applied to
    Fellegi-Sunter scoring).

    Exact-field similarities are binary {0, 1}. For field ``f``, replay
    the score accumulation in the SAME IEEE order `_field_scores` uses,
    with ``sim_f = 0`` and every other similarity at its maximum 1.0;
    every per-term product and the left-to-right additions are monotone
    in the sims, so the replayed value is the exact float MAXIMUM a
    pair with ``sim_f = 0`` can score. If that maximum is < threshold,
    the threshold filter already rejects every such pair, and the
    equality conjunct drops nothing the filter would keep. Fields whose
    replayed maximum reaches the threshold (including any exact-equality
    boundary) contribute no conjunct; negative weights disable the
    filter entirely (the max-at-1.0 argument needs w >= 0).

    Returns None when no field qualifies — callers apply the score
    filter unchanged in that case.
    """
    fields = list(string_fields) + list(exact_fields)
    if any(wmap[f] < 0 for f in fields):
        return None
    conj = None
    for f in exact_fields:
        s = None
        for g in fields:
            term = 0.0 if g == f else 1.0 * (wmap[g] / wsum)
            s = term if s is None else s + term
        if s < float(threshold):
            c = (
                F.col(f"{left_prefix}{f}").isNotNull()
                & F.col(f"{right_prefix}{f}").isNotNull()
                & (F.col(f"{left_prefix}{f}") == F.col(f"{right_prefix}{f}"))
            )
            conj = c if conj is None else conj & c
    return conj


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
    # implied exact-equality pre-filter FIRST (its own Filter below the
    # score filter, so the And short-circuits before any levenshtein):
    # drops only pairs the threshold filter rejects anyway
    pref = _implied_exact_prefilter(
        string_fields, exact_fields, wmap, wsum, threshold, "_a_", "_b_"
    )
    if pref is not None:
        out = out.where(pref)
    sims, score = _field_scores(
        string_fields, exact_fields, wmap, wsum, "_a_", "_b_"
    )
    for f in fields:
        out = out.withColumn(f"sim_{f}", sims[f])
    out = out.withColumn("score", score)
    return out.where(F.col("score") >= F.lit(float(threshold))).select(
        "id_a", "id_b", *[f"sim_{f}" for f in fields], "score"
    )


def master_probe_sides(
    master: DataFrame,
    id_col: str,
    block_keys: list,
    fields: list,
    max_block: int | None = DEFAULT_MAX_BLOCK,
) -> tuple[list, DataFrame]:
    """The master-side relations a linkage probe joins against: one
    capped block frame per blocking spec (id_master, _b0..) and the
    compared-field payload (id_master, _m_<field>..).

    Split out so callers that probe the SAME master repeatedly — the
    streaming face probes it once per micro-batch — can materialize
    these frames ONCE instead of re-running the per-spec block-cap
    window (a full master scan + shuffle) on every probe (guide §2.4:
    establish the partitioning/derived relation once, reuse it every
    pass; the master is a bounded dimension, so the materialization is
    never corpus-scale).
    """
    m_frames = []
    for spec in block_keys:
        cols = [spec] if isinstance(spec, str) else list(spec)
        m = master.select(
            F.col(id_col).alias("id_master"),
            *[F.col(c).alias(f"_b{i}") for i, c in enumerate(cols)],
        )
        for i in range(len(cols)):
            m = m.where(F.col(f"_b{i}").isNotNull())
        # pin the block-cap window's exchange at cluster width while the
        # master projection is small in bytes (no-op at scale): the
        # delta equi-join fans out IN this exchange's layout, and AQE
        # would coalesce the few-MB shuffle to 1-2 tasks
        from deeptime_spark.operators.layout import pin_width_for_cpu_dense

        m = pin_width_for_cpu_dense(m, *[f"_b{i}" for i in range(len(cols))])
        if max_block is not None:
            w = Window.partitionBy(
                *[F.col(f"_b{i}") for i in range(len(cols))]
            ).orderBy(F.col("id_master"))
            m = (
                m.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") <= int(max_block))
                .drop("_rn")
            )
        m_frames.append(m)
    jm = master.select(
        F.col(id_col).alias("id_master"),
        *[F.col(f).alias(f"_m_{f}") for f in fields],
    )
    return m_frames, jm


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
    master_sides: tuple[list, DataFrame] | None = None,
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
    m_frames, jm = (
        master_sides
        if master_sides is not None
        else master_probe_sides(master, id_col, block_keys, fields, max_block)
    )
    cand_frames = []
    for spec, m in zip(block_keys, m_frames):
        cols = [spec] if isinstance(spec, str) else list(spec)
        d = delta.select(
            F.col(id_col).alias("id_delta"),
            *[F.col(c).alias(f"_b{i}") for i, c in enumerate(cols)],
        )
        for i in range(len(cols)):
            d = d.where(F.col(f"_b{i}").isNotNull())
        cand_frames.append(
            d.join(m, [f"_b{i}" for i in range(len(cols))]).select(
                "id_delta", "id_master"
            )
        )
    cands = cand_frames[0]
    for c in cand_frames[1:]:
        cands = cands.unionByName(c)
    # pin the dedup exchange at cluster width while the pair ids are
    # small in bytes (no-op at scale): the levenshtein scoring runs in
    # this exchange's layout, and AQE would coalesce it to 1-2 tasks
    from deeptime_spark.operators.layout import pin_width_for_cpu_dense

    cands = pin_width_for_cpu_dense(cands, "id_delta", "id_master").distinct()
    jd = delta.select(
        F.col(id_col).alias("id_delta"),
        *[F.col(f).alias(f"_d_{f}") for f in fields],
    )
    out = cands.join(jd, "id_delta").join(jm, "id_master")
    # implied exact-equality pre-filter (see _implied_exact_prefilter):
    # per micro-batch/delta probe this skips the levenshtein terms for
    # every candidate whose exact fields already put it below threshold
    pref = _implied_exact_prefilter(
        string_fields, exact_fields, wmap, wsum, threshold, "_d_", "_m_"
    )
    if pref is not None:
        out = out.where(pref)
    sims, score = _field_scores(
        string_fields, exact_fields, wmap, wsum, "_d_", "_m_"
    )
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


def linkage_blocking_gate(
    records: DataFrame,
    id_col: str,
    block_keys: list,
    string_fields: list | None = None,
    exact_fields: list | None = None,
    weights: dict | None = None,
    threshold: float = 0.8,
    max_block: int | None = DEFAULT_MAX_BLOCK,
    probe_records: DataFrame | None = None,
) -> DataFrame:
    """Blocking-quality gate — the linkage twin of
    :func:`deeptime_spark.operators.dedup.dedup_candidate_quality`
    (measure the candidate-generation loss, don't trust it): on a
    BOUNDED probe, exact all-pairs truth at the scoring threshold vs
    the blocked candidate set, reported as Christen's standard blocking
    metrics ("Data Matching", 2012, ch. 7):

    - **pair_completeness** = |blocked ∩ truth| / |truth| — the
      fraction of genuinely-matching pairs the blocking keys (and the
      ``max_block`` cap) still surface. The production recall bound:
      linkage can never find a pair blocking never generated;
    - **reduction_ratio** = 1 − n_candidates / n_probe_pairs — how much
      of the quadratic comparison space blocking eliminated (the whole
      point of blocking; ~1.0 is good, ~0 means the keys don't block).

    Plus the cap accounting the pipeline itself keeps silent: on the
    FULL records relation, ``n_capped_blocks`` / ``n_overcap_members``
    count the blocks truncated by ``max_block`` and the members dropped
    from candidacy entirely (summed over blocking specs) — the number
    that says whether a hot block (a NULL-ish zip, a mega-city) is
    silently losing entities at production scale.

    Scale shape: the truth pass is an all-pairs self-join **of the
    probe only** — pass a bounded ``probe_records`` (e.g. a
    ``mixing.group_sample`` of a few thousand records); the gate never
    all-pairs the corpus. The cap accounting is one map-combined
    groupBy per spec over the full relation. Everything is exact
    integers plus single divisions — engine-portable.

    Returns ONE row: (n_records, n_probe, n_probe_pairs, n_exact,
    n_candidates, n_hit, pair_completeness, reduction_ratio,
    n_capped_blocks, n_overcap_members). pair_completeness is NULL when
    the probe holds no qualifying pair; reduction_ratio NULL when the
    probe has < 2 records.
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
    probe = probe_records if probe_records is not None else records
    payload = probe.select(F.col(id_col), *[F.col(f) for f in fields])
    # exact truth: ALL-PAIRS within the bounded probe, scored with the
    # SAME expressions the pipeline uses (_field_scores — no drift)
    from deeptime_spark.operators.layout import spread_for_map_parallelism

    # the nested-loop all-pairs parallelizes by LEFT-side partition: a
    # single-row-group probe scan would run |probe|^2 levenshtein
    # scorings as ONE task (r12 profile: the truth job sat on 2 of 32
    # cores for 10 s). Spread the left side across cores — no-op at
    # scale, where the scan already has enough splits (guide §2.5/§2.6).
    pa = spread_for_map_parallelism(
        payload.select(
            F.col(id_col).alias("id_a"),
            *[F.col(f).alias(f"_a_{f}") for f in fields],
        ),
        "id_a",
    )
    pb = payload.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f).alias(f"_b_{f}") for f in fields],
    )
    allp = pa.crossJoin(pb).where(F.col("id_a") < F.col("id_b"))
    # implied exact-equality pre-filter: drops only pairs the threshold
    # filter rejects, and because it is an EQUALITY conjunct Catalyst can
    # extract it into the join condition — the all-pairs nested loop
    # becomes an equi-join wherever one qualifies (guide §3)
    pref = _implied_exact_prefilter(
        string_fields, exact_fields, wmap, wsum, threshold, "_a_", "_b_"
    )
    if pref is not None:
        allp = allp.where(pref)
    _, score = _field_scores(
        string_fields, exact_fields, wmap, wsum, "_a_", "_b_"
    )
    truth = (
        allp.withColumn("_s", score)
        .where(F.col("_s") >= F.lit(float(threshold)))
        .select("id_a", "id_b")
    )
    cands = blocked_candidates(probe, id_col, block_keys, max_block)
    # ONE action for EVERY count the gate reports: both pair relations
    # are distinct on (id_a, id_b), so a full-outer join fans nothing
    # out and a single aggregate reads |truth|, |candidates| and |hit|
    # off marker columns; the probe count, the full-relation count and
    # the cap accounting are independent one-row aggregates crossJoined
    # onto it (1-row broadcast nested loops), so the whole gate is one
    # collect instead of four first()/count() jobs (guide §1.2: fewer
    # passes AND fewer actions — each action re-pays scheduling +
    # planning latency).
    row = (
        truth.withColumn("_t", F.lit(1))
        .join(cands.withColumn("_c", F.lit(1)), ["id_a", "id_b"], "full_outer")
        .agg(
            F.count("_t").alias("_ne"),
            F.count("_c").alias("_nc"),
            F.count(
                F.when(F.col("_t").isNotNull() & F.col("_c").isNotNull(), 1)
            ).alias("_nh"),
        )
        .crossJoin(payload.agg(F.count(F.lit(1)).alias("_np")))
        .crossJoin(records.agg(F.count(F.lit(1)).alias("_nr")))
        .crossJoin(_cap_accounting_df(records, block_keys, max_block))
        .first()
    )
    n_exact, n_cand, n_hit = int(row["_ne"]), int(row["_nc"]), int(row["_nh"])
    n_probe = int(row["_np"])
    n_pairs = n_probe * (n_probe - 1) // 2
    n_records = int(row["_nr"])
    n_capped_blocks, n_overcap = int(row["_cb"] or 0), int(row["_om"] or 0)
    pc = None if n_exact == 0 else float(n_hit) / float(n_exact)
    rr = None if n_pairs == 0 else 1.0 - float(n_cand) / float(n_pairs)
    spark = records.sparkSession
    return _local_df(spark, 
        [
            (
                int(n_records),
                int(n_probe),
                int(n_pairs),
                int(n_exact),
                int(n_cand),
                int(n_hit),
                pc,
                rr,
                int(n_capped_blocks),
                int(n_overcap),
            )
        ],
        "n_records long, n_probe long, n_probe_pairs long, n_exact long, "
        "n_candidates long, n_hit long, pair_completeness double, "
        "reduction_ratio double, n_capped_blocks long, n_overcap_members long",
    )

def _cap_accounting_df(
    records: DataFrame, block_keys: list, max_block: int | None
) -> DataFrame:
    """LAZY one-row (_cb, _om) frame: capped-block / over-cap-member
    counts over the FULL relation, summed across blocking specs — the
    same map-combined block-size groupBy per spec as always, but as a
    composable plan so gate/advisor fold it into ONE collect instead of
    one ``first()`` job per spec (guide §1.2: fewer passes/actions).
    Shared by the gate and the advisor so the cap-loss arithmetic can
    never drift."""
    spark = records.sparkSession
    if max_block is None:
        return _local_df(spark, [(0, 0)], "_cb long, _om long")
    cap = int(max_block)
    per_spec = []
    for spec in block_keys:
        cols = [spec] if isinstance(spec, str) else list(spec)
        blk = records.select(
            *[F.col(c).alias(f"_b{i}") for i, c in enumerate(cols)]
        )
        for i in range(len(cols)):
            blk = blk.where(F.col(f"_b{i}").isNotNull())
        sizes = blk.groupBy(
            *[F.col(f"_b{i}") for i in range(len(cols))]
        ).agg(F.count(F.lit(1)).alias("_n"))
        per_spec.append(
            sizes.agg(
                F.coalesce(
                    F.sum(F.when(F.col("_n") > cap, 1).otherwise(0)), F.lit(0)
                ).alias("_cb"),
                F.coalesce(
                    F.sum(F.greatest(F.col("_n") - cap, F.lit(0))), F.lit(0)
                ).alias("_om"),
            )
        )
    out = per_spec[0]
    for p in per_spec[1:]:
        out = out.unionByName(p)
    if len(per_spec) > 1:
        out = out.agg(
            F.sum("_cb").alias("_cb"), F.sum("_om").alias("_om")
        )
    return out




def blocking_spec_label(block_keys: list) -> str:
    """Deterministic display name for a blocking configuration:
    multi-column specs join with '+', unioned specs with '|'
    (e.g. [["nk", "seg"], "zip"] -> 'nk+seg|zip')."""
    parts = []
    for spec in block_keys:
        cols = [spec] if isinstance(spec, str) else list(spec)
        parts.append("+".join(cols))
    return "|".join(parts)


def blocking_key_advisor(
    records: DataFrame,
    id_col: str,
    candidate_specs: list,
    string_fields: list | None = None,
    exact_fields: list | None = None,
    weights: dict | None = None,
    threshold: float = 0.8,
    max_block: int | None = DEFAULT_MAX_BLOCK,
    probe_records: DataFrame | None = None,
) -> DataFrame:
    """Blocking-key ADVISOR — the measure-then-dispatch pattern of
    dedup.autotune_near_dedup applied to Christen blocking: given a
    list of candidate blocking configurations (each in
    :func:`blocked_candidates` ``block_keys`` form), evaluate every
    candidate against the SAME bounded-probe exact truth that
    :func:`linkage_blocking_gate` uses and report, per candidate, the
    metrics that pick a production blocking key: pair_completeness
    (recall bound), reduction_ratio (comparison-space elimination) and
    the full-relation over-cap loss. The caller dispatches to the spec
    with acceptable completeness and the highest reduction — or reads
    n_overcap_members to see that the remedy for a hot block is a finer
    key, not a bigger cap.

    Scale shape: the exact truth is ONE all-pairs self-join of the
    BOUNDED probe, computed once and shared across all candidates
    (never re-scored per spec, never over the corpus); per candidate
    the cost is one probe-sized blocked-candidate join plus the
    map-combined full-relation cap accounting — advisor cost is
    O(|probe|^2 + n_specs * |records|), independent of corpus pair
    count.

    Returns one row per candidate, in input order: (spec, n_probe,
    n_exact, n_candidates, n_hit, pair_completeness, reduction_ratio,
    n_capped_blocks, n_overcap_members). Ratio NULL semantics match
    the gate.
    """
    string_fields = list(string_fields or [])
    exact_fields = list(exact_fields or [])
    fields = string_fields + exact_fields
    if not fields:
        raise ValueError("need at least one compared field")
    if not candidate_specs:
        raise ValueError("candidate_specs must be non-empty")
    for bk in candidate_specs:
        if not bk:
            raise ValueError("every candidate spec must be non-empty")
    wmap = {f: float((weights or {}).get(f, 1.0)) for f in fields}
    wsum = sum(wmap.values())
    if wsum <= 0:
        raise ValueError("weights must sum positive")
    probe = probe_records if probe_records is not None else records
    payload = probe.select(F.col(id_col), *[F.col(f) for f in fields])
    from deeptime_spark.operators.layout import spread_for_map_parallelism

    # spread the all-pairs left side across cores (see the gate: the
    # nested-loop truth pass otherwise serializes on the scan's split
    # count — no-op at scale)
    pa = spread_for_map_parallelism(
        payload.select(
            F.col(id_col).alias("id_a"),
            *[F.col(f).alias(f"_a_{f}") for f in fields],
        ),
        "id_a",
    )
    pb = payload.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f).alias(f"_b_{f}") for f in fields],
    )
    allp = pa.crossJoin(pb).where(F.col("id_a") < F.col("id_b"))
    # same implied pre-filter as the gate's truth pass (see there)
    pref = _implied_exact_prefilter(
        string_fields, exact_fields, wmap, wsum, threshold, "_a_", "_b_"
    )
    if pref is not None:
        allp = allp.where(pref)
    _, score = _field_scores(
        string_fields, exact_fields, wmap, wsum, "_a_", "_b_"
    )
    truth = (
        allp.withColumn("_s", score)
        .where(F.col("_s") >= F.lit(float(threshold)))
        .select("id_a", "id_b")
        .persist()
    )
    try:
        n_probe = payload.count()
        # materialize the persisted truth BEFORE the per-spec branches
        # consume it: the single multi-spec action below schedules every
        # branch concurrently, and a not-yet-cached persist would race
        # (branches recomputing the all-pairs pass until blocks land)
        n_exact = truth.count()
        n_pairs = n_probe * (n_probe - 1) // 2

        def one_spec(bk) -> tuple:
            bk = [bk] if isinstance(bk, str) else list(bk)
            # ONE action per candidate spec: the gate's full-outer count
            # merge (n_candidates + n_hit in one aggregate) crossJoined
            # with the spec's one-row cap accounting — the r12 shape ran
            # the cap accounting as a SECOND first() per spec. (A single
            # all-spec union collect was TRIED and measured SLOWER —
            # 3.86 vs 2.77 warm: AQE walks one job's stage ladder more
            # serially than four concurrent queries overlap.)
            cands = blocked_candidates(probe, id_col, bk, max_block)
            crow = (
                truth.withColumn("_t", F.lit(1))
                .join(
                    cands.withColumn("_c", F.lit(1)),
                    ["id_a", "id_b"],
                    "full_outer",
                )
                .agg(
                    F.count("_c").alias("_nc"),
                    F.count(
                        F.when(
                            F.col("_t").isNotNull() & F.col("_c").isNotNull(),
                            1,
                        )
                    ).alias("_nh"),
                )
                .crossJoin(_cap_accounting_df(records, bk, max_block))
                .first()
            )
            n_cand, n_hit = int(crow["_nc"]), int(crow["_nh"])
            pc = None if n_exact == 0 else float(n_hit) / float(n_exact)
            rr = None if n_pairs == 0 else 1.0 - float(n_cand) / float(n_pairs)
            return (
                blocking_spec_label(bk),
                int(n_probe),
                int(n_exact),
                int(n_cand),
                int(n_hit),
                pc,
                rr,
                int(crow["_cb"] or 0),
                int(crow["_om"] or 0),
            )

        # the per-spec evaluations are independent short jobs against the
        # shared persisted truth — submit them from a small thread pool so
        # each job's scheduling tail back-fills the others (guide §2.6);
        # pool.map preserves input order, and results are ints/floats, so
        # the report is identical to the sequential loop
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(
            max_workers=min(4, len(candidate_specs))
        ) as pool:
            rows = list(pool.map(one_spec, candidate_specs))
    finally:
        truth.unpersist(blocking=False)
    spark = records.sparkSession
    return _local_df(spark, 
        rows,
        "spec string, n_probe long, n_exact long, n_candidates long, "
        "n_hit long, pair_completeness double, reduction_ratio double, "
        "n_capped_blocks long, n_overcap_members long",
    )
