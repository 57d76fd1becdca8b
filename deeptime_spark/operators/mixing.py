"""Data-mixing operators: deterministic sampling and domain reweighting.

The last stage of a training-data pipeline: given per-domain token
budgets (target mixture weights), compute per-domain sampling rates and
materialize a reproducible sample. Everything is content-addressed
(xxhash64 of the row key) — a row's keep/drop decision depends only on
its key, never on partitioning, cluster layout, or row order, so the
same sample falls out on any engine, any layout, any day. That property
is what makes 100 TB sampling auditable: re-running the pipeline
reproduces the sample bit-for-bit, and an engine-independent replica
(deeptime_spark.spark_hashes.xxhash64) can verify membership offline.

All hot-path logic is JVM codegen (hash + compare); no Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def deterministic_keep(key: Column, rate_ppm: Column | int, salt: int = 0) -> Column:
    """Content-addressed Bernoulli(rate_ppm / 1e6): keep iff
    pmod(xxhash64(key, salt-tag), 1e6) < rate_ppm. The salt lets
    independent sampling decisions reuse one key (e.g. train/holdout
    splits that must not correlate)."""
    tagged = F.concat(key.cast("string"), F.lit(f"#{salt}")) if salt else key.cast("string")
    h = F.pmod(F.xxhash64(tagged), F.lit(PPM))
    rate = F.lit(rate_ppm) if isinstance(rate_ppm, int) else rate_ppm
    # NULL keys hash as the constant seed (42), which would keep EVERY
    # null-keyed row at any rate above 42 ppm — exactly the malformed
    # rows a pipeline most wants down-weighted. Nulls never pass.
    return key.isNotNull() & (h < rate)


def sample_deterministic(
    df: DataFrame, rate_ppm: int, key_col: str = "doc_id", salt: int = 0
) -> DataFrame:
    """Uniform deterministic sample at rate_ppm parts-per-million."""
    return df.where(deterministic_keep(F.col(key_col), rate_ppm, salt))


def domain_mixture(
    docs: DataFrame,
    target_weights: dict[str, float],
    text_col: str = "text",
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain mixture accounting: observed token share vs the target
    mixture, and the per-domain DOWN-sampling rate that realizes the
    target (DoReMi/The Pile-style domain reweighting, applied as
    subsampling: rate_d = min(1, target_d · S / tokens_d) where S is the
    largest total budget no domain can exceed, S = min_d tokens_d /
    target_d over target_d > 0).

    One aggregation pass + window totals — no driver math, plain SQL
    semantics, so a SQL oracle replicates it exactly. Token counts are
    whitespace tokens (operators.text.token_count) — exact integers.
    """
    from pyspark.sql import Window

    from deeptime_spark.operators.text import token_count

    if target_weights:
        w = F.create_map(*[F.lit(x) for kv in target_weights.items() for x in kv])
        target = F.coalesce(w[F.col(strata_col)], F.lit(0.0))
    else:  # empty map literal types as map<void,void> — avoid it
        target = F.lit(0.0)
    per = (
        docs.groupBy(strata_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(text_col)).alias("n_tokens"),
        )
        .withColumn("target_share", target)
    )
    everything = Window.partitionBy()
    total = F.sum("n_tokens").over(everything)
    return per.select(
        strata_col,
        "n_docs",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (F.col("n_tokens") / total).alias("observed_share"),
        "target_share",
        _realizing_rate(F.col("target_share"), F.col("n_tokens")).alias(
            "sampling_rate"
        ),
    )


def _realizing_rate(target: Column, n_tokens: Column) -> Column:
    """The largest-feasible-budget down-sampling rate shared by
    :func:`domain_mixture` and :func:`temperature_mixture`:
    ``rate_d = min(1, target_d · S / tokens_d)`` with
    ``S = min over positive-target domains of tokens_e / target_e``.
    ``target`` may be any per-domain weight column — the common scale
    cancels, so unnormalized weights give the same rate. coalesce runs
    BEFORE least: with no positive-target domain S is NULL, and
    least() skips NULLs — the rate must clamp to 0.0, not silently
    pass everything."""
    from pyspark.sql import Window

    everything = Window.partitionBy()
    s_budget = F.min(F.when(target > 0, n_tokens / target)).over(everything)
    return F.least(
        F.lit(1.0),
        F.coalesce(
            F.when(n_tokens > 0, target * s_budget / n_tokens),
            F.lit(0.0),
        ),
    )


def stratified_sample(
    docs: DataFrame,
    rates_ppm: dict[str, int],
    strata_col: str = "source",
    key_col: str = "doc_id",
    salt: int = 0,
    default_ppm: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum s keeps rows at
    rates_ppm[s] parts-per-million (strata absent from the dict keep at
    ``default_ppm``). The rate rides a literal map lookup — one codegen
    predicate, no join, no shuffle; combined with ``domain_mixture`` this
    materializes a target token mixture reproducibly at any scale."""
    if rates_ppm:
        m = F.create_map(*[F.lit(x) for kv in rates_ppm.items() for x in kv])
        rate = F.coalesce(m[F.col(strata_col)], F.lit(default_ppm))
    else:
        rate = F.lit(default_ppm)
    return docs.where(deterministic_keep(F.col(key_col), rate, salt))


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    train_pct: int = 90,
    val_pct: int = 5,
    seed: int = 0,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Deterministic train/val/test assignment that can NOT leak across
    near-duplicate clusters: every document is assigned by hashing its
    duplicate-cluster REPRESENTATIVE (the component minimum from the
    verified near-dup pair graph; singleton docs represent themselves),
    so all members of a cluster land in the same split by construction —
    the standard guard against eval contamination by paraphrase/clone
    (pairs come from any of the dedup family's verified-pair pipelines).

    Content-addressed like the rest of the mixing surface: the split is
    a pure function of (cluster rep, seed) via xxhash64 — layout- and
    rerun-independent, offline-auditable in any engine with the hash
    replica. Returns ``docs`` + ``(cluster_rep, split)``.
    """
    from deeptime_spark.operators.dedup import connected_components

    if not (0 < train_pct and 0 <= val_pct and train_pct + val_pct <= 100):
        raise ValueError("invalid split percentages")
    cc = connected_components(pairs, id_a, id_b).select(
        F.col("node").alias(id_col), F.col("component").alias("cluster_rep")
    )
    rep = F.coalesce(F.col("cluster_rep"), F.col(id_col))
    bucket = F.pmod(
        F.xxhash64(
            F.concat(rep.cast("string"), F.lit(":"), F.lit(str(seed)))
        ),
        F.lit(100),
    )
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.join(cc, id_col, "left").withColumn(
        "cluster_rep", rep
    ).withColumn("split", split)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    target_ppm: int,
    key_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Deterministic IMPORTANCE sampling: each row keeps with
    probability proportional to its weight, scaled so the expected kept
    fraction is ``target_ppm`` parts-per-million — the
    quality/length-weighted corpus subsetting step of a data-mixture
    pipeline (e.g. sample documents proportional to token count to hit
    a token budget, or proportional to a quality score).

    One agg action computes the mean weight; the per-row keep rate
    ``min(1e6, weight · target_ppm / mean_w)`` then rides as a single
    codegen multiply against the same content-addressed hash as
    :func:`deterministic_keep` — layout/partitioning-independent and
    exactly replayable (the scale constant is ONE driver-computed
    double literal). Rows whose weight exceeds ``mean_w · 1e6 /
    target_ppm`` cap at probability 1, so the realized fraction
    undershoots on heavy-tailed weights; callers needing the exact
    budget re-normalize on the survivors. Null keys and
    null/non-positive weights never pass.
    """
    if not 0 < target_ppm <= PPM:
        raise ValueError(f"target_ppm must be in (0, {PPM}], got {target_ppm}")
    g = df.agg(F.avg(F.col(weight_col).cast("double")).alias("m")).first()
    mean_w = float(g["m"] or 0.0)
    if not mean_w > 0:
        raise ValueError(f"mean({weight_col}) must be > 0, got {mean_w}")
    scale = float(target_ppm) / mean_w
    rate = F.least(
        F.lit(float(PPM)), F.col(weight_col).cast("double") * F.lit(scale)
    )
    key = F.col(key_col)
    tagged = (
        F.concat(key.cast("string"), F.lit(f"#{salt}")) if salt else key.cast("string")
    )
    h = F.pmod(F.xxhash64(tagged), F.lit(PPM)).cast("double")
    return df.where(
        key.isNotNull()
        & (F.col(weight_col).cast("double") > 0)
        & (h < rate)
    )


def curriculum_buckets(
    df: DataFrame,
    score_col: Column | str,
    n_buckets: int = 10,
    group_cols: list[str] | None = None,
    id_col: str = "doc_id",
    token_col: Column | str | None = None,
    allow_single_partition: bool = False,
) -> DataFrame:
    """Quality-curriculum bucketing: rank documents by a quality score
    within each group and cut the ranking into ``n_buckets`` equal-count
    phases (bucket 1 = highest quality), with per-bucket document/token
    totals and the cumulative token budget a curriculum schedule needs
    ("train phase k on buckets 1..k").

    Deterministic: the ranking orders by (score DESC, id ASC), so ties
    never depend on layout; bucket boundaries are ANSI ``ntile``
    (earlier buckets absorb the remainder), identical across engines.

    Spark shape: one window (the irreducible per-group sort — its key
    cardinality is the group count, and ntile needs a total order) into
    one hash aggregate of ``n_buckets * groups`` rows; the cumulative
    sum runs over that tiny aggregate, not the corpus. At 100 TB the
    sort is the only corpus-scale exchange, and Spark runs it as a
    range-partitioned sort within groups — no driver materialization.

    Returns (group_cols..., bucket, n_docs, n_tokens, cum_tokens,
    min_score, max_score).
    """
    from pyspark.sql import Window

    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    group_cols = list(group_cols or [])
    if not group_cols and not allow_single_partition:
        # same contract as stats.cusum_changepoints: an ungrouped ntile
        # is ONE global ordered window — a single task holding the whole
        # corpus at scale
        raise ValueError(
            "curriculum_buckets without group_cols runs the whole corpus "
            "through ONE task (a single global ntile window); pass "
            "group_cols, or allow_single_partition=True for a "
            "driver-sized input"
        )
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    if token_col is None:
        from deeptime_spark.operators.text import token_count

        token_col = token_count("text")
    elif isinstance(token_col, str):
        token_col = F.col(token_col)
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("_score").desc(), F.col(id_col).asc()
    )
    ranked = df.select(
        *group_cols,
        F.col(id_col),
        score.alias("_score"),
        token_col.cast("long").alias("_tok"),
    ).withColumn("bucket", F.ntile(n_buckets).over(w))
    per = ranked.groupBy(*group_cols, "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_tok").alias("n_tokens"),
        F.min("_score").alias("min_score"),
        F.max("_score").alias("max_score"),
    )
    cum = Window.partitionBy(*group_cols).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per.select(
        *group_cols,
        F.col("bucket").cast("long").alias("bucket"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.sum("n_tokens").over(cum).cast("long").alias("cum_tokens"),
        "min_score",
        "max_score",
    )


def global_shuffle(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    salt: int = 0,
    n_buckets: int = 1024,
) -> DataFrame:
    """Deterministic global corpus shuffle: every row gets a ``shard``
    in ``[0, n_shards)`` and a dense ``pos`` (0-based) within its shard,
    under a content-addressed pseudo-random permutation — the
    "shuffle the corpus once before sharding" step SGD training needs
    so batches are not source-/time-correlated (the published LLM data
    pipelines all shuffle document order exactly once, globally, before
    cutting loader shards).

    Content-addressed like everything in this module: shard and order
    derive from ``xxhash64`` of the row key under two salt tags, never
    from layout, so reruns reproduce the permutation bit-for-bit and an
    offline replica (spark_hashes.xxhash64) can audit any row's
    placement. ``key_col`` must be unique per row (duplicate keys get
    adjacent but arbitrarily-ordered positions).

    Spark shape — the part that matters at 100 TB: a naive
    ``row_number() OVER (PARTITION BY shard ORDER BY h)`` funnels the
    whole corpus through ``n_shards`` tasks (loader shard counts are
    small — 8..1024). Instead the permutation runs as the classic
    two-level prefix-sum: rows hash into ``n_shards x n_buckets``
    sub-buckets, ONE tiny aggregate (n_shards*n_buckets rows) computes
    exclusive per-bucket offsets via a window over that aggregate —
    never over the corpus — and the per-row rank is a window over
    (shard, bucket): parallelism ``n_shards * n_buckets``, uniform by
    construction (hash keys), one corpus-scale exchange total.

    Returns the input columns plus (shard int, pos long).
    """
    from pyspark.sql import Window

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    key = F.coalesce(F.col(key_col).cast("string"), F.lit("\x00null"))
    h = F.xxhash64(F.concat(key, F.lit(f"#shuffle{salt}")))
    b = F.pmod(
        F.xxhash64(F.concat(key, F.lit(f"#bucket{salt}"))), F.lit(n_buckets)
    ).cast("int")
    tagged = df.withColumn("_h", h).withColumn(
        "_shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("int")
    ).withColumn("_bucket", b)
    # exclusive prefix offsets over the TINY (shard, bucket) count
    # aggregate; the window below runs over n_shards*n_buckets rows
    counts = tagged.groupBy("_shard", "_bucket").agg(
        F.count(F.lit(1)).alias("_n")
    )
    off_w = (
        Window.partitionBy("_shard")
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = counts.select(
        "_shard",
        "_bucket",
        (F.sum("_n").over(off_w) - F.col("_n")).alias("_off"),
    )
    rank_w = Window.partitionBy("_shard", "_bucket").orderBy(
        F.col("_h").asc(), F.col(key_col).asc()
    )
    return (
        tagged.join(F.broadcast(offsets), ["_shard", "_bucket"])
        .withColumn(
            "pos",
            (F.col("_off") + F.row_number().over(rank_w) - F.lit(1)).cast(
                "long"
            ),
        )
        .withColumnRenamed("_shard", "shard")
        .drop("_h", "_bucket", "_off")
    )


def temperature_mixture(
    docs: DataFrame,
    temperature: float = 2.0,
    text_col: str = "text",
    strata_col: str = "source",
) -> DataFrame:
    """Temperature-scaled domain sampling (the multilingual-LM mixing
    rule of mT5 / XLM-R: sample domain d with probability
    ``p_d^(1/T) / Σ_e p_e^(1/T)`` where ``p_d`` is the observed token
    share): T=1 keeps the natural mixture, T→∞ is uniform — the knob
    that up-weights low-resource domains without hand-written targets.

    The scaled shares become the TARGET mixture and the realizing
    per-domain down-sampling rate is derived exactly as in
    :func:`domain_mixture` (largest feasible budget S, then
    ``rate_d = min(1, q_d·S / tokens_d)``).

    One aggregation over the corpus + windows over the per-domain rows
    (domain-count-sized, never corpus-sized) — plain SQL semantics, so
    a SQL oracle replicates it directly. With ``temperature=2`` the
    power is an IEEE-exact ``sqrt``; other temperatures are subject to
    cross-engine ``pow`` ULP differences (round outputs before hashing).

    Returns (strata_col, n_docs, n_tokens, observed_share,
    target_share, sampling_rate).
    """
    from pyspark.sql import Window

    from deeptime_spark.operators.text import token_count

    if not temperature > 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    per = docs.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text_col)).alias("n_tokens"),
    )
    everything = Window.partitionBy()
    total = F.sum("n_tokens").over(everything)
    share = F.col("n_tokens") / total
    if temperature == 2.0:
        scaled = F.sqrt(share)
    else:
        scaled = F.pow(share, F.lit(1.0 / float(temperature)))
    with_scaled = per.withColumn("_scaled", scaled)
    z = F.sum("_scaled").over(everything)
    # _realizing_rate is scale-invariant in its target column, so the
    # UNNORMALIZED p^(1/T) feeds it directly — the normalizer z cancels
    # and the rate stays bit-exact across engines (a window SUM of
    # doubles is association-order-sensitive; MIN is not). Only the
    # reported target_share carries the z rounding.
    return with_scaled.select(
        strata_col,
        "n_docs",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (F.col("n_tokens") / total).alias("observed_share"),
        (F.col("_scaled") / z).alias("target_share"),
        _realizing_rate(F.col("_scaled"), F.col("n_tokens")).alias(
            "sampling_rate"
        ),
    )


def group_sample(
    df: DataFrame,
    n_per_group: int,
    group_cols: list[str],
    key_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Deterministic per-group sample: the ``n_per_group`` rows with the
    smallest content-addressed hash in every group — the "show me 50
    docs from each (source, lang) cell" primitive behind eyeball
    audits, labeling exports, and per-stratum debugging. Unlike
    ``TABLESAMPLE``/``rand()``, membership is a pure function of
    (key, salt): reruns, engines, and layouts agree row-for-row, and
    enlarging ``n_per_group`` only ADDS rows (nested samples — the
    bottom-k property the KMV sketch shares). ``key_col`` must be
    UNIQUE per group for the row-for-row guarantee — duplicate keys
    (and multiple NULL keys, which share one sentinel) tie on the sort
    key and the winner among them is layout-dependent.

    One window ranked by (hash, key) per group — the group count is the
    parallelism, and the per-task state is the top-k heap, not the
    group. Returns the input rows plus ``sample_rank`` (1-based).
    """
    from pyspark.sql import Window

    if n_per_group < 1:
        raise ValueError(f"n_per_group must be >= 1, got {n_per_group}")
    if not group_cols:
        raise ValueError("group_cols must be non-empty (a global sample "
                         "is one window task — use sample_deterministic)")
    key = F.coalesce(F.col(key_col).cast("string"), F.lit("\x00null"))
    h = F.xxhash64(F.concat(key, F.lit(f"#gsample{salt}")))
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n_per_group)
        .withColumn("sample_rank", F.col("sample_rank").cast("long"))
    )
