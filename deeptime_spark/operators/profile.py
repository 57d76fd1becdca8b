"""Dataset profiling: the per-column summary a data card / ingestion
audit needs, computed in one pass per table.

``profile_table`` emits one tidy row per column — row count, null count,
exact distinct count, min/max (rendered as strings so the relation is
uniform), and average string length — the numbers a 100 TB ingestion job
publishes next to its manifest so downstream consumers can sanity-check
a drop before training on it.

Spark shape: ONE wide aggregate over the table (every per-column
statistic is a codegen aggregate expression in the same pass — no
per-column scans), plus one exact ``count_distinct`` per column in the
same aggregate (Spark rewrites multiple distinct aggregates with
`expand`, still a single scan).  The wide single-row result is then
unpivoted driver-side into the tidy per-column relation (a ~n_columns
transpose of scalars, not data).  For cardinality at the
trillions-of-rows scale, swap the exact distinct for the HLL sketch in
operators/sketches.py — same relation shape, bounded state.
"""

from __future__ import annotations

from deeptime_spark.local_relation import local_df as _local_df
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "profile_table",
    "snapshot_diff",
    "scalar_violation_flag",
    "constraint_audit",
    "skew_profile",
    "k_anonymity_audit",
]


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One tidy row per column:
    ``(column, n_rows, n_null, n_distinct, min_value, max_value,
    avg_len_x100)``.

    ``min_value`` / ``max_value`` are the column's own min/max cast to
    string AFTER the aggregation (so numeric columns compare
    numerically, not lexically).  ``avg_len_x100`` is the average
    rendered-string length scaled to an exact integer
    (``sum(length)*100 div count``) — division-free determinism for the
    oracle gate.  NULL-only columns yield NULL min/max and 0 length.
    """
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        col = F.col(f"`{c}`")
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"_null_{c}"),
            F.count_distinct(col).alias(f"_dist_{c}"),
            F.min(col).cast("string").alias(f"_min_{c}"),
            F.max(col).cast("string").alias(f"_max_{c}"),
            F.sum(F.length(col.cast("string"))).alias(f"_len_{c}"),
        ]
    row = df.agg(*aggs).first()
    n = int(row["_n"])
    out = []
    for c in cols:
        tot_len = row[f"_len_{c}"]
        n_nonnull = n - int(row[f"_null_{c}"])
        out.append(
            (
                c,
                n,
                int(row[f"_null_{c}"]),
                int(row[f"_dist_{c}"]),
                row[f"_min_{c}"],
                row[f"_max_{c}"],
                (int(tot_len) * 100) // n_nonnull if (tot_len is not None and n_nonnull) else 0,
            )
        )
    spark = df.sparkSession
    return _local_df(spark, 
        out,
        "column string, n_rows long, n_null long, n_distinct long, "
        "min_value string, max_value string, avg_len_x100 long",
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_cols: list[str] | None = None,
) -> DataFrame:
    """Audit diff between two corpus snapshots: every id classified as
    ``added`` / ``removed`` / ``changed`` / ``unchanged``.

    Content equality is md5 over the concatenated (NULL-sentineled)
    content columns, so the diff never ships full payloads through the
    join — at 100 TB the shuffle carries (id, 32-byte digest) per side.
    One full-outer join on the id; the status is a codegen CASE.
    Returns ``(id_col, status)``; aggregate downstream for the summary
    a manifest delta publishes.
    """
    content_cols = content_cols or [c for c in old.columns if c != id_col]
    digest = F.md5(
        F.concat_ws(
            "\x1f",
            *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in content_cols],
        )
    )
    o = old.select(F.col(id_col).alias("_id"), digest.alias("_ho"))
    n = new.select(F.col(id_col).alias("_id"), digest.alias("_hn"))
    status = (
        F.when(F.col("_ho").isNull(), F.lit("added"))
        .when(F.col("_hn").isNull(), F.lit("removed"))
        .when(F.col("_ho") == F.col("_hn"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return o.join(n, "_id", "full_outer").select(
        F.col("_id").alias(id_col), status.alias("status")
    )


def scalar_violation_flag(kind: str, params) -> "F.Column":
    """Per-row 0/1 violation flag for the SCALAR constraint kinds —
    the single source of the not_null / range / accepted_values
    semantics shared by the batch audit and its streaming face
    (streaming/accumulate.py:streaming_constraint_totals), so a policy
    change (e.g. NULL handling) can never silently diverge the two."""
    if kind == "not_null":
        return F.when(F.col(params).isNull(), 1).otherwise(0)
    if kind == "range":
        col, lo, hi = params
        return F.when(
            F.col(col).isNotNull()
            & ((F.col(col) < F.lit(lo)) | (F.col(col) > F.lit(hi))),
            1,
        ).otherwise(0)
    if kind == "accepted_values":
        col, values = params
        return F.when(
            F.col(col).isNull() | ~F.col(col).isin(list(values)), 1
        ).otherwise(0)
    raise ValueError(f"unknown constraint kind {kind!r}")


def constraint_audit(
    df: DataFrame,
    constraints: list[tuple],
) -> DataFrame:
    """Declarative data-quality constraint audit — the dbt-test /
    Great-Expectations layer a production ingestion runs before
    publishing a drop: every constraint becomes one row
    (constraint, kind, n_rows, n_violations, pass) with EXACT integer
    counts, so the audit is engine-portable and diffable run-to-run.

    ``constraints`` entries (name, kind, params):

    - ``("o_ok", "not_null", "col")`` — NULL values
    - ``("uniq", "unique", ["col", ...])`` — rows beyond the first per
      key (count - distinct-count; NULL keys participate like values)
    - ``("rng", "range", ("col", lo, hi))`` — values outside [lo, hi]
      (NULLs are not range violations — compose with not_null)
    - ``("vals", "accepted_values", ("col", [v, ...]))`` — values
      outside the list (NULLs violate: an enum column has no NULL)
    - ``("fk", "foreign_key", ("col", parent_df, "parent_col"))`` —
      non-null child keys with no parent row (left-anti)

    Spark shape: all scalar constraints (not_null / range /
    accepted_values) fold into ONE wide conditional aggregate over a
    single table scan; each ``unique`` adds one count-distinct in the
    same pass; each ``foreign_key`` is one broadcast/shuffle left-anti
    count against its parent. At 100 TB that is 1 + n_fk scans, never
    per-constraint passes.
    """
    if not constraints:
        raise ValueError("constraints must be non-empty")
    names_seen = [name for name, _, _ in constraints]
    if len(set(names_seen)) != len(names_seen):
        dups = sorted({n for n in names_seen if names_seen.count(n) > 1})
        raise ValueError(f"duplicate constraint names: {dups}")
    aggs = [F.count(F.lit(1)).alias("_n")]
    fk_jobs = []
    order = []
    for name, kind, params in constraints:
        order.append((name, kind))
        if kind == "unique":
            cols = [params] if isinstance(params, str) else list(params)
            key = F.struct(*[F.col(c) for c in cols])
            aggs.append(
                (F.count(F.lit(1)) - F.count_distinct(key)).alias(f"_v_{name}")
            )
        elif kind == "foreign_key":
            col, parent, parent_col = params
            fk_jobs.append((name, col, parent, parent_col))
        else:
            aggs.append(
                F.sum(scalar_violation_flag(kind, params)).alias(f"_v_{name}")
            )
    row = df.agg(*aggs).first()
    n_rows = int(row["_n"])
    counts = {}
    for name, kind in order:
        if kind != "foreign_key":
            counts[name] = int(row[f"_v_{name}"] or 0)
    for name, col, parent, parent_col in fk_jobs:
        counts[name] = (
            df.where(F.col(col).isNotNull())
            .join(
                parent.select(F.col(parent_col).alias(col)).distinct(),
                col,
                "left_anti",
            )
            .count()
        )
    spark = df.sparkSession
    rows = [
        (name, kind, n_rows, counts[name], counts[name] == 0)
        for name, kind in order
    ]
    return _local_df(spark, 
        rows,
        "constraint string, kind string, n_rows long, "
        "n_violations long, pass boolean",
    )


def skew_profile(
    df: DataFrame,
    key_cols: list[str] | str,
    top_n: int = 10,
) -> DataFrame:
    """Join/aggregation KEY-SKEW diagnostic — the profiling pass a
    100 TB pipeline runs BEFORE keying a shuffle on a column: every
    groupBy/join on a skewed key funnels the heavy key's rows through
    one reducer, and the fix (salting factor, broadcast switch, AQE
    skew-join thresholds) needs the numbers this report carries.

    ONE map-combined aggregate (groupBy(key).count(), lazily persisted
    so both consumers share the single row-scale pass) — the key-count
    relation is key-cardinality-scale, never row-scale — then a bounded
    TakeOrdered for the top-``top_n`` heavy keys with EXACT integer
    global stats riding along:

    - ``share`` = the key's fraction of all rows (its reducer's load);
    - ``skew_ratio`` = count x n_keys / n_rows — how many times the
      mean bucket this key weighs (1.0 = perfectly uniform). A key with
      skew_ratio r needs ~ceil(r) salts to level its reducer, which is
      exactly how the salted two-stage top-k (operators/similarity.py)
      and AQE's skew-join split pick their fan-out.

    All values are exact integers or single divisions of exact integers
    — engine-portable, diffable run-to-run. NULL keys profile like
    values (a NULL-heavy join key is the most common skew bug).

    Returns (rank, key, n_rows_key, n_rows_total, n_keys, share,
    skew_ratio), rank 1 = heaviest; ``key`` is the string render of the
    key tuple (NULL -> 'NULL', multi-col joined with '|'; literal '\\'
    and '|' inside a value are escaped as '\\\\' and '\\|' so distinct
    key tuples can never collide in the render).

    The result is MATERIALIZED before return (localCheckpoint) — it is
    top_n rows, never data-scale — so the row-scale key-count relation
    this pass persists can be unpersisted before the caller sees the
    DataFrame; repeated profiling calls in a long-lived driver leak no
    cached relations.
    """
    cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not cols or top_n < 1:
        raise ValueError("need >=1 key column and top_n >= 1")

    def _render(c: str) -> "F.Column":
        # escape the join character so ("a|b","c") and ("a","b|c")
        # render differently; NULL renders as the bare token 'NULL'
        s = F.col(c).cast("string")
        s = F.replace(s, F.lit("\\"), F.lit("\\\\"))
        s = F.replace(s, F.lit("|"), F.lit("\\|"))
        return F.coalesce(s, F.lit("NULL"))

    key = F.concat_ws("|", *[_render(c) for c in cols])
    # the key-count relation feeds TWO consumers (totals + the
    # TakeOrdered) — persist so the row-scale scan+groupBy runs once;
    # the bounded result below is materialized eagerly so the cache is
    # released before return
    counts = (
        df.select(key.alias("_key"))
        .groupBy("_key")
        .agg(F.count(F.lit(1)).alias("_n"))
        .persist()
    )
    from pyspark.sql import Window

    totals = counts.agg(
        F.sum("_n").alias("_total"), F.count(F.lit(1)).alias("_keys")
    )
    # distributed TakeOrdered heap FIRST (orderBy+limit), THEN the rank
    # window over the top_n-row result — a bare global row_number window
    # would funnel the whole key-cardinality relation through one task
    top = counts.orderBy(F.col("_n").desc(), F.col("_key")).limit(int(top_n))
    w = Window.orderBy(F.col("_n").desc(), F.col("_key"))
    top = top.withColumn("rank", F.row_number().over(w))
    result = (
        top.crossJoin(F.broadcast(totals))
        .select(
            F.col("rank").cast("long").alias("rank"),
            F.col("_key").alias("key"),
            F.col("_n").cast("long").alias("n_rows_key"),
            F.col("_total").cast("long").alias("n_rows_total"),
            F.col("_keys").cast("long").alias("n_keys"),
            (F.col("_n").cast("double") / F.col("_total").cast("double")).alias(
                "share"
            ),
            (
                (F.col("_n") * F.col("_keys")).cast("double")
                / F.col("_total").cast("double")
            ).alias("skew_ratio"),
        )
    )
    # top_n rows — materialize now so the row-scale cache can go
    result = result.localCheckpoint(eager=True)
    counts.unpersist()
    return result


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
) -> DataFrame:
    """Re-identification-risk audit (Sweeney, IJUFKS 2002: k-anonymity;
    Machanavajjhala et al., ICDE 2006: l-diversity) — the governance
    pass a training-data pipeline runs BEFORE publishing a dataset
    containing quasi-identifiers: every equivalence class over
    ``quasi_cols`` smaller than ``k`` is a re-identification risk, and
    (with ``sensitive_col``) a class whose sensitive values are not
    diverse leaks the attribute even at size >= k.

    Spark shape: ONE map-combined groupBy over the quasi columns
    (class-cardinality-scale, never row-scale — the skew_profile
    pattern) carrying the class size and, when asked, the exact
    distinct-sensitive count per class; then one bounded aggregate over
    the class relation. NULL quasi values form their own class (NULLs
    are a linkable value for re-identification purposes — groupBy
    keeps them). All outputs are exact integers.

    Returns ONE row: (n_rows, n_classes, min_class_size,
    n_risky_classes, n_risky_rows, k_anonymity, min_l_diversity) —
    ``k_anonymity`` is the dataset's actual k (the minimum class
    size); ``n_risky_*`` count classes/rows below the requested ``k``;
    ``min_l_diversity`` is the smallest per-class distinct-sensitive
    count (NULL when no sensitive_col given).
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if int(k) < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    aggs = [F.count(F.lit(1)).alias("_n")]
    if sensitive_col is not None:
        # struct-wrapped so NULL sensitive values count as a value
        aggs.append(
            F.count_distinct(F.struct(F.col(sensitive_col))).alias("_l")
        )
    classes = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(*aggs)
    out_aggs = [
        F.sum("_n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("_n").cast("long").alias("min_class_size"),
        F.sum(F.when(F.col("_n") < int(k), 1).otherwise(0))
        .cast("long")
        .alias("n_risky_classes"),
        F.sum(F.when(F.col("_n") < int(k), F.col("_n")).otherwise(0))
        .cast("long")
        .alias("n_risky_rows"),
        F.min("_n").cast("long").alias("k_anonymity"),
    ]
    if sensitive_col is not None:
        out_aggs.append(F.min("_l").cast("long").alias("min_l_diversity"))
    else:
        out_aggs.append(
            F.lit(None).cast("long").alias("min_l_diversity")
        )
    return classes.agg(*out_aggs)
