"""Full-text retrieval over a document corpus: TF/DF statistics and
BM25 top-k scoring — the "find the docs about X" primitive a corpus
curation pipeline needs for audits, targeted decontamination, and
building eval slices.

Spark shape (designed for a 100 TB corpus):

* ``term_stats`` is ONE tokenize pass (codegen split + explode) feeding
  three hash aggregates with map-side partials; the per-term document
  frequency table is ``O(vocab)``.
* ``bm25_search`` never materializes a score for the whole vocabulary:
  the tf relation is filtered to the query's terms FIRST (an ``isin``
  over a handful of literals — predicate-pushdown-friendly), pivoted to
  one column per query term, and scored in a single codegen expression.
  The final top-k is ``orderBy().limit(k)`` = TakeOrdered, never a
  global sort.
* Determinism for the oracle gate: the only transcendental (the idf
  ``log``) is computed on the DRIVER over the ≤ |query| collected
  df rows and enters the plan as double literals; everything distributed
  is +, *, / over exact inputs, and the per-doc score sums the terms in
  sorted-term order inside one expression — bit-exact across engines.

The reference has no retrieval surface; this extends the LLM-corpus
layer (operators/text.py, dedup.py) the same way the sketch module does.
"""

from __future__ import annotations

import math
import re as _re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["tokenize_counts", "term_stats", "bm25_search", "sparse_cosine_pairs", "rrf_fuse", "hybrid_search"]

_WS = _re.compile(r"[ \t\n\x0b\f\r]+")


def _norm_tokens_py(text: str) -> list[str]:
    """Driver-side mirror of the token pipeline below (trim/lower,
    collapse whitespace, drop empties)."""
    n = _WS.sub(" ", (text or "").lower().strip(" "))
    return [t for t in n.split(" ") if t]


def tokenize_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-(doc, term) frequency relation ``(id_col, term, tf)`` from one
    codegen normalize/split/explode pass + one hash aggregate."""
    norm = F.regexp_replace(
        F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+", " "
    )
    toks = docs.select(
        F.col(id_col), F.explode(F.split(norm, " ")).alias("term")
    ).where(F.col("term") != "")
    return toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))


def term_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(tf, doc_len, doc_freq): the three relations BM25 needs.
    ``doc_len`` is ``(id, dl)``; ``doc_freq`` is ``(term, df)`` —
    O(vocab) rows, the table an index would persist."""
    tf = tokenize_counts(docs, text_col, id_col)
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return tf, dl, dfreq


def bm25_search(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k: ``(id_col, score, n_matched)`` for the ``k``
    best-scoring documents (ties broken by ascending id, so the result
    is total-ordered and layout-independent).

    ``score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``
    with ``idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))`` (the
    Robertson–Sparck-Jones form used by Lucene).

    CACHE LIFECYCLE IS THE CALLER'S (the verify_candidates_jaccard
    convention): the per-doc stats relation is lazily ``persist()``-ed —
    one stats action reads avgdl/N/df off it and the returned scoring
    plan references it — and it stays cached until the caller clears it
    (``spark.catalog.clearCache()``, as the bench/correctness harnesses
    do between queries) or block-manager LRU evicts it. Callers issuing
    many searches in one session should clear between searches.
    """
    terms = sorted(set(_norm_tokens_py(query)))
    if not terms:
        raise ValueError("query has no terms after normalization")
    # per-term columns are positional aliases _t0.._tn (sorted-term
    # order), so arbitrary query tokens (backticks, dots, 'dl') can never
    # break column resolution; only a pathological id_col can collide
    alias = {t: f"_t{i}" for i, t in enumerate(terms)}
    if id_col in set(alias.values()) | {"dl"}:
        raise ValueError(f"id_col {id_col!r} collides with internal column names")
    # ONE tokenize pass: the per-doc relation carries dl (token count)
    # and the query-term tf columns as conditional sums of the SAME
    # exploded rows term_stats would aggregate — identical integers, so
    # every downstream double is unchanged.  The r12-pre shape ran THREE
    # full tokenize passes (avgdl scalar off dl, df collect off dfreq,
    # tf-pivot + dl join), each a separate explode + hash aggregate of
    # the whole corpus (guide §1.2: remove passes before tuning them).
    # spread_for_map_parallelism widens the explode off the scan's split
    # count (single-row-group parquet at bench scale -> 1 task; no-op on
    # a many-split corpus).
    from deeptime_spark.operators.layout import spread_for_map_parallelism

    spread = spread_for_map_parallelism(docs, id_col)
    norm = F.regexp_replace(
        F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+", " "
    )
    toks = spread.select(
        F.col(id_col), F.explode(F.split(norm, " ")).alias("term")
    ).where(F.col("term") != "")
    per_doc = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum((F.col("term") == F.lit(t)).cast("long")).alias(alias[t])
            for t in terms
        ],
    )
    # lazy persist: the stats action below and the returned scoring plan
    # both consume per_doc; without it the tokenize pass re-executes
    per_doc = per_doc.persist()

    # global stats: one tiny agg action — n_docs, total dl, and every
    # per-term df (count of docs containing the term) in a single row
    g = per_doc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("total"),
        *[
            F.sum((F.col(alias[t]) > 0).cast("long")).alias(f"_df{i}")
            for i, t in enumerate(terms)
        ],
    ).first()
    n_docs, total = int(g["n"]), int(g["total"] or 0)
    if n_docs == 0:
        raise ValueError("empty corpus")
    avgdl = total / float(n_docs)
    df_map = {t: int(g[f"_df{i}"] or 0) for i, t in enumerate(terms)}
    idf = {
        t: math.log(1.0 + (n_docs - df_map.get(t, 0) + 0.5) / (df_map.get(t, 0) + 0.5))
        for t in terms
    }

    # score in ONE expression with the terms in sorted order (fixed fp
    # summation order); only docs matching >= 1 query term are scored —
    # the same set the r12-pre inner pivot produced
    score = F.lit(0.0)
    matched = F.lit(0)
    norm_len = F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / F.lit(avgdl))
    any_hit = F.lit(False)
    for t in terms:
        tf_c = F.coalesce(F.col(alias[t]), F.lit(0)).cast("double")
        score = score + F.lit(idf[t]) * (
            tf_c * F.lit(k1 + 1.0) / (tf_c + F.lit(k1) * norm_len)
        )
        matched = matched + (tf_c > 0).cast("int")
        any_hit = any_hit | (F.col(alias[t]) > 0)
    return (
        per_doc.where(any_hit)
        .select(
            F.col(id_col),
            score.alias("score"),
            matched.cast("long").alias("n_matched"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def sparse_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.9,
    ngram_n: int = 3,
    max_df: int = 10,
    max_bucket: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All-pairs sparse cosine similarity over raw term-frequency
    vectors: ``(id_a, id_b, cosine)`` for every candidate pair with
    ``cosine >= threshold`` — the term-based near-duplicate/similar-doc
    complement to the embedding ANN family.

    Candidate generation is an inverted index over word ``ngram_n``-grams
    restricted to grams with document frequency ``<= max_df`` (rare-gram
    pruning: near-identical documents always share rare grams, while
    boilerplate-frequency grams would generate quadratic candidates —
    the same recall contract as MinHash-LSH banding: a pair sharing NO
    rare gram is not considered).  Pair expansion reuses the dedup
    module's capped join-free bucket expansion.  Verification is EXACT
    and bit-reproducible: the tf vectors are integer counts, so the
    pair dot (one shuffled double join restricted to candidate ids +
    an integer sum) and the squared norms are exact integers; cosine is
    ``dot / (sqrt(n2_a) * sqrt(n2_b))`` — IEEE-deterministic ops over
    exact inputs, replayable by the oracle to the last bit.

    100 TB shape: gram df table is O(gram vocab); candidate volume is
    bounded by ``max_bucket^2 / 2`` per rare gram; the verification
    joins touch only candidate documents (left_semi restriction).
    """
    from deeptime_spark.operators.dedup import _bucket_pairs
    from deeptime_spark.operators.layout import spread_for_map_parallelism
    from deeptime_spark.operators.text import word_ngrams

    # the gram regex explosion and tokenize pass inherit the scan's
    # split count — ONE task on a single-row-group parquet (profiled
    # 2.5 s of single-task jobs at sf0.1); hash-spread the doc side
    # first (no-op at scale — guide §2.4)
    docs = spread_for_map_parallelism(docs, id_col)
    tf = tokenize_counts(docs, text_col, id_col)
    grams = docs.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), ngram_n)).alias("g")
    )
    gdf = grams.groupBy("g").agg(F.count(F.lit(1)).alias("_gdf"))
    rare = grams.join(gdf.where(F.col("_gdf") <= max_df), "g")
    # lazy persists: cand feeds BOTH the id restriction and the dot join,
    # tfv feeds the norms and both sides of the dot join — without them
    # the gram/tokenize subtrees re-execute up to 3x
    # size_probe=docs: the rare-gram bucket rows are few BYTES but the
    # in-bucket pair expansion is quadratic CPU — AQE coalesces the
    # sub-MB shuffle to ~3 tasks and the expansion strands (measured
    # 0.66 s/3 tasks at sf0.1); the scan-rooted gate pins it at cluster
    # width, no-op at scale (guide §2.5, the _bucket_pairs convention)
    cand = (
        _bucket_pairs(rare, ["g"], id_col, [], max_bucket, size_probe=docs)
        .select("id_a", "id_b")
        .distinct()
        .persist()
    )
    ids = (
        cand.select(F.col("id_a").alias(id_col))
        .unionAll(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    tfv = tf.join(ids, id_col, "left_semi").persist()
    norms = tfv.groupBy(id_col).agg(F.sum(F.col("tf") * F.col("tf")).alias("_n2"))
    # xxhash64 the term ONCE per (candidate doc, term) row: the dot
    # join's first leg expands |pairs| x |terms(a)| rows (435k pairs x
    # ~23 terms at sf0.1 — pairs >> docs by construction), and every one
    # of them carries the join key through the (id_b, term) hash join.
    # As a long the key is 8 bytes with primitive hashing/compares
    # instead of a UTF8String (the §13 dedup regime: hash per DOC, join
    # per PAIR — guide §2.3/§4.2). Correctness rides on xxhash64 being
    # injective on each doc pair's term union (collision probability
    # ~|terms|^2 * 2^-64 per pair — a collision double-counts a dot
    # term); exactness is pinned against the string-path DuckDB oracle
    # at all three SFs, same contract as the dedup hashed intersects.
    th = tfv.select(
        F.col(id_col), F.xxhash64("term").alias("_t"), F.col("tf")
    )
    ta = th.select(
        F.col(id_col).alias("id_a"), F.col("_t"), F.col("tf").alias("_tfa")
    )
    tb = th.select(
        F.col(id_col).alias("id_b"), F.col("_t"), F.col("tf").alias("_tfb")
    )
    dot = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "_t"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("_tfa") * F.col("_tfb")).alias("_dot"))
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("_n2").alias("_n2a"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("_n2").alias("_n2b"))
    return (
        dot.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("_dot").cast("double")
                / (F.sqrt(F.col("_n2a").cast("double")) * F.sqrt(F.col("_n2b").cast("double")))
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def rrf_fuse(
    rankings: "list[DataFrame]",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, "Reciprocal
    rank fusion outperforms Condorcet and individual rank learning
    methods", SIGIR'09): ``score(d) = Σ_i 1/(rrf_k + rank_i(d))`` over
    the input rankings, items absent from a ranking contributing
    nothing. The standard hybrid-retrieval combiner (sparse BM25 +
    dense ANN) — rank-only, so incomparable score scales never matter.

    Each input is a (id, rank) frame of AT MOST the candidate depth
    (k_each in :func:`hybrid_search`) rows — bounded by parameters, not
    data, so the outer joins below are driver-scale no matter the
    corpus. Per-source ranks are pivoted into FIXED positional columns
    and the score is one expression summing the sources in input
    order — a fixed fp op tree over exact integer ranks, bit-exact
    across engines (same determinism contract as bm25_search).

    Returns (id, rrf_score, rank_0..rank_{n-1}) for the top ``k`` by
    (rrf_score desc, id asc); absent ranks are -1.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    tagged = None
    for i, r in enumerate(rankings):
        t = r.select(
            F.col(id_col),
            F.col(rank_col).cast("long").alias(f"rank_{i}"),
        )
        tagged = t if tagged is None else tagged.join(t, id_col, "full_outer")
    score = F.lit(0.0)
    for i in range(len(rankings)):
        score = score + F.when(
            F.col(f"rank_{i}").isNotNull(),
            F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(f"rank_{i}").cast("double")),
        ).otherwise(F.lit(0.0))
    out = tagged.select(
        F.col(id_col),
        score.alias("rrf_score"),
        *[
            F.coalesce(F.col(f"rank_{i}"), F.lit(-1)).alias(f"rank_{i}")
            for i in range(len(rankings))
        ],
    )
    return out.orderBy(F.col("rrf_score").desc(), F.col(id_col)).limit(k)


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query_text: str,
    query_vec,
    k: int = 10,
    k_each: int = 50,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    text_col: str = "text",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid sparse+dense retrieval: BM25 top-``k_each`` over the text
    corpus and exact cosine top-``k_each`` over the embedding column,
    fused by reciprocal rank (:func:`rrf_fuse`).

    Both candidate lists are produced by TakeOrdered plans (never a
    global sort), each totally ordered by (score desc, id asc) so the
    integer ranks — the ONLY thing fusion consumes — are deterministic
    wherever the underlying scores are (bm25_search and
    topk_for_vector both carry that contract). Returns
    (id, rrf_score, rank_bm25, rank_dense); -1 marks absence from that
    candidate list.
    """
    from pyspark.sql import Window

    from deeptime_spark.operators.similarity import topk_for_vector

    sparse = bm25_search(
        docs, query_text, k=k_each, text_col=text_col, id_col=id_col
    )
    # the candidate frames are <= k_each rows: a single-partition rank
    # window over them is bounded by the parameter, not the corpus
    w_s = Window.orderBy(F.col("score").desc(), F.col(id_col))
    sparse = sparse.select(id_col, F.row_number().over(w_s).alias("rank"))
    dense = topk_for_vector(
        embeddings, query_vec, k=k_each, id_col=vec_id_col, vec_col=vec_col
    )
    w_d = Window.orderBy(F.col("similarity").desc(), F.col(vec_id_col))
    dense = dense.select(
        F.col(vec_id_col).alias(id_col), F.row_number().over(w_d).alias("rank")
    )
    fused = rrf_fuse([sparse, dense], id_col=id_col, k=k, rrf_k=rrf_k)
    return fused.select(
        id_col,
        "rrf_score",
        F.col("rank_0").alias("rank_bm25"),
        F.col("rank_1").alias("rank_dense"),
    )


# ------------------------------------------ persisted inverted index


def write_postings_index(
    docs: DataFrame,
    path: str,
    n_buckets: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Persist an inverted (postings) index as a TERM-BUCKET-PARTITIONED
    parquet table plus a one-row stats sidecar — the serving-side
    counterpart of :func:`bm25_search`, and the text twin of the
    cell-partitioned IVF layout (similarity.py:write_ivf_index).

    Layout: ``pmod(xxhash64(term), n_buckets)`` assigns every term a
    bucket; ``partitionBy("_bucket")`` writes one directory per bucket,
    so a probe for a bounded term set reads ``|terms| / n_buckets`` of
    the bytes via PARTITION PRUNING — no row-level scan of the other
    buckets.  A term's ENTIRE postings list (and therefore its document
    frequency) lives inside its own bucket, so ranked retrieval needs
    nothing outside the pruned directories plus the sidecar scalars.

    The stats sidecar records (n_docs, total_terms, n_buckets); n_docs
    and the derivable avgdl are what BM25-style scoring needs.
    """
    spark = docs.sparkSession
    tf = tokenize_counts(docs, text_col, id_col)
    bucketed = tf.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col("term")), F.lit(int(n_buckets)))
    )
    bucketed.write.mode("overwrite").partitionBy("_bucket").parquet(
        f"{path}/postings"
    )
    # derive the sidecar scalars from the JUST-WRITTEN postings, not a
    # second tokenize pass over the corpus (the unpersisted tf lineage
    # would re-run the normalize/split/explode/groupBy pipeline)
    stats = spark.read.parquet(f"{path}/postings").agg(
        F.count_distinct(F.col(id_col)).alias("n_docs"),
        F.sum("tf").alias("total_terms"),
        F.lit(int(n_buckets)).alias("n_buckets"),
    )
    stats.coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")


def probe_postings_index(
    spark,
    path: str,
    terms: list[str],
    id_col: str = "doc_id",
    mode: str = "and",
    max_terms: int = 256,
) -> DataFrame:
    """Conjunctive / disjunctive probe over a :func:`write_postings_index`
    layout: the query terms' buckets (computed with the engine-independent
    xxhash64 replica, deeptime_spark.spark_hashes) become a literal
    ``_bucket IN (...)`` predicate — statically partition-pruned, so the
    scan touches only the probed directories regardless of corpus size.

    Returns ``(id_col, n_terms, total_tf)`` for documents matching ALL
    terms (``mode="and"``) or ANY term (``mode="or"``) — exact integers.

    This is the SERVING path: ``terms`` is a bounded request (raises
    above ``max_terms``); for corpus-scale term sets keep the term
    relation distributed and join it against the postings instead.
    """
    from deeptime_spark.spark_hashes import xxhash64 as _xx

    if mode not in ("and", "or"):
        raise ValueError("mode must be 'and' or 'or'")
    norm_terms = sorted({t for w in terms for t in _norm_tokens_py(w)})
    if not norm_terms:
        raise ValueError("no non-empty query terms")
    if len(norm_terms) > max_terms:
        raise ValueError(
            f"probe_postings_index is a serving-side probe over a bounded "
            f"term set (> {max_terms} terms); join against the postings "
            f"relation for corpus-scale term sets"
        )
    n_buckets = int(
        spark.read.parquet(f"{path}/stats").select("n_buckets").head()[0]
    )
    buckets = sorted({_xx(t.encode()) % n_buckets for t in norm_terms})
    postings = spark.read.parquet(f"{path}/postings").where(
        F.col("_bucket").isin(buckets) & F.col("term").isin(norm_terms)
    )
    hits = postings.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("tf").alias("total_tf"),
    )
    if mode == "and":
        hits = hits.where(F.col("n_terms") == len(norm_terms))
    return hits.select(
        id_col,
        F.col("n_terms").cast("long").alias("n_terms"),
        F.col("total_tf").cast("long").alias("total_tf"),
    )
