"""Text analysis operators over document tables.

Large-scale training-data-pipeline surface (BASELINE.json north star):
language ID, quality scoring, token counting, document fingerprinting.
All hot-path logic is built-in Spark SQL functions (JVM, codegen) — no
Python in the per-document path. Designed against the harness
``documents(doc_id, text, lang, source, n_chars)`` table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal high-frequency stopword lists for an n-gram/stopword language-ID
# heuristic (top function words; public linguistic knowledge).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was", "with", "his", "her", "this"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "von", "sie", "mit", "sich", "auf", "ein", "eine", "zu"],
    "fr": ["le", "la", "les", "et", "est", "dans", "que", "pour", "une", "des", "du", "pas", "sur", "avec"],
    "es": ["el", "la", "los", "las", "que", "es", "en", "un", "una", "por", "con", "para", "del", "se"],
    "it": ["il", "la", "che", "di", "e", "un", "una", "per", "non", "sono", "con", "del", "si", "le"],
}


def tokens(text_col: str | Column = "text") -> Column:
    """Whitespace tokenization of trimmed, lowercased text (the base of all
    token-level ops). Pure JVM: lower/trim/split."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(F.lower(c)), r"\s+")


def token_count(text_col: str | Column = "text") -> Column:
    """Whitespace token count."""
    return F.size(tokens(text_col))


def word_token_count(text_col: str | Column = "text") -> Column:
    """BPE-ish regex token count: words, numbers, and punctuation runs
    counted separately (approximates subword tokenizer granularity better
    than whitespace)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0))


def char_count(text_col: str | Column = "text") -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.length(c)


def punct_ratio(text_col: str | Column = "text") -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return punct / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(text_col: str | Column = "text", lang: str = "en") -> Column:
    """Fraction of tokens that are high-frequency function words."""
    toks = tokens(text_col)
    words = STOPWORDS[lang]
    is_stop = F.filter(toks, lambda t: t.isin(words))
    return F.size(is_stop) / F.greatest(F.size(toks), F.lit(1))


def mean_word_length(text_col: str | Column = "text") -> Column:
    toks = tokens(text_col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1))


def quality_score(text_col: str | Column = "text") -> Column:
    """Composite heuristic quality in [0, 1]: favors moderate length,
    low punctuation density, natural mean word length, some stopwords
    (Gopher/C4-style quality-filter ingredients, simplified)."""
    n_tok = token_count(text_col)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    p = punct_ratio(text_col)
    punct_ok = F.when(p < 0.3, 1.0 - p / 0.3).otherwise(F.lit(0.0))
    mwl = mean_word_length(text_col)
    mwl_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    sw = stopword_ratio(text_col)
    sw_ok = F.least(sw / 0.2, F.lit(1.0))
    return (len_ok + punct_ok + mwl_ok + sw_ok) / 4.0


def detect_language(text_col: str | Column = "text") -> Column:
    """Stopword-vote language ID over the built-in language set.

    score(lang) = #token occurrences in lang's stopword list; argmax wins,
    'unknown' when all scores are zero. Entirely JVM expressions: one
    filter+size per language over the shared token array (Catalyst reuses
    the tokenization subtree).
    """
    toks = tokens(text_col)

    def stop_filter(ws: list[str]):
        # 1-arg lambda required: 2-arg lambdas receive the element index
        return lambda t: t.isin(ws)

    scores = [(lang, F.size(F.filter(toks, stop_filter(words)))) for lang, words in STOPWORDS.items()]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("unknown")
    for lang, s in reversed(scores):
        expr = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(expr)
    return expr


def shingles(text_col: str | Column = "text", k: int = 5) -> Column:
    """Character k-gram shingle array over normalized text (whitespace
    collapsed, lowercased).

    Implemented as ONE codegen regex pass using an overlapping-capture
    lookahead ``(?=(.{k}))`` — an order of magnitude faster than the
    equivalent ``transform(sequence(...), substr)``, whose higher-order
    function is interpreted per element. Texts shorter than k yield the
    whole text as a single shingle (same as the substr formulation).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    norm = F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")
    grams = F.regexp_extract_all(norm, F.lit(f"(?=(.{{{k}}}))"), 1)
    return F.when(F.length(norm) < k, F.array(norm)).otherwise(grams)


def word_ngrams(text_col: str | Column = "text", n: int = 3) -> Column:
    """Distinct word n-gram array via ONE codegen regex pass with an
    overlapping-capture lookahead (same trick as ``shingles`` — the
    token-slice formulation pays n interpreted HOF passes). Texts with
    fewer than n tokens yield the whole normalized text as a single gram
    (matching the slice formulation's edge behavior)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    norm = F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")
    # (?<!\S) anchors gram starts at word boundaries — without it the
    # lookahead also fires mid-word on every character position
    pattern = r"(?<!\S)(?=(" + r"\S+ " * (n - 1) + r"\S+))"
    grams = F.array_distinct(F.regexp_extract_all(norm, F.lit(pattern), 1))
    n_tok = F.size(F.split(norm, " "))
    return F.when(n_tok < n, F.array(norm)).otherwise(grams)


def fingerprint(text_col: str | Column = "text", k: int = 5, n: int = 8) -> Column:
    """Bottom-n sketch of shingle hashes — a deterministic document
    fingerprint (winnowing-style content signature): the n smallest
    xxhash64 values of the k-shingle set. Near-duplicate documents share
    most fingerprint elements."""
    hashed = F.transform(shingles(text_col, k), lambda s: F.xxhash64(s))
    return F.slice(F.array_sort(F.array_distinct(hashed)), 1, n)


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach the standard per-document stat columns."""
    return (
        df.withColumn("n_tokens", token_count(text_col))
        .withColumn("n_chars_computed", char_count(text_col))
        .withColumn("punct_ratio", punct_ratio(text_col))
        .withColumn("stopword_ratio", stopword_ratio(text_col))
        .withColumn("mean_word_length", mean_word_length(text_col))
        .withColumn("quality", quality_score(text_col))
        .withColumn("lang_detected", detect_language(text_col))
    )


# ------------------------------------------------ Gopher quality rules

GOPHER_REQUIRED_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The Gopher pretraining quality-filter rules (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", Table A1) as pure Column
    expressions — the standard document filter set a 100 TB text pipeline
    runs before training:

    - 50 <= word count <= 100,000
    - 3 <= mean word length <= 10
    - symbol-to-word ratio ('#' or ellipsis) < 0.1
    - < 90% of lines start with a bullet
    - < 30% of lines end with an ellipsis
    - >= 80% of words contain an alphabetic character
    - >= 2 of the 8 required English stop words present

    All ratios are divisions of exact integer counts, so the emitted
    doubles are bit-exact and engine-independent. Per-line / per-token
    predicates run as higher-order filters over the per-document arrays
    (small arrays; the corpus-scale axis stays row-parallel codegen).
    Adds the individual metrics and a ``passes_gopher`` flag. NULL text
    is treated as empty (web corpora contain null rows; a raw split(null)
    would poison every downstream metric with nulls/-1 sizes).
    """
    c = F.coalesce(F.col(text_col), F.lit(""))
    # STAGED projections: the token/line splits are materialized once as
    # intermediate array columns and every metric reads the column, and the
    # passes flag reads the metric COLUMNS. Folding all of this into one
    # select re-inlines each regex split ~5x and the metric expressions
    # again inside the flag — the expression tree blows up whole-stage
    # codegen and a fresh plan pays ~6s of JIT compile for identical
    # runtime. (CollapseProject keeps the stages: it does not duplicate
    # non-cheap aliased expressions.)
    base = df.select("*", tokens(c).alias("_toks"), F.split(c, r"\n").alias("_lines"))
    toks = F.col("_toks")
    lines = F.col("_lines")
    n_words = F.size(toks)
    total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    mean_len = total_len.cast("double") / F.greatest(F.size(toks), F.lit(1))
    n_hash = F.length(F.regexp_replace(c, r"[^#]", ""))
    n_ellipsis = F.size(F.regexp_extract_all(c, F.lit(r"\.\.\.|…"), 0))
    symbol_ratio = (n_hash + n_ellipsis) / F.greatest(n_words, F.lit(1))
    n_lines = F.greatest(F.size(lines), F.lit(1))
    frac_bullet = F.size(
        F.filter(lines, lambda l: l.rlike(r"^\s*[-*•‣▶]"))
    ) / n_lines
    frac_ellipsis_l = F.size(
        F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))
    ) / n_lines
    frac_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) / F.greatest(
        n_words, F.lit(1)
    )
    n_stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in GOPHER_REQUIRED_WORDS]),
            lambda w: F.array_contains(toks, w),
        )
    )
    metrics = base.select(
        "*",
        n_words.cast("long").alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        frac_bullet.alias("frac_bullet_lines"),
        frac_ellipsis_l.alias("frac_ellipsis_lines"),
        frac_alpha.alias("frac_alpha_words"),
        n_stop_hits.cast("long").alias("n_stop_hits"),
    ).drop("_toks", "_lines")
    passes = (
        F.col("n_words").between(50, 100_000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("symbol_ratio") < 0.1)
        & (F.col("frac_bullet_lines") < 0.9)
        & (F.col("frac_ellipsis_lines") < 0.3)
        & (F.col("frac_alpha_words") >= 0.8)
        & (F.col("n_stop_hits") >= 2)
    )
    return metrics.select("*", passes.cast("long").alias("passes_gopher"))


def gopher_repetition(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher repetition rules (same paper): duplicate-line fraction and
    the fraction of characters inside duplicated lines — boilerplate and
    template detection. Per-document array algebra; exact integer counts.
    NULL text treated as empty."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(F.split(c, r"\n"), lambda l: F.length(F.trim(l)) > 0)
    n_lines = F.greatest(F.size(lines), F.lit(1))
    n_distinct = F.size(F.array_distinct(lines))
    frac_dup_lines = (F.size(lines) - n_distinct) / n_lines
    total_chars = F.aggregate(lines, F.lit(0), lambda a, l: a + F.length(l))
    # chars in lines that appear more than once (all copies counted).
    # Sorted-adjacency formulation: after sort_array, a line is part of a
    # duplicate run iff it equals its left or right neighbor — O(L log L)
    # per document instead of the naive O(L^2) nested filter, which a
    # single pathological 100k-line document would turn into a stage
    # straggler. Empty-string shift sentinels can't collide: empty lines
    # were filtered out above.
    s = F.sort_array(lines)
    n = F.size(s)
    prev = F.concat(F.array(F.lit("")), F.slice(s, 1, F.greatest(n - 1, F.lit(0))))
    nxt = F.concat(F.slice(s, 2, F.greatest(n - 1, F.lit(0))), F.array(F.lit("")))
    eq_prev = F.zip_with(s, prev, lambda a, b: a == b)
    eq_next = F.zip_with(s, nxt, lambda a, b: a == b)
    dup_flags = F.zip_with(eq_prev, eq_next, lambda a, b: a | b)
    dup_chars = F.aggregate(
        F.zip_with(s, dup_flags, lambda l, f: F.when(f, F.length(l)).otherwise(0)),
        F.lit(0),
        lambda a, v: a + v,
    )
    frac_dup_chars = dup_chars / F.greatest(total_chars, F.lit(1))
    return df.select(
        "*",
        frac_dup_lines.alias("frac_dup_lines"),
        frac_dup_chars.alias("frac_dup_line_chars"),
    )


# ------------------------------------------------ unigram LM scoring

def unigram_lm_scores_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 50_000,
    smoothing: float = 1.0,
) -> DataFrame:
    """LM-based document quality signal (the CCNet-style filter axis: a
    language model trained on the corpus scores each document; outliers
    are boilerplate/gibberish). Here the model is a self-trained unigram
    LM — the Spark-first reduction of that design:

    - **model fit** = one explode + groupBy token count (map-side partial
      aggregation; exact integers, layout-independent), top ``vocab_size``
      tokens by (count desc, token asc) — a deterministic order —
      collected to the driver (V rows, small);
    - **probabilities**: add-``smoothing`` estimates
      p(w) = (c_w + a) / (T + a (V + 1)) with one OOV bucket — all derived
      from exact integers, so every log-prob double is reproducible;
    - **scoring** = Arrow map with the broadcast token->logprob dict; each
      document's score is the mean token log-prob accumulated IN TOKEN
      ORDER (sequential cumsum), so the result never depends on how rows
      were partitioned.

    Returns (id, n_tokens, lm_score) with lm_score <= 0 (higher = more
    typical of the corpus).
    """
    import math

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from deeptime_spark.operators.layout import spread_for_map_parallelism

    # both the count explode and the Arrow scoring map are map-heavy;
    # spread a single-split scan once for both consumers (no-op at scale)
    df = spread_for_map_parallelism(df, id_col)
    toks = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    counts = toks.select(F.explode("_toks").alias("w")).groupBy("w").count()
    agg = counts.agg(
        F.sum("count").alias("T"), F.count(F.lit(1)).alias("n_distinct")
    ).first()
    total = int(agg["T"] or 0)
    vocab_rows = (
        counts.orderBy(F.desc("count"), F.asc("w")).limit(vocab_size).collect()
    )
    V = len(vocab_rows)
    denom = total + smoothing * (V + 1)
    logp = {
        r["w"]: math.log((int(r["count"]) + smoothing) / denom) for r in vocab_rows
    }
    log_oov = math.log(smoothing / denom)

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_tokens", LongType()),
            StructField("lm_score", DoubleType()),
        ]
    )

    def score(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids, ns, scores = [], [], []
            for i, ws in zip(pdf[id_col], pdf["_toks"]):
                lp = np.array([logp.get(w, log_oov) for w in ws], dtype=np.float64)
                ids.append(int(i))
                ns.append(len(lp))
                # in-order sequential sum: layout-independent
                scores.append(float(np.cumsum(lp)[-1] / len(lp)) if len(lp) else 0.0)
            yield pd.DataFrame({id_col: ids, "n_tokens": ns, "lm_score": scores})

    return toks.mapInPandas(score, schema=schema)


def _lm2_fit_frame(
    df: DataFrame, text_col: str, vocab_size: int, bigram_size: int
) -> DataFrame:
    """The bigram-LM model fit as ONE corpus scan with ONE regex pass:
    each doc explodes into its (n-1) bigrams plus its LAST token —
    n rows per n-token doc (previously 2n-1 across two regex passes).
    Unigram counts are then EXACTLY derivable inside the engine: every
    token instance occurs exactly once as either a bigram's FIRST word
    or the doc-final token, so
    ``c_uni(w) = Σ_x c_bi(w,x) + #{docs ending in w}`` — one
    ``substring_index(t, ' ', 1)`` projection (a no-space last-token
    row passes through whole) + a re-aggregation over the ~|distinct
    grams| grouped output, which is orders of magnitude smaller than
    the token-instance relation that paid the first shuffle. Bigrams
    contain a space, last tokens cannot — the space is a free
    discriminator, no marker column.

    The corpus token total and both TakeOrdered cuts consume the SAME
    grouped frame, so Catalyst's ReusedExchange computes the
    scan+shuffle once and the whole model arrives in a single collect
    (plan pinned in tests/test_plans.py). Rows: (t, count, _kind) with
    _kind in {'u' vocab, 'b' bigram, 'T' total} — byte-identical
    counts to the two-pass formulation (exact integer identity), so
    the oracle replica is unchanged."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    norm = F.regexp_replace(F.trim(F.lower(txt)), r"\s+", " ")
    grams2 = F.when(
        ~norm.contains(" "), F.array().cast("array<string>")
    ).otherwise(
        F.regexp_extract_all(norm, F.lit(r"(?<!\S)(?=(\S+ \S+))"), 1)
    )
    last_tok = F.substring_index(norm, " ", -1)
    counts = (
        df.select(F.explode(F.concat(grams2, F.array(last_tok))).alias("t"))
        .where(F.col("t") != "")
        .groupBy("t")
        .count()
    )
    has_space = F.col("t").contains(" ")
    # NO where() between `counts` and its consumers: a filter on the
    # grouping key would be pushed BELOW the aggregation, splitting the
    # shared exchange and re-running the scan+explode per branch. Both
    # kinds derive from one small explode over the grouped rows — a
    # bigram row (v w, c) yields ('b', "v w", c) and the unigram
    # contribution ('u', v, c); a last-token row (w, c) yields
    # ('u', w, c) — re-aggregated over the tiny distinct-gram relation.
    kinded = F.when(
        has_space,
        F.array(
            F.struct(F.lit("b").alias("_kind"), F.col("t").alias("t")),
            F.struct(
                F.lit("u").alias("_kind"),
                F.substring_index(F.col("t"), " ", 1).alias("t"),
            ),
        ),
    ).otherwise(
        F.array(F.struct(F.lit("u").alias("_kind"), F.col("t").alias("t")))
    )
    combined = (
        counts.select(F.explode(kinded).alias("e"), F.col("count"))
        .select(F.col("e._kind").alias("_kind"), F.col("e.t").alias("t"), "count")
        .groupBy("_kind", "t")
        .agg(F.sum("count").alias("count"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_kind").orderBy(F.desc("count"), F.asc("t"))
    cap = max(vocab_size, bigram_size)
    cuts = (
        combined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cap)  # simple bound -> WindowGroupLimit
        .where(
            ((F.col("_kind") == "u") & (F.col("_rn") <= vocab_size))
            | ((F.col("_kind") == "b") & (F.col("_rn") <= bigram_size))
        )
        .select("t", "count", "_kind")
    )
    # T = Σ unigram counts = Σ over ALL grouped rows (each token
    # instance is counted exactly once in the explode)
    tot = counts.agg(
        F.coalesce(F.sum("count"), F.lit(0)).alias("count")
    ).select(F.lit("").alias("t"), "count", F.lit("T").alias("_kind"))
    return cuts.unionByName(tot)


def bigram_lm_scores_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 50_000,
    bigram_size: int = 200_000,
    alpha: float = 0.4,
    smoothing: float = 1.0,
) -> DataFrame:
    """Interpolated BIGRAM language-model quality signal — the
    KenLM-perplexity axis of CCNet-style filtering, reduced to an
    exactly-reproducible two-table Spark formulation:

    - **unigram fit** as ``unigram_lm_scores_df`` (one explode +
      groupBy count; distributed top-``vocab_size`` cut);
    - **bigram fit**: the same codegen lookahead-regex pass the Gopher
      repetition rules use (``_word_ngrams_all`` pattern, n=2) -> one
      groupBy count -> distributed top-``bigram_size`` cut
      (``orderBy(count desc, gram)`` TakeOrdered — the pruned-LM
      standard). BOTH model tables are bounded no matter the corpus
      size: driver memory is O(vocab_size + bigram_size);
    - **probabilities**: p(w | v) = alpha * c(v,w)/c(v) +
      (1-alpha) * p_uni(w), with the bigram term dropping to zero when
      (v,w) was pruned or v is out-of-vocabulary (interpolation keeps
      the estimate proper: the unigram term is always > 0). Every double
      is a deterministic function of exact integer counts;
    - **scoring**: Arrow map over broadcast dicts, log-probs accumulated
      IN TOKEN ORDER — layout-independent, replayable by the oracle.

    Returns (id, n_tokens, lm2_score) where lm2_score is the mean token
    log-probability (<= 0; higher = more typical of the corpus).
    """
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from deeptime_spark.operators.layout import spread_for_map_parallelism

    # 1 MiB floor: the scorer is vectorized numpy, so for sub-MiB
    # single-file corpora the repartition stage + 32-task scheduling
    # costs more than it parallelizes; real corpora (and the 100 TB
    # regime, where spread is a no-op) clear the floor immediately.
    df = spread_for_map_parallelism(df, id_col, min_bytes_per_partition=1 << 20)
    toks = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    fit_rows = _lm2_fit_frame(df, text_col, vocab_size, bigram_size).collect()
    vocab_rows = [r for r in fit_rows if r["_kind"] == "u"]
    bigram_rows = [r for r in fit_rows if r["_kind"] == "b"]
    total = int(next(r["count"] for r in fit_rows if r["_kind"] == "T"))
    V = len(vocab_rows)
    denom = total + smoothing * (V + 1)
    c_uni = {r["t"]: int(r["count"]) for r in vocab_rows}
    p_uni = {w: (c + smoothing) / denom for w, c in c_uni.items()}
    p_oov = smoothing / denom

    c_bi = {}
    for r in bigram_rows:
        v, _, w = r["t"].partition(" ")
        if v in c_uni:
            c_bi[(v, w)] = int(r["count"])

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_tokens", LongType()),
            StructField("lm2_score", DoubleType()),
        ]
    )

    import numpy as np

    one_minus_alpha = 1.0 - alpha
    # Driver-side precompute for vectorized scoring (bounded:
    # O(vocab_size + bigram_size)). Token ids over W = vocab UNION the
    # bigrams' second words; gid 0 is the OOV sentinel, so an id
    # comparison replaces every per-token dict probe in the hot path.
    gid: dict[str, int] = {}
    for w in c_uni:
        gid.setdefault(w, len(gid) + 1)
    for (_, w2) in c_bi:
        gid.setdefault(w2, len(gid) + 1)
    pu_g = np.full(len(gid) + 1, p_oov, np.float64)
    for w, p in p_uni.items():
        pu_g[gid[w]] = p
    # interpolation bigram term precomputed per pruned entry with the
    # SAME scalar IEEE ops as the reference formula: alpha*c(v,w)/c(v)
    n_ids = np.int64(len(gid) + 1)
    bi_keys = np.empty(len(c_bi), np.int64)
    bi_terms = np.empty(len(c_bi), np.float64)
    for k, ((v, w2), cb) in enumerate(c_bi.items()):
        bi_keys[k] = gid[v] * n_ids + gid[w2]
        bi_terms[k] = alpha * cb / c_uni[v]
    order = np.argsort(bi_keys)
    bi_keys = bi_keys[order]
    bi_terms = bi_terms[order]

    def score(batches):
        import pandas as pd

        # Vectorized scoring: token->id via pd.factorize + one dict probe
        # per UNIQUE token, bigram terms via sorted-key searchsorted (no
        # per-pair Python), interpolation elementwise (IEEE-identical to
        # the scalar formula), and the log accumulation through the
        # SHARED mean_logprob_segments helper — the oracle replica calls
        # the exact same helper on an identically-ordered vals array, so
        # both sides stay bit-identical without a scalar Python loop.
        oov = 0
        for pdf in batches:
            if not len(pdf):
                continue
            raw = [np.asarray(ws, dtype=object) for ws in pdf["_toks"]]
            lens_raw = np.fromiter((len(ws) for ws in raw), np.int64, len(raw))
            ids = [int(i) for i in pdf[id_col]]
            flat_raw = (
                np.concatenate(raw) if lens_raw.sum() else np.empty(0, object)
            )
            # split() can emit empty strings (e.g. empty text): drop them
            # and shrink the per-doc lengths by each doc's empty count
            keep = flat_raw != ""
            if bool(keep.all()):
                flat, lens_arr = flat_raw, lens_raw
            else:
                flat = flat_raw[keep]
                dropped = np.zeros(len(raw), np.int64)
                nzr = lens_raw > 0
                if nzr.any():
                    starts_raw = np.concatenate(([0], np.cumsum(lens_raw)[:-1]))
                    dropped[nzr] = np.add.reduceat(
                        (~keep).astype(np.int64), starts_raw[nzr]
                    )
                lens_arr = lens_raw - dropped
            lens = lens_arr.tolist()
            if not len(flat):
                yield pd.DataFrame(
                    {id_col: ids, "n_tokens": lens, "lm2_score": [0.0] * len(ids)}
                )
                continue
            codes, uniques = pd.factorize(flat)
            g_of_u = np.fromiter(
                (gid.get(u, oov) for u in uniques), np.int64, len(uniques)
            )
            g = g_of_u[codes]
            pu = pu_g[g]
            # per-position value whose log enters the sum: first token of
            # each doc contributes log(p_uni); later tokens contribute
            # log(alpha*c(v,w)/c(v) + (1-alpha)*p_uni(w)), with the
            # bigram term zero when (v,w) was pruned or v is OOV
            vals = np.empty(len(flat), np.float64)
            if len(flat) > 1:
                pk = g[:-1] * n_ids + g[1:]
                idx = np.searchsorted(bi_keys, pk)
                idx[idx == len(bi_keys)] = 0
                hit = bi_keys[idx] == pk if len(bi_keys) else np.zeros(len(pk), bool)
                term = np.where(hit, bi_terms[idx] if len(bi_terms) else 0.0, 0.0)
                vals[1:] = term + one_minus_alpha * pu[1:]
            # doc-start positions overwrite the (boundary-crossing) pair
            # value with the plain unigram probability (empty docs have
            # no start position — and would index past the end)
            starts = np.concatenate(([0], np.cumsum(lens_arr)[:-1]))
            vals[starts[lens_arr > 0]] = pu[starts[lens_arr > 0]]
            scores = mean_logprob_segments(vals, lens_arr)
            yield pd.DataFrame({id_col: ids, "n_tokens": lens, "lm2_score": scores})

    return toks.mapInPandas(score, schema=schema)


def mean_logprob_segments(vals, lens_arr) -> "list[float]":
    """Per-document mean token log-probability over a flat probability
    array segmented by ``lens_arr`` (empty docs score 0.0).

    ``np.log`` elementwise, then per-segment ``np.add.reduceat`` (numpy's
    pairwise reduce — deterministic for a given segment, independent of
    how segments are batched) divided by the segment length. BOTH the
    Arrow scorer and the oracle replica (oracle_ref.py:
    oracle_doc_lm2_score) call this one helper, which is what makes the
    engine/oracle comparison bit-exact — neither side may re-implement
    the accumulation."""
    import numpy as np

    lens_arr = np.asarray(lens_arr, dtype=np.int64)
    out = np.zeros(len(lens_arr), dtype=np.float64)
    nz = lens_arr > 0
    if nz.any():
        starts = np.concatenate(([0], np.cumsum(lens_arr)[:-1]))
        logs = np.log(np.asarray(vals, dtype=np.float64))
        out[nz] = np.add.reduceat(logs, starts[nz]) / lens_arr[nz]
    return out.tolist()


def _word_ngrams_all(text_col: str | Column, n: int) -> Column:
    """All word n-grams IN ORDER (non-distinct) — the counting base for
    repetition metrics. Same lookahead-regex single pass as word_ngrams."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    norm = F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")
    pattern = r"(?<!\S)(?=(" + r"\S+ " * (n - 1) + r"\S+))"
    grams = F.regexp_extract_all(norm, F.lit(pattern), 1)
    n_tok = F.size(F.split(norm, " "))
    return F.when(n_tok < n, F.array().cast("array<string>")).otherwise(grams)


def gopher_top_ngram_fractions(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", ns: tuple = (2, 3, 4)
) -> DataFrame:
    """The remaining Gopher repetition rules: for each n, the fraction of
    (normalized) characters covered by occurrences of the single most
    frequent word n-gram — template/boilerplate detection.

    Plan shape: explode grams -> codegen count per (doc, gram) with
    map-side partial aggregation -> per-doc argmax via one row_number
    window (count desc, gram asc — the deterministic tie-break) -> join
    back on the doc id. Everything stays in whole-stage codegen and
    spills safely on pathological documents; an array-local fold would
    run interpreted per gram and keep million-gram documents on a single
    row. All counts are integers, so results are engine-exact."""
    from pyspark.sql import Window

    c = F.coalesce(F.col(text_col), F.lit(""))
    norm_len = F.greatest(
        F.length(F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")), F.lit(1)
    )
    from deeptime_spark.operators.layout import spread_for_map_parallelism

    # gram explosion is the heavy map stage; spread a single-split scan
    # (no-op at scale), keyed by doc id so the gram count groupBy and the
    # per-(doc, n) window both run with no further exchange
    df = spread_for_map_parallelism(df, id_col)
    out = df.withColumn("_nl", norm_len)
    # one explode carries every n (tagged structs), so the whole rule set
    # costs one gram shuffle + one window + one join regardless of len(ns)
    def _tag(n):
        # factory, NOT a default-arg lambda: a 2-parameter lambda makes
        # F.transform pass the array INDEX as the second argument
        def f(g):
            return F.struct(F.lit(n).alias("n"), g.alias("g"))

        return f

    tagged = F.flatten(
        F.array(*[F.transform(_word_ngrams_all(text_col, n), _tag(n)) for n in ns])
    )
    grams = out.select(
        F.col(id_col), F.col("_nl"), F.explode(tagged).alias("_t")
    ).select(id_col, "_nl", F.col("_t.n").alias("_n"), F.col("_t.g").alias("_g"))
    counts = grams.groupBy(id_col, "_nl", "_n", "_g").agg(
        F.count(F.lit(1)).alias("_c")
    )
    w = Window.partitionBy(id_col, "_n").orderBy(F.desc("_c"), F.asc("_g"))
    top = (
        counts.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .groupBy(id_col)
        .agg(
            *[
                F.max(
                    F.when(F.col("_n") == n, (F.col("_c") * F.length("_g")) / F.col("_nl"))
                ).alias(f"frac_top_{n}gram_chars")
                for n in ns
            ]
        )
    )
    joined = out.join(top, on=id_col, how="left")
    for n in ns:
        joined = joined.withColumn(
            f"frac_top_{n}gram_chars",
            F.coalesce(F.col(f"frac_top_{n}gram_chars"), F.lit(0.0)),
        )
    return joined.drop("_nl")


# ------------------------------------------------ C4-style line filtering

C4_BAD_PHRASES = [
    "javascript",
    "lorem ipsum",
    "cookie policy",
    "privacy policy",
    "terms of use",
    "{",
]


def c4_keep_line(line: Column, min_words: int = 5, require_terminal_punct: bool = True,
                 bad_phrases: list[str] | None = None) -> Column:
    """Per-line C4 keep predicate (Raffel et al., "Exploring the Limits of
    Transfer Learning with a Unified Text-to-Text Transformer", JMLR'20,
    §2.2 cleaning heuristics): a line survives iff it is non-blank, has at
    least ``min_words`` whitespace words, ends in terminal punctuation
    (optional), and contains none of the boilerplate ``bad_phrases``
    (case-insensitive). Pure Column algebra — evaluated inside codegen,
    no Python per line."""
    phrases = C4_BAD_PHRASES if bad_phrases is None else bad_phrases
    t = F.trim(line)
    keep = (F.length(t) > 0) & (F.size(F.split(t, r"\s+")) >= min_words)
    if require_terminal_punct:
        keep = keep & t.rlike(r'[.!?"”]$')
    low = F.lower(line)
    for p in phrases:
        keep = keep & ~low.contains(p.lower())
    return keep


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    require_terminal_punct: bool = True,
    min_kept_lines: int = 3,
    bad_phrases: list[str] | None = None,
) -> DataFrame:
    """C4 line-level cleaning over a document table: drop boilerplate
    lines, reassemble the document, and flag documents that keep fewer
    than ``min_kept_lines`` lines (C4 drops pages with <3 retained
    sentences). Entirely per-document array algebra — one codegen
    projection, NO shuffle, trivially data-parallel at any corpus size.

    Returns the input columns plus ``clean_text``, ``n_lines_total``,
    ``n_lines_kept``, and ``passes_c4``.
    """
    c = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(c, r"\n")
    kept = F.filter(
        lines,
        lambda l: c4_keep_line(l, min_words, require_terminal_punct, bad_phrases),
    )
    n_total = F.size(lines)
    n_kept = F.size(kept)
    return df.select(
        "*",
        F.array_join(kept, "\n").alias("clean_text"),
        n_total.cast("long").alias("n_lines_total"),
        n_kept.cast("long").alias("n_lines_kept"),
        (n_kept >= min_kept_lines).cast("long").alias("passes_c4"),
    )


# ------------------------------------------------ PII scrubbing

# Order matters: longer/more-specific patterns first so a credit-card
# number is not half-eaten by the phone rule. All patterns are RE2-safe
# (no backrefs/lookbehind) and run in Spark's codegen regexp engine.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("credit_card", r"\b(?:\d[ -]?){13,16}\b", "<CC>"),
    ("phone", r"\+?\d{1,3}[ .-]?\(?\d{2,4}\)?[ .-]?\d{3,4}[ .-]?\d{3,4}", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
]


def scrub_pii(text_col: str | Column = "text", patterns=None) -> Column:
    """Replace PII spans with typed placeholder tags — the CCNet/C4-style
    pre-training scrub. One chained regexp_replace per pattern class,
    all inside codegen; at corpus scale this is a map-only projection
    with zero shuffles."""
    c = F.coalesce(F.col(text_col) if isinstance(text_col, str) else text_col, F.lit(""))
    # explicit None check: an empty pattern list legitimately means
    # "scrub nothing" and must not fall back to the defaults
    for _, pat, repl in (PII_PATTERNS if patterns is None else patterns):
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              patterns=None) -> DataFrame:
    """Per-document PII hit counts per class plus the scrubbed text —
    the audit view a redaction pipeline needs (how much was removed,
    and of what kind) alongside the cleaned output.

    Counts are INDEPENDENT per class over the raw text (a digit run can
    count as both credit_card and phone); scrubbing applies the classes
    sequentially in PII_PATTERNS order, so each span is replaced once by
    its highest-priority class."""
    pats = PII_PATTERNS if patterns is None else patterns
    cols = [F.col(id_col)]
    for name, pat, _ in pats:
        cols.append(
            F.size(F.regexp_extract_all(F.coalesce(F.col(text_col), F.lit("")), F.lit(pat), 0))
            .cast("long")
            .alias(f"n_{name}"),
        )
    cols.append(scrub_pii(text_col, pats).alias("scrubbed_text"))
    return df.select(*cols)


# ------------------------------------- model-based quality classifier

def quality_classifier_scores_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 50_000,
    smoothing: float = 1.0,
    label_col: str | None = None,
) -> DataFrame:
    """Self-supervised quality CLASSIFIER (the fastText-filter axis of
    CCNet/GPT-3-style pipelines: train a cheap text classifier on weak
    quality labels, keep what scores 'good'). Spark-first reduction with
    no training dependency and exact reproducibility:

    - **weak labels** = the Gopher rule flag (``gopher_quality`` —
      heuristics stand in for the curated positive set, as in the
      published pipelines' bootstrap stage);
    - **model** = multinomial Naive Bayes over unigrams: per-class token
      counts from ONE explode + groupBy aggregation (map-side partial,
      exact integers); add-``smoothing`` log-probabilities and the class
      prior derived on the driver from those integers — every double is
      a deterministic function of exact counts;
    - **scoring** = Arrow map with the broadcast token -> (logp_good -
      logp_bad) dict; each document's log-odds accumulate IN TOKEN ORDER
      (sequential cumsum), so results never depend on partitioning.

    Returns (id, n_tokens, log_odds, pred_good): log_odds > 0 means the
    classifier calls the document 'good'. The same shape scales to a
    curated-positive-set label column via ``label_col``.
    """
    import math

    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    from deeptime_spark.operators.layout import spread_for_map_parallelism

    if label_col is not None:
        # curated-positive-set pathway: caller supplies 0/1 labels
        # (e.g. "is from a reference corpus"), same training shape
        labeled = df.select(
            F.col(id_col), F.col(text_col), F.col(label_col).cast("int").alias("_y")
        )
    else:
        labeled = gopher_quality(df, text_col).select(
            F.col(id_col), F.col(text_col), F.col("passes_gopher").alias("_y")
        )
    toks = labeled.select(
        F.col(id_col), F.col("_y"), tokens(text_col).alias("_toks")
    )
    tok_counts = (
        toks.select("_y", F.explode("_toks").alias("w"))
        .where(F.col("w") != "")
        .groupBy("_y", "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # Bounded-driver vocab cut (100 TB design point): the top-vocab_size
    # words by (total desc, word) are chosen DISTRIBUTEDLY — a TakeOrdered
    # heap over the word totals — and the per-class counts are semi-joined
    # down to that vocabulary BEFORE the collect, so the driver sees at
    # most 2 * vocab_size rows instead of the full distinct-token table
    # (O(1e8) on a web corpus). The deterministic (total desc, word)
    # ordering is reconstructed on the driver from the collected rows.
    vocab_df = (
        tok_counts.groupBy("w")
        .agg(F.sum("n").alias("_total"))
        .orderBy(F.col("_total").desc(), F.col("w"))
        .limit(vocab_size)
        .select("w")
    )
    counts = tok_counts.join(F.broadcast(vocab_df), "w", "left_semi").collect()
    doc_counts = labeled.groupBy("_y").agg(F.count(F.lit(1)).alias("n")).collect()
    n_good = sum(int(r["n"]) for r in doc_counts if int(r["_y"]) == 1)
    n_bad = sum(int(r["n"]) for r in doc_counts if int(r["_y"]) == 0)

    per_class: dict[int, dict[str, int]] = {0: {}, 1: {}}
    for r in counts:
        per_class[int(r["_y"])][r["w"]] = int(r["n"])
    totals: dict[str, int] = {}
    for c in (0, 1):
        for w, n in per_class[c].items():
            totals[w] = totals.get(w, 0) + n
    vocab = [w for w, _ in sorted(totals.items(), key=lambda kv: (-kv[1], kv[0]))]
    t_good = sum(per_class[1].get(w, 0) for w in vocab)
    t_bad = sum(per_class[0].get(w, 0) for w in vocab)
    V = len(vocab)
    prior = math.log((n_good + smoothing) / (n_bad + smoothing))
    delta = {
        w: (
            math.log((per_class[1].get(w, 0) + smoothing) / (t_good + smoothing * (V + 1)))
            - math.log((per_class[0].get(w, 0) + smoothing) / (t_bad + smoothing * (V + 1)))
        )
        for w in vocab
    }
    oov = (
        math.log(smoothing / (t_good + smoothing * (V + 1)))
        - math.log(smoothing / (t_bad + smoothing * (V + 1)))
    )

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_tokens", LongType()),
            StructField("log_odds", DoubleType()),
            StructField("pred_good", LongType()),
        ]
    )
    src = spread_for_map_parallelism(df.select(id_col, text_col), id_col)

    def score(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids, ns, odds, preds = [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                ws = [w for w in (t or "").lower().strip(" ").split() if w]
                lp = np.array([delta.get(w, oov) for w in ws], dtype=np.float64)
                # in-order sequential sum: layout-independent
                lo = prior + (float(np.cumsum(lp)[-1]) if len(lp) else 0.0)
                ids.append(int(i))
                ns.append(len(ws))
                odds.append(lo)
                preds.append(1 if lo > 0 else 0)
            yield pd.DataFrame(
                {id_col: ids, "n_tokens": ns, "log_odds": odds, "pred_good": preds}
            )

    return src.mapInPandas(score, schema=schema)


def novelty_scores(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document novelty: the fraction of the document's distinct
    word ``n``-grams whose FIRST corpus occurrence (lowest id) is this
    document — the contribution-scoring signal dedup-aware samplers use
    to down-weight documents that mostly restate earlier ones (a 0.0
    score = every gram already seen in an earlier doc; 1.0 = all new).

    Spark shape: one gram explode, one ``min(id)`` hash aggregate over
    grams (map-side partials; the first-owner table is O(gram vocab)),
    one join back, one per-doc count — no self-joins, no windows over
    the corpus.  The ratio is emitted integer-scaled
    (``novel * 1e6 div total``) so the result is exact and
    engine-portable.  Returns ``(id, n_grams, n_novel, novelty_ppm)``.
    """
    grams = docs.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("_g")
    )
    first_owner = grams.groupBy("_g").agg(F.min(id_col).alias("_first"))
    per_doc = (
        grams.join(first_owner, "_g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("_first") == F.col(id_col)).cast("long")).alias("n_novel"),
        )
    )
    # integer DIV, not fp division + cast: exact and engine-portable
    return per_doc.select(
        id_col,
        "n_grams",
        "n_novel",
        F.expr("(n_novel * 1000000L) DIV n_grams").alias("novelty_ppm"),
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Top-``top_k`` word-bigram collocations by pointwise mutual
    information — the classic corpus-analysis signal for multiword
    expressions (Church & Hanks, "Word Association Norms, Mutual
    Information, and Lexicography", CL 16(1), 1990), and a vocabulary
    diagnostic for training corpora (tokenizer-merge candidates,
    boilerplate phrase discovery).

    Returns (w1, w2, c12, c1, c2, pmi_ratio, pmi) where ``pmi_ratio =
    P(w1,w2) / (P(w1)·P(w2))`` computed as a fixed expression tree of
    IEEE divisions/multiplications over exact BIGINT counts (bit-exact
    across engines, unlike ln), and ``pmi = ln(pmi_ratio)`` for human
    consumption. Ordered by (pmi_ratio desc, w1, w2) — a total order,
    so the top-k cut is deterministic under ties.

    Scale shape: unigrams and bigrams share ONE corpus scan + ONE count
    shuffle (bigrams contain a space, whitespace tokens cannot — the
    same free discriminator as the bigram-LM fit); the counts relation
    is persisted because the kind/min_count splits filter on the
    grouping key, which Catalyst would push below the aggregation and
    defeat ReusedExchange. ``min_count`` bounds the bigram side BEFORE
    the two unigram joins, and the final cut is orderBy+limit →
    TakeOrdered (no global sort). The counts persist is lazy (no action
    here) and left to session cache management, the same pattern as the
    sparse-cosine candidate reuse (retrieval.py).
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    grams2 = _word_ngrams_all(F.coalesce(F.col(text_col), F.lit("")), 2)
    counts = (
        df.select(
            F.explode(
                F.concat(tokens(F.coalesce(F.col(text_col), F.lit(""))), grams2)
            ).alias("t")
        )
        .where(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    is_uni = ~F.col("t").contains(" ")
    tot = F.broadcast(
        counts.agg(
            F.coalesce(F.sum(F.when(is_uni, F.col("c"))), F.lit(0)).alias("T"),
            F.coalesce(F.sum(F.when(~is_uni, F.col("c"))), F.lit(0)).alias("B"),
        )
    )
    big = (
        counts.where(~is_uni & (F.col("c") >= min_count))
        .select(
            F.split(F.col("t"), " ").getItem(0).alias("w1"),
            F.split(F.col("t"), " ").getItem(1).alias("w2"),
            F.col("c").alias("c12"),
        )
    )
    u1 = counts.where(is_uni).select(F.col("t").alias("w1"), F.col("c").alias("c1"))
    u2 = counts.where(is_uni).select(F.col("t").alias("w2"), F.col("c").alias("c2"))
    ratio = (F.col("c12").cast("double") / F.col("B")) / (
        (F.col("c1").cast("double") / F.col("T"))
        * (F.col("c2").cast("double") / F.col("T"))
    )
    return (
        big.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(tot)
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "c2",
            ratio.alias("pmi_ratio"),
            F.log(ratio).alias("pmi"),
        )
        .orderBy(F.desc("pmi_ratio"), "w1", "w2")
        .limit(top_k)
    )


def compression_ratio_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib-deflate compression ratio — the classic cheap
    boilerplate/repetition signal for corpus filtering (highly
    compressible text is template or repeated content; near-ratio-1
    text is random or already-compressed junk). Used as a quality rule
    in public corpus pipelines alongside the Gopher repetition rules.

    Returns (id, n_bytes, n_compressed, ratio_ppm) with ``ratio_ppm =
    n_compressed * 1_000_000 DIV n_bytes`` — integer-exact, so an
    oracle replica sharing the same zlib build reproduces it
    bit-for-bit (DEFLATE output for a fixed level is deterministic for
    a given library build; the oracle replica runs the identical
    CPython zlib, which pins this). Arrow-batched mapInPandas; the
    text never travels past the compression stage.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("n_bytes", LongType()),
            StructField("n_compressed", LongType()),
            StructField("ratio_ppm", LongType()),
        ]
    )

    def work(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            nb, nc, rp = [], [], []
            for t in pdf[text_col]:
                raw = (t or "").encode("utf-8")
                comp = zlib.compress(raw, level)
                nb.append(len(raw))
                nc.append(len(comp))
                rp.append(len(comp) * 1_000_000 // len(raw) if raw else 0)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_bytes": nb,
                    "n_compressed": nc,
                    "ratio_ppm": rp,
                }
            )

    return df.select(id_col, text_col).mapInPandas(work, schema=schema)


def cluster_term_lift(
    docs: DataFrame,
    assignments: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    cluster_col: str = "cluster",
    min_count: int = 5,
    top_k: int = 10,
) -> DataFrame:
    """Class-based term relevance for topic labeling — the c-TF-IDF idea
    of BERTopic (Grootendorst, "BERTopic: Neural topic modeling with a
    class-based TF-IDF procedure", 2022), with the log damping replaced
    by the raw relevance LIFT:

        lift(t, c) = (tf_{t,c} / w_c) / (f_t / T)

    (cluster-relative term frequency over corpus-relative term
    frequency). Like pmi_ratio, the lift is a fixed tree of IEEE
    divisions over exact BIGINT counts — bit-exact across engines,
    which the log-damped original is not; the log's damping only
    reweights the tail, the lift carries the ranking signal.

    Plan shape: assignments join the DOC relation (one row per doc)
    BEFORE the token explode, so the join never touches token-instance
    rows; one explode + one (cluster, term) count with map-side
    partials; w_c, f_t and T all derive from that grouped relation (no
    second corpus scan); the per-cluster top-k is a WindowGroupLimit
    cut, not a global sort.

    Returns (cluster, term, tf, lift) — top ``top_k`` terms per
    cluster by (lift desc, term asc) among terms with cluster tf >=
    ``min_count``.
    """
    from pyspark.sql import Window

    joined = docs.select(F.col(id_col), F.col(text_col)).join(
        assignments.select(F.col(id_col), F.col(cluster_col)), id_col
    )
    toks = joined.select(
        F.col(cluster_col), F.explode(tokens(text_col)).alias("term")
    ).where(F.col("term") != "")
    tfc = toks.groupBy(cluster_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    wc = tfc.groupBy(cluster_col).agg(F.sum("tf").alias("_wc"))
    ft = tfc.groupBy("term").agg(F.sum("tf").alias("_ft"))
    tot = tfc.agg(F.sum("tf").alias("_T"))
    scored = (
        tfc.where(F.col("tf") >= min_count)
        .join(wc, cluster_col)
        .join(ft, "term")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col(cluster_col),
            F.col("term"),
            F.col("tf"),
            (
                (F.col("tf").cast("double") / F.col("_wc").cast("double"))
                / (F.col("_ft").cast("double") / F.col("_T").cast("double"))
            ).alias("lift"),
        )
    )
    w = Window.partitionBy(cluster_col).orderBy(F.desc("lift"), F.asc("term"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= top_k)
        .drop("_rn")
    )


def distinct_ngram_diversity(
    docs: DataFrame,
    ns: tuple[int, ...] = (1, 2, 3),
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Corpus diversity by distinct-n ratio (Li et al., NAACL 2016
    "A Diversity-Promoting Objective Function for Neural Conversation
    Models": ``distinct-n = |unique n-grams| / |n-grams|``) per group —
    the standard degenerate-corpus detector: templated/synthetic text
    collapses distinct-2/3 long before humans notice, so a data
    pipeline gates every new source on it (n=1 is the classic
    type-token ratio).

    One explode per n over a shared normalized text column, each a
    map-side explode into a (distinct-count, count) aggregate — no
    joins, no windows; COUNT(DISTINCT) shuffles each n-gram string once
    (Spark plans it as the two-level partial distinct). Gram extraction
    is the module's ONE-codegen-regex-pass lookahead (the same trick as
    ``word_ngrams``/``shingles`` — the token-slice formulation pays n
    interpreted HOF passes per row). Counts are exact integers; each
    ratio is one double division of exact integers — bit-reproducible,
    pure-SQL-replicable. Texts with fewer than n tokens contribute no
    n-grams.

    Returns (group_col, n, n_ngrams, n_distinct, distinct_ratio),
    one row per group per n.
    """
    if not ns or any(n < 1 for n in ns):
        raise ValueError(f"ns must be positive, got {ns!r}")
    c = F.col(text_col)
    norm = F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")
    base = docs.select(F.col(group_col), norm.alias("_norm")).where(
        F.col("_norm") != ""
    )
    out = None
    for n in sorted(set(int(n) for n in ns)):
        # overlapping-capture lookahead anchored at token starts: every
        # run of n consecutive tokens, WITH multiplicity
        pattern = r"(?<!\S)(?=(" + r"\S+ " * (n - 1) + r"\S+))"
        grams = F.regexp_extract_all(F.col("_norm"), F.lit(pattern), 1)
        g = (
            base.select(F.col(group_col), F.explode(grams).alias("_g"))
            .groupBy(group_col)
            .agg(
                F.count(F.lit(1)).alias("n_ngrams"),
                F.countDistinct("_g").alias("n_distinct"),
            )
            .select(
                group_col,
                F.lit(n).cast("long").alias("n"),
                F.col("n_ngrams").cast("long").alias("n_ngrams"),
                F.col("n_distinct").cast("long").alias("n_distinct"),
                (
                    F.col("n_distinct").cast("double")
                    / F.col("n_ngrams").cast("double")
                ).alias("distinct_ratio"),
            )
        )
        out = g if out is None else out.unionByName(g)
    return out
