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
