"""Plain-SQL surface for the engine's scalar text/dedup kernels.

Spark 4 SQL UDFs (``CREATE TEMPORARY FUNCTION ... RETURNS ... RETURN
<expr>``) let SQL-only users call the same expressions the DataFrame
operators compile to — no Python round trip, full Catalyst
optimization, and constant folding makes the parameterized regex
patterns foldable after inlining (so ``k``/``n`` must be literals at
the call site, which SQL analysts pass anyway).

The bodies are GENERATED from the same parameters as the Column
builders in ``operators/text.py`` / ``operators/dedup.py``;
``tests/test_sql_functions.py`` pins SQL-vs-Column equality on real
documents so the two surfaces cannot drift apart silently.

``dt_simhash64`` / ``dt_minhash32`` are the convenience forms built on
interpreted higher-order functions — right for ad-hoc SQL analysis.
Corpus-scale signature jobs should use ``simhash_signatures_df`` /
``minhash_signatures_df``, whose explode + codegen-aggregate plans are
the 100 TB path (see their docstrings).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_NORM = r"regexp_replace(trim(lower({t})), '\\s+', ' ')"
_TOKS = r"split(trim(lower({t})), '\\s+')"


def _simhash_body(bits: int = 64) -> str:
    # exact mirror of operators/dedup.py:simhash — same tokenization
    # (empty tokens from empty text included), same votes, same bits
    hashed = "transform(" + _TOKS.format(t="t") + ", s -> xxhash64(s))"
    terms = []
    for p in range(bits):
        vote = (
            f"aggregate({hashed}, 0L, (acc, h) -> acc +"
            f" IF(((shiftright(h, {p}) & 1L) = 1L), 1L, -1L))"
        )
        terms.append(f"shiftleft(IF({vote} > 0L, 1L, 0L), {p})")
    return " + ".join(terms)


def _minhash_body(n_hashes: int = 32) -> str:
    sh = (
        "array_distinct(regexp_extract_all("
        + _NORM.format(t="t")
        + ", '(?=(.{' || k || '}))', 1))"
    )
    mins = ", ".join(
        f"array_min(transform(_sh, s -> hash(s, {i})))" for i in range(n_hashes)
    )
    # one named pass over the shingle array via a lambda binding
    return f"transform(array({sh}), _sh -> array({mins}))[0]"


def sql_function_definitions() -> dict[str, str]:
    """name -> CREATE TEMPORARY FUNCTION statement."""
    norm = _NORM.format(t="t")
    ngram_pat = r"'(?<!\\S)(?=(' || repeat('\\S+ ', n - 1) || '\\S+))'"
    word_ngrams = (
        f"CASE WHEN size(split({norm}, ' ')) < n THEN array({norm}) "
        f"ELSE array_distinct(regexp_extract_all({norm}, {ngram_pat}, 1)) END"
    )
    return {
        "dt_token_count": (
            # exact mirror of operators/text.py:token_count
            "CREATE OR REPLACE TEMPORARY FUNCTION dt_token_count(t STRING) RETURNS INT "
            f"RETURN size({_TOKS.format(t='t')})"
        ),
        "dt_shingles": (
            "CREATE OR REPLACE TEMPORARY FUNCTION dt_shingles(t STRING, k INT) "
            "RETURNS ARRAY<STRING> RETURN "
            f"CASE WHEN length({norm}) < k THEN array({norm}) "
            f"ELSE regexp_extract_all({norm}, '(?=(.{{' || k || '}}))', 1) END"
        ),
        "dt_word_ngrams": (
            "CREATE OR REPLACE TEMPORARY FUNCTION dt_word_ngrams(t STRING, n INT) "
            f"RETURNS ARRAY<STRING> RETURN {word_ngrams}"
        ),
        "dt_ngram_jaccard": (
            "CREATE OR REPLACE TEMPORARY FUNCTION dt_ngram_jaccard(a STRING, b STRING, n INT) "
            "RETURNS DOUBLE RETURN "
            "size(array_intersect(dt_word_ngrams(a, n), dt_word_ngrams(b, n))) / "
            "greatest(size(array_union(dt_word_ngrams(a, n), dt_word_ngrams(b, n))), 1)"
        ),
        "dt_simhash64": (
            "CREATE OR REPLACE TEMPORARY FUNCTION dt_simhash64(t STRING) RETURNS BIGINT "
            f"RETURN {_simhash_body()}"
        ),
        "dt_minhash32": (
            "CREATE OR REPLACE TEMPORARY FUNCTION dt_minhash32(t STRING, k INT) "
            f"RETURNS ARRAY<INT> RETURN {_minhash_body()}"
        ),
        "dt_hamming64": (
            "CREATE OR REPLACE TEMPORARY FUNCTION dt_hamming64(a BIGINT, b BIGINT) "
            "RETURNS INT RETURN bit_count(a ^ b)"
        ),
    }


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Install every dt_* SQL function into the session; returns names."""
    defs = sql_function_definitions()
    for stmt in defs.values():
        spark.sql(stmt)
    return list(defs)
