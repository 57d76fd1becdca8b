"""SQL-surface drift pins: every dt_* SQL function must equal the
Column builder it mirrors, on real harness documents."""

import pytest
from pyspark.sql import functions as F

from deeptime_spark.sql_functions import register_sql_functions

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sql_docs(spark):
    register_sql_functions(spark)
    spark.read.parquet(f"{SF}/documents.parquet").limit(60).createOrReplaceTempView(
        "sqlfn_docs"
    )
    return spark


def _both(spark, sql_expr, col):
    got = spark.sql(
        f"SELECT doc_id, {sql_expr} AS v FROM sqlfn_docs ORDER BY doc_id"
    ).collect()
    want = (
        spark.table("sqlfn_docs")
        .select("doc_id", col.alias("v"))
        .orderBy("doc_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_token_count(sql_docs):
    from deeptime_spark.operators.text import token_count

    _both(sql_docs, "dt_token_count(text)", token_count("text"))


def test_shingles(sql_docs):
    from deeptime_spark.operators.text import shingles

    _both(sql_docs, "dt_shingles(text, 5)", shingles("text", 5))


def test_word_ngrams(sql_docs):
    from deeptime_spark.operators.text import word_ngrams

    _both(sql_docs, "dt_word_ngrams(text, 3)", word_ngrams("text", 3))


def test_simhash(sql_docs):
    from deeptime_spark.operators.dedup import simhash

    _both(sql_docs, "dt_simhash64(text)", simhash("text"))


def test_minhash(sql_docs):
    from deeptime_spark.operators.dedup import minhash_signature

    _both(
        sql_docs,
        "dt_minhash32(text, 5)",
        minhash_signature("text", n_hashes=32, shingle_k=5),
    )


def test_jaccard_and_hamming(sql_docs):
    from deeptime_spark.operators.dedup import hamming_distance64, ngram_jaccard, simhash

    spark = sql_docs
    pairs = spark.sql(
        """SELECT a.doc_id ia, b.doc_id ib, a.text ta, b.text tb
           FROM sqlfn_docs a JOIN sqlfn_docs b ON b.doc_id = a.doc_id + 1"""
    )
    pairs.createOrReplaceTempView("sqlfn_pairs")
    got = spark.sql(
        """SELECT ia, dt_ngram_jaccard(ta, tb, 3) AS j,
                  dt_hamming64(dt_simhash64(ta), dt_simhash64(tb)) AS h
           FROM sqlfn_pairs ORDER BY ia"""
    ).collect()
    want = (
        spark.table("sqlfn_pairs")
        .select(
            "ia",
            ngram_jaccard(F.col("ta"), F.col("tb"), 3).alias("j"),
            hamming_distance64(simhash(F.col("ta")), simhash(F.col("tb"))).cast("int").alias("h"),
        )
        .orderBy("ia")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_registration_is_idempotent(sql_docs):
    """CREATE OR REPLACE: registering twice in one session must not raise
    (round-4 ADVICE — FUNCTION_ALREADY_EXISTS kept doc_sql_surface out of
    repeated-run sweeps)."""
    spark = sql_docs
    register_sql_functions(spark)
    register_sql_functions(spark)
    assert spark.sql("SELECT dt_token_count('a b c') AS v").collect()[0]["v"] == 3
