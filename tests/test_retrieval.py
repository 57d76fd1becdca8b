"""BM25 retrieval (operators/retrieval.py)."""

import pytest
from pyspark.sql import functions as F

from deeptime_spark.operators.retrieval import bm25_search, term_stats, tokenize_counts


def _corpus(spark):
    rows = [
        (0, "spark shuffle join hash join", "s"),
        (1, "hash hash hash join", "s"),
        (2, "completely unrelated words here", "s"),
        (3, "join", "s"),
        (4, "the hash join of the hash join is a hash join", "s"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_term_stats_counts(spark):
    tf, dl, dfreq = term_stats(_corpus(spark))
    tfm = {(r["doc_id"], r["term"]): r["tf"] for r in tf.collect()}
    assert tfm[(1, "hash")] == 3 and tfm[(0, "join")] == 2
    dlm = {r["doc_id"]: r["dl"] for r in dl.collect()}
    assert dlm[3] == 1 and dlm[4] == 11
    dfm = {r["term"]: r["df"] for r in dfreq.collect()}
    assert dfm["join"] == 4 and dfm["hash"] == 3


def test_bm25_ranks_matching_docs_first(spark):
    res = bm25_search(_corpus(spark), "hash join", k=5).collect()
    ids = [r["doc_id"] for r in res]
    assert 2 not in ids  # no query term -> never scored
    assert set(ids) == {0, 1, 3, 4}
    # scores strictly ordered, n_matched consistent
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)
    nm = {r["doc_id"]: r["n_matched"] for r in res}
    assert nm[3] == 1 and nm[0] == 2


def test_bm25_layout_invariance(spark):
    docs = _corpus(spark)
    a = [tuple(r) for r in bm25_search(docs, "hash join", k=5).collect()]
    b = [tuple(r) for r in bm25_search(docs.repartition(7), "hash join", k=5).collect()]
    assert a == b


def test_bm25_unknown_term_contributes_zero(spark):
    # a term absent from the corpus gets idf of log(1 + (N+0.5)/0.5) but
    # tf=0 everywhere -> contributes nothing; ranking equals hash-join-only
    a = [r["doc_id"] for r in bm25_search(_corpus(spark), "hash join", k=5).collect()]
    b = [r["doc_id"] for r in bm25_search(_corpus(spark), "hash join zzzmissing", k=5).collect()]
    assert a == b


def test_bm25_validation(spark):
    with pytest.raises(ValueError):
        bm25_search(_corpus(spark), "   ")
    with pytest.raises(ValueError):
        bm25_search(_corpus(spark), "hash join", id_col="_t0")


def test_bm25_awkward_tokens_resolve(spark):
    # positional pivot aliases: tokens named like internal columns or
    # containing backticks must not break column resolution
    rows = [(0, "dl `tick` doc_id dl", "s"), (1, "unrelated", "s")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    res = bm25_search(docs, "dl `tick`", k=2).collect()
    assert res[0]["doc_id"] == 0 and res[0]["n_matched"] >= 1


def test_tokenize_counts_normalizes(spark):
    docs = spark.createDataFrame(
        [(0, "  Hash\tJOIN  hash  ", "s")], "doc_id long, text string, source string"
    )
    tfm = {(r["doc_id"], r["term"]): r["tf"] for r in tokenize_counts(docs).collect()}
    assert tfm == {(0, "hash"): 2, (0, "join"): 1}


# ----------------------------------------------------- sparse cosine

from deeptime_spark.operators.retrieval import sparse_cosine_pairs


def test_sparse_cosine_finds_near_duplicates(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, base, "s"),
        (1, base + " iota", "s"),          # near-dup of 0
        (2, "totally different words entirely", "s"),
        (3, base, "s"),                     # exact dup of 0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in sparse_cosine_pairs(docs, threshold=0.8, ngram_n=3, max_df=10).collect()
    }
    assert (0, 3) in out and abs(out[(0, 3)] - 1.0) < 1e-12
    assert (0, 1) in out and 0.8 < out[(0, 1)] < 1.0
    assert not any(2 in p for p in out)


def test_sparse_cosine_layout_invariance(spark):
    rows = [(i, f"common prefix words here tail{i % 3} tail{i % 3} end", "s") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    a = sorted(map(tuple, sparse_cosine_pairs(docs, 0.5, 3, 20).collect()))
    b = sorted(map(tuple, sparse_cosine_pairs(docs.repartition(5), 0.5, 3, 20).collect()))
    assert a == b and len(a) > 0


def test_sparse_cosine_rare_gram_contract(spark):
    # two docs share ONLY a gram whose df exceeds max_df -> no candidate
    common = "the quick brown"
    rows = [(i, common + f" unique{i} only{i} here{i}", "s") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = sparse_cosine_pairs(docs, threshold=0.0, ngram_n=3, max_df=3).collect()
    # every 3-gram containing 'the quick brown' appears in all 8 docs (df=8>3)
    # except the per-doc unique tails (df=1) which no pair shares
    assert out == []


def test_rrf_fuse_known_rankings(spark):
    import pytest

    from deeptime_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank long")
    b = spark.createDataFrame([(3, 1), (1, 2), (9, 3)], "doc_id long, rank long")
    got = {r["doc_id"]: r for r in rrf_fuse([a, b], k=10).collect()}
    # doc 1: 1/61 + 1/62; doc 3: 1/63 + 1/61; doc 2: 1/62; doc 9: 1/63
    assert got[1]["rrf_score"] == pytest.approx(1 / 61 + 1 / 62, abs=1e-15)
    assert got[3]["rrf_score"] == pytest.approx(1 / 63 + 1 / 61, abs=1e-15)
    assert got[2]["rrf_score"] == pytest.approx(1 / 62, abs=1e-15)
    assert got[9]["rrf_score"] == pytest.approx(1 / 63, abs=1e-15)
    # absence marked -1; order by fused score
    assert got[2]["rank_1"] == -1 and got[9]["rank_0"] == -1
    order = [r["doc_id"] for r in rrf_fuse([a, b], k=3).collect()]
    assert order == [1, 3, 2]
    with pytest.raises(ValueError):
        rrf_fuse([])


def test_hybrid_search_contains_both_modalities(spark):
    from deeptime_spark.operators.retrieval import hybrid_search

    docs = spark.createDataFrame(
        [(i, "alpha beta " + ("needle " * (i % 3))) for i in range(20)],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    out = hybrid_search(docs, emb, "needle", [1.0, 0.0], k=5, k_each=5)
    rows = out.collect()
    assert len(rows) == 5
    assert {"doc_id", "rrf_score", "rank_bm25", "rank_dense"} <= set(out.columns)
    # every returned doc appears in at least one candidate list
    assert all(r["rank_bm25"] > 0 or r["rank_dense"] > 0 for r in rows)
