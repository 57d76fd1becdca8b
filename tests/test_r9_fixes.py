"""Round-9 fixes: KMV small-regime exactness, curriculum single-partition
guard, ppjoin cache lifecycle, string-keyed streaming EWMA."""

import pytest

from pyspark.sql import functions as F


def test_kmv_overlap_small_regime_union_is_exact(spark):
    # 10 + 10 disjoint keys, k large: the union sketch holds the whole
    # union, so union_est must be the exact cardinality (k_used), not the
    # saturated (k_used-1)*2^64/(tau+2^63) estimate
    from deeptime_spark.operators.sketches import kmv_overlap_pairs, kmv_sketch

    rows = [("A", f"a{i}") for i in range(10)] + [("B", f"b{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "src string, key string")
    out = kmv_overlap_pairs(kmv_sketch(df, "key", ["src"], k=256), "src", k=256).collect()
    assert len(out) == 1
    r = out[0]
    assert r["k_used"] == 20
    assert r["union_est"] == 20.0
    assert r["n_common"] == 0 and r["intersection_est"] == 0.0


def test_kmv_overlap_shared_keys_small_regime(spark):
    # overlapping sets below k: union_est exact, intersection exact
    from deeptime_spark.operators.sketches import kmv_overlap_pairs, kmv_sketch

    rows = [("A", f"x{i}") for i in range(12)] + [("B", f"x{i}") for i in range(6, 18)]
    df = spark.createDataFrame(rows, "src string, key string")
    r = kmv_overlap_pairs(kmv_sketch(df, "key", ["src"], k=64), "src", k=64).collect()[0]
    assert r["k_used"] == 18 and r["n_common"] == 6
    assert r["union_est"] == 18.0
    assert r["intersection_est"] == pytest.approx(6.0)


def test_curriculum_requires_group_cols_or_explicit_flag(spark):
    from deeptime_spark.operators.mixing import curriculum_buckets

    df = spark.createDataFrame(
        [(i, float(i), 1) for i in range(4)], "doc_id long, s double, n long"
    )
    with pytest.raises(ValueError, match="ONE task"):
        curriculum_buckets(df, "s", n_buckets=2, group_cols=[], token_col="n")
    out = curriculum_buckets(
        df, "s", n_buckets=2, group_cols=[], token_col="n",
        allow_single_partition=True,
    ).collect()
    assert sum(r["n_docs"] for r in out) == 4


def test_ppjoin_releases_its_caches(spark):
    from deeptime_spark.operators.dedup import ppjoin_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "zeta eta theta iota"),
        ],
        "doc_id long, text string",
    )
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    out = ppjoin_pairs(docs, threshold_pct=60)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (1, 2) in got
    # materialize=True (default) must release the operator's two
    # intermediate persists (token sets, prefix tokens); relative to the
    # session's pre-call state, only the localCheckpoint of the RESULT
    # may remain (its storage is GC-managed — the triangle_counts
    # convention). Delta-based: the shared test session may hold other
    # tests' checkpoints.
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 1


def test_streaming_ewma_string_keys(spark, tmp_path):
    # a string-keyed stream must carry its keys through (the out schema
    # derives the key field type from the input, not a hardcoded Long)
    from deeptime_spark.streaming.accumulate import streaming_ewma

    src = tmp_path / "in"
    src.mkdir()
    df = spark.createDataFrame(
        [("a", 1, 0, 1.0), ("a", 2, 1, 3.0), ("b", 3, 0, 10.0)],
        "name string, event_id long, ts long, value double",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(src / "batch0"))
    stream = (
        spark.readStream.schema("name string, event_id long, ts long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "batch0"))
    )
    out = streaming_ewma(stream, alpha=0.5, key_col="name", value_col="value")
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_str_keys")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["name"]: r for r in spark.sql("select * from ewma_str_keys").collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"]["n_events"] == 2 and rows["a"]["ewma_value"] == pytest.approx(2.0)
    assert rows["b"]["ewma_value"] == pytest.approx(10.0)


def test_dedup_candidate_quality_counts(spark):
    from deeptime_spark.operators.dedup import dedup_candidate_quality

    exact = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6)], "id_a long, id_b long"
    )
    # candidates: one hit (reversed order — must normalize), one dup, one miss
    cands = spark.createDataFrame(
        [(2, 1), (1, 2), (7, 8)], "id_a long, id_b long"
    )
    r = dedup_candidate_quality(cands, exact).collect()[0]
    assert (r["n_exact"], r["n_candidates"], r["n_hit"]) == (3, 2, 1)
    assert r["recall"] == pytest.approx(1 / 3)
    assert r["precision"] == pytest.approx(0.5)
    # empty exact set: recall null, not a crash
    r0 = dedup_candidate_quality(cands, exact.limit(0)).collect()[0]
    assert r0["recall"] is None and r0["n_exact"] == 0


def test_word_unit_minhash_bands_find_token_near_dups(spark):
    from deeptime_spark.operators.dedup import (
        minhash_lsh_candidates,
        ppjoin_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " lambda"),          # J = 10/11 vs doc 1
            (3, "one two three four five"),  # unrelated
        ],
        "doc_id long, text string",
    )
    cands = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            docs, n_hashes=64, bands=16, unit="words"
        ).collect()
    }
    assert (1, 2) in cands and (1, 3) not in cands
    exact = {
        (r["id_a"], r["id_b"])
        for r in ppjoin_pairs(docs, threshold_pct=70).collect()
    }
    assert exact == {(1, 2)}


def test_minhash_rejects_unknown_unit(spark):
    from deeptime_spark.operators.dedup import minhash_signatures_df

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="unit"):
        minhash_signatures_df(df, unit="bytes")
