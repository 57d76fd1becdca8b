"""Data-mixing operators: deterministic sampling + domain reweighting."""

import pytest
from pyspark.sql import functions as F

from deeptime_spark.operators import mixing


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_sample_layout_invariant(spark, docs):
    a = sorted(r["doc_id"] for r in mixing.sample_deterministic(docs, 250000).collect())
    b = sorted(
        r["doc_id"]
        for r in mixing.sample_deterministic(docs.repartition(13), 250000).collect()
    )
    assert a == b and 0 < len(a) < docs.count()


def test_sample_nested_rates(spark, docs):
    # a lower rate's sample is a SUBSET of a higher rate's (same key, same
    # salt -> same uniform variate, thresholded)
    lo = {r["doc_id"] for r in mixing.sample_deterministic(docs, 100000).collect()}
    hi = {r["doc_id"] for r in mixing.sample_deterministic(docs, 400000).collect()}
    assert lo <= hi


def test_sample_salt_decorrelates(spark, docs):
    a = {r["doc_id"] for r in mixing.sample_deterministic(docs, 500000, salt=0).collect()}
    b = {r["doc_id"] for r in mixing.sample_deterministic(docs, 500000, salt=1).collect()}
    assert a != b  # independent decisions
    # both still roughly half the corpus
    n = docs.count()
    assert 0.3 * n < len(a) < 0.7 * n and 0.3 * n < len(b) < 0.7 * n


def test_domain_mixture_budget_math(spark):
    rows = [
        (i, " ".join(["w"] * 100), "a") for i in range(10)
    ] + [(100 + i, " ".join(["w"] * 100), "b") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in mixing.domain_mixture(df, {"a": 0.5, "b": 0.5}).collect()}
    # a: 1000 tokens, b: 3000 tokens; budget S = min(1000/.5, 3000/.5) = 2000
    # rate_a = .5*2000/1000 = 1.0; rate_b = .5*2000/3000 = 1/3
    assert out["a"]["sampling_rate"] == 1.0
    assert abs(out["b"]["sampling_rate"] - 1 / 3) < 1e-12
    assert out["a"]["observed_share"] == 0.25


def test_domain_mixture_zero_target_zero_rate(spark):
    df = spark.createDataFrame(
        [(1, "w w w", "a"), (2, "w w w", "b")], "doc_id long, text string, source string"
    )
    out = {r["source"]: r for r in mixing.domain_mixture(df, {"a": 1.0}).collect()}
    assert out["b"]["sampling_rate"] == 0.0
    assert out["a"]["sampling_rate"] == 1.0
    # no positive-target domain at all -> every rate clamps to 0, not 1
    out2 = {r["source"]: r for r in mixing.domain_mixture(df, {}).collect()}
    assert all(r["sampling_rate"] == 0.0 for r in out2.values())


def test_stratified_rates_apply_per_stratum(spark, docs):
    kept = mixing.stratified_sample(
        docs, {"src0": 1_000_000}, default_ppm=0
    )
    got = kept.select("source").distinct().collect()
    assert [r["source"] for r in got] == ["src0"]
    assert kept.count() == docs.where(F.col("source") == "src0").count()


def test_null_keys_never_sampled(spark):
    df = spark.createDataFrame(
        [(None, "a"), (1, "a"), (2, "b")], "doc_id long, source string"
    )
    kept = mixing.sample_deterministic(df, 1_000_000)  # rate = 100%
    ids = [r["doc_id"] for r in kept.collect()]
    assert None not in ids and sorted(ids) == [1, 2]


# ------------------------------------------------- leakage-safe split


def test_leakage_safe_split_clusters_never_span(spark):
    from deeptime_spark.operators.mixing import leakage_safe_split
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"text {i}", "s") for i in range(200)],
        "doc_id long, text string, source string",
    )
    # chain 0-1-2 one cluster; 10-11 another
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    out = leakage_safe_split(docs, pairs, train_pct=60, val_pct=20, seed=3)
    rows = {r["doc_id"]: (r["cluster_rep"], r["split"]) for r in out.collect()}
    assert rows[0][1] == rows[1][1] == rows[2][1]
    assert rows[0][0] == rows[1][0] == rows[2][0] == 0
    assert rows[10][1] == rows[11][1]
    assert rows[50][0] == 50  # singleton represents itself
    # splits roughly follow 60/20/20 across 200 mostly-singleton docs
    from collections import Counter

    c = Counter(s for _, s in rows.values())
    assert 0.4 < c["train"] / 200 < 0.8
    assert c["val"] > 0 and c["test"] > 0


def test_leakage_safe_split_deterministic_across_layouts(spark):
    from deeptime_spark.operators.mixing import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"t{i}", "s") for i in range(50)], "doc_id long, text string, source string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    a = sorted(map(tuple, leakage_safe_split(docs, pairs).select("doc_id", "split").collect()))
    b = sorted(
        map(
            tuple,
            leakage_safe_split(docs.repartition(7), pairs).select("doc_id", "split").collect(),
        )
    )
    assert a == b


def test_leakage_safe_split_validation(spark):
    import pytest as _pytest

    from deeptime_spark.operators.mixing import leakage_safe_split

    docs = spark.createDataFrame([(1, "t", "s")], "doc_id long, text string, source string")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    with _pytest.raises(ValueError):
        leakage_safe_split(docs, pairs, train_pct=80, val_pct=30)


def test_weighted_sample_proportional_and_deterministic(spark):
    import pytest

    from deeptime_spark.operators.mixing import weighted_sample

    rows = [(i, 1 if i < 4000 else 10) for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    kept = weighted_sample(df, "w", target_ppm=200_000)
    got = {r["doc_id"] for r in kept.collect()}
    # heavy rows (w=10, ~3.5x mean) keep ~3.5x more often than light
    light = sum(1 for i in got if i < 4000) / 4000
    heavy = sum(1 for i in got if i >= 4000) / 1000
    assert heavy > 2.5 * light
    # layout-independent: same result after repartition
    got2 = {
        r["doc_id"]
        for r in weighted_sample(df.repartition(13), "w", target_ppm=200_000).collect()
    }
    assert got == got2
    # zero/negative weights and null keys never pass
    df2 = spark.createDataFrame(
        [(1, 0), (2, -5), (None, 100), (3, 100)], "doc_id long, w long"
    )
    kept2 = {r["doc_id"] for r in weighted_sample(df2, "w", target_ppm=1_000_000).collect()}
    assert kept2 == {3}
    with pytest.raises(ValueError):
        weighted_sample(df, "w", target_ppm=0)


# ----------------------------------------------------- global_shuffle
def test_global_shuffle_dense_positions_and_determinism(spark, docs):
    from deeptime_spark.operators.mixing import global_shuffle

    out = global_shuffle(docs, n_shards=4, salt=7, n_buckets=16)
    rows = out.select("doc_id", "shard", "pos").collect()
    assert len(rows) == docs.count()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(4))
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), f"shard {s} not dense"
    # layout invariance: repartitioned input gives the identical placement
    again = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in global_shuffle(docs.repartition(13), 4, salt=7, n_buckets=16)
        .select("doc_id", "shard", "pos")
        .collect()
    }
    assert again == {r["doc_id"]: (r["shard"], r["pos"]) for r in rows}


def test_global_shuffle_offline_replica(spark, docs):
    """Any row's placement is auditable with the engine-independent
    xxhash64 replica: shard = pmod(h_shuffle, n); order within shard =
    (bucket, h_shuffle, key) lexicographic."""
    from deeptime_spark.operators.mixing import global_shuffle
    from deeptime_spark.spark_hashes import xxhash64

    n_shards, n_buckets, salt = 3, 8, 1
    rows = (
        global_shuffle(docs, n_shards, salt=salt, n_buckets=n_buckets)
        .select("doc_id", "shard", "pos")
        .collect()
    )
    ids = [r["doc_id"] for r in rows]
    placement = {}
    for i in ids:
        h = xxhash64(f"{i}#shuffle{salt}".encode())
        b = xxhash64(f"{i}#bucket{salt}".encode()) % n_buckets
        placement[i] = (h % n_shards, b, h)
    for s in range(n_shards):
        members = sorted(
            (i for i in ids if placement[i][0] == s),
            key=lambda i: (placement[i][1], placement[i][2], i),
        )
        expect = {i: p for p, i in enumerate(members)}
        got = {r["doc_id"]: r["pos"] for r in rows if r["shard"] == s}
        assert got == expect


def test_global_shuffle_single_shard_and_validation(spark, docs):
    from deeptime_spark.operators.mixing import global_shuffle

    one = global_shuffle(docs.limit(50), n_shards=1, n_buckets=4)
    ps = sorted(r["pos"] for r in one.select("pos").collect())
    assert ps == list(range(50))
    with pytest.raises(ValueError):
        global_shuffle(docs, 0)
    with pytest.raises(ValueError):
        global_shuffle(docs, 2, n_buckets=0)


def test_global_shuffle_null_keys_kept(spark):
    from deeptime_spark.operators.mixing import global_shuffle

    df = spark.createDataFrame(
        [(None, "a"), (1, "b"), (2, "c")], "doc_id long, text string"
    )
    rows = global_shuffle(df, n_shards=2, n_buckets=4).collect()
    assert len(rows) == 3  # null keys placed deterministically, not dropped


# ------------------------------------------------- temperature_mixture
def test_temperature_mixture_t1_keeps_natural_shares(spark, docs):
    from deeptime_spark.operators.mixing import temperature_mixture

    rows = temperature_mixture(docs, temperature=1.0).collect()
    for r in rows:
        assert r["target_share"] == pytest.approx(r["observed_share"], abs=1e-12)
        assert r["sampling_rate"] == pytest.approx(1.0, abs=1e-9)


def test_temperature_mixture_flattens_toward_uniform(spark, docs):
    from deeptime_spark.operators.mixing import temperature_mixture

    t2 = {r["source"]: r for r in temperature_mixture(docs, 2.0).collect()}
    obs = {s: r["observed_share"] for s, r in t2.items()}
    tgt = {s: r["target_share"] for s, r in t2.items()}
    big = max(obs, key=obs.get)
    small = min(obs, key=obs.get)
    # scaling compresses the spread: the biggest domain loses share,
    # the smallest gains
    assert tgt[big] < obs[big] and tgt[small] > obs[small]
    assert sum(tgt.values()) == pytest.approx(1.0, abs=1e-12)
    # rates realize the target: rate_d * tokens_d proportional to target
    kept = {
        s: t2[s]["sampling_rate"] * t2[s]["n_tokens"] for s in t2
    }
    total_kept = sum(kept.values())
    for s in t2:
        assert kept[s] / total_kept == pytest.approx(tgt[s], rel=1e-9)


def test_temperature_mixture_validation(spark, docs):
    from deeptime_spark.operators.mixing import temperature_mixture

    with pytest.raises(ValueError):
        temperature_mixture(docs, temperature=0.0)


# ------------------------------------------------------ group_sample
def test_group_sample_bottomk_nested_and_deterministic(spark, docs):
    from deeptime_spark.operators.mixing import group_sample

    s5 = group_sample(docs, 5, ["source"]).select("source", "doc_id", "sample_rank")
    s10 = group_sample(docs, 10, ["source"]).select("source", "doc_id")
    small = {(r["source"], r["doc_id"]) for r in s5.collect()}
    big = {(r["source"], r["doc_id"]) for r in s10.collect()}
    assert small <= big  # nested samples (bottom-k property)
    per = {}
    for r in s5.collect():
        per.setdefault(r["source"], []).append(r["sample_rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per.values())
    again = {
        (r["source"], r["doc_id"])
        for r in group_sample(docs.repartition(9), 5, ["source"]).collect()
    }
    assert again == small
    with pytest.raises(ValueError):
        group_sample(docs, 0, ["source"])
    with pytest.raises(ValueError):
        group_sample(docs, 5, [])
