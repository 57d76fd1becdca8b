"""Round-8 late additions: per-key EWMA fold (operators/stats.py),
curriculum bucketing (operators/mixing.py), the persisted postings
index (operators/retrieval.py), and KMV set-operation overlap
estimation (operators/sketches.py)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from deeptime_spark.operators.mixing import curriculum_buckets
from deeptime_spark.operators.retrieval import (
    probe_postings_index,
    write_postings_index,
)
from deeptime_spark.operators.sketches import kmv_overlap_pairs, kmv_sketch
from deeptime_spark.operators.stats import ewma_by_key
from deeptime_spark.spark_hashes import xxhash64

# ------------------------------------------------------------------ EWMA


def _ewma_py(xs, alpha):
    s = xs[0]
    for x in xs[1:]:
        s = s * (1.0 - alpha) + x * alpha
    return s


def test_ewma_matches_python_fold_bitexact(spark, rng):
    rows = []
    for uid in range(5):
        for t in range(40):
            rows.append((uid, t, float(rng.normal())))
    df = spark.createDataFrame(rows, "user_id int, t int, value double")
    got = {
        r["user_id"]: (r["n_events"], r["ewma_value"])
        for r in ewma_by_key(
            df, "value", order_cols=["t"], group_cols=["user_id"], alpha=0.25
        ).collect()
    }
    by_uid = {}
    for uid, t, v in rows:
        by_uid.setdefault(uid, []).append((t, v))
    for uid, tv in by_uid.items():
        xs = [v for _, v in sorted(tv)]
        n, e = got[uid]
        assert n == len(xs)
        assert e == _ewma_py(xs, 0.25)  # bit-exact IEEE fold


def test_ewma_single_event_and_null_drop(spark):
    df = spark.createDataFrame(
        [(1, 0, 7.5), (2, 0, None), (2, 1, 3.0)],
        "user_id int, t int, value double",
    )
    got = {
        r["user_id"]: (r["n_events"], r["ewma_value"])
        for r in ewma_by_key(
            df, "value", order_cols=["t"], group_cols=["user_id"]
        ).collect()
    }
    assert got[1] == (1, 7.5)  # fold seed is the first element
    assert got[2] == (1, 3.0)  # nulls dropped before the fold


def test_ewma_layout_invariant(spark, rng):
    rows = [(i % 7, i, float(rng.normal())) for i in range(300)]
    df = spark.createDataFrame(rows, "user_id int, t int, value double")
    a = ewma_by_key(df.coalesce(1), "value", ["t"], ["user_id"]).collect()
    b = ewma_by_key(df.repartition(13), "value", ["t"], ["user_id"]).collect()
    assert {(r["user_id"], r["ewma_value"]) for r in a} == {
        (r["user_id"], r["ewma_value"]) for r in b
    }


def test_ewma_requires_order(spark):
    df = spark.createDataFrame([(1, 1.0)], "user_id int, value double")
    with pytest.raises(ValueError):
        ewma_by_key(df, "value", order_cols=[], group_cols=["user_id"])


# ------------------------------------------------------------ curriculum


def test_curriculum_buckets_ntile_and_cumsum(spark):
    # 10 docs, one group, score = doc_id (descending rank = highest id first)
    rows = [(i, float(i), 10 + i) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, s double, n long")
    out = curriculum_buckets(
        df, "s", n_buckets=4, group_cols=[], id_col="doc_id", token_col="n",
        allow_single_partition=True,
    ).collect()
    by_b = {r["bucket"]: r for r in out}
    # ntile(4) over 10 rows: sizes 3,3,2,2; ranking is score desc
    assert [by_b[b]["n_docs"] for b in (1, 2, 3, 4)] == [3, 3, 2, 2]
    assert by_b[1]["max_score"] == 9.0 and by_b[1]["min_score"] == 7.0
    assert by_b[4]["min_score"] == 0.0
    total = sum(r["n_tokens"] for r in out)
    assert by_b[4]["cum_tokens"] == total
    # cumulative is monotone and bucket-1-prefixed
    assert by_b[1]["cum_tokens"] == by_b[1]["n_tokens"]


def test_curriculum_grouped_and_tie_break(spark):
    # equal scores -> tie broken by doc_id ascending, per group
    rows = [("a", i, 1.0, 1) for i in range(4)] + [("b", i, 1.0, 1) for i in range(2)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, s double, n long")
    out = curriculum_buckets(
        df, "s", n_buckets=2, group_cols=["lang"], id_col="doc_id", token_col="n"
    ).collect()
    a = {r["bucket"]: r["n_docs"] for r in out if r["lang"] == "a"}
    b = {r["bucket"]: r["n_docs"] for r in out if r["lang"] == "b"}
    assert a == {1: 2, 2: 2} and b == {1: 1, 2: 1}


# -------------------------------------------------------- postings index


def test_postings_index_roundtrip_and_pruning(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (0, "fast scan and fast merge"),
            (1, "scan the window"),
            (2, "merge scan window scan"),
            (3, "nothing here"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "pidx")
    write_postings_index(docs, path, n_buckets=8)
    out = {
        r["doc_id"]: (r["n_terms"], r["total_tf"])
        for r in probe_postings_index(
            spark, path, ["scan", "window"], mode="and"
        ).collect()
    }
    assert out == {1: (2, 2), 2: (2, 3)}
    out_or = {
        r["doc_id"]: r["total_tf"]
        for r in probe_postings_index(
            spark, path, ["scan", "window"], mode="or"
        ).collect()
    }
    assert out_or == {0: 1, 1: 2, 2: 3}
    # the physical scan must be pruned to the probed buckets
    probed = {xxhash64(t.encode()) % 8 for t in ("scan", "window")}
    lists = spark.read.parquet(f"{path}/postings").where(
        F.col("_bucket").isin(sorted(probed))
    )
    plan = lists._jdf.queryExecution().executedPlan().toString()
    seg = plan.split("PartitionFilters")[1][:200]
    assert "_bucket" in seg  # the bucket IN-list must be a partition filter


def test_postings_probe_contract(spark, tmp_path):
    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    path = str(tmp_path / "pidx2")
    write_postings_index(docs, path, n_buckets=4)
    with pytest.raises(ValueError):
        probe_postings_index(spark, path, ["a"], mode="xor")
    with pytest.raises(ValueError):
        probe_postings_index(spark, path, ["   "])
    with pytest.raises(ValueError):
        probe_postings_index(spark, path, [f"t{i}" for i in range(300)])


# ------------------------------------------------------------ KMV overlap


def test_kmv_sketch_is_bottomk_of_distinct_hashes(spark):
    vals = [f"v{i}" for i in range(200)] * 3  # duplicates collapse
    df = spark.createDataFrame([(v,) for v in vals], "key string")
    got = sorted(r["h"] for r in kmv_sketch(df, "key", [], k=16).collect())
    exp = sorted(xxhash64(f"v{i}".encode()) for i in range(200))[:16]
    assert got == exp


def test_kmv_overlap_estimates_match_ground_truth(spark):
    # two sets with known overlap: A = 0..999, B = 500..1499 (J = 1/3)
    rows = [("A", f"x{i}") for i in range(1000)] + [
        ("B", f"x{i}") for i in range(500, 1500)
    ]
    df = spark.createDataFrame(rows, "src string, key string")
    k = 256
    sk = kmv_sketch(df, "key", ["src"], k=k)
    out = kmv_overlap_pairs(sk, "src", k=k).collect()
    assert len(out) == 1
    r = out[0]
    assert r["group_a"] == "A" and r["group_b"] == "B"
    assert r["k_used"] == k
    assert r["jaccard_est"] == r["n_common"] / k
    # sketch guarantees: estimates within sampling error of truth
    assert abs(r["jaccard_est"] - 1 / 3) < 0.12
    assert abs(r["union_est"] - 1500) / 1500 < 0.25
    assert abs(r["intersection_est"] - 500) / 500 < 0.5


def test_kmv_overlap_all_pairs_lexicographic(spark):
    rows = [(s, f"{s}-{i}") for s in ("a", "b", "c") for i in range(50)]
    df = spark.createDataFrame(rows, "src string, key string")
    out = kmv_overlap_pairs(kmv_sketch(df, "key", ["src"], k=32), "src", k=32)
    pairs = {(r["group_a"], r["group_b"]) for r in out.collect()}
    assert pairs == {("a", "b"), ("a", "c"), ("b", "c")}
    assert all(r["n_common"] == 0 for r in out.collect())  # disjoint sets


def test_kmv_sketch_validates_k(spark):
    df = spark.createDataFrame([("x",)], "key string")
    with pytest.raises(ValueError):
        kmv_sketch(df, "key", [], k=0)


# ------------------------------------------------------------- pHash


def test_phash_integer_exact_and_separation(spark):
    from deeptime_spark.operators.multimodal import (
        phash_bytes,
        synth_ppm,
        synth_ppm_variant,
    )


    def hd(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    base = [phash_bytes(synth_ppm(16, 16, seed=i)) for i in range(0, 60, 3)]
    # deterministic: same payload -> same hash
    assert base[0] == phash_bytes(synth_ppm(16, 16, seed=0))
    # planted one-pixel variants stay within radius 4
    for i in range(0, 60, 15):
        assert hd(phash_bytes(synth_ppm(16, 16, seed=i)), phash_bytes(synth_ppm_variant(16, 16, seed=i))) <= 4
    # unrelated images are far apart
    import itertools

    assert min(hd(a, b) for a, b in itertools.combinations(base, 2)) > 8
    # non-image payloads degrade to None, not an exception
    assert phash_bytes(b"not an image") is None


def test_phash_images_matches_scalar(spark):
    from deeptime_spark.operators.multimodal import (
        phash_bytes,
        phash_images,
        synth_ppm,
    )

    rows = [(i, synth_ppm(16, 16, seed=i)) for i in range(12)]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r["phash"] for r in phash_images(media).collect()}
    for i, p in rows:
        assert got[i] == phash_bytes(p)


# ------------------------------------------------------ streaming EWMA


def test_streaming_ewma_equals_batch(spark, tmp_path, rng):
    """End-of-stream state must equal the batch fold bit-for-bit when
    chunks replay in time order."""
    import os

    from deeptime_spark.operators.stats import ewma_by_key
    from deeptime_spark.streaming.accumulate import streaming_ewma

    rows = [(i % 5, i, i, float(rng.normal())) for i in range(400)]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, value double")
    batch = {
        r["user_id"]: (r["n_events"], r["ewma_value"])
        for r in ewma_by_key(df, "value", ["ts", "event_id"], ["user_id"]).collect()
    }
    src = str(tmp_path / "src")
    os.makedirs(src)
    for c in range(4):
        before = set(os.listdir(src))
        df.where((F.col("ts") >= c * 100) & (F.col("ts") < (c + 1) * 100)).coalesce(
            1
        ).write.mode("append").parquet(src)
        for f in set(os.listdir(src)) - before:
            if f.endswith(".parquet"):
                os.utime(os.path.join(src, f), (c * 1000, c * 1000))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    out = streaming_ewma(stream, alpha=0.25)
    q = (
        out.writeStream.format("memory")
        .queryName("t_ewma")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    final = {
        r["user_id"]: (r["n_events"], r["ewma_value"])
        for r in spark.table("t_ewma")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.expr("max_by(ewma_value, n_events)").alias("ewma_value"),
        )
        .collect()
    }
    spark.catalog.dropTempView("t_ewma")
    assert final == batch  # bit-exact


# ------------------------------------------------------- PPJoin (exact)


def test_ppjoin_exact_vs_bruteforce(spark, rng):
    """Prefix filtering must lose NOTHING: results equal brute-force
    all-pairs Jaccard at the threshold."""
    from deeptime_spark.operators.dedup import ppjoin_pairs

    vocab = [f"w{i}" for i in range(50)]
    rows = []
    for i in range(80):
        k = int(rng.integers(5, 15))
        toks = list(rng.choice(vocab, size=k, replace=False))
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["n_intersect"], r["n_union"])
        for r in ppjoin_pairs(df, threshold_pct=60).collect()
    }
    sets = {i: set(t.split()) for i, t in rows}
    exp = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = sets[ids[x]], sets[ids[y]]
            inter = len(a & b)
            union = len(a | b)
            if 100 * inter >= 60 * union:
                exp[(ids[x], ids[y])] = (inter, union)
    assert got == exp


def test_ppjoin_identical_and_disjoint(spark):
    from deeptime_spark.operators.dedup import ppjoin_pairs

    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d e"), (2, "x y z q r")],
        "doc_id long, text string",
    )
    out = ppjoin_pairs(df, threshold_pct=90).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"], r["jaccard"]) == (0, 1, 1.0)


def test_ppjoin_threshold_validation(spark):
    from deeptime_spark.operators.dedup import ppjoin_pairs

    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        ppjoin_pairs(df, threshold_pct=0)
    with pytest.raises(ValueError):
        ppjoin_pairs(df, threshold_pct=101)


# ---------------------------------------------------------------- BFS


def test_bfs_distances_simple_chain_and_fork(spark):
    from deeptime_spark.operators.graph import bfs_distances

    # 0-1-2-3 chain plus fork 1-4; seed {0}
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (1, 4)], "src long, dst long"
    )
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, [0]).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 2}


def test_bfs_multi_source_and_depth_cap(spark):
    from deeptime_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11)], "src long, dst long"
    )
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, [0, 10], max_depth=2).collect()}
    # node 3 is 3 hops away -> excluded by the cap; component of 10 reached
    assert got == {0: 0, 10: 0, 1: 1, 11: 1, 2: 2}


def test_bfs_directed_vs_undirected(spark):
    from deeptime_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame([(1, 0), (1, 2)], "src long, dst long")
    und = {r["node"]: r["dist"] for r in bfs_distances(edges, [0]).collect()}
    assert und == {0: 0, 1: 1, 2: 2}
    d = {r["node"]: r["dist"] for r in bfs_distances(edges, [0], directed=True).collect()}
    assert d == {0: 0}  # no out-edges from 0

    with pytest.raises(ValueError):
        bfs_distances(edges, [])


def test_drop_setsim_duplicates_composition(spark):
    from deeptime_spark.operators.dedup import drop_near_duplicates, ppjoin_pairs

    docs = spark.createDataFrame(
        [
            (0, "a b c d e", 5),
            (1, "a b c d e", 5),
            (2, "a b c d e f", 6),
            (3, "x y z w v", 5),
        ],
        "doc_id long, text string, n_chars long",
    )
    pairs = ppjoin_pairs(docs, threshold_pct=80)
    kept = sorted(r["doc_id"] for r in drop_near_duplicates(docs, pairs).collect())
    # {0,1,2} form one cluster (0-1 exact, 2 within 5/6 >= 0.8); 0 is canonical
    assert kept == [0, 3]


# ----------------------------------------------------- bottom-k rollup


def test_bottomk_rollup_is_monoid(spark, tmp_path):
    """Rollup of per-day bottom-k sketch tables must equal the one-shot
    bottom-k quantiles over the full data — bit-identical, not approx."""
    from deeptime_spark.operators.sketches import (
        bottomk_rollup_quantiles,
        bottomk_sample,
    )

    rows = [(f"t{i % 3}", i % 5, i, (i * 37) % 1000) for i in range(2000)]
    df = spark.createDataFrame(rows, "grp string, day int, id long, v long")
    daily = bottomk_sample(df, "id", ["grp", "day"], k=64, payload_cols=["id", "v"])
    p = str(tmp_path / "sketch")
    daily.write.mode("overwrite").partitionBy("day").parquet(p)
    stored = spark.read.parquet(p).drop("day")
    rolled = {
        r["grp"]: (r["n_sample"], r["q25"], r["q50"], r["q75"], r["q90"])
        for r in bottomk_rollup_quantiles(stored, "id", "v", ["grp"], k=64).collect()
    }
    oneshot = {
        r["grp"]: (r["n_sample"], r["q25"], r["q50"], r["q75"], r["q90"])
        for r in bottomk_rollup_quantiles(df, "id", "v", ["grp"], k=64).collect()
    }
    assert rolled == oneshot


def test_bottomk_rollup_quantiles_match_python(spark):
    from deeptime_spark.operators.sketches import bottomk_rollup_quantiles
    from deeptime_spark.spark_hashes import xxhash64

    rows = [("a", i, (i * 7) % 100) for i in range(500)]
    df = spark.createDataFrame(rows, "grp string, id long, v long")
    k = 32
    got = bottomk_rollup_quantiles(df, "id", "v", ["grp"], k=k).collect()[0]
    sample = sorted((xxhash64(str(i).encode()), i, v) for _, i, v in rows)[:k]
    vals = sorted(v for _, _, v in sample)
    n = len(vals)
    exp = [vals[max((q * n + 99) // 100, 1) - 1] for q in (25, 50, 75, 90)]
    assert got["n_sample"] == n
    assert [got["q25"], got["q50"], got["q75"], got["q90"]] == exp


def test_streaming_bottomk_equals_batch_any_chunking(spark, tmp_path):
    """Content-addressed sample: end-of-stream quantiles equal the batch
    rollup regardless of how rows are chunked into micro-batches."""
    import os

    from deeptime_spark.operators.sketches import bottomk_rollup_quantiles
    from deeptime_spark.streaming.accumulate import streaming_bottomk_quantiles

    rows = [(f"g{i % 2}", i, (i * 13) % 500) for i in range(600)]
    df = spark.createDataFrame(rows, "event_type string, event_id long, cents long")
    batch = {
        r["event_type"]: (r["n_sample"], r["q25"], r["q50"], r["q75"], r["q90"])
        for r in bottomk_rollup_quantiles(
            df, "event_id", "cents", ["event_type"], k=64
        ).collect()
    }
    src = str(tmp_path / "src")
    os.makedirs(src)
    # adversarial chunking: interleaved by id residue, no time order
    for c in range(3):
        df.where(F.pmod(F.col("event_id"), F.lit(3)) == c).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_bottomk_quantiles(stream, k=64)
    q = (
        out.writeStream.format("memory")
        .queryName("t_kmvq")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    final = {
        r["event_type"]: (r["n_sample"], r["q25"], r["q50"], r["q75"], r["q90"])
        for r in spark.table("t_kmvq")
        .groupBy("event_type")
        .agg(
            *[
                F.expr(f"max_by({c}, n_seen)").alias(c)
                for c in ("n_sample", "q25", "q50", "q75", "q90")
            ]
        )
        .collect()
    }
    spark.catalog.dropTempView("t_kmvq")
    assert final == batch
