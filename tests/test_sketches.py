"""Sketch layer: deterministic HLL distinct counting, Bloom-filter
membership, and count-min frequency estimation (operators/sketches.py)."""

import math

import pytest
from pyspark.sql import functions as F

from deeptime_spark.operators.sketches import (
    bloom_build,
    bloom_decontaminate,
    bloom_probe,
    hll_count_distinct,
    hll_merge,
    hll_registers,
)
from deeptime_spark.spark_hashes import xxhash64

_M64 = (1 << 64) - 1


def _vals_df(spark, n, prefix="v", parts=1):
    df = spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("v")
    )
    return df.repartition(parts) if parts > 1 else df


# ------------------------------------------------------------------ HLL


def test_hll_registers_match_python_replica(spark):
    p = 10
    W = 64 - p
    n = 500
    got = {
        (r["reg_idx"], r["rho"])
        for r in hll_registers(_vals_df(spark, n), "v", [], p=p).collect()
    }
    regs = {}
    for i in range(n):
        h = xxhash64(f"v{i}".encode()) & _M64
        idx = h >> W
        w = h & ((1 << W) - 1)
        rho = (W - w.bit_length() + 1) if w else (W + 1)
        regs[idx] = max(regs.get(idx, 0), rho)
    assert got == set(regs.items())


def test_hll_estimate_accuracy(spark):
    # standard error ~1.04/sqrt(m) = 1.6% at p=12; 5% is a safe bound
    n = 3000
    est = hll_count_distinct(_vals_df(spark, n), "v", [], p=12)
    assert len(est) == 1
    assert abs(est[0]["est_distinct"] - n) / n < 0.05


def test_hll_small_range_linear_counting(spark):
    # tiny cardinality -> linear-counting branch, near-exact
    est = hll_count_distinct(_vals_df(spark, 10), "v", [], p=12)
    assert abs(est[0]["est_distinct"] - 10) < 0.5


def test_hll_merge_equals_union_sketch(spark):
    a = _vals_df(spark, 400, "a")
    b = _vals_df(spark, 400, "b")
    merged = hll_merge(
        [hll_registers(a, "v", [], 12), hll_registers(b, "v", [], 12)], []
    )
    full = hll_registers(a.unionAll(b), "v", [], 12)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in full.collect()
    }


def test_hll_duplicate_and_layout_invariance(spark):
    base = _vals_df(spark, 600)
    dup = base.unionAll(base).repartition(13)
    r1 = sorted(map(tuple, hll_registers(base, "v", [], 11).collect()))
    r2 = sorted(map(tuple, hll_registers(dup, "v", [], 11).collect()))
    assert r1 == r2


def test_hll_grouped(spark):
    df = spark.range(1000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.concat(F.lit("x"), F.col("id").cast("string")).alias("v"),
    )
    est = {d["g"]: d["est_distinct"] for d in hll_count_distinct(df, "v", ["g"], 12)}
    assert set(est) == {"0", "1"}
    for v in est.values():
        assert abs(v - 500) / 500 < 0.07


def test_hll_p_validation(spark):
    with pytest.raises(ValueError):
        hll_registers(_vals_df(spark, 5), "v", [], p=2)


# ---------------------------------------------------------------- Bloom


def test_bloom_no_false_negatives(spark):
    members = _vals_df(spark, 300, "m")
    bits = bloom_build(members, "v", m_bits=1 << 14, k=4)
    probed = bloom_probe(
        members.select(F.lit(0).alias("k"), "v"), bits, "v", ["k"], 1 << 14, 4
    )
    assert probed.where(F.col("bloom_hit") == 0).count() == 0


def test_bloom_fp_rate_reasonable(spark):
    m_bits, k, n = 1 << 16, 4, 1000
    members = _vals_df(spark, n, "m")
    others = _vals_df(spark, 2000, "o")
    bits = bloom_build(members, "v", m_bits, k)
    hits = (
        bloom_probe(others.select(F.lit(0).alias("g"), "v"), bits, "v", ["g"], m_bits, k)
        .agg(F.sum("bloom_hit"))
        .first()[0]
    )
    # theoretical fp ~ (1 - e^{-kn/m})^k ~ 0.0001 at these params; allow slack
    assert hits / 2000 < 0.02


def test_bloom_positions_match_python(spark):
    m_bits, k = 1 << 12, 5
    rows = bloom_build(_vals_df(spark, 50, "q"), "v", m_bits, k).collect()
    got = {r["pos"] for r in rows}
    exp = set()
    for i in range(50):
        h = xxhash64(f"q{i}".encode()) & _M64
        h1, h2 = h & 0xFFFFFFFF, h >> 32
        exp |= {(h1 + j * h2 + j * j) % m_bits for j in range(k)}
    assert got == exp


def test_bloom_bits_bounded(spark):
    m_bits = 1 << 8  # deliberately tiny: saturation must cap the relation
    bits = bloom_build(_vals_df(spark, 5000), "v", m_bits, 4)
    assert bits.count() <= m_bits


def test_bloom_decontaminate_flags_probe_docs(spark):
    rows = [
        (i, f"tok{i} " + " ".join(f"w{i}_{j}" for j in range(10)), "s")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    probes = docs.where(F.col("doc_id") % 10 == 0)
    out = bloom_decontaminate(docs, probes, n=8, m_bits=1 << 14, k=4)
    flagged = {r["doc_id"] for r in out.where("contaminated = 1").collect()}
    # every probe doc shares all its grams with itself -> must be flagged
    assert {0, 10, 20, 30} <= flagged


def test_bloom_validation(spark):
    with pytest.raises(ValueError):
        bloom_build(_vals_df(spark, 5), "v", m_bits=0, k=4)


# ------------------------------------------------------------ count-min

from deeptime_spark.operators.sketches import cms_build, cms_estimate


def test_cms_never_undercounts_and_is_tight_when_sparse(spark):
    df = spark.range(2000).select(
        (F.col("id") % 50).cast("string").alias("v")  # 50 values x 40 each
    )
    sketch = cms_build(df, "v", width=1 << 12, depth=4)
    est = {
        r["v"]: r["cms_est"]
        for r in cms_estimate(df, sketch, "v", 1 << 12, 4).collect()
    }
    assert set(est) == {str(i) for i in range(50)}
    for v in est.values():
        assert v >= 40  # never undercounts
        assert v <= 120  # sparse sketch: collisions rare at 50 values / 4096 cells


def test_cms_weighted(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 7), ("b", 1)], "v string, wt long"
    )
    sketch = cms_build(df, "v", 1 << 10, 3, weight_col="wt")
    est = {
        r["v"]: r["cms_est"]
        for r in cms_estimate(df, sketch, "v", 1 << 10, 3).collect()
    }
    assert est["a"] >= 12 and est["b"] >= 1


def test_cms_merge_by_cellwise_sum(spark):
    a = spark.range(500).select((F.col("id") % 10).cast("string").alias("v"))
    b = spark.range(300).select((F.col("id") % 10).cast("string").alias("v"))
    merged = (
        cms_build(a, "v", 1 << 10, 4)
        .unionByName(cms_build(b, "v", 1 << 10, 4))
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = cms_build(a.unionAll(b), "v", 1 << 10, 4)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in full.collect()}


def test_cms_sketch_bounded(spark):
    df = spark.range(50000).select(F.col("id").cast("string").alias("v"))
    assert cms_build(df, "v", 256, 3).count() <= 256 * 3


def test_cms_validation(spark):
    with pytest.raises(ValueError):
        cms_build(spark.range(3).select(F.col("id").cast("string").alias("v")), "v", 0, 2)


# --------------------------------------------- bottom-k (KMV) sampling

from deeptime_spark.operators.sketches import bottomk_quantiles, bottomk_sample


def test_bottomk_sample_matches_python_order(spark):
    df = spark.range(500).select(
        F.col("id").alias("key"), (F.col("id") * 2).alias("payload")
    )
    got = sorted(r["key"] for r in bottomk_sample(df, "key", [], k=50).collect())
    exp = sorted(
        sorted(range(500), key=lambda i: (xxhash64(str(i).encode()), i))[:50]
    )
    assert got == exp


def test_bottomk_sample_is_merge_stable(spark):
    # bottom-k of the union == bottom-k of (bottom-k(A) U bottom-k(B))
    a = spark.range(0, 300).select(F.col("id").alias("key"))
    b = spark.range(300, 600).select(F.col("id").alias("key"))
    merged = bottomk_sample(
        bottomk_sample(a, "key", [], 40).unionAll(bottomk_sample(b, "key", [], 40)),
        "key", [], 40,
    )
    full = bottomk_sample(a.unionAll(b), "key", [], 40)
    assert sorted(r["key"] for r in merged.collect()) == sorted(
        r["key"] for r in full.collect()
    )


def test_bottomk_layout_invariance(spark):
    df = spark.range(1000).select(F.col("id").alias("key"))
    a = sorted(r["key"] for r in bottomk_sample(df, "key", [], 64).collect())
    b = sorted(r["key"] for r in bottomk_sample(df.repartition(11), "key", [], 64).collect())
    assert a == b


def test_bottomk_quantiles_near_truth(spark):
    # uniform values 0..9999: sampled quantiles should sit near the true ones
    df = spark.range(10000).select(
        F.col("id").alias("key"), F.col("id").cast("double").alias("v")
    )
    rows = bottomk_quantiles(df, "key", "v", [], k=512, quantiles=(0.5,))
    q50 = rows[0]["q50"]
    assert rows[0]["n_sample"] == 512
    assert abs(q50 - 5000) < 800  # ~4% sampling error band at k=512


def test_bottomk_validation(spark):
    import pytest as _pytest

    df = spark.range(5).select(F.col("id").alias("key"))
    with _pytest.raises(ValueError):
        bottomk_sample(df, "key", [], k=0)


def test_hll_rollup_persisted_merge_equals_direct(spark, tmp_path):
    # the serving pattern behind the doc_hll_rollup harness query:
    # daily register relations written as a day-partitioned parquet
    # sketch table, read back and monoid-merged -> bit-identical to the
    # one-pass sketch over the same rows (max(rho) across days is the
    # rho of the global min sub-hash)
    df = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 7).alias("day"),
        F.concat(F.lit("x"), (F.col("id") % 900).cast("string")).alias("v"),
    )
    daily = hll_registers(df, "v", ["g", "day"], 12)
    path = str(tmp_path / "sketches")
    daily.write.mode("overwrite").partitionBy("day").parquet(path)
    stored = spark.read.parquet(path)
    merged = hll_merge([stored.drop("day")], ["g"])
    direct = hll_registers(df, "v", ["g"], 12)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
