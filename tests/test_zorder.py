"""Z-order clustering key: Morton interleave correctness and the
locality property the layout exists for (both dimensions bounded
within a key range)."""

import pytest

from pyspark.sql import functions as F


def _morton2(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key_matches_reference_interleave(spark, rng):
    from deeptime_spark.operators.layout import zorder_key

    pts = [(int(rng.integers(0, 1 << 16)), int(rng.integers(0, 1 << 16))) for _ in range(200)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key([F.col("x"), F.col("y")], 16).alias("z")).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _morton2(x, y), (x, y)


def test_zorder_key_validates_width(spark):
    from deeptime_spark.operators.layout import zorder_key

    with pytest.raises(ValueError):
        zorder_key([F.col("x")] * 4, 16)  # 64 bits > signed long


def test_zorder_bucket_shift_semantics(spark):
    from deeptime_spark.operators.layout import zorder_bucket

    df = spark.createDataFrame([(v,) for v in [0, 5, 100, 65535, 65536, 200000]], "v long")
    # span 200000 needs 18 bits -> shift 2
    got = [r["b"] for r in df.select(zorder_bucket(F.col("v"), 0, 200000, 16).alias("b")).orderBy("v").collect()]
    assert got == [0, 1, 25, 16383, 16384, 50000]
    # degenerate constant column -> all bucket 0
    got0 = {r["b"] for r in df.select(zorder_bucket(F.col("v"), 7, 7, 16).alias("b")).collect()}
    assert got0 == {0}


def test_zorder_repartition_locality(spark, rng):
    from deeptime_spark.operators.layout import zorder_repartition

    pts = [
        (int(rng.integers(0, 1 << 20)), int(rng.integers(0, 1 << 12)))
        for _ in range(4000)
    ]
    df = spark.createDataFrame(pts, "a long, b long")
    keyed = zorder_repartition(df, ["a", "b"], n_partitions=8, bits=16)
    assert "_zkey" in keyed.columns
    # rows sharing a coarse z-prefix are bounded in BOTH dimensions: a
    # top-10-bit prefix pins the top 5 bucket bits of each axis, so each
    # axis varies over at most 2^11 bucket units; axis a (~2^20 span)
    # has bucket width 2^4 -> range <= 2^15; axis b (~2^12 span, shift
    # 0) -> range <= 2^11.
    stats = (
        keyed.groupBy(F.shiftright("_zkey", 22).alias("zb"))
        .agg(
            (F.max("a") - F.min("a")).alias("ra"),
            (F.max("b") - F.min("b")).alias("rb"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    multi = [r for r in stats if r["n"] > 1]
    assert multi
    for r in multi:
        assert r["ra"] < (1 << 15) + (1 << 4)
        assert r["rb"] < (1 << 11) + 1
    # row count preserved
    assert keyed.count() == len(pts)
