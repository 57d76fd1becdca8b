"""Bit-exactness of the engine-independent Spark hash replicas: every
value compared against Spark's own F.hash / F.xxhash64 output."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from deeptime_spark.spark_hashes import (
    murmur3_32,
    murmur3_32_fixed,
    murmur3_int32_vec,
    spark_hash_str_int,
    xxhash64,
    xxhash64_fixed,
)

CASES = [
    "",
    "a",
    "ab",
    "abc",
    "abcd",
    "abcde",
    "hello",
    "hello world, this is a longer string spanning several blocks!",
    "1234567",
    "12345678",
    "123456789012345678901234567890123456789",  # > 32 bytes (xxh64 stripes)
    "[1, 2, 3, -400000]",
    "\x00\x01\x7f",
    "café naïve 你好",  # multi-byte UTF-8
]


def test_murmur3_scalar_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in CASES], ["s"])
    # single column: murmur3 over UTF-8 with Spark's default seed 42
    got = [r[0] for r in df.select(F.hash("s")).collect()]
    want = [murmur3_32(s.encode(), 42) for s in CASES]
    assert got == want
    # chained form F.hash(col, lit(i)) — the minhash seed family
    for i in (0, 1, 17, 31):
        got = [r[0] for r in df.select(F.hash("s", F.lit(i))).collect()]
        want = [spark_hash_str_int(s.encode(), i) for s in CASES]
        assert got == want, f"i={i}"


def test_xxhash64_scalar_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in CASES], ["s"])
    got = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    want = [xxhash64(s.encode()) for s in CASES]
    assert got == want


def test_fixed_paths_match_scalar():
    rng = np.random.default_rng(7)
    for L in (1, 3, 4, 5, 7, 8, 11, 12, 13, 31):
        arr = rng.integers(0, 256, size=(64, L), dtype=np.uint8)
        for seed in (0, 42):
            vec = murmur3_32_fixed(arr, seed)
            ref = np.array([murmur3_32(bytes(row), seed) for row in arr], dtype=np.int32)
            assert (vec == ref).all(), f"murmur3 L={L} seed={seed}"
        vec64 = xxhash64_fixed(arr)
        ref64 = np.array([xxhash64(bytes(row)) for row in arr], dtype=np.int64)
        assert (vec64 == ref64).all(), f"xxh64 L={L}"


def test_minhash_shingle_scale(spark):
    # the real workload shape: 5-char ASCII shingles, many seeds
    sh = ["abcde", "bcdef", "hello", " worl", "d doc"]
    df = spark.createDataFrame([(s,) for s in sh], ["s"])
    arr = np.frombuffer("".join(sh).encode(), dtype=np.uint8).reshape(len(sh), 5)
    inner = murmur3_32_fixed(arr, 42)
    for i in range(8):
        got = [r[0] for r in df.select(F.hash("s", F.lit(i))).collect()]
        assert got == murmur3_int32_vec(i, inner).tolist()
