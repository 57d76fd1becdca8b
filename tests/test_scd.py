"""SCD Type-2 merge (operators/scd.py) — Kimball semantics pinned on a
hand-traceable dimension."""

import pytest


def _dim(spark):
    return spark.createDataFrame(
        [
            (1, 100, "A", 0, None),      # open, will change
            (2, 200, "B", 0, None),      # open, unchanged update
            (3, 300, "C", 0, None),      # open, no update row
            (4, 400, "D", 0, 5),         # historical closed row
            (4, 450, "D", 5, None),      # current version of key 4
        ],
        "k long, bal long, seg string, valid_from long, valid_to long",
    )


def test_scd2_merge_semantics(spark):
    from deeptime_spark.operators.scd import scd2_merge

    updates = spark.createDataFrame(
        [
            (1, 150, "A"),    # tracked change -> close + reopen
            (2, 200, "B"),    # identical -> no-op
            (4, 450, "Z"),    # change on the CURRENT version of key 4
            (9, 900, "N"),    # brand-new key
        ],
        "k long, bal long, seg string",
    )
    out = scd2_merge(
        _dim(spark), updates, key="k", tracked=["bal", "seg"], effective_ts=7
    )
    rows = {
        (r["k"], r["valid_from"]): (r["bal"], r["seg"], r["valid_to"])
        for r in out.collect()
    }
    assert len(rows) == 8
    assert rows[(1, 0)] == (100, "A", 7)       # closed
    assert rows[(1, 7)] == (150, "A", None)    # reopened
    assert rows[(2, 0)] == (200, "B", None)    # untouched
    assert rows[(3, 0)] == (300, "C", None)    # untouched
    assert rows[(4, 0)] == (400, "D", 5)       # history preserved
    assert rows[(4, 5)] == (450, "D", 7)       # current closed
    assert rows[(4, 7)] == (450, "Z", None)    # new current
    assert rows[(9, 7)] == (900, "N", None)    # new key


def test_scd2_merge_idempotent(spark):
    from deeptime_spark.operators.scd import scd2_merge

    updates = spark.createDataFrame([(1, 150, "A")], "k long, bal long, seg string")
    once = scd2_merge(_dim(spark), updates, "k", ["bal", "seg"], 7)
    twice = scd2_merge(once, updates, "k", ["bal", "seg"], 8)
    a = sorted(tuple(r) for r in once.collect())
    b = sorted(tuple(r) for r in twice.collect())
    assert a == b  # same batch re-applied changes nothing


def test_scd2_merge_validation(spark):
    from deeptime_spark.operators.scd import scd2_merge

    d = _dim(spark)
    u = spark.createDataFrame([(1, 1, "A")], "k long, bal long, seg string")
    with pytest.raises(ValueError):
        scd2_merge(d, u, "k", [], 1)
    bad = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        scd2_merge(d, bad, "k", ["bal"], 1)
