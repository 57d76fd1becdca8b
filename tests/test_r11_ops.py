"""Round-11 additions: linkage blocking pair-completeness gate
(linkage.py:linkage_blocking_gate — Christen's pair completeness /
reduction ratio + the over-cap accounting), probe-mode tuned dedup,
and the streaming linkage probe face."""

import pytest
from pyspark.sql import functions as F

from deeptime_spark.operators.linkage import (
    blocked_candidates,
    blocked_record_linkage,
    linkage_blocking_gate,
)


def _recs(spark, rows):
    return spark.createDataFrame(
        rows, "id long, name string, zip string, bal long"
    )


def test_gate_perfect_blocking(spark):
    # clone pairs share the zip block; nothing capped -> completeness 1
    rows = [
        (1, "alice", "10001", 50),
        (2, "alicx", "10001", 50),  # near-clone of 1, same block
        (3, "bob", "20002", 70),
        (4, "bobb", "20002", 70),  # near-clone of 3
        (5, "carol", "30003", 90),
    ]
    out = linkage_blocking_gate(
        _recs(spark, rows),
        id_col="id",
        block_keys=["zip"],
        string_fields=["name"],
        exact_fields=["bal"],
        threshold=0.85,
        max_block=10,
    ).first()
    assert out["n_records"] == 5 and out["n_probe"] == 5
    assert out["n_probe_pairs"] == 10
    assert out["n_exact"] == 2  # (1,2) and (3,4)
    assert out["n_hit"] == 2
    assert out["pair_completeness"] == 1.0
    # blocking eliminated 8 of 10 pairs (2 candidates survive)
    assert out["n_candidates"] == 2
    assert abs(out["reduction_ratio"] - 0.8) < 1e-12
    assert out["n_capped_blocks"] == 0 and out["n_overcap_members"] == 0


def test_gate_blocking_misses_cross_block_pair(spark):
    # identical records in DIFFERENT blocks: truth sees the pair,
    # blocking cannot -> completeness 1/2
    rows = [
        (1, "alice", "10001", 50),
        (2, "alice", "99999", 50),  # true match, wrong block
        (3, "bob", "20002", 70),
        (4, "bobb", "20002", 70),
    ]
    out = linkage_blocking_gate(
        _recs(spark, rows),
        id_col="id",
        block_keys=["zip"],
        string_fields=["name"],
        exact_fields=["bal"],
        threshold=0.85,
        max_block=10,
    ).first()
    assert out["n_exact"] == 2
    assert out["n_hit"] == 1
    assert out["pair_completeness"] == 0.5


def test_gate_overcap_accounting(spark):
    # one hot block of 6 at max_block=2: 4 members dropped from
    # candidacy entirely, and the capped block loses the (5,6) clones
    rows = [
        (1, "a1", "10001", 1),
        (2, "a2", "10001", 2),
        (3, "a3", "10001", 3),
        (4, "a4", "10001", 4),
        (5, "same", "10001", 9),
        (6, "same", "10001", 9),  # exact clone, beyond the cap
        (7, "x", "20002", 5),
    ]
    out = linkage_blocking_gate(
        _recs(spark, rows),
        id_col="id",
        block_keys=["zip"],
        string_fields=["name"],
        exact_fields=["bal"],
        threshold=0.99,
        max_block=2,
    ).first()
    assert out["n_capped_blocks"] == 1
    assert out["n_overcap_members"] == 4
    # the clone pair exists in truth but the cap dropped both members
    assert out["n_exact"] == 1 and out["n_hit"] == 0
    assert out["pair_completeness"] == 0.0
    # candidates: only (1,2) survives the capped block
    assert out["n_candidates"] == 1


def test_gate_bounded_probe_subset(spark):
    # gate truth/candidates run on the probe; cap accounting on FULL
    rows = [(i, f"n{i}", "10001", i) for i in range(1, 11)]
    recs = _recs(spark, rows)
    probe = recs.where(F.col("id") <= 4)
    out = linkage_blocking_gate(
        recs,
        id_col="id",
        block_keys=["zip"],
        string_fields=["name"],
        threshold=0.99,
        max_block=3,
        probe_records=probe,
    ).first()
    assert out["n_records"] == 10
    assert out["n_probe"] == 4
    assert out["n_probe_pairs"] == 6
    # full relation: one block of 10 at cap 3 -> 7 dropped
    assert out["n_capped_blocks"] == 1 and out["n_overcap_members"] == 7


def test_gate_null_completeness_when_no_truth(spark):
    rows = [(1, "alice", "10001", 1), (2, "zzzz", "10001", 2)]
    out = linkage_blocking_gate(
        _recs(spark, rows),
        id_col="id",
        block_keys=["zip"],
        string_fields=["name"],
        threshold=0.99,
        max_block=10,
    ).first()
    assert out["n_exact"] == 0
    assert out["pair_completeness"] is None


def test_gate_validates_inputs(spark):
    recs = _recs(spark, [(1, "a", "1", 1)])
    with pytest.raises(ValueError):
        linkage_blocking_gate(recs, "id", [], string_fields=["name"])
    with pytest.raises(ValueError):
        linkage_blocking_gate(recs, "id", ["zip"])


def test_gate_truth_matches_uncapped_linkage(spark):
    # with no cap and a single all-covering block, blocked linkage
    # pairs == gate truth (same _field_scores expressions by
    # construction; this pins the refactor)
    rows = [
        (1, "alice", "1", 5),
        (2, "alicx", "1", 5),
        (3, "bo", "1", 5),
        (4, "bob", "1", 7),
    ]
    recs = _recs(spark, rows)
    pairs = blocked_record_linkage(
        recs,
        id_col="id",
        block_keys=["zip"],
        string_fields=["name"],
        exact_fields=["bal"],
        threshold=0.6,
        max_block=None,
    )
    out = linkage_blocking_gate(
        recs,
        id_col="id",
        block_keys=["zip"],
        string_fields=["name"],
        exact_fields=["bal"],
        threshold=0.6,
        max_block=None,
    ).first()
    assert out["n_exact"] == pairs.count()
    assert out["n_hit"] == out["n_exact"]
    assert out["pair_completeness"] == 1.0
