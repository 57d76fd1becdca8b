"""Dataset profiling (operators/profile.py)."""

from pyspark.sql import functions as F

from deeptime_spark.operators.profile import profile_table


def test_profile_basic(spark):
    df = spark.createDataFrame(
        [(1, "aa", None), (2, "bbbb", 5.0), (2, None, 7.5)],
        "id long, s string, v double",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert set(prof) == {"id", "s", "v"}
    assert prof["id"]["n_rows"] == 3 and prof["id"]["n_null"] == 0
    assert prof["id"]["n_distinct"] == 2
    assert prof["id"]["min_value"] == "1" and prof["id"]["max_value"] == "2"
    assert prof["s"]["n_null"] == 1 and prof["s"]["n_distinct"] == 2
    # avg rendered length of {aa, bbbb} = 3.0 -> 300
    assert prof["s"]["avg_len_x100"] == 300
    assert prof["v"]["n_null"] == 1 and prof["v"]["n_distinct"] == 2


def test_profile_null_only_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "id long, x string")
    prof = {r["column"]: r for r in profile_table(df, ["x"]).collect()}
    assert prof["x"]["n_null"] == 2
    assert prof["x"]["n_distinct"] == 0
    assert prof["x"]["min_value"] is None and prof["x"]["max_value"] is None
    assert prof["x"]["avg_len_x100"] == 0


def test_profile_single_scan(spark):
    # the whole profile is ONE aggregate job: no per-column actions
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("m"), F.col("id").cast("string").alias("s")
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["m"]["n_distinct"] == 7
    assert prof["id"]["n_distinct"] == 100


def test_snapshot_diff_statuses(spark):
    from deeptime_spark.operators.profile import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", "s"), (2, "b", "s"), (3, "c", "s")],
        "doc_id long, text string, source string",
    )
    new = spark.createDataFrame(
        [(2, "b", "s"), (3, "C!", "s"), (4, "d", "s")],
        "doc_id long, text string, source string",
    )
    st = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert st == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_null_content(spark):
    from deeptime_spark.operators.profile import snapshot_diff

    old = spark.createDataFrame([(1, None)], "doc_id long, text string")
    new_same = spark.createDataFrame([(1, None)], "doc_id long, text string")
    new_diff = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    assert snapshot_diff(old, new_same).first()["status"] == "unchanged"
    assert snapshot_diff(old, new_diff).first()["status"] == "changed"


# ------------------------------------------------- constraint_audit
def test_constraint_audit_kinds(spark):
    import pytest

    from deeptime_spark.operators.profile import constraint_audit

    df = spark.createDataFrame(
        [
            (1, 10, "A", 5.0),
            (2, 20, "B", -1.0),   # range violation
            (2, None, "C", 2.0),  # dup id + null fk + bad enum
            (4, 99, "A", 3.0),    # fk violation (99 not in parent)
        ],
        "id long, fk long, status string, price double",
    )
    parent = spark.createDataFrame([(10,), (20,)], "pid long")
    out = {
        r["constraint"]: (r["n_violations"], r["pass"])
        for r in constraint_audit(
            df,
            [
                ("id_unique", "unique", "id"),
                ("fk_not_null", "not_null", "fk"),
                ("fk_parent", "foreign_key", ("fk", parent, "pid")),
                ("price_range", "range", ("price", 0.0, 100.0)),
                ("status_enum", "accepted_values", ("status", ["A", "B"])),
            ],
        ).collect()
    }
    assert out["id_unique"] == (1, False)
    assert out["fk_not_null"] == (1, False)
    assert out["fk_parent"] == (1, False)   # null fk is NOT an fk violation
    assert out["price_range"] == (1, False)
    assert out["status_enum"] == (1, False)
    clean = {
        r["constraint"]: r["pass"]
        for r in constraint_audit(
            df.where("id = 1"), [("id_unique", "unique", "id")]
        ).collect()
    }
    assert clean["id_unique"] is True
    with pytest.raises(ValueError):
        constraint_audit(df, [])
    with pytest.raises(ValueError):
        constraint_audit(df, [("x", "nope", "id")])
