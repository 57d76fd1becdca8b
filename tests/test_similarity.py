

def test_ann_recall_known_sets(spark):
    import pytest

    from deeptime_spark.operators.similarity import ann_recall

    exact = spark.createDataFrame(
        [(0, i) for i in range(5)] + [(1, i) for i in range(10, 15)],
        "query_id long, vec_id long",
    )
    approx = spark.createDataFrame(
        [(0, 0), (0, 1), (0, 99)] + [(1, 10)], "query_id long, vec_id long"
    )
    got = {r["query_id"]: r for r in ann_recall(approx, exact).collect()}
    assert got[0]["n_hit"] == 2 and got[0]["recall"] == pytest.approx(0.4)
    assert got[1]["n_hit"] == 1 and got[1]["recall"] == pytest.approx(0.2)
    # a query absent from approx scores 0
    exact2 = exact.union(spark.createDataFrame([(2, 7)], "q long, v long"))
    got2 = {r["query_id"]: r for r in ann_recall(approx, exact2).collect()}
    assert got2[2]["n_hit"] == 0 and got2[2]["recall"] == 0.0
