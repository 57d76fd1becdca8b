"""Round-13 optimization pins: payload-free LSH banding, merged
advisor/gate passes, and the other operator-internal restructurings must
keep every emitted value identical to the shapes they replaced."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, n=120, clones=3):
    """Small corpus with real near-dup structure: every base doc gains
    ``clones`` lightly perturbed copies so the banding emits pairs from
    several bands (the with_est payload actually rides the shuffle)."""
    rows = []
    for i in range(n):
        base = (
            f"alpha bravo charlie delta echo foxtrot {i} golf hotel "
            f"india juliett kilo lima mike november oscar papa {i % 7}"
        )
        rows.append((i, base))
        for c in range(1, clones + 1):
            rows.append((10_000 * c + i, base + f" extra{c}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_candidates_with_est_false_same_pairs(spark):
    """with_est=False must yield the IDENTICAL candidate pair set as the
    payload-carrying shape — the estimate column is the only difference."""
    from deeptime_spark.operators.dedup import minhash_lsh_candidates

    docs = _docs(spark)
    with_payload = minhash_lsh_candidates(docs, n_hashes=32, bands=8)
    bare = minhash_lsh_candidates(docs, n_hashes=32, bands=8, with_est=False)
    assert bare.columns == ["id_a", "id_b"]
    a = {(r["id_a"], r["id_b"]) for r in with_payload.collect()}
    b = {(r["id_a"], r["id_b"]) for r in bare.collect()}
    assert a == b
    assert len(a) > 0


def test_minhash_candidates_with_est_false_plan_has_no_signature_payload(spark):
    """The banding exchange and the pair dedup must not carry the
    n_hashes-int signature array when with_est=False: no ``minhash``
    column anywhere in the physical plan past the band explode."""
    from deeptime_spark.operators.dedup import minhash_lsh_candidates

    docs = _docs(spark, n=30, clones=1)
    bare = minhash_lsh_candidates(docs, n_hashes=32, bands=8, with_est=False)
    plan = bare._jdf.queryExecution().executedPlan().toString()
    # the signature appears once where bands are derived (the Generate
    # input), never in aggregate/exchange operators downstream
    assert "minhash_a" not in plan and "minhash_b" not in plan


def _linkage_recs(spark):
    """Records with near-threshold scores, NULL exact fields, and pairs
    whose exact field disagrees but whose string field matches exactly —
    the cases an over-eager pre-filter would get wrong."""
    rows = [
        (1, "alice cooper", "A", 100),
        (2, "alice cooper", "A", 100),    # exact dup: score 1.0
        (3, "alice cooperX", "A", 100),   # high name sim, bal equal
        (4, "alice cooper", "A", 101),    # IDENTICAL name, bal differs
        (5, "alice cooper", "A", None),   # NULL bal: uninformative
        (6, "totally other", "A", 100),   # bal equal, name far
        (7, "alice cooper", "B", 100),    # other block
        (8, "alice cooperXY", "B", 100),
    ]
    return spark.createDataFrame(
        rows, "id long, name string, blk string, bal long"
    )


def test_implied_exact_prefilter_output_identical(spark):
    """blocked_record_linkage must emit the IDENTICAL pair rows with the
    implied pre-filter active (w_bal=2/3 > 1-t) as a reference scoring
    with no pre-filter at all."""
    from deeptime_spark.operators.linkage import (
        _field_scores,
        blocked_candidates,
        blocked_record_linkage,
    )

    recs = _linkage_recs(spark)
    got = blocked_record_linkage(
        recs, id_col="id", block_keys=["blk"], string_fields=["name"],
        exact_fields=["bal"], weights={"name": 1, "bal": 2}, threshold=0.9,
    )
    # reference: candidates + raw scoring + threshold, no pre-filter
    cands = blocked_candidates(recs, "id", ["blk"], 1000)
    ja = recs.select(
        F.col("id").alias("id_a"),
        F.col("name").alias("_a_name"), F.col("bal").alias("_a_bal"),
    )
    jb = recs.select(
        F.col("id").alias("id_b"),
        F.col("name").alias("_b_name"), F.col("bal").alias("_b_bal"),
    )
    sims, score = _field_scores(["name"], ["bal"], {"name": 1.0, "bal": 2.0}, 3.0, "_a_", "_b_")
    ref = (
        cands.join(ja, "id_a").join(jb, "id_b")
        .withColumn("sim_name", sims["name"])
        .withColumn("sim_bal", sims["bal"])
        .withColumn("score", score)
        .where(F.col("score") >= 0.9)
        .select("id_a", "id_b", "sim_name", "sim_bal", "score")
    )
    a = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in ref.collect()}
    assert a == b
    assert len(a) >= 2  # (1,2) and at least one near pair


def test_implied_exact_prefilter_boundary_weight_not_added(spark):
    """At the exact float boundary (max score with sim_f=0 EQUALS the
    threshold) the conjunct must NOT be added: a pair with unequal exact
    field but perfect string sim reaches the threshold and must survive."""
    from deeptime_spark.operators.linkage import (
        _implied_exact_prefilter,
        blocked_record_linkage,
    )

    # weights 1/1, threshold 0.5: with sim_bal=0 the max score is exactly
    # 0.5 — no conjunct may be emitted for bal
    assert _implied_exact_prefilter(
        ["name"], ["bal"], {"name": 1.0, "bal": 1.0}, 2.0, 0.5, "_a_", "_b_"
    ) is None
    recs = _linkage_recs(spark)
    out = blocked_record_linkage(
        recs, id_col="id", block_keys=["blk"], string_fields=["name"],
        exact_fields=["bal"], weights={"name": 1, "bal": 1}, threshold=0.5,
    )
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    # (1,4): identical names, unequal bal -> score exactly 0.5, KEPT
    assert (1, 4) in pairs
