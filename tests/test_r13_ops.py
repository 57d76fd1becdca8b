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
