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


def test_minibatch_kmeans_initial_centers(spark):
    import numpy as np

    from deeptime_spark.clustering.kmeans import MiniBatchKMeans

    rows = [([float(i), float(i % 3)],) for i in range(60)]
    df = spark.createDataFrame(rows, "x array<double>")
    init = np.array([[0.0, 0.0], [30.0, 1.0], [59.0, 2.0]])
    est = MiniBatchKMeans(
        n_clusters=3, batch_fraction=1.0, max_iter=2, initial_centers=init
    )
    est.fit(df)
    model = est.fetch_model()
    # first epoch performs a real update: centers move off the init
    assert model.cluster_centers.shape == (3, 2)
    assert not np.allclose(model.cluster_centers, init)
    # 2 epochs -> 2 recorded inertias (no burned init epoch)
    assert len(est._inertias) == 2
    # wrong center count raises
    with pytest.raises(ValueError):
        MiniBatchKMeans(
            n_clusters=4, batch_fraction=1.0, max_iter=1, initial_centers=init
        ).fit(df)


def test_minibatch_initial_centers_replay(spark):
    # the oracle contract: single sorted partition + full batches ->
    # the numpy replay of partial_fit reproduces centers exactly
    import numpy as np

    rng = np.random.default_rng(7)
    X = rng.normal(size=(50, 3))
    from deeptime_spark.clustering.kmeans import MiniBatchKMeans

    df = (
        spark.createDataFrame(
            [(i, [float(v) for v in X[i]]) for i in range(50)],
            "i long, x array<double>",
        )
        .coalesce(1)
        .sortWithinPartitions("i")
        .select("x")
    )
    init = X[:2].copy()
    est = MiniBatchKMeans(
        n_clusters=2, batch_fraction=1.0, max_iter=3, initial_centers=init
    )
    est.fit(df)
    centers = init.copy()
    counts = np.ones(2)
    inertias = []
    for _ in range(3):
        d2 = (
            np.einsum("ij,ij->i", X, X)[:, None]
            - 2.0 * (X @ centers.T)
            + np.einsum("ij,ij->i", centers, centers)[None, :]
        )
        a = np.argmin(d2, axis=1)
        cost = float(np.clip(d2[np.arange(len(a)), a], 0.0, None).sum())
        sums = np.zeros_like(centers)
        cnt = np.zeros(2)
        np.add.at(sums, a, X)
        np.add.at(cnt, a, 1.0)
        counts += cnt
        mask = cnt > 0
        eta = (cnt[mask] / counts[mask])[:, None]
        centers[mask] = (1 - eta) * centers[mask] + eta * (
            sums[mask] / cnt[mask][:, None]
        )
        converged = bool(inertias) and cost != 0.0 and abs(
            cost - inertias[-1]
        ) / cost <= 1e-5
        inertias.append(cost)
        if converged:
            break
    assert np.allclose(est.fetch_model().cluster_centers, centers, atol=1e-12)
    assert est._inertias == pytest.approx(inertias, abs=1e-9)


def test_autotune_probe_mode_never_ppjoins_corpus(spark):
    # probe-mode banding dispatch: pairs come from corpus banding +
    # verify; result equals full-corpus autotune when recall is high
    from deeptime_spark.operators.dedup import autotune_near_dedup

    base = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "one two three four five six seven eight",
        "red green blue yellow purple orange pink grey",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((i * 10, t))
        rows.append((i * 10 + 1, t + " extra"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    probe = docs.where(F.col("doc_id") < 20)
    pairs, report = autotune_near_dedup(
        docs, threshold_pct=70, probe_docs=probe, max_bucket=64
    )
    r = report.first()
    assert r["method"] == "lsh_banding"
    got = {(p["id_a"], p["id_b"]) for p in pairs.collect()}
    assert got == {(0, 1), (10, 11), (20, 21)}


def test_streaming_linkage_probe_equals_batch(spark, tmp_path):
    from deeptime_spark.operators.linkage import record_linkage_probe
    from deeptime_spark.streaming.accumulate import (
        streaming_record_linkage_probe,
    )

    master_rows = [
        (1, "alice", "10001", 50),
        (2, "bob", "20002", 70),
        (3, "carol", "10001", 90),
    ]
    delta_rows = [
        (101, "alicx", "10001", 50),  # matches 1
        (102, "bobb", "20002", 70),  # matches 2
        (103, "zzzz", "10001", 11),  # no match
    ]
    schema = "id long, name string, zip string, bal long"
    master = spark.createDataFrame(master_rows, schema)
    delta = spark.createDataFrame(delta_rows, schema)
    mdir = str(tmp_path / "master")
    sdir = str(tmp_path / "src")
    odir = str(tmp_path / "out")
    master.write.parquet(mdir)
    delta.repartition(3, F.col("id")).write.parquet(sdir)
    stream = (
        spark.readStream.schema(master.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(sdir)
    )
    q = streaming_record_linkage_probe(
        spark,
        stream,
        master_path=mdir,
        out_path=odir,
        id_col="id",
        block_keys=["zip"],
        string_fields=["name"],
        exact_fields=["bal"],
        threshold=0.7,
    )
    assert q.awaitTermination(120)
    got = {
        (r["id_delta"], r["id_master"], round(r["score"], 9))
        for r in spark.read.parquet(odir).collect()
    }
    want = {
        (r["id_delta"], r["id_master"], round(r["score"], 9))
        for r in record_linkage_probe(
            master,
            delta,
            id_col="id",
            block_keys=["zip"],
            string_fields=["name"],
            exact_fields=["bal"],
            threshold=0.7,
        ).collect()
    }
    assert got == want and len(got) == 2


def test_streaming_scd2_retain_versions(spark, tmp_path):
    # retain_versions=2 prunes snapshots older than the previous one
    import glob

    from deeptime_spark.streaming.accumulate import streaming_scd2_merge

    dim = spark.createDataFrame(
        [(k, f"a{k}", 0, None) for k in range(1, 5)],
        "k long, attr string, valid_from long, valid_to long",
    )
    updates = spark.createDataFrame(
        [(k, f"a{k}x") for k in range(1, 5)], "k long, attr string"
    )
    src = str(tmp_path / "src")
    dim_dir = str(tmp_path / "dim")
    updates.repartition(4, F.col("k")).write.parquet(src)
    dim.write.parquet(f"{dim_dir}/v0")
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_scd2_merge(
        spark, stream, key="k", tracked=["attr"], dim_path=dim_dir,
        checkpoint=str(tmp_path / "ckpt"), retain_versions=2,
    )
    assert q.awaitTermination(120)
    versions = sorted(
        int(p.rsplit("/v", 1)[1]) for p in glob.glob(f"{dim_dir}/v*")
    )
    # only the latest and its predecessor survive
    assert len(versions) == 2
    assert versions[1] - versions[0] == 1
    final = spark.read.parquet(f"{dim_dir}/v{versions[-1]}")
    assert final.where(F.col("valid_to").isNull()).count() == 4
    assert final.count() == 8  # every key got one new version
    # the guard: retain_versions < 2 is rejected
    with pytest.raises(ValueError):
        streaming_scd2_merge(
            spark, stream, key="k", tracked=["attr"], dim_path=dim_dir,
            retain_versions=1,
        )


def test_k_anonymity_audit_basics(spark):
    from deeptime_spark.operators.profile import k_anonymity_audit

    rows = [
        ("10001", "m", 1),
        ("10001", "m", 2),
        ("10001", "m", 2),
        ("20002", "f", 3),  # singleton class -> risky at k=2
        (None, "f", 4),     # NULL quasi forms its OWN class
        (None, "f", 4),
    ]
    df = spark.createDataFrame(rows, "zip string, sex string, income long")
    out = k_anonymity_audit(
        df, ["zip", "sex"], k=2, sensitive_col="income"
    ).first()
    assert out["n_rows"] == 6
    assert out["n_classes"] == 3
    assert out["min_class_size"] == 1 and out["k_anonymity"] == 1
    assert out["n_risky_classes"] == 1 and out["n_risky_rows"] == 1
    # l-diversity: (10001,m) has {1,2}=2, (20002,f) has {3}=1, NULL has {4}=1
    assert out["min_l_diversity"] == 1


def test_k_anonymity_no_sensitive_and_validation(spark):
    from deeptime_spark.operators.profile import k_anonymity_audit

    df = spark.createDataFrame([("a", 1), ("a", 2)], "q string, v long")
    out = k_anonymity_audit(df, ["q"], k=1).first()
    assert out["k_anonymity"] == 2
    assert out["n_risky_classes"] == 0
    assert out["min_l_diversity"] is None
    with pytest.raises(ValueError):
        k_anonymity_audit(df, [], k=2)
    with pytest.raises(ValueError):
        k_anonymity_audit(df, ["q"], k=0)
