"""Round-10 additions: S-curve banding choice and the measure-then-
dispatch auto-tuned near-dedup (dedup.py:choose_banding /
autotune_near_dedup)."""

import pytest
from pyspark.sql import functions as F

from deeptime_spark.operators.dedup import (
    autotune_near_dedup,
    choose_banding,
    ppjoin_pairs,
)


def test_choose_banding_scurve():
    # the recall-gate geometry: midpoint 0.5 is the largest <= 0.7
    assert choose_banding(64, 70) == (16, 4)
    # 0.9 target: (8, 8) midpoint 0.771; (4, 16) midpoint 0.917 > 0.9
    assert choose_banding(64, 90) == (8, 8)
    assert choose_banding(16, 50) == (8, 2)
    # threshold below every midpoint -> most-bands fallback
    assert choose_banding(64, 1) == (64, 1)
    with pytest.raises(ValueError):
        choose_banding(0, 70)
    with pytest.raises(ValueError):
        choose_banding(64, 0)


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_autotune_fallback_on_clone_saturation(spark):
    # 6 exact clones of each of 4 base texts; max_bucket=2 caps every
    # band bucket below the clone-family size, so banding recall
    # collapses and the dispatch MUST fall back to the exact join
    base = [
        "alpha beta gamma delta epsilon zeta",
        "one two three four five six seven",
        "red green blue yellow purple orange",
        "north south east west up down center",
    ]
    rows = [(100 * b + j, t) for b, t in enumerate(base) for j in range(6)]
    docs = _mk_docs(spark, rows)
    pairs, report = autotune_near_dedup(
        docs, threshold_pct=70, recall_floor=0.9, n_hashes=32, max_bucket=2
    )
    rep = report.first()
    assert rep["method"] == "ppjoin_exact"
    assert rep["probe_recall"] < 0.9
    assert rep["pipeline_recall"] == 1.0
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    exact = {
        (r["id_a"], r["id_b"])
        for r in ppjoin_pairs(docs, threshold_pct=70).collect()
    }
    # each clone family is a 6-clique: C(6,2)*4 = 60 qualifying pairs
    assert got == exact and len(got) == 60


def test_autotune_banding_above_floor(spark):
    # same clone families, generous cap: banding finds every qualifying
    # pair, recall 1.0 >= floor, dispatch stays on the banding path —
    # and the verified pair set still equals the exact join (identical
    # integer predicate)
    base = [
        "alpha beta gamma delta epsilon zeta",
        "one two three four five six seven",
        "red green blue yellow purple orange",
    ]
    rows = [(100 * b + j, t) for b, t in enumerate(base) for j in range(4)]
    docs = _mk_docs(spark, rows)
    pairs, report = autotune_near_dedup(
        docs, threshold_pct=70, recall_floor=0.9, n_hashes=32, max_bucket=256
    )
    rep = report.first()
    assert rep["method"] == "lsh_banding"
    assert rep["probe_recall"] == 1.0
    assert rep["pipeline_recall"] == 1.0
    assert (rep["bands"], rep["rows_per_band"]) == choose_banding(32, 70)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    exact = {
        (r["id_a"], r["id_b"])
        for r in ppjoin_pairs(docs, threshold_pct=70).collect()
    }
    assert got == exact and len(got) == 18  # C(4,2)*3


def test_autotune_probe_docs_bounds_measurement(spark):
    # probe = one clone family only; the banding path then signs the
    # FULL corpus, and the report's counts reflect the probe alone
    base = ["alpha beta gamma delta epsilon zeta",
            "one two three four five six seven"]
    rows = [(100 * b + j, t) for b, t in enumerate(base) for j in range(3)]
    docs = _mk_docs(spark, rows)
    probe = docs.where(F.col("doc_id") < 100)
    pairs, report = autotune_near_dedup(
        docs, threshold_pct=70, recall_floor=0.9, n_hashes=32,
        max_bucket=256, probe_docs=probe,
    )
    rep = report.first()
    assert rep["method"] == "lsh_banding"
    assert rep["n_exact_probe"] == 3  # C(3,2) inside the probe family
    # full-corpus pairs: both families' 3-cliques
    assert pairs.count() == 6


def test_autotune_validates_floor(spark):
    docs = _mk_docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        autotune_near_dedup(docs, recall_floor=1.5)


def test_streaming_scd2_matches_batch(spark, tmp_path):
    # 4-file update stream vs composing scd2_merge batch-by-batch:
    # identical end snapshot, and re-running a batch against its input
    # version reproduces the identical next version (replay exactness)
    import glob

    from deeptime_spark.operators.scd import scd2_merge
    from deeptime_spark.streaming.accumulate import streaming_scd2_merge

    dim = spark.createDataFrame(
        [(k, f"attr{k}", 0, None) for k in range(1, 9)],
        "k long, attr string, valid_from long, valid_to long",
    )
    updates = spark.createDataFrame(
        [(k, f"attr{k}x" if k % 2 == 0 else f"attr{k}") for k in range(1, 9)]
        + [(99, "brand-new")],
        "k long, attr string",
    )
    src = str(tmp_path / "src")
    dim_dir = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")
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
        checkpoint=ckpt,
    )
    assert q.awaitTermination(120)
    versions = sorted(
        int(p.rsplit("/v", 1)[1]) for p in glob.glob(f"{dim_dir}/v*")
    )
    latest = versions[-1]
    assert latest == len(versions) - 1  # contiguous v0..vN
    final = spark.read.parquet(f"{dim_dir}/v{latest}")
    # order-insensitive end state equals composing the batch merges in
    # the same batch order (replay each file as its own batch)
    # changed keys (even) get 2 versions; unchanged odd keys 1; new key 1
    agg = {
        r["k"]: (r["n"], r["n_open"])
        for r in final.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("valid_to").isNull(), 1).otherwise(0)).alias(
                "n_open"
            ),
        ).collect()
    }
    for k in range(1, 9):
        assert agg[k] == ((2, 1) if k % 2 == 0 else (1, 1))
    assert agg[99] == (1, 1)
    # replay exactness: re-merging the LAST batch's input file against
    # v{latest-1} reproduces v{latest} bit-for-bit (set equality on rows)
    files = sorted(glob.glob(f"{src}/part-*.parquet"))
    # recover which file was batch latest-1 by trying each: exactly one
    # reproduces the latest snapshot from its predecessor
    prev = spark.read.parquet(f"{dim_dir}/v{latest - 1}")
    want = {tuple(r) for r in final.collect()}
    hits = 0
    for f in files:
        got = scd2_merge(
            prev, spark.read.parquet(f), key="k", tracked=["attr"],
            effective_ts=latest,
        )
        if {tuple(r) for r in got.collect()} == want:
            hits += 1
    assert hits >= 1


# -------------------------------- unigram-LM tokenizer (Kudo, ACL'18)

def test_unigram_train_deterministic_and_bounded():
    from deeptime_spark.operators.bpe import train_unigram_from_counts

    counts = [("hello", 50), ("help", 30), ("world", 40), ("word", 20),
              ("hell", 10), ("low", 15), ("lowest", 5), ("he", 25)]
    tab = train_unigram_from_counts(counts, vocab_size=20, seed_size=50, n_em=2)
    # deterministic under dictionary reorder (all loops sort)
    tab2 = train_unigram_from_counts(
        list(reversed(counts)), vocab_size=20, seed_size=50, n_em=2
    )
    assert tab == tab2
    assert len(tab) <= 20
    # coverage: every character of the dictionary survives pruning
    chars = {c for w, _ in counts for c in w}
    assert chars <= {p for p, _ in tab}
    # normalized model: probabilities sum to ~1
    import math
    assert abs(sum(math.exp(lp) for _, lp in tab) - 1.0) < 1e-6


def test_unigram_viterbi_matches_bruteforce():
    import itertools
    import math

    from deeptime_spark.operators.bpe import (
        train_unigram_from_counts,
        unigram_encode_word,
    )

    counts = [("abab", 20), ("abc", 10), ("bc", 15), ("cab", 5)]
    table = dict(train_unigram_from_counts(counts, vocab_size=12, seed_size=30))
    unk = min(table.values()) - 10.0

    def brute(word):
        best, best_score = None, -math.inf
        n = len(word)
        for cuts in itertools.product([0, 1], repeat=n - 1):
            pos = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
            segs = [word[pos[i]:pos[i + 1]] for i in range(len(pos) - 1)]
            score = sum(
                table.get(s, unk if len(s) == 1 else -math.inf) for s in segs
            )
            if score > best_score:
                best, best_score = segs, score
        return best_score

    for w in ("abab", "abcbc", "cababc", "xbc"):
        got = unigram_encode_word(w, table, 8, unk)
        got_score = sum(table.get(s, unk) for s in got)
        assert abs(got_score - brute(w)) < 1e-9, (w, got)


def test_unigram_token_counts_df_matches_driver_encode(spark):
    from deeptime_spark.operators.bpe import (
        train_unigram_from_counts,
        unigram_encode_word,
        unigram_token_counts_df,
    )

    texts = ["hello world", "help the world", "hello hello low", ""]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    from collections import Counter
    wc = Counter(w for t in texts for w in t.split() if w)
    pieces = train_unigram_from_counts(sorted(wc.items()), vocab_size=30, seed_size=60)
    table = dict(pieces)
    unk = min(table.values()) - 10.0
    got = {
        r["doc_id"]: (r["n_words"], r["n_unigram_tokens"])
        for r in unigram_token_counts_df(docs, pieces).collect()
    }
    for i, t in enumerate(texts):
        ws = [w for w in t.lower().strip(" ").split() if w]
        want = (len(ws), sum(len(unigram_encode_word(w, table, 8, unk)) for w in ws))
        assert got[i] == want, (i, got[i], want)


# ---------------------------- skew profiler + blocked record linkage

def test_skew_profile_exact_stats(spark):
    from deeptime_spark.operators.profile import skew_profile

    rows = [("a",)] * 6 + [("b",)] * 3 + [(None,)] * 2 + [("c",)]
    df = spark.createDataFrame(rows, "k string")
    out = {r["rank"]: r for r in skew_profile(df, "k", top_n=4).collect()}
    assert [out[i]["key"] for i in (1, 2, 3, 4)] == ["a", "b", "NULL", "c"]
    r1 = out[1]
    assert (r1["n_rows_key"], r1["n_rows_total"], r1["n_keys"]) == (6, 12, 4)
    assert r1["share"] == 6 / 12 and r1["skew_ratio"] == 6 * 4 / 12
    with pytest.raises(ValueError):
        skew_profile(df, [], top_n=4)


def test_blocked_candidates_cap_and_null(spark):
    from deeptime_spark.operators.linkage import blocked_candidates

    rows = [(i, "x" if i < 5 else None) for i in range(8)]
    df = spark.createDataFrame(rows, "id long, blk string")
    # NULL blocks never match; cap=3 keeps ids 0,1,2 -> C(3,2)=3 pairs
    got = {
        (r["id_a"], r["id_b"])
        for r in blocked_candidates(df, "id", ["blk"], max_block=3).collect()
    }
    assert got == {(0, 1), (0, 2), (1, 2)}
    # uncapped: C(5,2)=10 pairs among the non-null block members
    assert blocked_candidates(df, "id", ["blk"], max_block=None).count() == 10


def test_blocked_record_linkage_scores(spark):
    from deeptime_spark.operators.linkage import blocked_record_linkage

    rows = [
        (1, "jonathan smith", "10001", 100),
        (2, "jonathan smyth", "10001", 100),   # 1 edit, same bal -> match
        (3, "entirely other", "10001", 100),   # same bal, name far
        (4, "jonathan smith", "10001", 999),   # same name, bal off
        (5, "jonathan smith", "20002", 100),   # different block: no pair
    ]
    df = spark.createDataFrame(rows, "id long, name string, zip string, bal long")
    out = blocked_record_linkage(
        df, "id", ["zip"], string_fields=["name"], exact_fields=["bal"],
        weights={"name": 1, "bal": 2}, threshold=0.9,
    )
    got = {(r["id_a"], r["id_b"]): r for r in out.collect()}
    assert (1, 2) in got
    r = got[(1, 2)]
    assert abs(r["sim_name"] - (1 - 1 / 14)) < 1e-12
    assert r["sim_bal"] == 1.0
    assert abs(r["score"] - ((1 - 1 / 14) / 3 + 2 / 3)) < 1e-12
    # name-far + bal-match scores (low + 2/3) < 0.9; bal-off scores 1/3
    assert (1, 3) not in got and (1, 4) not in got
    # cross-block pair never became a candidate
    assert all(5 not in p for p in got)
    with pytest.raises(ValueError):
        blocked_record_linkage(df, "id", ["zip"])


def test_entity_resolution_golden_records(spark):
    # linkage pairs -> CC -> min-id canonical: the 1-edit clone loses to
    # its original; the unmatched and off-balance records all survive
    from deeptime_spark.operators.dedup import drop_near_duplicates
    from deeptime_spark.operators.linkage import blocked_record_linkage

    rows = [
        (1, "jonathan smith", "10001", 100),
        (2, "jonathan smyth", "10001", 100),   # matches 1 -> dropped
        (3, "entirely other", "10001", 100),   # survives
        (4, "jonathan smith", "10001", 999),   # survives (bal off)
    ]
    df = spark.createDataFrame(rows, "id long, name string, zip string, bal long")
    pairs = blocked_record_linkage(
        df, "id", ["zip"], string_fields=["name"], exact_fields=["bal"],
        weights={"name": 1, "bal": 2}, threshold=0.9,
    )
    golden = drop_near_duplicates(df, pairs, id_col="id")
    assert {r["id"] for r in golden.collect()} == {1, 3, 4}


def test_ppjoin_matches_bruteforce_property(spark):
    # PPJoin's prefix filter must be LOSSLESS: for random small corpora
    # the returned pair set equals brute-force all-pairs token Jaccard
    # at the same integer predicate (100*i >= pct*u)
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(["a", "b", "c", "dd", "ee", "ff", "gg"])

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.lists(word, min_size=1, max_size=6),
            min_size=2,
            max_size=10,
        ),
        st.sampled_from([50, 70, 90]),
    )
    def check(docs_words, pct):
        texts = [" ".join(ws) for ws in docs_words]
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {
            (r["id_a"], r["id_b"], r["n_intersect"], r["n_union"])
            for r in ppjoin_pairs(df, threshold_pct=pct).collect()
        }
        want = set()
        sets = [set(ws) for ws in docs_words]
        for i in range(len(sets)):
            for j in range(i + 1, len(sets)):
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j])
                if union and 100 * inter >= pct * union:
                    want.add((i, j, inter, union))
        assert got == want, (texts, pct, got ^ want)

    check()


def test_skew_profile_matches_bruteforce_property(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from deeptime_spark.operators.profile import skew_profile

    @settings(max_examples=6, deadline=None)
    @given(st.lists(st.integers(0, 5), min_size=1, max_size=40))
    def check(keys):
        df = spark.createDataFrame([(k,) for k in keys], "k int")
        got = {
            r["rank"]: (r["key"], r["n_rows_key"], r["share"], r["skew_ratio"])
            for r in skew_profile(df, "k", top_n=3).collect()
        }
        from collections import Counter
        cnt = Counter(str(k) for k in keys)
        order = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        n, nk = len(keys), len(cnt)
        for rank, (key, c) in enumerate(order, 1):
            assert got[rank] == (key, c, c / n, c * nk / n), (keys, rank)

    check()


def test_record_linkage_probe_best_match(spark):
    from deeptime_spark.operators.linkage import record_linkage_probe

    master = spark.createDataFrame(
        [
            (1, "jonathan smith", "10001", 100),
            (2, "jonathan smyth", "10001", 100),  # 1 edit from the probe too
            (3, "entirely other", "10001", 100),
            (4, "lone record", "20002", 50),
        ],
        "id long, name string, zip string, bal long",
    )
    delta = spark.createDataFrame(
        [
            (101, "jonathan smith", "10001", 100),  # exact -> master 1
            (102, "jonathan smqth", "10001", 100),  # 1 edit from BOTH 1,2
            (103, "jonathan smith", "10001", 999),  # bal off -> no match
            (104, "other zip", "30003", 100),       # no block -> no match
        ],
        "id long, name string, zip string, bal long",
    )
    out = {
        r["id_delta"]: r
        for r in record_linkage_probe(
            master, delta, "id", ["zip"], string_fields=["name"],
            exact_fields=["bal"], weights={"name": 1, "bal": 2},
            threshold=0.9,
        ).collect()
    }
    assert out[101]["id_master"] == 1 and out[101]["score"] == 1.0
    # 102 ties between masters 1 and 2 on score -> min master id wins
    assert out[102]["id_master"] == 1
    assert abs(out[102]["sim_name"] - (1 - 1 / 14)) < 1e-12
    assert 103 not in out and 104 not in out


def test_centrality_truncation_warning_only_when_truncated(spark):
    import warnings as _w

    from deeptime_spark.operators.graph import (
        betweenness_centrality,
        harmonic_centrality,
    )

    # path graph 0-1-2-...-6: eccentricity from node 0 is 6
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long"
    )

    def msgs(fn, depth):
        with _w.catch_warnings(record=True) as w:
            _w.simplefilter("always")
            fn(edges, n_pivots=1, max_depth=depth).count()
            return [str(x.message) for x in w
                    if issubclass(x.category, RuntimeWarning)]

    for fn in (betweenness_centrality, harmonic_centrality):
        # genuinely truncated: unvisited nodes remain beyond depth 2
        assert any("truncated" in m for m in msgs(fn, 2)), fn.__name__
        # fully explored at exactly max_depth: loop exhausts but the
        # probe expansion is empty -> NO false warning
        assert not any("truncated" in m for m in msgs(fn, 6)), fn.__name__
        # comfortably deep: no warning either
        assert not any("truncated" in m for m in msgs(fn, 20)), fn.__name__
