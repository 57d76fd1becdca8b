"""BPE tokenizer: classic-algorithm behavior on a hand-built corpus
(the harness documents have a ~31-word vocabulary — too degenerate to
exercise merge dynamics), plus layout independence of the Spark path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from deeptime_spark.operators.bpe import (
    END,
    bpe_token_counts_df,
    collect_word_counts,
    encode_word,
    train_bpe,
    train_bpe_from_counts,
)


def test_classic_merge_order():
    # Sennrich's worked example shape: 'est' emerges from frequent
    # lowest/newest/widest family before rarer pairs
    counts = [("lowest", 5), ("newest", 6), ("widest", 3), ("low", 7), ("new", 2)]
    merges = train_bpe_from_counts(counts, n_merges=4, min_pair_count=2)
    # 'es' (14) then 'est' (14) then 'est</w>' (14) dominate 'lo'/'ow' (12)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END)
    assert merges[3] == ("l", "o")


def test_encode_concat_roundtrip():
    counts = [("banana", 4), ("bandana", 3), ("ananas", 2)]
    merges = train_bpe_from_counts(counts, n_merges=10, min_pair_count=2)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in counts + [("band", 0), ("zzz", 0)]:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + END  # merging never loses characters
        assert toks[-1].endswith(END)


def test_unseen_word_falls_back_to_chars():
    merges = train_bpe_from_counts([("aaaa", 10)], n_merges=3, min_pair_count=2)
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("xyz", ranks) == ["x", "y", "z", END]


def test_tie_breaks_are_lexicographic():
    # 'ab' and 'cd' both have count 3: the lexicographically smaller
    # pair must merge first regardless of dict insertion order
    for order in ([("ab", 3), ("cd", 3)], [("cd", 3), ("ab", 3)]):
        merges = train_bpe_from_counts(order, n_merges=1, min_pair_count=2)
        assert merges[0] == ("a", "b")


def test_spark_counts_match_python_and_layout_independent(spark):
    rows = [(i, t) for i, t in enumerate(
        ["the cat sat", "the cat", "a cat sat here", "", None, "the the the"]
    )]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = collect_word_counts(df)
    scrambled = collect_word_counts(df.repartition(5, "doc_id"))
    assert base == scrambled
    assert dict(base)["the"] == 5 and dict(base)["cat"] == 3

    merges = train_bpe(df, n_merges=8, min_count=1)
    out = bpe_token_counts_df(df, merges).orderBy("doc_id").collect()
    ranks = {p: i for i, p in enumerate(merges)}
    for r in out:
        text = rows[r["doc_id"]][1] or ""
        ws = [w for w in text.lower().split() if w]
        assert r["n_words"] == len(ws)
        assert r["n_bpe_tokens"] == sum(len(encode_word(w, ranks)) for w in ws)
    out2 = bpe_token_counts_df(df.repartition(3, "doc_id"), merges).orderBy("doc_id").collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in out2]


# ---------------------------------------------------------- properties

from hypothesis import given, settings
from hypothesis import strategies as st

_words = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=8),
    min_size=1, max_size=30,
).map(lambda ws: [(w, i % 7 + 1) for i, w in enumerate(dict.fromkeys(ws))])


@settings(max_examples=60, deadline=None)
@given(_words)
def test_prop_roundtrip_and_bounds(counts):
    merges = train_bpe_from_counts(counts, n_merges=20, min_pair_count=2)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in counts:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + END
        assert 1 <= len(toks) <= len(w) + 1


@settings(max_examples=40, deadline=None)
@given(_words)
def test_prop_training_input_order_invariant(counts):
    # the merge sequence is a function of the COUNTS, not of the
    # dictionary ordering the driver happened to collect
    merges_a = train_bpe_from_counts(counts, n_merges=15, min_pair_count=2)
    merges_b = train_bpe_from_counts(list(reversed(counts)), n_merges=15, min_pair_count=2)
    assert merges_a == merges_b


def test_top_k_words_cap_is_distributed_and_deterministic(spark):
    """The dictionary cap must equal the driver-side (count desc, word)
    truncation — i.e. the TakeOrdered tie-break matches the documented
    ordering — and must bound the collect."""
    rows = [(i, f"common common common rare{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = collect_word_counts(df, min_count=1, top_k_words=None)
    capped = collect_word_counts(df, min_count=1, top_k_words=5)
    assert capped == full[:5]
    assert len(capped) == 5 and capped[0][0] == "common"
    # default hapax pruning: rare{i} words (count 1) vanish
    assert collect_word_counts(df) == [("common", 120)]
