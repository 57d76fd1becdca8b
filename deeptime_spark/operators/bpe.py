"""Byte-pair-encoding tokenizer, Spark-split the published way.

Sennrich et al., "Neural Machine Translation of Rare Words with Subword
Units" (ACL 2016): BPE training never touches the raw corpus after the
first pass — it operates on the DISTINCT-WORD frequency dictionary.
That gives the natural 100 TB decomposition:

- **corpus-scale work = ONE aggregation**: explode whitespace tokens ->
  groupBy(word).count() — map-side combined, so the shuffle carries the
  distinct vocabulary per partition, not token occurrences;
- **merge loop = driver-side** over |vocab| entries with incremental
  pair-count maintenance (only words containing the merged pair are
  touched per iteration — the subword-nmt trick), deterministic
  tie-break (max count, then lexicographically smallest pair);
- **encoding = broadcast ranks + Arrow map** with an LRU word cache —
  natural text is Zipf-heavy, so the per-batch hit rate is high and the
  greedy merge loop runs once per distinct word per batch, not per
  occurrence.

Scale envelope: the driver dictionary is the only non-distributed
state, and it is BOUNDED by default: ``min_count=2`` prunes hapax
legomena (useless to BPE statistics at ``min_pair_count>=2``, and they
dominate |vocab| on noisy web text) and ``top_k_words`` applies a
distributed ``orderBy(n desc, word).limit`` (TakeOrdered heap) before
the collect, so driver memory is O(top_k_words) regardless of corpus
size. For even cheaper training, sample documents deterministically
first (operators/mixing.sample_deterministic) — standard practice for
production tokenizers, which train merges on a corpus sample anyway.

All statistics are exact integers; training and encoding are
deterministic functions of the word-count dictionary, so results are
layout-independent and replayable by the oracle (oracle_ref.py).
"""

from __future__ import annotations

from collections import Counter, defaultdict
from typing import Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deeptime_spark.operators.text import tokens

END = "</w>"


_ASCII_WS = None


def ascii_ws_words(t: str) -> list[str]:
    """Executor-side word split matching the training dictionary and the
    oracle EXACTLY: Java \\s+ / oracle [ \\t\\n\\x0b\\f\\r]+ are
    ASCII-whitespace-only, while Python str.split() also breaks on
    Unicode whitespace (U+00A0, U+2028, ...) — a document containing
    those would tokenize differently on the encode side and break the
    bit-for-bit oracle contract."""
    global _ASCII_WS
    if _ASCII_WS is None:
        import re as _re

        _ASCII_WS = _re.compile(r"[ \t\n\x0b\f\r]+")
    return [w for w in _ASCII_WS.split((t or "").lower().strip(" ")) if w]



def word_counts_df(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the corpus — the single corpus-scale pass."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def collect_word_counts(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    top_k_words: int | None = 1_000_000,
) -> list[tuple[str, int]]:
    """Driver-side dictionary, deterministically ordered (count desc,
    word asc) — the training input.

    Bounded at the 100 TB design point: hapax pruning (``min_count``,
    default 2 — count-1 words contribute nothing to BPE pair statistics
    at ``min_pair_count>=2``) plus a DISTRIBUTED top-k cut
    (``orderBy(n desc, word).limit`` — a TakeOrdered heap with the same
    deterministic tie-break as the returned ordering) keep the collect
    at <= ``top_k_words`` rows regardless of corpus size, instead of the
    full distinct-word set (O(1e8) with noise on a web corpus). Pass
    ``top_k_words=None`` for the unbounded dictionary on small corpora."""
    wc = word_counts_df(df, text_col)
    if min_count > 1:
        wc = wc.where(F.col("n") >= min_count)
    if top_k_words is not None:
        wc = wc.orderBy(F.col("n").desc(), F.col("word")).limit(top_k_words)
    rows = wc.collect()
    return sorted(((r["word"], int(r["n"])) for r in rows), key=lambda kv: (-kv[1], kv[0]))


def _word_pairs(syms: Sequence[str]) -> Iterable[tuple[str, str]]:
    return zip(syms, syms[1:])


def train_bpe_from_counts(
    counts: Iterable[tuple[str, int]],
    n_merges: int = 200,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """The classic merge loop with incremental pair-count updates.

    Deterministic: ties on pair count break to the lexicographically
    smallest pair, and the dictionary order never matters because every
    statistic is a full sum over it."""
    vocab: list[tuple[tuple[str, ...], int]] = [
        (tuple(word) + (END,), int(n)) for word, n in counts if word
    ]
    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for wi, (syms, n) in enumerate(vocab):
        for p in _word_pairs(syms):
            pair_counts[p] += n
            pair_words[p].add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best_count = max(pair_counts.values())
        if best_count < min_pair_count:
            break
        best = min(p for p, c in pair_counts.items() if c == best_count)
        merges.append(best)
        joined = best[0] + best[1]
        for wi in list(pair_words[best]):
            syms, n = vocab[wi]
            for p in _word_pairs(syms):
                pair_counts[p] -= n
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                s = pair_words.get(p)
                if s is not None:
                    s.discard(wi)
                    if not s:
                        del pair_words[p]
            new: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    new.append(joined)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            vocab[wi] = (tuple(new), n)
            for p in _word_pairs(vocab[wi][0]):
                pair_counts[p] += n
                pair_words[p].add(wi)
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    min_count: int = 2,
    min_pair_count: int = 2,
    top_k_words: int | None = 1_000_000,
) -> list[tuple[str, str]]:
    return train_bpe_from_counts(
        collect_word_counts(df, text_col, min_count, top_k_words),
        n_merges,
        min_pair_count,
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2-style greedy encode: repeatedly merge the lowest-rank pair."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for p in _word_pairs(syms):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        new: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == best_pair[0] and syms[i + 1] == best_pair[1]:
                new.append(best_pair[0] + best_pair[1])
                i += 2
            else:
                new.append(syms[i])
                i += 1
        syms = new
    return syms


def bpe_token_counts_df(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_words, n_bpe_tokens) per document — broadcast ranks, one
    Arrow map, per-batch LRU over distinct words."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from deeptime_spark.operators.layout import spread_for_map_parallelism

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    bc = df.sparkSession.sparkContext.broadcast(ranks)
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_words", LongType()),
            StructField("n_bpe_tokens", LongType()),
        ]
    )

    # the greedy merge loop is CPU-dense Python: spread a single-split
    # scan before the Arrow stage (no-op at real scale)
    src = spread_for_map_parallelism(df.select(id_col, text_col), id_col)

    def enc(batches):
        r = bc.value
        cache: dict[str, int] = {}

        def n_toks(w: str) -> int:
            v = cache.get(w)
            if v is None:
                v = len(encode_word(w, r))
                cache[w] = v
            return v

        for pdf in batches:
            if not len(pdf):
                continue
            ids, nw, nb = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                ws = ascii_ws_words(t)
                ids.append(int(i))
                nw.append(len(ws))
                nb.append(sum(n_toks(w) for w in ws))
            yield pd.DataFrame({id_col: ids, "n_words": nw, "n_bpe_tokens": nb})

    return src.mapInPandas(enc, schema=schema)


def bpe_encode_df(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """(id, *extra_cols, toks: array<string>) — the full BPE symbol
    sequence per document (words encoded independently, symbols
    concatenated in word order; each word ends with the </w> marker, the
    classic Sennrich formulation). Broadcast ranks, one Arrow map,
    per-batch LRU over distinct words — the same execution shape as
    ``bpe_token_counts_df`` but materializing the symbols for downstream
    packing/sinks rather than just counting them."""
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from deeptime_spark.operators.layout import spread_for_map_parallelism

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    bc = df.sparkSession.sparkContext.broadcast(ranks)
    fields = [StructField(id_col, LongType())]
    fields += [df.schema[c] for c in extra_cols]
    fields += [StructField("toks", ArrayType(StringType()))]
    schema = StructType(fields)

    src = spread_for_map_parallelism(
        df.select(id_col, *extra_cols, text_col), id_col
    )

    def enc(batches):
        r = bc.value
        cache: dict[str, list] = {}

        def toks_of(w: str) -> list:
            v = cache.get(w)
            if v is None:
                v = encode_word(w, r)
                cache[w] = v
            return v

        for pdf in batches:
            if not len(pdf):
                continue
            out: dict = {id_col: [int(i) for i in pdf[id_col]]}
            for c in extra_cols:
                out[c] = list(pdf[c])
            toks_col = []
            for t in pdf[text_col]:
                ws = ascii_ws_words(t)
                syms: list = []
                for w in ws:
                    syms.extend(toks_of(w))
                toks_col.append(syms)
            out["toks"] = toks_col
            yield pd.DataFrame(out)

    return src.mapInPandas(enc, schema=schema)


def pack_token_sequences(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    seq_len: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str = "source",
) -> DataFrame:
    """Tokenize-and-pack: BPE-encode every document and pack the token
    stream into fixed-length training sequences — the Megatron-style
    data-prep step between a cleaned corpus and a training run.

    Semantics (deterministic, layout-independent): within each shard
    (``shard_col`` group), documents concatenate in ``id_col`` order
    into one token stream; sequence k of a shard holds stream positions
    [k*seq_len, (k+1)*seq_len) — documents STRADDLE sequence boundaries
    (no padding waste), the final sequence of a shard may be short.

    Spark shape — two shuffles plus one Arrow encode stage, each
    justified: (1) a per-shard window computes each document's token
    OFFSET via prefix sum over exact per-doc counts (the array rides the
    same exchange, so no extra join); parallelism is the shard count,
    exactly as ``pack_documents`` — sub-shard upstream for more;
    (2) posexplode assigns every token its stream position, and a
    groupBy on (shard, seq_idx) gathers each sequence — per-group
    payload is bounded by ``seq_len``, and this shuffle of the tokenized
    corpus is the irreducible one (it IS the packing job). No driver
    materialization anywhere; output rows are bounded at seq_len tokens.

    Returns (shard, seq_idx, n_tokens, n_docs, first_doc_id, toks).
    """
    from pyspark.sql import Window

    enc = bpe_encode_df(df, merges, text_col, id_col, extra_cols=(shard_col,))
    w = Window.partitionBy(shard_col).orderBy(id_col)
    with_off = (
        enc.withColumn("_n", F.size("toks"))
        .withColumn("_off", F.sum("_n").over(w) - F.col("_n"))
    )
    pos = with_off.select(
        F.col(shard_col).alias("shard"),
        F.col(id_col),
        F.posexplode("toks").alias("_i", "tok"),
        F.col("_off"),
    ).select(
        "shard",
        id_col,
        "tok",
        (F.col("_off") + F.col("_i")).alias("_pos"),
    )
    return (
        pos.groupBy(
            "shard", F.expr(f"_pos div {int(seq_len)}").alias("seq_idx")
        )
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count_distinct(F.col(id_col)).alias("n_docs"),
            F.min(id_col).alias("first_doc_id"),
            F.array_sort(
                F.collect_list(F.struct(F.col("_pos").alias("p"), F.col("tok")))
            ).alias("_st"),
        )
        .withColumn("toks", F.transform("_st", lambda s: s["tok"]))
        .drop("_st")
    )


# ------------------------------------------------------------------
# SentencePiece-style UNIGRAM language-model tokenizer (Kudo, "Subword
# Regularization: Improving Neural Network Translation Models with
# Multiple Subword Candidates", ACL 2018) — the second of the two
# tokenizer families production pipelines train (BPE above; unigram is
# what SentencePiece defaults to for T5/LLaMA-style vocabularies).
#
# Identical 100 TB decomposition to BPE: the corpus-scale work is the
# SAME one word-count aggregation (collect_word_counts — map-combined,
# bounded by min_count/top_k_words); EM training operates on the
# distinct-word frequency dictionary driver-side (Kudo's algorithm is
# defined on exactly that table); encoding is broadcast piece table +
# one Arrow map with an LRU word cache. All training inputs are exact
# integers and every loop iterates deterministically-ordered
# structures, so the trained table is a pure function of the word
# counts — layout-independent and replayable by the oracle.


def _seed_unigram_scores(
    counts: Sequence[tuple[str, int]], max_piece_len: int
) -> tuple[Counter, set]:
    """One pass over the dictionary: substring scores (count * len — the
    SentencePiece seed heuristic) and the character set. Shared by
    :func:`seed_unigram_pieces` and the trainer's initialization so the
    O(total_count x L^2) scoring loop runs ONCE per training call."""
    scores: Counter = Counter()
    chars: set[str] = set()
    for word, n in counts:
        m = len(word)
        chars.update(word)
        for i in range(m):
            for j in range(i + 1, min(i + max_piece_len, m) + 1):
                scores[word[i:j]] += n * (j - i)
    return scores, chars


def seed_unigram_pieces(
    counts: Sequence[tuple[str, int]],
    max_piece_len: int = 8,
    seed_size: int = 2000,
    _scored: tuple | None = None,
) -> list[str]:
    """Candidate seed vocabulary: every substring (length <= L) of every
    dictionary word, scored by count * len(piece) (frequent LONG
    substrings are the useful pieces); top ``seed_size`` by
    (score desc, piece asc), plus ALL single characters (segmentation
    coverage guarantee)."""
    scores, chars = _scored if _scored is not None else _seed_unigram_scores(
        counts, max_piece_len
    )
    multi = [p for p in scores if len(p) > 1]
    multi.sort(key=lambda p: (-scores[p], p))
    return sorted(chars) + multi[: max(seed_size - len(chars), 0)]


def _unigram_expected_counts(
    counts: Sequence[tuple[str, int]],
    logp: dict,
    max_piece_len: int,
) -> tuple[dict, float]:
    """One E-step: forward-backward over each word's segmentation
    lattice, expected piece counts weighted by word frequency, plus the
    corpus log-likelihood. Deterministic: words in dictionary order,
    lattice edges in (position, length) order."""
    import math

    expected: dict = {}
    total_ll = 0.0
    NEG = float("-inf")
    for word, n in counts:
        m = len(word)
        fwd = [NEG] * (m + 1)
        fwd[0] = 0.0
        for j in range(1, m + 1):
            acc = NEG
            for i in range(max(0, j - max_piece_len), j):
                lp = logp.get(word[i:j])
                if lp is None or fwd[i] == NEG:
                    continue
                v = fwd[i] + lp
                acc = v if acc == NEG else (
                    max(acc, v) + math.log1p(math.exp(-abs(acc - v)))
                )
            fwd[j] = acc
        if fwd[m] == NEG:
            continue  # word not coverable (pruned char) — skipped consistently
        bwd = [NEG] * (m + 1)
        bwd[m] = 0.0
        for i in range(m - 1, -1, -1):
            acc = NEG
            for j in range(i + 1, min(i + max_piece_len, m) + 1):
                lp = logp.get(word[i:j])
                if lp is None or bwd[j] == NEG:
                    continue
                v = lp + bwd[j]
                acc = v if acc == NEG else (
                    max(acc, v) + math.log1p(math.exp(-abs(acc - v)))
                )
            bwd[i] = acc
        z = fwd[m]
        total_ll += n * z
        for i in range(m):
            for ln in range(1, min(max_piece_len, m - i) + 1):
                piece = word[i : i + ln]
                lp = logp.get(piece)
                if lp is None or fwd[i] == NEG or bwd[i + ln] == NEG:
                    continue
                post = math.exp(fwd[i] + lp + bwd[i + ln] - z)
                if post > 0.0:
                    expected[piece] = expected.get(piece, 0.0) + n * post
    return expected, total_ll


def train_unigram_from_counts(
    counts: Iterable[tuple[str, int]],
    vocab_size: int = 400,
    max_piece_len: int = 8,
    seed_size: int = 2000,
    n_em: int = 2,
    shrink: float = 0.75,
) -> list[tuple[str, float]]:
    """Kudo's iterative EM + prune: seed a large candidate vocabulary,
    alternate (``n_em`` EM rounds -> prune to ``shrink`` of the current
    multi-char pieces by expected count) until <= ``vocab_size`` pieces
    remain, with single characters never pruned (coverage). Ties in the
    prune ordering break lexicographically; every loop iterates sorted
    structures, so the output is a pure deterministic function of the
    integer word counts.

    Returns [(piece, log_prob)] sorted by piece."""
    import math

    counts = sorted(((w, int(n)) for w, n in counts if w), key=lambda kv: (-kv[1], kv[0]))
    if not counts:
        return []
    scored = _seed_unigram_scores(counts, max_piece_len)
    pieces = seed_unigram_pieces(
        counts, max_piece_len, seed_size, _scored=scored
    )
    chars = {p for p in pieces if len(p) == 1}
    # init: normalized seed scores (count*len), the SentencePiece
    # seeding — reusing the single scoring pass
    scores = scored[0]
    tot = float(sum(scores[p] for p in pieces))
    logp = {p: math.log(scores[p] / tot) for p in pieces}
    while True:
        for _ in range(max(n_em, 1)):
            expected, _ll = _unigram_expected_counts(counts, logp, max_piece_len)
            tot = sum(expected[p] for p in sorted(expected))
            if tot <= 0.0:
                break
            logp = {p: math.log(expected[p] / tot) for p in sorted(expected) if expected[p] > 0.0}
            for c in sorted(chars):  # coverage floor for chars EM zeroed
                if c not in logp:
                    logp[c] = math.log(1e-12)
        multi = sorted(
            (p for p in logp if len(p) > 1),
            key=lambda p: (-expected.get(p, 0.0), p),
        )
        n_keep_target = max(vocab_size - len(chars), 0)
        if len(multi) <= n_keep_target or len(logp) <= vocab_size:
            break
        n_keep = max(int(len(multi) * shrink), n_keep_target)
        if n_keep >= len(multi):
            n_keep = n_keep_target
        kept = set(multi[:n_keep]) | chars
        logp = {p: lp for p, lp in logp.items() if p in kept}
    # final renormalized table over the surviving vocabulary
    expected, _ll = _unigram_expected_counts(counts, logp, max_piece_len)
    tot = sum(expected[p] for p in sorted(expected))
    out = {
        p: math.log(expected[p] / tot)
        for p in sorted(expected)
        if expected[p] > 0.0
    }
    for c in sorted(chars):
        if c not in out:
            out[c] = math.log(1e-12)
    return sorted(out.items())


def train_unigram(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 400,
    max_piece_len: int = 8,
    seed_size: int = 2000,
    n_em: int = 2,
    min_count: int = 2,
    top_k_words: int | None = 1_000_000,
) -> list[tuple[str, float]]:
    """Corpus-scale work = the same ONE bounded word-count aggregate BPE
    trains from; EM is driver-side over the dictionary (Kudo's algorithm
    is defined on exactly that table)."""
    return train_unigram_from_counts(
        collect_word_counts(df, text_col, min_count, top_k_words),
        vocab_size=vocab_size,
        max_piece_len=max_piece_len,
        seed_size=seed_size,
        n_em=n_em,
    )


def unigram_encode_word(
    word: str, logp: dict, max_piece_len: int = 8, unk_logp: float | None = None
) -> list[str]:
    """Viterbi best segmentation under the unigram model. Unknown
    characters fall back to a floor score (min table log-prob - 10).
    Ties break toward the LONGEST piece ending at each position —
    deterministic and layout-free."""
    if unk_logp is None:
        unk_logp = (min(logp.values()) if logp else 0.0) - 10.0
    m = len(word)
    NEG = float("-inf")
    best = [NEG] * (m + 1)
    back = [0] * (m + 1)
    best[0] = 0.0
    for j in range(1, m + 1):
        for i in range(max(0, j - max_piece_len), j):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None:
                if j - i == 1:
                    lp = unk_logp  # single unknown char
                else:
                    continue
            if best[i] == NEG:
                continue
            v = best[i] + lp
            # strict > keeps the SMALLEST i on ties = longest piece
            if v > best[j] or (v == best[j] and i < back[j]):
                best[j] = v
                back[j] = i
    out: list[str] = []
    j = m
    while j > 0:
        i = back[j]
        out.append(word[i:j])
        j = i
    out.reverse()
    return out


def unigram_token_counts_df(
    df: DataFrame,
    pieces: Sequence[tuple[str, float]],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 8,
) -> DataFrame:
    """(id, n_words, n_unigram_tokens) per document — broadcast piece
    table, one Arrow map, per-batch LRU over distinct words (the
    bpe_token_counts_df shape)."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from deeptime_spark.operators.layout import spread_for_map_parallelism

    logp = dict(pieces)
    bc = df.sparkSession.sparkContext.broadcast(logp)
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_words", LongType()),
            StructField("n_unigram_tokens", LongType()),
        ]
    )
    src = spread_for_map_parallelism(df.select(id_col, text_col), id_col)

    def enc(batches):
        table = bc.value
        unk = (min(table.values()) if table else 0.0) - 10.0
        cache: dict[str, int] = {}

        def n_toks(w: str) -> int:
            v = cache.get(w)
            if v is None:
                v = len(unigram_encode_word(w, table, max_piece_len, unk))
                cache[w] = v
            return v

        for pdf in batches:
            if not len(pdf):
                continue
            ids, nw, nt = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                ws = ascii_ws_words(t)
                ids.append(int(i))
                nw.append(len(ws))
                nt.append(sum(n_toks(w) for w in ws))
            yield pd.DataFrame({id_col: ids, "n_words": nw, "n_unigram_tokens": nt})

    return src.mapInPandas(enc, schema)
