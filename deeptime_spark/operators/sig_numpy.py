"""Vectorized batch kernels for text fingerprints (MinHash / SimHash).

The JVM expression form of these signatures (explode + n_hashes chained
``hash(shingle, lit(i))`` expressions + an n_hashes-buffer hash
aggregate) pays per-row, per-buffer interpreted aggregate-update cost —
measured ~11 us per exploded shingle row at sf0.1, with the map side
under 5% of the stage. These kernels compute the *identical* integers
(Spark's Murmur3/XXH64 replicas from ``spark_hashes``) batch-at-a-time
in numpy inside ``mapInPandas``: the signature pass becomes scan-local
(ZERO shuffle of document text — guide §2.3: shuffle keys and metadata,
not payloads) and the per-shingle cost drops to vectorized numpy.

Exactness contract: ``F.hash(s, F.lit(i))`` chains seeds —
``murmur3_int32(i, seed=murmur3_utf8(s, 42))`` — and min over the
shingle MULTISET equals min over the distinct set, so no dedup is
needed before the min. Text normalization mirrors the SQL expressions
token-for-token (Java ``\\s`` class, 0x20-only trim, lowercase). The
engine-vs-SQL equality is pinned by tests/test_r12_ops.py.
"""

from __future__ import annotations

import re
from typing import Iterable

import numpy as np

from deeptime_spark.spark_hashes import (
    murmur3_32,
    murmur3_32_fixed,
    murmur3_int32_vec,
    xxhash64,
    xxhash64_fixed,
)

# Java \s — what Spark's regexp_replace/split see for r"\s+"
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _norm_text(t: str) -> str:
    """Mirror of ``regexp_replace(trim(lower(c)), '\\s+', ' ')``."""
    return _JAVA_WS.sub(" ", t.lower().strip(" "))


def _split_tokens(t: str) -> list[str]:
    """Mirror of ``F.split(trim(lower(c)), '\\s+')`` (limit -1)."""
    return _JAVA_WS.split(t.lower().strip(" "))


def _hash_var_bytes(chunks: list[bytes], seed: int = 42) -> np.ndarray:
    """murmur3(seed) over variable-length byte strings, vectorized by
    grouping equal lengths into fixed-width matrices."""
    out = np.empty(len(chunks), dtype=np.int32)
    by_len: dict[int, list[int]] = {}
    for j, b in enumerate(chunks):
        by_len.setdefault(len(b), []).append(j)
    for L, idxs in by_len.items():
        if L == 0:
            v = murmur3_32(b"", seed)
            for j in idxs:
                out[j] = v
        else:
            sub = np.frombuffer(
                b"".join(chunks[j] for j in idxs), dtype=np.uint8
            ).reshape(len(idxs), L)
            out[np.asarray(idxs)] = murmur3_32_fixed(sub, seed)
    return out


def _xxh64_var_bytes(chunks: list[bytes], seed: int = 42) -> np.ndarray:
    """xxhash64(seed) over variable-length byte strings, length-grouped."""
    out = np.empty(len(chunks), dtype=np.int64)
    by_len: dict[int, list[int]] = {}
    for j, b in enumerate(chunks):
        by_len.setdefault(len(b), []).append(j)
    for L, idxs in by_len.items():
        if L == 0:
            v = xxhash64(b"", seed)
            for j in idxs:
                out[j] = v
        else:
            sub = np.frombuffer(
                b"".join(chunks[j] for j in idxs), dtype=np.uint8
            ).reshape(len(idxs), L)
            out[np.asarray(idxs)] = xxhash64_fixed(sub, seed)
    return out


def _char_shingle_hashes(texts: Iterable[str | None], k: int):
    """Per-doc murmur3(seed 42) of every overlapping char k-gram of the
    normalized text (multiset — duplicates are harmless under min).

    Returns (keep_idx, counts, inner) where ``keep_idx`` indexes the
    docs that produce at least one shingle (Spark's explode drops NULL
    texts), ``counts[j]`` is doc j's shingle count and ``inner`` the
    flat int32 hash array in doc order.
    """
    keep_idx: list[int] = []
    counts: list[int] = []
    mats: list[np.ndarray | None] = []
    slow: list[tuple[int, list[bytes]]] = []
    for j, t in enumerate(texts):
        if t is None:
            continue
        norm = _norm_text(t)
        if len(norm) < k:
            slow.append((len(counts), [norm.encode()]))
            mats.append(None)
            counts.append(1)
        elif norm.isascii():
            b = np.frombuffer(norm.encode(), dtype=np.uint8)
            w = np.lib.stride_tricks.sliding_window_view(b, k)
            mats.append(w)
            counts.append(len(w))
        else:
            enc = [norm[i : i + k].encode() for i in range(len(norm) - k + 1)]
            slow.append((len(counts), enc))
            mats.append(None)
            counts.append(len(enc))
        keep_idx.append(j)
    offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    inner = np.empty(int(offsets[-1]), dtype=np.int32)
    fast = [m for m in mats if m is not None]
    if fast:
        big = np.concatenate(fast, axis=0) if len(fast) > 1 else fast[0]
        hv = murmur3_32_fixed(big, 42)
        hp = 0
        for p, m in enumerate(mats):
            if m is not None:
                n = counts[p]
                inner[offsets[p] : offsets[p] + n] = hv[hp : hp + n]
                hp += n
    for p, enc in slow:
        inner[offsets[p] : offsets[p] + len(enc)] = _hash_var_bytes(enc, 42)
    return keep_idx, np.asarray(counts, dtype=np.int64), inner


def _word_token_hashes(texts: Iterable[str | None]):
    """Per-doc murmur3(seed 42) of the doc's DISTINCT non-empty
    whitespace tokens (mirror of ``array_distinct(filter(tokens, != ''))``;
    distinctness is free here and keeps the flat array small)."""
    keep_idx: list[int] = []
    counts: list[int] = []
    chunks: list[bytes] = []
    for j, t in enumerate(texts):
        if t is None:
            continue
        toks = {tok for tok in _split_tokens(t) if tok}
        if not toks:
            continue  # empty array -> explode emits nothing -> doc dropped
        keep_idx.append(j)
        counts.append(len(toks))
        chunks.extend(tok.encode() for tok in toks)
    inner = _hash_var_bytes(chunks, 42)
    return keep_idx, np.asarray(counts, dtype=np.int64), inner


def minhash_batch(
    texts: list[str | None], n_hashes: int, shingle_k: int, unit: str
):
    """MinHash signatures for a batch of texts.

    Returns (keep_idx, sigs) — ``sigs[r, i] = min over shingles s of
    hash(s, lit(i))`` as int32, rows aligned with ``keep_idx`` into the
    input batch (docs that explode to zero rows are absent, matching
    the SQL plan).
    """
    if unit == "chars":
        keep_idx, counts, inner = _char_shingle_hashes(texts, shingle_k)
    elif unit == "words":
        keep_idx, counts, inner = _word_token_hashes(texts)
    else:
        raise ValueError(f"unit must be 'chars' or 'words', got {unit!r}")
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    sigs = np.empty((len(counts), n_hashes), dtype=np.int32)
    for i in range(n_hashes):
        v = murmur3_int32_vec(i, inner)
        if len(counts):
            sigs[:, i] = np.minimum.reduceat(v, starts)
    return keep_idx, sigs


def simhash_batch(texts: list[str | None], bits: int = 64):
    """SimHash fingerprints for a batch of texts.

    Mirrors ``simhash_signatures_df``: xxhash64 of every whitespace
    token (EMPTY tokens included — Spark's split keeps them), per-bit
    count-weighted sign votes over distinct token hashes, vote > 0 sets
    the bit. Returns (keep_idx, sigs int64).
    """
    keep_idx: list[int] = []
    counts: list[int] = []
    chunks: list[bytes] = []
    weights: list[np.ndarray] = []
    for j, t in enumerate(texts):
        if t is None:
            continue
        toks = _split_tokens(t)
        cnt: dict[str, int] = {}
        for tok in toks:
            cnt[tok] = cnt.get(tok, 0) + 1
        keep_idx.append(j)
        counts.append(len(cnt))
        chunks.extend(tok.encode() for tok in cnt)
        weights.append(np.fromiter(cnt.values(), dtype=np.int64, count=len(cnt)))
    inner = _xxh64_var_bytes(chunks, 42)
    w = np.concatenate(weights) if weights else np.empty(0, dtype=np.int64)
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(np.asarray(counts, dtype=np.int64)[:-1], out=starts[1:])
    sigs = np.zeros(len(counts), dtype=np.int64)
    uh = inner.view(np.uint64)
    for p in range(bits):
        bit = ((uh >> np.uint64(p)) & np.uint64(1)).astype(np.int64)
        vote_elems = np.where(bit == 1, w, -w)
        if len(counts):
            votes = np.add.reduceat(vote_elems, starts)
            sigs |= (votes > 0).astype(np.int64) << np.int64(p)
    return keep_idx, sigs
