"""Engine-independent reimplementations of Spark's hash functions.

``F.hash`` (Murmur3 x86_32, Spark tail variant) and ``F.xxhash64``
(XXH64, default seed 42) pin the bucketing decisions of the MinHash /
SimHash / fingerprint operators.  The correctness oracles re-derive those
decisions OUTSIDE Spark, which needs bit-exact replicas of both hash
functions over UTF-8 bytes.

Both algorithms are public:

- Murmur3 x86_32 (Austin Appleby, public domain).  Spark's variant
  (org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes) differs
  from the canonical tail handling: every remaining byte after the 4-byte
  blocks is mixed as its OWN full block (signed byte -> mixK1 -> mixH1),
  rather than being accumulated into a single partial block.
- XXH64 (Yann Collet, BSD).  Spark's XXH64.hashUnsafeBytes follows the
  canonical layout (32-byte stripes, 8-byte chunks, one 4-byte chunk,
  tail bytes), so the standard algorithm applies.

Scalar forms take bytes; the ``*_fixed`` forms vectorize over an
(n, L) uint8 matrix of equal-length inputs with numpy uint32/uint64
wrap-around arithmetic — used for shingle-scale workloads (millions of
short strings) where per-string Python would dominate oracle build time.

Verified bit-exact against Spark itself in tests/test_spark_hashes.py.
"""

from __future__ import annotations

import numpy as np

_U32 = np.uint32
_U64 = np.uint64

# ----------------------------------------------------------- murmur3

_C1 = 0xCC9E2D51
_C2 = 0x1B873593


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & 0xFFFFFFFF
    k1 = _rotl32(k1, 15)
    return (k1 * _C2) & 0xFFFFFFFF


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1


def murmur3_32(data: bytes, seed: int = 42) -> int:
    """Spark F.hash(string_col, lit(seed)) over UTF-8 bytes -> signed int32."""
    h1 = seed & 0xFFFFFFFF
    n_blocks = len(data) // 4
    for b in range(n_blocks):
        k1 = int.from_bytes(data[b * 4 : b * 4 + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(k1))
    # Spark tail: each remaining byte is its own signed-int block
    for i in range(n_blocks * 4, len(data)):
        byte = data[i]
        if byte > 127:
            byte -= 256
        h1 = _mix_h1(h1, _mix_k1(byte & 0xFFFFFFFF))
    out = _fmix(h1, len(data))
    return out - (1 << 32) if out >= (1 << 31) else out


def murmur3_32_fixed(arr: np.ndarray, seed: int = 42) -> np.ndarray:
    """Vectorized Spark-murmur3 over an (n, L) uint8 matrix -> int32 (n,)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    n, L = arr.shape
    h1 = np.full(n, seed & 0xFFFFFFFF, dtype=_U32)
    c1, c2 = _U32(_C1), _U32(_C2)
    with np.errstate(over="ignore"):
        for b in range(L // 4):
            blk = arr[:, b * 4 : b * 4 + 4].astype(_U32)
            k1 = blk[:, 0] | (blk[:, 1] << _U32(8)) | (blk[:, 2] << _U32(16)) | (blk[:, 3] << _U32(24))
            k1 = k1 * c1
            k1 = (k1 << _U32(15)) | (k1 >> _U32(17))
            k1 = k1 * c2
            h1 ^= k1
            h1 = (h1 << _U32(13)) | (h1 >> _U32(19))
            h1 = h1 * _U32(5) + _U32(0xE6546B64)
        for i in range((L // 4) * 4, L):
            k1 = arr[:, i].astype(np.int8).astype(np.int32).astype(_U32)
            k1 = k1 * c1
            k1 = (k1 << _U32(15)) | (k1 >> _U32(17))
            k1 = k1 * c2
            h1 ^= k1
            h1 = (h1 << _U32(13)) | (h1 >> _U32(19))
            h1 = h1 * _U32(5) + _U32(0xE6546B64)
        h1 ^= _U32(L)
        h1 ^= h1 >> _U32(16)
        h1 = h1 * _U32(0x85EBCA6B)
        h1 ^= h1 >> _U32(13)
        h1 = h1 * _U32(0xC2B2AE35)
        h1 ^= h1 >> _U32(16)
    return h1.view(np.int32)


def murmur3_int32(value: int, seed: int) -> int:
    """Spark's Murmur3 of one INT column value: a single 4-byte block
    (hashInt), fmix length 4 -> signed int32."""
    h1 = _mix_h1(seed & 0xFFFFFFFF, _mix_k1(value & 0xFFFFFFFF))
    out = _fmix(h1, 4)
    return out - (1 << 32) if out >= (1 << 31) else out


def spark_hash_str_int(data: bytes, i: int) -> int:
    """Mirror of ``F.hash(string_col, F.lit(i))``: multi-column hash
    chains seeds — the int literal is hashed WITH the string hash as its
    seed (it is not a seed parameter)."""
    return murmur3_int32(i, murmur3_32(data, 42) & 0xFFFFFFFF)


def murmur3_int32_vec(value: int, seeds: np.ndarray) -> np.ndarray:
    """Vectorized ``murmur3_int32`` of one int under many seeds (the
    chained multi-column form: seeds = per-row string hashes)."""
    seeds = seeds.astype(np.int32).view(_U32).copy()
    with np.errstate(over="ignore"):
        k1 = np.full(len(seeds), value & 0xFFFFFFFF, dtype=_U32)
        k1 = k1 * _U32(_C1)
        k1 = (k1 << _U32(15)) | (k1 >> _U32(17))
        k1 = k1 * _U32(_C2)
        h1 = seeds
        h1 ^= k1
        h1 = (h1 << _U32(13)) | (h1 >> _U32(19))
        h1 = h1 * _U32(5) + _U32(0xE6546B64)
        h1 ^= _U32(4)
        h1 ^= h1 >> _U32(16)
        h1 = h1 * _U32(0x85EBCA6B)
        h1 ^= h1 >> _U32(13)
        h1 = h1 * _U32(0xC2B2AE35)
        h1 ^= h1 >> _U32(16)
    return h1.view(np.int32)


# ------------------------------------------------------------- xxh64

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh_round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    acc = _rotl64(acc, 31)
    return (acc * _P1) & _M64


def _xxh_merge(acc: int, val: int) -> int:
    acc ^= _xxh_round(0, val)
    return (acc * _P1 + _P4) & _M64


def xxhash64(data: bytes, seed: int = 42) -> int:
    """Spark F.xxhash64(string_col) over UTF-8 bytes -> signed int64.
    Spark's default seed is 42."""
    length = len(data)
    pos = 0
    if length >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while pos + 32 <= length:
            v1 = _xxh_round(v1, int.from_bytes(data[pos : pos + 8], "little"))
            v2 = _xxh_round(v2, int.from_bytes(data[pos + 8 : pos + 16], "little"))
            v3 = _xxh_round(v3, int.from_bytes(data[pos + 16 : pos + 24], "little"))
            v4 = _xxh_round(v4, int.from_bytes(data[pos + 24 : pos + 32], "little"))
            pos += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)) & _M64
        h = _xxh_merge(h, v1)
        h = _xxh_merge(h, v2)
        h = _xxh_merge(h, v3)
        h = _xxh_merge(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + length) & _M64
    while pos + 8 <= length:
        k = _xxh_round(0, int.from_bytes(data[pos : pos + 8], "little"))
        h ^= k
        h = (_rotl64(h, 27) * _P1 + _P4) & _M64
        pos += 8
    if pos + 4 <= length:
        h ^= (int.from_bytes(data[pos : pos + 4], "little") * _P1) & _M64
        h = (_rotl64(h, 23) * _P2 + _P3) & _M64
        pos += 4
    while pos < length:
        h ^= (data[pos] * _P5) & _M64
        h = (_rotl64(h, 11) * _P1) & _M64
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_fixed(arr: np.ndarray, seed: int = 42) -> np.ndarray:
    """Vectorized XXH64 over an (n, L) uint8 matrix with L < 32 -> int64."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    n, L = arr.shape
    if L >= 32:
        raise ValueError("vectorized path only for short inputs (L < 32)")
    p1, p2, p3, p4, p5 = (_U64(p) for p in (_P1, _P2, _P3, _P4, _P5))
    with np.errstate(over="ignore"):
        h = np.full(n, (seed + _P5 + L) & _M64, dtype=_U64)
        pos = 0
        while pos + 8 <= L:
            chunk = np.zeros(n, dtype=_U64)
            for b in range(8):
                chunk |= arr[:, pos + b].astype(_U64) << _U64(8 * b)
            k = chunk * p2
            k = (k << _U64(31)) | (k >> _U64(33))
            k = k * p1
            h ^= k
            h = (h << _U64(27)) | (h >> _U64(37))
            h = h * p1 + p4
            pos += 8
        if pos + 4 <= L:
            chunk = np.zeros(n, dtype=_U64)
            for b in range(4):
                chunk |= arr[:, pos + b].astype(_U64) << _U64(8 * b)
            h ^= chunk * p1
            h = (h << _U64(23)) | (h >> _U64(41))
            h = h * p2 + p3
            pos += 4
        while pos < L:
            h ^= arr[:, pos].astype(_U64) * p5
            h = (h << _U64(11)) | (h >> _U64(53))
            h = h * p1
            pos += 1
        h ^= h >> _U64(33)
        h = h * p2
        h ^= h >> _U64(29)
        h = h * p3
        h ^= h >> _U64(32)
    return h.view(np.int64)
