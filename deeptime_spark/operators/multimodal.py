"""Multimodal (image/audio/video) column plumbing.

Training-data-pipeline surface (BASELINE.json north star): media as opaque
``binary`` columns with typed metadata structs; decode / feature-extract /
resize / frame-sample as Arrow-batched ``mapInPandas`` stages.

Decode paths, in priority order inside the Arrow kernel:

1. REAL pure-Python decoders for container-friendly formats — WAV PCM
   (stdlib ``wave``), PPM P6, and uncompressed 24-bit BMP — producing
   actual sample/pixel arrays and physically meaningful features (RMS,
   zero-crossing rate, channel means, luma gradient energy, ...).
2. ``DETERMINISTIC_FAKE`` fallback for formats needing codec libraries
   (JPEG/MP3/H.264 — PIL/ffmpeg are NOT in this container): a seeded
   hash-derived vector, or NotImplementedError when the flag is off.

The Spark-side contract (schema, batch shape, partitioning, payload
dropped immediately after decode) is identical on both paths.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Schema contract for media rows: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

# Feature-extraction output: fixed-width embedding per media row.
FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)

DETERMINISTIC_FAKE = True  # fallback for codec-needing formats; see docstring
_FEATURE_DIM = 16


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a codec-needing decode kernel: a seeded
    RNG keyed on an md5 of the payload (process-salt-free, stable across
    runs and executors — unlike builtin hash())."""
    import hashlib

    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "little")
    return np.random.default_rng(seed).normal(size=dim)


# ------------------------------------------------------- real decoders
# Pure-Python/numpy, no codec libraries: WAV PCM, PPM P6, 24-bit BMP.

def decode_wav(payload: bytes):
    """WAV PCM -> (samples float64 in [-1, 1] shaped (n, channels), rate).

    stdlib ``wave`` handles the RIFF chunking; sample decode is a numpy
    frombuffer (8-bit unsigned / 16- or 32-bit signed little-endian PCM).
    """
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        n_channels = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    return x.reshape(-1, n_channels), rate


def decode_ppm(payload: bytes) -> np.ndarray:
    """PPM binary (P6, maxval <= 255) -> uint8 array (h, w, 3)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header = magic, width, height, maxval as whitespace-separated tokens,
    # '#' comments allowed between tokens; pixel data starts after the
    # single whitespace byte following maxval
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    pix = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return pix.reshape(h, w, 3)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BI_RGB, bottom-up) -> uint8 (h, w, 3) RGB."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    row_bytes = (w * 3 + 3) & ~3  # rows padded to 4-byte boundary
    rows = []
    for r in range(abs(h)):
        off = data_offset + r * row_bytes
        rows.append(np.frombuffer(payload, np.uint8, count=w * 3, offset=off).reshape(w, 3))
    img = np.stack(rows[::-1] if h > 0 else rows)  # positive h = bottom-up
    return img[:, :, ::-1]  # BGR -> RGB


def _audio_features(samples: np.ndarray, rate: int, dim: int) -> np.ndarray:
    """Physically meaningful, deterministic audio features (first slot = 1.0
    marks the real-audio path)."""
    mono = samples.mean(axis=1)
    n = len(mono)
    zc = float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8))))) if n > 1 else 0.0
    q = np.percentile(mono, [25, 50, 75]) if n else np.zeros(3)
    feats = [
        1.0,
        float(samples.shape[1]),
        rate / 1e4,
        n / max(rate, 1),
        float(np.sqrt(np.mean(mono**2))) if n else 0.0,  # RMS
        zc,  # zero-crossing rate
        float(mono.mean()) if n else 0.0,
        float(mono.std()) if n else 0.0,
        float(np.abs(mono).max()) if n else 0.0,
        float(q[0]),
        float(q[1]),
        float(q[2]),
    ]
    return np.asarray((feats + [0.0] * dim)[:dim])


def _image_features(img: np.ndarray, dim: int) -> np.ndarray:
    """Channel statistics + luma gradient energy (first slot = 2.0 marks
    the real-image path)."""
    h, w = img.shape[:2]
    fimg = img.astype(np.float64) / 255.0
    luma = fimg @ np.array([0.299, 0.587, 0.114])
    grad = float(np.mean(np.abs(np.diff(luma, axis=1)))) if w > 1 else 0.0
    feats = [
        2.0,
        w / 100.0,
        h / 100.0,
        *[float(m) for m in fimg.mean(axis=(0, 1))],
        *[float(s) for s in fimg.std(axis=(0, 1))],
        float(luma.mean()),
        float(luma.std()),
        grad,
    ]
    return np.asarray((feats + [0.0] * dim)[:dim])


def decode_features(payload: bytes, dim: int = _FEATURE_DIM) -> np.ndarray:
    """Sniff the payload magic and run the matching REAL decoder; fall back
    to the deterministic fake (or raise) for codec-needing formats."""
    try:
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return _audio_features(*decode_wav(payload), dim=dim)
        if payload[:2] == b"P6":
            return _image_features(decode_ppm(payload), dim=dim)
        if payload[:2] == b"BM":
            return _image_features(decode_bmp(payload), dim=dim)
    except Exception:  # malformed container-format payload (wave.Error,
        pass  # struct.error, truncated buffers, ...): treat as opaque below
    if not DETERMINISTIC_FAKE:
        raise NotImplementedError("codec libraries unavailable in this container")
    return _fake_decode(payload, dim)


# ------------------------------------------------ synthetic binary fixtures

def synth_wav(freq_hz: float, duration_s: float = 0.25, rate: int = 8000,
              amplitude: float = 0.5) -> bytes:
    """Deterministic PCM16 mono sine-wave WAV (pure stdlib+numpy): the
    binary fixture generator for tests and the harness query."""
    import io
    import wave

    t = np.arange(int(rate * duration_s)) / rate
    x = (amplitude * np.sin(2 * np.pi * freq_hz * t) * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def synth_ppm(width: int, height: int, seed: int) -> bytes:
    """Deterministic random-pixel P6 PPM fixture."""
    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
    return b"P6\n%d %d\n255\n" % (width, height) + pix.tobytes()


def synth_ppm_variant(width: int, height: int, seed: int, delta: int = 120) -> bytes:
    """The planted perceptual NEAR-duplicate of :func:`synth_ppm`: the
    same deterministic image with pixel (0,0) — which the nearest-
    neighbor resize samples — shifted by ``delta`` per channel. One
    shared definition for the harness queries, the oracle replicas, and
    the tests: the aHash/pHash planted-pair distances depend on this
    exact edit, so drift between copies would silently break the
    Spark-vs-oracle agreement."""
    b = bytearray(synth_ppm(width, height, seed))
    off = b.index(b"255\n") + 4
    for c in range(3):
        b[off + c] = (b[off + c] + delta) % 256
    return bytes(b)


def extract_features(media: DataFrame, dim: int = _FEATURE_DIM) -> DataFrame:
    """media rows -> (media_id, feature array<double>).

    Real pipeline shape: Arrow batches through mapInPandas, one output row
    per input row, payload column dropped immediately after the UDF so the
    (large) binaries never travel further than the decode stage. WAV/PPM/BMP
    payloads decode for REAL (see ``decode_features``); codec-needing
    formats fall back to the deterministic fake kernel.
    """

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            feats = [
                decode_features(bytes(p) if p is not None else b"", dim).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return media.select("media_id", "payload").mapInPandas(decode, schema=FEATURE_SCHEMA)


def resize_image(img: "np.ndarray", height: int, width: int) -> "np.ndarray":
    """Nearest-neighbor resize — pure index math, no codec library, and
    deterministic (the same pixel is chosen for a target cell on any
    platform: floor(i * src / dst))."""
    ys = (np.arange(height) * img.shape[0]) // height
    xs = (np.arange(width) * img.shape[1]) // width
    return img[ys][:, xs]


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("ok", BooleanType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(media: DataFrame, height: int = 32, width: int = 32) -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-emit raw RGB bytes, as one
    Arrow-batched mapInPandas stage (the resize step of an image
    preprocessing pipeline). PPM/BMP payloads decode for real; anything
    else (including WAV/garbage) yields ok=false with a null payload —
    no silent fakes in the resize path. Output payload is height*width*3
    uint8 bytes (row-major RGB), bounded regardless of input size, so the
    stage SHRINKS data volume — the property that matters at 100 TB.
    """

    def work(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            out_ok, out_payload = [], []
            for p in pdf["payload"]:
                raw = bytes(p) if p is not None else b""
                img = None
                try:
                    img = decode_ppm(raw)
                except Exception:
                    try:
                        img = decode_bmp(raw)
                    except Exception:
                        img = None
                if img is None:
                    out_ok.append(False)
                    out_payload.append(None)
                else:
                    out_ok.append(True)
                    out_payload.append(
                        resize_image(img, height, width).astype(np.uint8).tobytes()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "height": np.full(len(pdf), height, dtype=np.int32),
                    "width": np.full(len(pdf), width, dtype=np.int32),
                    "ok": out_ok,
                    "payload": out_payload,
                }
            )

    return media.select("media_id", "payload").mapInPandas(work, schema=RESIZE_SCHEMA)


def frame_sample_plan(video: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Planning stage of video frame sampling: one output row per sampled
    timestamp (metadata only — pure JVM sequence/explode; the decode of the
    actual frame joins through ``extract_features`` in a codec image)."""
    n_frames = F.greatest((F.col("duration_ms") / F.lit(every_ms)).cast("int"), F.lit(1))
    return (
        video.where(F.col("modality") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .withColumn("frame_ts_ms", F.col("frame_idx") * F.lit(every_ms))
        .select("media_id", "frame_idx", "frame_ts_ms", "mime")
    )


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Adapter used by tests/bench: fabricate media rows from the documents
    table (payload = utf8 text bytes) so the plumbing has a real input."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("modality"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
    )


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("ahash", LongType()),
        StructField("ok", BooleanType()),
    ]
)


def ahash_bytes(payload: bytes, hash_size: int = 8) -> int | None:
    """Average-hash of one PPM/BMP payload — INTEGER-EXACT end to end.

    The standard perceptual aHash (resize to hash_size², threshold each
    cell against the mean) reformulated without floats: grayscale is the
    channel sum r+g+b (a monotone transform of luminance — thresholding
    is invariant to the scale), the resize is the nearest-neighbor index
    math of ``resize_image``, and the mean is the floored integer mean
    ``sum DIV n``. Bits are packed row-major, MSB first, into a SIGNED
    64-bit integer (two's complement, so bit 63 set -> negative —
    matches Spark/DuckDB BIGINT semantics). Returns None for payloads
    that are neither PPM nor BMP."""
    try:
        if payload[:2] == b"P6":
            img = decode_ppm(payload)
        elif payload[:2] == b"BM":
            img = decode_bmp(payload)
        else:
            return None
    except Exception:
        return None
    gray = img.astype(np.int32).sum(axis=2)  # r+g+b, 0..765
    small = resize_image(gray, hash_size, hash_size)
    mean = int(small.sum()) // (hash_size * hash_size)
    bits = (small > mean).flatten()
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    if h >= 1 << 63:
        h -= 1 << 64
    return h


def ahash_images(media: DataFrame, hash_size: int = 8) -> DataFrame:
    """(media_id, ahash, ok) over binary image payloads — the perceptual
    fingerprint stage of an image dedup pipeline, Arrow-batched through
    mapInPandas with the payload dropped immediately after (binaries
    never travel past the decode stage). Near-duplicate pairs come from
    the generic pigeonhole Hamming join
    (operators/dedup.py:hamming_near_pairs), exactly as SimHash text
    dedup — the image side only has to produce a 64-bit signature.
    Integer-exact, so an oracle replica reproduces hashes bit-for-bit.
    """

    def work(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            hs = [
                ahash_bytes(bytes(p), hash_size) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "ahash": pd.array(hs, dtype="Int64"),
                    "ok": [h is not None for h in hs],
                }
            )

    return media.select("media_id", "payload").mapInPandas(work, schema=AHASH_SCHEMA)


_DCT_SCALE = 1 << 15
_DCT_CACHE: dict[int, "np.ndarray"] = {}


def _dct_matrix_fixed(n: int) -> "np.ndarray":
    """Orthonormal DCT-II basis in SIGNED 16-bit fixed point
    (round(C * 2^15) as int64). Fixed-point makes the downstream hash
    INTEGER-EXACT: the transform is two int64 matmuls, so the bit
    pattern never depends on BLAS threading or SIMD width — the same
    determinism contract as ahash_bytes, extended to a frequency-domain
    hash. Magnitude bound: |C_fixed| <= 2^13, pixels <= 765, so the
    transform values stay < 2^50 — no int64 overflow."""
    m = _DCT_CACHE.get(n)
    if m is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        c = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
        c[0] *= np.sqrt(1.0 / n)
        c[1:] *= np.sqrt(2.0 / n)
        m = np.round(c * _DCT_SCALE).astype(np.int64)
        _DCT_CACHE[n] = m
    return m


def phash_bytes(payload: bytes, hash_size: int = 8, resize_to: int = 32) -> int | None:
    """Perceptual DCT hash (pHash) of one PPM/BMP payload — the
    frequency-domain counterpart of :func:`ahash_bytes`, robust to
    uniform brightness/contrast edits aHash is blind to.

    Classic recipe (Zauner 2010, the public imagehash formulation):
    grayscale -> resize to ``resize_to``² -> 2-d DCT-II -> keep the
    top-left ``hash_size``² low-frequency block -> threshold each
    coefficient against the block median -> pack bits row-major, MSB
    first, into a SIGNED 64-bit integer.

    INTEGER-EXACT throughout: grayscale is the channel sum, the resize
    is nearest-neighbor index math, the DCT runs in fixed point
    (:func:`_dct_matrix_fixed`), and the median test compares
    ``2*coeff > lo+hi`` of the two middle order statistics — all int64,
    so an oracle replica reproduces every bit. Returns None for
    payloads that are neither PPM nor BMP."""
    try:
        if payload[:2] == b"P6":
            img = decode_ppm(payload)
        elif payload[:2] == b"BM":
            img = decode_bmp(payload)
        else:
            return None
    except Exception:
        return None
    gray = img.astype(np.int64).sum(axis=2)  # r+g+b, 0..765
    small = resize_image(gray, resize_to, resize_to).astype(np.int64)
    c = _dct_matrix_fixed(resize_to)
    freq = c @ small @ c.T
    low = freq[:hash_size, :hash_size].flatten()
    n = hash_size * hash_size
    srt = np.sort(low)
    med2 = int(srt[n // 2 - 1]) + int(srt[n // 2])  # 2*median, exact int
    h = 0
    for v in low:
        h = (h << 1) | int(2 * int(v) > med2)
    if h >= 1 << 63:
        h -= 1 << 64
    return h


def phash_images(media: DataFrame, hash_size: int = 8) -> DataFrame:
    """(media_id, phash, ok) over binary image payloads — same Arrow
    mapInPandas shape as :func:`ahash_images` (payload dropped at the
    decode stage, signature rides on); pair generation reuses the
    pigeonhole Hamming join (operators/dedup.py:hamming_near_pairs)."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("phash", LongType()),
            StructField("ok", BooleanType()),
        ]
    )

    def work(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            hs = [
                phash_bytes(bytes(p), hash_size) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": pd.array(hs, dtype="Int64"),
                    "ok": [h is not None for h in hs],
                }
            )

    return media.select("media_id", "payload").mapInPandas(work, schema=schema)
