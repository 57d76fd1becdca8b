"""Single-node reference vs engine, same data, same results.

The reference library executes its operators as single-process
numpy/BLAS (or, for the LLM-data ops it doesn't have, the natural
single-node implementation is plain Python/numpy — exactly what our
oracle replicas in oracle_ref.py/spark_hashes.py already are, and they
produce bit-identical outputs to the Spark queries by construction).
This harness times those single-node implementations against the
corresponding Spark queries on the SAME sf directory and prints one
JSON line — the "matches-or-beats single-node throughput" evidence at
the scale where a single node still can hold the data.

Reading the numbers: the engine carries ~0.5 s/query of fixed Spark
overhead (job scheduling, codegen). For CPU-dense text/hash kernels the
32-core JVM path wins outright; for tiny-d BLAS kernels (moments over a
d<=6 feature vector) single-threaded numpy on 100k rows is
microseconds of FLOPs and no distributed engine can beat it — there the
win is the slope, not the intercept (SCALE.md: the same plans hold
slope ~1-2 at 8x data and would on 1000 executors at 100 TB, where the
numpy path stops existing because the data doesn't fit one node).

Usage: python tools/single_node_compare.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import numpy as np


def timed(fn, n=1):
    best = float("inf")
    out = None
    for _ in range(n):
        t0 = time.time()
        out = fn()
        best = min(best, time.time() - t0)
    return best, out


def _flatten_if_dir_tables(sf: str) -> str:
    """Spark-written table DIRS (e.g. tools/scale_bench.py replicas) ->
    one flat parquet file per table, so the duckdb/numpy single-node
    side can read them the same way it reads the driver testdata."""
    if not os.path.isdir(os.path.join(sf, "documents.parquet")):
        return sf
    flat = sf.rstrip("/") + "_flat"
    os.makedirs(flat, exist_ok=True)
    con = duckdb.connect()
    for t in ("documents", "events", "embeddings", "lineitem"):
        src, dst = os.path.join(sf, f"{t}.parquet"), os.path.join(flat, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        if os.path.isdir(src):
            con.execute(
                f"COPY (SELECT * FROM parquet_scan('{src}/*.parquet')) TO '{dst}' (FORMAT PARQUET)"
            )
        elif os.path.exists(src):
            os.symlink(os.path.abspath(src), dst)
    return flat


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf_single = _flatten_if_dir_tables(sf)
    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_single
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import __spark_entry__ as entrymod
    from deeptime_spark import oracle_ref
    from deeptime_spark.session import get_spark

    spark = get_spark("single-node-compare")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warm the fixed engine costs once (same policy as bench.py)
    spark.read.parquet(f"{sf}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().write.format("noop").mode("overwrite").save()

    def spark_time(name):
        def run():
            qs[name](spark, sf).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()

        return timed(run, n=2)[0]

    results = {}

    # ---- MinHash signatures + LSH banding over every document --------
    # single-node reference: the bit-exact Murmur3 replica pipeline the
    # oracle uses (shingling, per-seed hashing, banding) on one core.
    def single_minhash():
        oracle_ref._minhash_sigs.cache_clear()
        return oracle_ref._minhash_sigs(sf_single, n_hashes=32)

    t_single, _ = timed(single_minhash)
    results["minhash_bands"] = {"single_node_s": round(t_single, 3),
                                "engine_s": round(spark_time("minhash_bands"), 3)}

    # ---- Token stats over every document ------------------------------
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_single}/documents.parquet')"
    ).fetchall()

    def single_token_stats():
        out = []
        for i, t in docs:
            toks = (t or "").lower().split()
            n = len(toks)
            uniq = len(set(toks))
            total = sum(len(w) for w in toks)
            out.append((i, n, uniq, total / n if n else 0.0))
        return out

    t_single, _ = timed(single_token_stats)
    results["doc_token_stats"] = {"single_node_s": round(t_single, 3),
                                  "engine_s": round(spark_time("doc_token_stats"), 3)}

    # ---- Gopher top-n-gram fractions ---------------------------------
    def single_gopher_rep():
        from collections import Counter

        out = []
        for i, t in docs:
            norm = " ".join((t or "").lower().split())
            toks = norm.split(" ")
            nl = max(len(norm), 1)
            fracs = []
            for n in (2, 3, 4):
                grams = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
                if not grams:
                    fracs.append(0.0)
                    continue
                cnt = Counter(grams)
                top, c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
                fracs.append(c * len(top) / nl)
            out.append((i, *fracs))
        return out

    t_single, _ = timed(single_gopher_rep)
    results["doc_gopher_repetition"] = {
        "single_node_s": round(t_single, 3),
        "engine_s": round(spark_time("doc_gopher_repetition"), 3),
    }

    # ---- Moments / covariance at lag (the reference's BLAS core) -----
    ev = con.execute(
        f"""SELECT user_id, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS t,
                   value FROM read_parquet('{sf_single}/events.parquet') ORDER BY user_id, t"""
    ).fetchnumpy()
    uid = np.asarray(ev["user_id"], dtype=np.int64)
    val = np.asarray(ev["value"], dtype=np.float64) / 100.0

    def single_moments():
        X = np.stack([val, val * val, val * val * val], axis=1)
        bounds = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1], True])
        lag = 2
        idx0, idxt = [], []
        for a, b in zip(bounds[:-1], bounds[1:]):
            if b - a > lag:
                idx0.append(np.arange(a, b - lag))
                idxt.append(np.arange(a + lag, b))
        i0, it = np.concatenate(idx0), np.concatenate(idxt)
        X0, Xt = X[i0], X[it]
        return X0.T @ X0, X0.T @ Xt  # the reference's moments_XXXY BLAS call

    t_single, _ = timed(single_moments, n=2)
    results["event_moments"] = {"single_node_s": round(t_single, 3),
                                "engine_s": round(spark_time("event_moments"), 3)}

    # ---- Transition counting (the reference's groupBy-count core) ----
    st = con.execute(
        f"""SELECT user_id, CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
                   WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 WHEN 'view' THEN 4 ELSE -1 END AS s
            FROM read_parquet('{sf_single}/events.parquet') ORDER BY user_id, ts, event_id"""
    ).fetchnumpy()
    uid2 = np.asarray(st["user_id"], dtype=np.int64)
    s = np.asarray(st["s"], dtype=np.int64)

    def single_counts():
        same = uid2[1:] == uid2[:-1]
        pair = s[:-1][same] * 5 + s[1:][same]
        return np.bincount(pair, minlength=25).reshape(5, 5)

    t_single, _ = timed(single_counts, n=2)
    results["event_transition_counts"] = {
        "single_node_s": round(t_single, 3),
        "engine_s": round(spark_time("event_transition_counts"), 3),
    }

    # ---- Brute-force cosine top-k (BLAS gemm) ------------------------
    emb = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_single}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    V = np.array([r[1] for r in emb], dtype=np.float64)

    def single_knn():
        Q = V[:5]
        sims = (Q / np.linalg.norm(Q, axis=1, keepdims=True)) @ (
            V / np.linalg.norm(V, axis=1, keepdims=True)
        ).T
        return np.argsort(-sims, axis=1)[:, :11]

    t_single, _ = timed(single_knn, n=2)
    results["knn_bruteforce"] = {"single_node_s": round(t_single, 3),
                                 "engine_s": round(spark_time("knn_bruteforce"), 3)}

    # ---- BPE tokenizer and NB quality classifier ---------------------
    # the literal-value oracle builders ARE the single-node reference
    # implementations (full train + encode / label + train + score in one
    # process, bit-identical outputs) — time them directly.
    for qname, builder in (
        ("bpe_tokens", "oracle_bpe"),
        ("doc_quality_classifier", "oracle_quality_classifier"),
    ):
        fn = getattr(oracle_ref, builder)
        t_single, _ = timed(fn)
        results[qname] = {"single_node_s": round(t_single, 3),
                          "engine_s": round(spark_time(qname), 3)}

    # ---- URL normalization + host accounting (web layer, round 5) ----
    # faithful single-process replica of the normalize_url chain
    # (Python re, same RE2-safe patterns) over the same synthesized URLs
    # the web_host_stats query uses.
    import re

    TP = r"(?:utm_[a-z0-9]+|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)"
    p_pre = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)")
    p_frag = re.compile(r"#.*$")
    p_mid = re.compile(r"([?&])(?:" + TP + r"=[^&#]*&)+")
    p_tail = re.compile(r"[?&](?:" + TP + r"=[^&#]*&)*" + TP + r"=[^&#]*$")
    p_qamp = re.compile(r"\?&")
    p_trail = re.compile(r"[?&]$")
    p_slash = re.compile(r"//+")
    p_auth = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)")

    def single_web_host_stats():
        stats: dict = {}
        for i, t in docs:
            url = (
                f"HTTP://Site{i % 7}.Example.COM:80//d//{i % 40}"
                f"/page?utm_source=x&ref=feed&id={i % 9}#frag"
            )
            u = url.strip()
            m = p_pre.match(u)
            prefix = m.group(1) if m else ""
            rest = u[len(prefix):]
            low = prefix.lower()
            if low.startswith("http://"):
                low = re.sub(r":80$", "", low)
            elif low.startswith("https://"):
                low = re.sub(r":443$", "", low)
            rest = p_frag.sub("", rest)
            rest = p_mid.sub(r"\1", rest)
            rest = p_tail.sub("", rest)
            rest = p_trail.sub("", p_qamp.sub("?", rest))
            qpos = rest.find("?")
            path, q = (rest, "") if qpos < 0 else (rest[:qpos], rest[qpos:])
            nurl = low + p_slash.sub("/", path) + q
            am = p_auth.match(u)
            host = (am.group(1) if am else "").split("@")[-1]
            host = re.sub(r":[0-9]*$", "", host).lower()
            ent = stats.setdefault(host, [0, 0, set()])
            ent[0] += 1
            ent[1] += len((t or "").lower().split())
            ent[2].add(nurl)
        return {h: (c, tk, len(us)) for h, (c, tk, us) in stats.items()}

    t_single, _ = timed(single_web_host_stats)
    results["web_host_stats"] = {"single_node_s": round(t_single, 3),
                                 "engine_s": round(spark_time("web_host_stats"), 3)}

    # ---- HLL distinct shingles per lang (r6 sketch layer) -------------
    # single-node reference: numpy-vectorized XXH64 over the shingle
    # sets (the best honest one-core implementation — the same
    # vectorized hash kernel the oracle replicas use), then register
    # max-rho + the Flajolet finish.
    docs_lang = con.execute(
        f"SELECT lang, text FROM read_parquet('{sf_single}/documents.parquet')"
    ).fetchall()

    def single_hll(p=12):
        import math

        from deeptime_spark.spark_hashes import xxhash64, xxhash64_fixed

        W, m = 64 - p, 1 << p
        sets: dict = {}
        for lang, t in docs_lang:
            sets.setdefault(lang, set()).update(
                oracle_ref._shingle_set(oracle_ref._norm_text(t or ""))
            )
        out = {}
        for lang, sh in sets.items():
            by_len: dict = {}
            for s in sh:
                b = s.encode()
                by_len.setdefault(len(b), []).append(b)
            hs = []
            for L, items in by_len.items():
                if L < 32:
                    arr = np.frombuffer(b"".join(items), dtype=np.uint8).reshape(len(items), L)
                    hs.append(xxhash64_fixed(arr).astype(np.uint64))
                else:
                    hs.append(np.array([xxhash64(b) for b in items]).astype(np.uint64))
            h = np.concatenate(hs) if hs else np.empty(0, dtype=np.uint64)
            idx = (h >> np.uint64(W)).astype(np.int64)
            w = (h & np.uint64((1 << W) - 1)).astype(np.uint64)
            rho = np.where(w == 0, W + 1, W - np.floor(np.log2(np.maximum(w, 1))).astype(np.int64))
            regs = np.zeros(m, dtype=np.int64)
            np.maximum.at(regs, idx, rho)
            Z = np.sum(np.power(2.0, -regs.astype(np.float64)))
            alpha = 0.7213 / (1.0 + 1.079 / m)
            E = alpha * m * m / Z
            V = int(np.sum(regs == 0))
            if E <= 2.5 * m and V > 0:
                E = m * math.log(m / V)
            out[lang] = E
        return out

    t_single, _ = timed(single_hll)
    results["doc_hll_shingles"] = {"single_node_s": round(t_single, 3),
                                   "engine_s": round(spark_time("doc_hll_shingles"), 3)}

    # ---- BM25 top-k (r6 retrieval layer) ------------------------------
    # single-node reference: the full oracle replica (tokenize, df/dl
    # tables, idf, score, top-k) — plain Python over the corpus.
    def single_bm25():
        return oracle_ref.oracle_doc_bm25_search()

    oracle_ref._docs(sf_single)  # exclude the one-time data load from the timing
    t_single, _ = timed(single_bm25)
    results["doc_bm25_search"] = {"single_node_s": round(t_single, 3),
                                  "engine_s": round(spark_time("doc_bm25_search"), 3)}

    print(json.dumps({"sf_dir": sf, "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
