"""Hybrid end-to-end on-chip benchmark (BASELINE config #4 / VERDICT r4 #3).

One VelesQL-shaped query — vector NEAR + BM25 MATCH + ColumnStore filter,
USING FUSION RRF — at 100K x 768D:

- quality: `hybrid_search_batch` (serve path) vs a HOST-fused oracle
  (exact host-f32 vector scores + the same BM25 scores, weighted RRF on
  host) — overlap@10.
- throughput: wall QPS of the batched public path at b=256 and b=16
  (host-observed; the vector branch is one device dispatch per batch).
- per-call: `execute_query` p50/p99 of the full VelesQL string (the
  tunnel-RTT-floor number, reference analog `search/text.rs:113-221`).

Run: python benchmarks/exp_hybrid.py          (real TPU, ~5 min)
     HYBRID_N=20000 HYBRID_D=128 ...          (smaller smoke)
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/velesdb_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VOCAB = [
    "coffee", "espresso", "latte", "grinder", "roast", "bean", "cup",
    "laptop", "keyboard", "screen", "battery", "charger", "dock",
    "guitar", "amp", "pedal", "string", "pickup", "tuner",
    "jacket", "boot", "scarf", "glove", "wool", "zipper",
    "novel", "poem", "essay", "author", "chapter", "plot",
]


def main():
    import tempfile

    from velesdb_tpu.database import Database
    from velesdb_tpu.fusion import weighted_rrf

    n = int(os.environ.get("HYBRID_N", 100_000))
    d = int(os.environ.get("HYBRID_D", 768))
    b = int(os.environ.get("HYBRID_B", 256))
    k = 10
    rng = np.random.default_rng(42)
    centers = rng.standard_normal((64, d)).astype(np.float32) * 2.0
    assign = rng.integers(0, 64, n)
    corpus = centers[assign] + 0.7 * rng.standard_normal((n, d)).astype(
        np.float32
    )
    # text: 3 topic words tied to the row's cluster + 2 random, price uniform
    words = np.array(VOCAB)
    topic = words[(assign % len(VOCAB))]
    payloads = []
    for i in range(n):
        extra = " ".join(words[rng.integers(0, len(words), 2)])
        payloads.append(
            {"text": f"{topic[i]} {topic[i]} {extra}",
             "price": float(rng.uniform(1, 100))}
        )

    db = Database(tempfile.mkdtemp(prefix="hybrid_bench_"))
    col = db.create_collection("h", dim=d, metric="cosine")
    t0 = time.perf_counter()
    step = 50_000
    for s in range(0, n, step):
        col.upsert_bulk(range(s, min(s + step, n)),
                        corpus[s : s + step],
                        payloads[s : s + step])
    print(f"[hybrid] ingest {n/(time.perf_counter()-t0):,.0f} vec/s",
          file=sys.stderr, flush=True)
    col._ensure_text()

    qa = rng.integers(0, 64, b)
    qvecs = centers[qa] + 0.7 * rng.standard_normal((b, d)).astype(np.float32)
    qtexts = [str(words[a % len(words)]) for a in qa]
    filt = {"type": "lt", "field": "price", "value": 50.0}

    # ---- quality vs the host-fused oracle -------------------------------
    got = col.hybrid_search_batch(qvecs, qtexts, k, filter=filt)
    mask = np.asarray(col._raw_filter_mask(filt), bool)
    live_ids = np.arange(n)[mask[:n]]
    ch = corpus / np.maximum(np.linalg.norm(corpus, axis=1, keepdims=True), 1e-30)
    fetch = 2 * k
    overlaps = []
    for i in range(b):
        qn = qvecs[i] / max(np.linalg.norm(qvecs[i]), 1e-30)
        s = ch[mask[:n]] @ qn
        top = live_ids[np.argsort(-s)[:fetch]]
        vec_list = [(int(t), float(ch[t] @ qn)) for t in top]
        tv, ts = col.text_index.search_batch([qtexts[i]], fetch, n, mask=mask)
        txt_list = [
            (int(sl), float(v)) for v, sl in zip(tv[0], ts[0]) if sl >= 0 and v > 0
        ]
        want = [vid for vid, _ in weighted_rrf(vec_list, txt_list, k)]
        got_ids = [r.id for r in got[i]]
        overlaps.append(len(set(got_ids) & set(want)) / k)
    quality = float(np.mean(overlaps))
    print(f"[hybrid] overlap@10 vs host-fused oracle: {quality:.4f}",
          file=sys.stderr, flush=True)

    # ---- throughput: batched public path --------------------------------
    out = {"n": n, "d": d, "k": k, "quality_vs_host_oracle": round(quality, 4)}
    for bsz in (b, 16):
        reps = max(1, 512 // bsz)
        # warm
        col.hybrid_search_batch(qvecs[:bsz], qtexts[:bsz], k, filter=filt)
        t0 = time.perf_counter()
        for r in range(reps):
            qv = qvecs[:bsz] + np.float32(1e-4 * (r + 1))
            col.hybrid_search_batch(qv, qtexts[:bsz], k, filter=filt)
        dt = time.perf_counter() - t0
        out[f"qps_b{bsz}"] = round(reps * bsz / dt, 1)
        print(f"[hybrid] b={bsz}: {out[f'qps_b{bsz}']:,} QPS (wall, public API)",
              file=sys.stderr, flush=True)

    # ---- per-call VelesQL query (NEAR + MATCH + filter, fused) -----------
    q = (
        "SELECT * FROM h WHERE v NEAR $v AND text MATCH '{}' "
        "AND price < 50 LIMIT 10"
    )
    times = []
    db.query(q.format(qtexts[0]), params={"v": qvecs[0].tolist()})
    for i in range(24):
        t0 = time.perf_counter()
        db.query(
            q.format(qtexts[i % b]),
            params={"v": (qvecs[i % b] + np.float32(1e-4 * i)).tolist()},
        )
        times.append((time.perf_counter() - t0) * 1e3)
    out["velesql_p50_ms"] = round(float(np.percentile(times, 50)), 2)
    out["velesql_p99_ms"] = round(float(np.percentile(times, 99)), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
