"""Hybrid stage profile (VERDICT r4 weak #5 / next #5): decompose one
device-fused NEAR+MATCH+filter batch into its stages and find the floor.

Stages of `Collection._hybrid_fused_batch` (collection.py):

    mask     ColumnStore filter -> bool mask (host columnar eval)
    vector   `_search_device` coarse top-fetch (device dispatch + queue)
    bm25     `text_index.search_batch_dev` (host tokenize + postings-block
             list build + device scatter-add/top-k dispatch)
    fuse     `rrf_fuse_topk` + the ONE [B, k] readback
    hydrate  slot->id mapping + payload retrieves (host, B*k rows)
    full     the public `hybrid_search_batch` call (sum check)

Each stage timed with unique inputs, min/med of REPS calls, forced
device sync. Run: python benchmarks/exp_hybrid_profile.py
Knobs: HYBRID_N/D/B (default 100K x 768 x 256).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/velesdb_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benchmarks.exp_hybrid import VOCAB

REPS = 12


def timed(fn, reps=REPS):
    samples = []
    for r in range(reps):
        t0 = time.perf_counter()
        fn(r)
        samples.append((time.perf_counter() - t0) * 1e3)
    return float(np.min(samples)), float(np.median(samples))


def main():
    import tempfile

    import jax

    if os.environ.get("HYBRID_CPU"):  # smoke-test off-chip
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from velesdb_tpu.database import Database
    from velesdb_tpu.ops.fused_rrf import rrf_fuse_topk

    n = int(os.environ.get("HYBRID_N", 100_000))
    d = int(os.environ.get("HYBRID_D", 768))
    b = int(os.environ.get("HYBRID_B", 256))
    k = 10
    fetch = 2 * k
    rng = np.random.default_rng(42)
    centers = rng.standard_normal((64, d)).astype(np.float32) * 2.0
    assign = rng.integers(0, 64, n)
    corpus = centers[assign] + 0.7 * rng.standard_normal((n, d)).astype(
        np.float32
    )
    words = np.array(VOCAB)
    topic = words[(assign % len(VOCAB))]
    payloads = []
    for i in range(n):
        extra = " ".join(words[rng.integers(0, len(words), 2)])
        payloads.append(
            {"text": f"{topic[i]} {topic[i]} {extra}",
             "price": float(rng.uniform(1, 100))}
        )

    db = Database(tempfile.mkdtemp(prefix="hybrid_prof_"))
    col = db.create_collection("h", dim=d, metric="cosine")
    step = 50_000
    for s in range(0, n, step):
        col.upsert_bulk(range(s, min(s + step, n)),
                        corpus[s : s + step], payloads[s : s + step])
    col._ensure_text()
    col.refresh_device()

    qa = rng.integers(0, 64, b)
    qvecs = centers[qa] + 0.7 * rng.standard_normal((b, d)).astype(np.float32)
    qtexts = [str(words[a % len(words)]) for a in qa]
    filt = {"type": "lt", "field": "price", "value": 50.0}

    # warm every compile once
    col.hybrid_search_batch(qvecs, qtexts, k, filter=filt)

    out = {"n": n, "d": d, "b": b, "fetch": fetch}

    # ---- full public path ------------------------------------------------
    def full(r):
        col.hybrid_search_batch(
            qvecs + np.float32(1e-4 * (r + 1)), qtexts, k, filter=filt
        )

    out["full_ms"] = timed(full)

    # ---- mask eval ---------------------------------------------------------
    def mask_stage(r):
        col._raw_filter_mask(
            {"type": "lt", "field": "price", "value": 50.0 + 1e-6 * r}
        )

    out["mask_ms"] = timed(mask_stage)

    raw_mask = col._raw_filter_mask(filt)
    used = max(col.vectors.used_slots, 1)
    n_pad = col._brute.n_pad or used
    m = np.asarray(raw_mask, bool)
    m = np.pad(m, (0, n_pad - m.shape[0]))
    mask_pad = m

    # ---- vector branch -----------------------------------------------------
    def vec_stage(r):
        v_vals, v_idx, _e, _s, _t = col._search_device(
            qvecs + np.float32(1e-4 * (r + 1)), fetch, mask_pad, None, None
        )
        jax.block_until_ready((v_vals, v_idx))

    out["vector_ms"] = timed(vec_stage)

    # ---- bm25 branch (host prep + device dispatch) -------------------------
    def bm25_stage(r):
        got = col.text_index.search_batch_dev(
            qtexts, fetch, used, mask=raw_mask
        )
        jax.block_until_ready(got)

    out["bm25_ms"] = timed(bm25_stage)

    # bm25 host prep alone (tokenize + block lists, no dispatch): proxy =
    # run search_batch_dev against an EMPTY-hit query set is wrong; instead
    # time tokenization+lookup directly
    from collections import Counter

    from velesdb_tpu.text.tokenizer import tokenize

    def bm25_prep(r):
        ti = col.text_index
        for q in qtexts:
            for term, qtf in Counter(tokenize(q)).items():
                tid = ti._vocab.get(term)
                if tid is not None:
                    ti._term_blocks[tid]

    out["bm25_hostprep_ms"] = timed(bm25_prep)

    # ---- fuse + readback ----------------------------------------------------
    v_vals, v_idx, _e, _s, _t = col._search_device(
        qvecs, fetch, mask_pad, None, None
    )
    txt = col.text_index.search_batch_dev(qtexts, fetch, used, mask=raw_mask)
    t_vals, t_idx = txt
    jax.block_until_ready((v_vals, v_idx, t_vals, t_idx))

    def fuse_stage(r):
        fv, fi = rrf_fuse_topk(
            v_vals, v_idx, t_vals, t_idx,
            jnp.float32(0.5 + 1e-6 * r), jnp.float32(0.5), None, k=k,
        )
        jax.device_get((fv, fi))

    out["fuse_readback_ms"] = timed(fuse_stage)

    # ---- hydrate -------------------------------------------------------------
    fv, fi = rrf_fuse_topk(
        v_vals, v_idx, t_vals, t_idx, jnp.float32(0.5), jnp.float32(0.5),
        None, k=k,
    )
    fvh, fih = jax.device_get((fv, fi))
    slot_ids, _ = col.vectors.occupancy()
    col._slot_ids = slot_ids

    def hydrate_stage(r):
        col._hydrate(np.asarray(fvh), np.asarray(fih), k)

    out["hydrate_ms"] = timed(hydrate_stage)

    # ---- occupancy/slot-id map (per call in the serve path) -----------------
    def occupancy_stage(r):
        col.vectors.occupancy()

    out["occupancy_ms"] = timed(occupancy_stage)

    stages = ["mask_ms", "vector_ms", "bm25_ms", "fuse_readback_ms",
              "hydrate_ms", "occupancy_ms"]
    out["sum_stages_ms"] = round(sum(out[s][0] for s in stages), 2)
    out["qps_b"] = round(b / (out["full_ms"][0] / 1e3))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
