"""System drive at 1M x 128D on real TPU: the INTEGRATED serving path —
host ingest -> device refresh -> IVF build + realistic calibration ->
planner-driven search at several batch sizes -> served recall vs oracle.

Round-3 result (v5e): ingest 190K vec/s, refresh 9s, calibrated IVF recall
0.962 (balanced), served recall@10 0.997, planner picks exact at every
batch size (measured fastest at 1M — IVF is the capacity engine).
Run: python benchmarks/system_1m.py"""
import os
import shutil
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/velesdb_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler

faulthandler.enable()
faulthandler.dump_traceback_later(420, repeat=True)

import numpy as np

from velesdb_tpu import Database

N, D = 1_000_000, 128
root = os.environ.get("SYS1M_DB", "/tmp/v1m_db")
shutil.rmtree(root, ignore_errors=True)

rng = np.random.default_rng(42)
centers = rng.standard_normal((64, D)).astype(np.float32) * 2.0
corpus = centers[rng.integers(0, 64, N)] + rng.standard_normal((N, D)).astype(
    np.float32
) * 0.7
queries = centers[rng.integers(0, 64, 256)] + rng.standard_normal(
    (256, D)
).astype(np.float32) * 0.7

db = Database(root)
c = db.create_collection("m", dim=D, metric="euclidean")
t0 = time.time()
step = 200_000
for i in range(0, N, step):
    c.upsert_bulk(range(i, i + step), corpus[i : i + step])
print(f"ingest {N/(time.time()-t0):,.0f} vec/s", flush=True)
t0 = time.time()
c.refresh_device()
print(f"device refresh {time.time()-t0:.1f}s", flush=True)

# lower the ANN auto-build threshold so the planner considers IVF at 1M
assert c.count() == N
t0 = time.time()
print("building ivf...", flush=True)
ok = c._ensure_ivf()
print(f"ivf build {time.time()-t0:.1f}s ok={ok} spill={c.ivf.spill} "
      f"nprobe(balanced)={c.ivf.nprobe_for(128)}", flush=True)
print("calibrated recall:", {e: c.planner.engine_recall(e) for e in ("ivf",)},
      flush=True)

for batch in (256, 16, 1):
    q = queries[:batch]
    c.search_batch(q, 10)  # warm/compile + EMA seed
    t0 = time.time()
    hits = c.search_batch(q, 10)
    dt = time.time() - t0
    # engine the planner actually chose for this batch size
    eng = c._choose_engine(batch)
    top1 = hits[0][0].id if hits[0] else None
    print(f"batch={batch}: engine={eng} wall={dt*1e3:.1f}ms top1={top1}",
          flush=True)

# recall of the served path at batch=256 vs exact oracle
from velesdb_tpu.ops.chunked import brute_force_topk
from velesdb_tpu.ops import DistanceMetric

_, gt = brute_force_topk(queries, corpus, 10, DistanceMetric.EUCLIDEAN)
gt = np.asarray(gt)
served = c.search_batch(queries, 10)
slot_ids = {int(s): int(v) for s, v in enumerate(c._slot_ids)}
got = np.asarray([[h.id for h in row] + [-1] * (10 - len(row)) for row in served])
r = np.mean([len(set(got[i]) & set(gt[i])) / 10 for i in range(256)])
print(f"served recall@10 (batch=256) = {r:.4f}", flush=True)
db.close()
print("SYSTEM DRIVE DONE", flush=True)
