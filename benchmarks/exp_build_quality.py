"""Build-knob quality ladder: can cheaper kNN knobs keep serve recall?

The 1M auto knobs (build_nprobe=32, passes=2) were tuned in r3 when beam
recall was BUILD-limited ("0.73 true-10NN containment at nprobe=16"). r3c
then showed the serving limiter was ENTRY coverage, not the kNN: the SQ8
entry-IVF + exact rescore closed the gap at unchanged build knobs. If the
wide-entry serve path is also robust to a cheaper kNN graph, the build
cost scales ~linearly down with nprobe x passes — the main lever for the
1M-vectors/min north star (VERDICT r4 #1).

For each knob combo: build the 1M x 128D graph (warm-timed), then measure
the serve ladder (host-f32 eps-recall + identity at ef 16/32/64/128,
b=16 QPS via the scan protocol).

Run: python benchmarks/exp_build_quality.py
     BUILDQ_COMBOS="32x2,32x1,16x1,8x1" BUILDQ_N=1000000 ...
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/velesdb_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 10
B16 = 16
ITERS = 64


def main():
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp

    from velesdb_tpu.index.graph_index import GraphIndex, beam_search_impl
    from velesdb_tpu.index.params import GraphParams
    from velesdb_tpu.ops import DistanceMetric
    from velesdb_tpu.ops.pallas_kernels import use_pallas

    n = int(os.environ.get("BUILDQ_N", 1_000_000))
    d = int(os.environ.get("BUILDQ_D", 128))
    metric = DistanceMetric.parse(os.environ.get("BUILDQ_METRIC", "euclidean"))
    combos = [
        (int(c.split("x")[0]), int(c.split("x")[1]))
        for c in os.environ.get("BUILDQ_COMBOS", "32x2,32x1,16x1").split(",")
    ]

    @jax.jit
    def gen(seed):
        k1, k2, k3, k4, k5 = jax.random.split(jax.random.key(seed), 5)
        centers = jax.random.normal(k1, (64, d), jnp.float32) * 2.0
        assign = jax.random.randint(k2, (n,), 0, 64)
        corpus = centers[assign] + jax.random.normal(k3, (n, d)) * 0.7
        qa = jax.random.randint(k4, (512,), 0, 64)
        qs = centers[qa] + jax.random.normal(k5, (512, d)) * 0.7
        return corpus, qs

    corpus_dev, queries_dev = gen(0)
    if metric is DistanceMetric.COSINE:
        sq = jnp.sum(corpus_dev * corpus_dev, axis=1, keepdims=True)
        corpus_dev = corpus_dev * jax.lax.rsqrt(jnp.maximum(sq, 1e-30))
    jax.block_until_ready(corpus_dev)
    queries = np.asarray(queries_dev)
    host_stub = np.zeros((n, d), np.float32)
    valid = np.ones(n, bool)

    # host-f32 oracle (corpus readback once: 512MB at 1Mx128)
    print("[buildq] reading corpus back for the host oracle...", flush=True)
    corpus_host = np.asarray(corpus_dev[:n])
    q_host = np.asarray(queries[:128], np.float32)
    kth = np.empty(128, np.float64)
    gt_host = np.empty((128, K), np.int64)
    csq = np.sum(corpus_host.astype(np.float64) ** 2, axis=1)
    for i in range(128):
        if metric is DistanceMetric.EUCLIDEAN:
            s = csq - 2.0 * (corpus_host @ q_host[i]).astype(np.float64)
            top = np.argpartition(s, K - 1)[:K]
            kth[i] = np.sqrt(max(
                s[top].max() + float(q_host[i] @ q_host[i]), 0.0
            ))
        else:
            s = -(corpus_host @ q_host[i])
            top = np.argpartition(s, K - 1)[:K]
            kth[i] = s[top].max()
        gt_host[i] = top

    def ladder(gi, tag, build_s):
        _beam = functools.partial(
            jax.jit,
            static_argnames=(
                "k", "beam", "expansions", "degree", "entry_points",
                "metric", "entry_probes", "entry_mode", "expand_width",
            ),
        )(beam_search_impl)
        eiv = gi._entry_ivf
        kernel_entry = eiv is not None and use_pallas()
        router = (
            (gi._route_cents, gi._route_csq, gi._route_rows)
            if gi._route_cents is not None else None
        )
        estate = None
        emode = "legacy"
        probes = gi.params.entry_probes
        if kernel_entry:
            e_aux, e_frows = eiv._kernel_state()
            estate = (eiv._centroids, eiv._cent_sq, eiv._parts, e_aux, e_frows)
            emode = "kernel"
            probes = min(gi.params.entry_probes, eiv.c)
        n_router = 3 if router is not None else 0

        def mk_fn(ef):
            beam, expansions = gi.params.beam_for_ef(ef, K)

            def fn(q, corp, adj, sn, vd, seeds, *rest):
                rt = tuple(rest[:n_router]) if router is not None else None
                es = tuple(rest[n_router:]) if emode == "kernel" else None
                return _beam(
                    q, corp, adj, sn, vd, seeds, None, None, rt, es,
                    k=K, beam=beam, expansions=expansions,
                    degree=gi._adj.shape[1],
                    entry_points=min(gi.params.entry_points, beam),
                    metric=metric, entry_probes=probes, entry_mode=emode,
                    expand_width=gi.params.expand_width,
                )

            return fn

        arrays = (gi._corpus, gi._adj, gi._sqnorm, gi._valid, gi._seed_ids) \
            + (router if router is not None else ()) \
            + (estate if emode == "kernel" else ())
        out = []
        for ef in (16, 32, 64, 128):
            fn = mk_fn(ef)
            _, idx = fn(jnp.asarray(q_host), *arrays)
            idx = np.asarray(idx)
            rid = float(np.mean(
                [len(set(idx[i]) & set(gt_host[i])) / K for i in range(128)]
            ))
            eps_hits = 0
            for i in range(128):
                ids = idx[i][idx[i] >= 0]
                if not len(ids):
                    continue
                if metric is DistanceMetric.EUCLIDEAN:
                    s = np.linalg.norm(
                        corpus_host[ids] - q_host[i][None, :], axis=1
                    )
                    eps_hits += int(np.sum(s <= kth[i] * 1.001 + 1e-9))
                else:
                    s = -(corpus_host[ids] @ q_host[i])
                    eps_hits += int(
                        np.sum(s <= kth[i] + 1e-3 * abs(kth[i]) + 1e-9)
                    )
            reps = eps_hits / (128.0 * K)
            # b=16 QPS, scan protocol
            big = np.resize(queries, (ITERS * B16, d)) + np.random.default_rng(
                9
            ).standard_normal((ITERS * B16, d)).astype(np.float32) * 0.01
            qs = jnp.asarray(big.reshape(ITERS, B16, d))

            @jax.jit
            def run_many(qs, *ops):
                def body(_, q):
                    v, i = fn(q, *ops)
                    return None, (v[0, 0], i[0, 0])

                _, outs = jax.lax.scan(body, None, qs)
                return outs

            jax.block_until_ready(run_many(qs, *arrays))
            samples = []
            for s_ in range(3):
                qs_s = jax.block_until_ready(jnp.roll(qs, 1 + 7 * s_, axis=0))
                t0 = time.perf_counter()
                outs = run_many(qs_s, *arrays)
                np.asarray(outs[0])
                samples.append(time.perf_counter() - t0)
            qps = ITERS * B16 / float(np.min(samples))
            row = {"combo": tag, "build_s": round(build_s, 1),
                   "vec_per_s": round(n / build_s), "ef": ef,
                   "recall_host": round(rid, 4), "recall_eps": round(reps, 4),
                   "qps_b16": round(qps)}
            out.append(row)
            print(row, flush=True)
        return out

    all_rows = []
    for nprobe, passes in combos:
        tag = f"np{nprobe}x{passes}"
        params = dataclasses.replace(
            GraphParams.auto(d, n), build_nprobe=nprobe, build_passes=passes
        )
        # cold (compile) + warm timed
        print(f"[buildq] {tag}: cold build...", flush=True)
        g0 = GraphIndex(d, metric, params)
        t0 = time.perf_counter()
        g0.build(host_stub, valid, corpus_dev=corpus_dev)
        cold = time.perf_counter() - t0
        print(f"[buildq] {tag}: cold {cold:.1f}s; warm build...", flush=True)
        gi = GraphIndex(d, metric, params)
        prof = {}
        t0 = time.perf_counter()
        gi.build(host_stub, valid, corpus_dev=corpus_dev, profile=prof)
        warm = time.perf_counter() - t0
        print(f"[buildq] {tag}: warm {warm:.1f}s "
              f"({n/warm:,.0f} vec/s) stages="
              f"{ {k: round(v,1) for k,v in prof.items()} }", flush=True)
        all_rows.extend(ladder(gi, tag, warm))
        del g0, gi
    print(json.dumps({"n": n, "d": d, "rows": all_rows}))


if __name__ == "__main__":
    main()
