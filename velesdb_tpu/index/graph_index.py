"""Graph ANN index: batched beam search over padded adjacency arrays.

The TPU re-architecture of the reference's native HNSW
(``index/hnsw/native/graph.rs``): instead of pointer-chasing one node at a time
with SIMD distance calls (``search_layer``, ``graph.rs:438``), the graph is a
flat ``[N_pad, degree] int32`` adjacency table and search is a *batched beam
search*: every iteration expands the best unvisited candidate of each query in
the batch simultaneously — one gather of ``[B, degree]`` neighbor rows, one
gather of their vectors, one batched matmul for distances, one sort-merge into
the per-query candidate pool. All shapes are static, the whole search is a
single jitted program, and B queries amortize every HBM access (SURVEY.md §7).

Build (CAGRA-style, replaces HNSW's sequential inserts ``graph.rs:158``):

1. exact kNN graph via chunked brute force on the MXU (``ops/chunked.py``)
2. VAMANA alpha-diversification prune of forward edges (``select_neighbors``
   analog, ``graph.rs:526``)
3. reverse-edge augmentation up to the degree cap (``add_bidirectional_
   connection`` analog, ``graph.rs:592``) — vectorized host-side scatter

There are no layers: with batched expansion the hierarchy buys little (the
beam converges in O(diameter) hops and entry points are strided seeds), which
removes HNSW's random-level machinery entirely.

Supported metrics: cosine / euclidean / dot (graph ANN over Hamming/Jaccard
falls back to exact binary search in the collection layer).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from velesdb_tpu.index.params import GraphParams, SearchQuality
from velesdb_tpu.ops.chunked import self_knn
from velesdb_tpu.ops.distance import DistanceMetric

__all__ = ["GraphIndex", "beam_search_impl"]

_INF = jnp.float32(jnp.inf)
EXPAND_WIDTH = 4  # candidates expanded per beam iteration (CAGRA-style)

# sticky kill-switch for the ENTRY probe kernel only (scoped per ADVICE r2:
# a Mosaic failure must not disable the XLA entry scan or the beam itself)
_ENTRY_KERNEL_OK = [True]

# per-dispatch budget for the legacy entry row gather ([B, probes*L, D] f32);
# search() chunks query batches so one dispatch never exceeds it
_ENTRY_GATHER_BUDGET = 1 << 30


def _pad_pow2(n: int, minimum: int = 8) -> int:
    return 1 << (max(n, minimum) - 1).bit_length()


class GraphIndex:
    """Beam-search ANN over a device-resident padded adjacency table."""

    def __init__(self, dim: int, metric: DistanceMetric, params: GraphParams | None = None):
        self.dim = dim
        self.metric = DistanceMetric.parse(metric)
        if self.metric not in (
            DistanceMetric.COSINE,
            DistanceMetric.EUCLIDEAN,
            DistanceMetric.DOT_PRODUCT,
        ):
            raise ValueError(f"graph index does not support metric {self.metric}")
        self.params = params or GraphParams()
        self.n = 0  # valid rows (build-time high-water mark)
        self.n_pad = 0
        self._corpus = None  # [N_pad, D] f32 device
        self._adj = None  # [N_pad, degree] int32 device, -1 = empty
        self._sqnorm = None  # [N_pad] f32 squared norms (euclidean/cosine)
        self._valid = None  # [N_pad] bool
        self._seed_ids = None  # [S] int32 routing sample
        self._adj_host = None  # [N, degree] int32 host copy (save path)
        self._sq8trav = None  # SQ8Vectors shadow (quantized traversal)
        # IVF router from the approx build's first pass (free): beam entry
        # points come from the query's top partitions instead of a global
        # strided sample — measured +0.01-0.02 recall at 1M, equal QPS
        self._route_cents = None  # [P, D] f32
        self._route_csq = None  # [P] f32
        self._route_rows = None  # [P, L] int32
        self._route_host = None  # host copies (save path, no D2H)
        # SQ8 entry-IVF (r3c): quantized upper layer serving the wide
        # entry scan — kernel-probed at small batch, XLA-scanned otherwise
        self._entry_ivf = None
        self._dirty = True

    # ------------------------------------------------------------------
    # build
    # ------------------------------------------------------------------

    # Above this row count the exact O(N^2 D) self-kNN build switches to the
    # IVF-bucketed approximate build (O(N * nprobe * L * D)) — the reference
    # keeps HNSW construction sub-quadratic by greedy insertion
    # (native/graph.rs:158); we keep it sub-quadratic by partition probing.
    EXACT_KNN_MAX_ROWS = 65_536

    def build(self, corpus: np.ndarray, valid: np.ndarray,
              corpus_dev=None, profile: dict | None = None) -> None:
        """Full (re)build from the host slot array. Throughput-oriented: the
        kNN stage is pure MXU work (chunked exact below
        ``EXACT_KNN_MAX_ROWS``, IVF-bucketed approximate above), the graph
        assembly is vectorized NumPy.

        ``corpus_dev`` (optional ``[>=n, D]`` device array, e.g. the
        collection's resident search corpus) skips every host->device corpus
        transfer in the build — three 307MB uploads at 100K x 768D, the
        dominant warm-build cost on remote-attached TPUs. For cosine it may
        be pre-normalized (cosine scoring is normalization-invariant).

        ``profile`` (optional dict) receives per-stage wall seconds
        (knn/prune/assemble/upload) — the build-throughput tuning loop's
        instrument (benchmarks/exp_build_profile.py).
        """
        import time as _time

        def _mark(stage, t0):
            if profile is not None:
                profile[stage] = profile.get(stage, 0.0) + _time.perf_counter() - t0
            return _time.perf_counter()

        t = _time.perf_counter()
        n = corpus.shape[0]
        p = self.params
        self.n = n
        if n == 0:
            self.n_pad = 0
            self._dirty = False
            return
        dev = None
        if corpus_dev is not None:
            if (
                isinstance(corpus_dev, jax.Array)
                and corpus_dev.shape[0] == n
                and corpus_dev.dtype == jnp.float32
            ):
                # alias, don't copy: the eager [:n] full slice materializes
                # a second full corpus on device — at 10M x 128D that is
                # +5.1GB before the build's own partition copy, which OOMed
                # the 16GB chip (r3d)
                dev = corpus_dev
            else:
                dev = jnp.asarray(corpus_dev)[:n].astype(jnp.float32)
        knn_k = min(p.knn_k, max(1, int(valid.sum()) - 1))
        router = None
        # 1. kNN graph (self-edges excluded) — ONE device program
        if n <= self.EXACT_KNN_MAX_ROWS:
            knn_idx = self_knn(
                corpus if dev is None else dev, knn_k, self.metric, valid=valid
            )
        else:
            from velesdb_tpu.index.ivf import ivf_self_knn

            from velesdb_tpu.index.ivf import nn_descent_round

            src = corpus if dev is None else dev
            # IvfIndex caps partitions at 8192 (serving economics), which
            # makes partition length L grow linearly past ~2M rows — at 8M
            # the [L, nprobe*L] neighborhood blocks crashed the compile
            # helper (r3d). The BUILD kNN wants bounded L instead: scale
            # the partition count so L stays ~256 at any N.
            build_c = n // 256 if n // 256 > 8192 else None
            # fully device-resident post-kNN pipeline (merge -> prune ->
            # assembly) when no NN-descent refinement is requested: the
            # [n, knn_k] readback + re-upload + host scatter were ~half the
            # 1M x 128D build (r4 profile)
            on_device = p.refine_rounds == 0 and dev is not None
            knn_idx, router = ivf_self_knn(
                src, knn_k, self.metric,
                valid=valid, nprobe=p.build_nprobe, passes=p.build_passes,
                n_clusters=build_c,
                return_router=True, profile=profile,
                return_device=on_device,
            )
            for _ in range(p.refine_rounds):
                knn_idx = nn_descent_round(src, knn_idx, self.metric, valid=valid)
        t = _mark("knn", t)
        if isinstance(knn_idx, jax.Array):
            # 2+3 on device: alpha prune, then reverse-edge assembly as one
            # jitted program; the adjacency never exists on the host until
            # save() asks for it
            fwd_dev = self._alpha_prune_dev(knn_idx, dev)
            if profile is not None:
                fwd_dev = jax.block_until_ready(fwd_dev)
            t = _mark("prune", t)
            adj = _assemble_adjacency_dev(fwd_dev, n=n, degree=p.degree)
            if profile is not None:
                adj = jax.block_until_ready(adj)
            t = _mark("assemble", t)
        else:
            # distance-ordered forward candidates
            fwd = knn_idx.astype(np.int32)  # [n, knn_k], -1 where few valid
            # 2. alpha-diversification prune (device, blockwise)
            fwd = self._alpha_prune_host(corpus, fwd, dev)
            t = _mark("prune", t)
            # 3. reverse-edge augmentation + final adjacency
            adj = _assemble_adjacency(fwd, n, p.degree)
            t = _mark("assemble", t)
        self._upload(corpus, valid, adj, dev, router=router, profile=profile)
        _mark("upload", t)
        self._dirty = False

    def _alpha_prune_dev(self, fwd, dev):
        """VAMANA prune on a device-resident ``[n, k]`` kNN — same scan
        program as :meth:`_alpha_prune_host` but zero host round trips.
        Returns the pruned fwd padded to the scan's block multiple (pad
        rows all -1; the device assembly masks them)."""
        if self.params.alpha <= 1.0:
            return fwd
        n, k = fwd.shape
        block = 2048
        n_pad = ((n + block - 1) // block) * block
        corpus_dev = jnp.pad(dev, ((0, n_pad - n), (0, 0)))
        fwd_dev = jnp.pad(
            fwd, ((0, n_pad - n), (0, 0)), constant_values=-1
        )
        keep = _alpha_prune_scan(
            corpus_dev, fwd_dev, self.metric, self.params.alpha, block
        )
        return jnp.where(keep, fwd_dev, jnp.int32(-1))

    def _alpha_prune_host(self, corpus: np.ndarray, fwd: np.ndarray,
                          dev=None) -> np.ndarray:
        """VAMANA prune (keeps diverse neighbors): ONE device program
        scanning node blocks, one readback."""
        if self.params.alpha <= 1.0:
            return fwd
        n, k = fwd.shape
        block = 2048
        n_pad = ((n + block - 1) // block) * block
        if dev is not None:
            corpus_dev = jnp.pad(dev, ((0, n_pad - n), (0, 0)))
        else:
            corpus_dev = jax.device_put(
                jnp.asarray(np.pad(corpus, ((0, n_pad - n), (0, 0))))
            )
        fwd_dev = jax.device_put(
            jnp.asarray(np.pad(fwd, ((0, n_pad - n), (0, 0)), constant_values=-1))
        )
        keep = np.asarray(
            _alpha_prune_scan(
                corpus_dev, fwd_dev, self.metric, self.params.alpha, block
            )
        )[:n]
        return np.where(keep, fwd, -1)

    def _upload(self, corpus, valid, adj, dev=None, router=None,
                entry_ivf_path=None, profile: dict | None = None) -> None:
        import time as _time

        def _mark(stage, t0, sync=None):
            if profile is not None:
                if sync is not None:
                    jax.block_until_ready(sync)
                profile[stage] = (
                    profile.get(stage, 0.0) + _time.perf_counter() - t0
                )
            return _time.perf_counter()

        _t = _time.perf_counter()
        n = corpus.shape[0]
        if isinstance(adj, jax.Array):
            # device-assembled adjacency (r4): the host copy is deferred to
            # save() entirely (_host_adj) — see the staging note at the end
            # of this method
            self._adj_host = None
        else:
            # host-assembled: keep the host copy (save() then never reads
            # hundreds of MB back through the tunnel — large D2H transfers
            # are its wedge-prone operation)
            self._adj_host = np.asarray(adj, np.int32)[:n]
        # multiple-of-1024 padding, NOT pow2: pow2 padding wastes up to 2x
        # corpus HBM just past a power of two (at 8M x 128D it also forced
        # a 388K-row padded COPY next to the caller's aliased upload, r3d);
        # nothing in the beam/entry path needs a pow2 row count
        self.n_pad = ((n + 1023) // 1024) * 1024
        pad = self.n_pad - n
        cap_mode = (
            self.params.quantized_traversal and not self.params.traversal_rerank
        )
        if dev is not None:
            # pad==0: alias the caller's array — jnp.pad copies even for
            # zero pad, and a second full corpus next to the caller's
            # reference OOMs large builds (8M x 128D, r3d)
            self._corpus = dev if pad == 0 else jnp.pad(dev, ((0, pad), (0, 0)))
        elif cap_mode:
            # capacity mode with no resident device corpus (load path):
            # never materialize f32 on device — at 10M x 128D the transient
            # alone is 5.1GB next to the adjacency + SQ8 arrays (r3e)
            self._corpus = None
        else:
            corpus_p = np.pad(np.asarray(corpus, np.float32), ((0, pad), (0, 0)))
            self._corpus = jax.device_put(jnp.asarray(corpus_p))
        valid_p = np.pad(np.asarray(valid, bool), (0, pad))
        if isinstance(adj, jax.Array):
            m = adj.shape[0]
            if m < self.n_pad:
                adj = jnp.pad(
                    adj, ((0, self.n_pad - m), (0, 0)), constant_values=-1
                )
            elif m > self.n_pad:
                adj = adj[: self.n_pad]
            self._adj = adj
        else:
            adj_p = np.pad(adj, ((0, pad), (0, 0)), constant_values=-1)
            self._adj = jax.device_put(jnp.asarray(adj_p))
        self._valid = jax.device_put(jnp.asarray(valid_p))
        if self._corpus is not None:
            self._sqnorm = jnp.sum(self._corpus * self._corpus, axis=-1)
        else:
            c32 = np.asarray(corpus, np.float32)
            sn = np.zeros(self.n_pad, np.float32)
            sn[:n] = np.einsum("nd,nd->n", c32, c32)
            self._sqnorm = jax.device_put(jnp.asarray(sn))
        _t = _mark("upload.corpus", _t, self._sqnorm)
        # dual-precision shadow copy: SQ8 codes for beam gathers (1/4 HBM
        # bytes per step); the f32 corpus is retained for the final rerank
        self._sq8trav = None
        if self.params.quantized_traversal:
            from velesdb_tpu.ops.quantization import SQ8Vectors, sq8_quantize

            if self._corpus is not None:
                self._sq8trav = jax.device_put(sq8_quantize(self._corpus))
            else:
                # host-side chunked quantize (same affine as sq8_quantize:
                # per-row min/max, round-half-even codes); uploads 1B/dim
                # instead of 4B/dim through the tunnel
                d = corpus.shape[1]
                codes = np.zeros((self.n_pad, d), np.uint8)
                scale = np.ones(self.n_pad, np.float32)
                minv = np.zeros(self.n_pad, np.float32)
                c32 = np.asarray(corpus, np.float32)
                step = 1 << 20
                for s in range(0, n, step):
                    blk = c32[s : s + step]
                    mn, mx = blk.min(axis=1), blk.max(axis=1)
                    sc = np.where(mx > mn, (mx - mn) / 255.0, 1.0)
                    codes[s : s + len(blk)] = np.clip(
                        np.round((blk - mn[:, None]) / sc[:, None]), 0, 255
                    ).astype(np.uint8)
                    scale[s : s + len(blk)] = sc
                    minv[s : s + len(blk)] = mn
                self._sq8trav = SQ8Vectors(
                    codes=jax.device_put(jnp.asarray(codes)),
                    scale=jax.device_put(jnp.asarray(scale)),
                    minv=jax.device_put(jnp.asarray(minv)),
                )
            if cap_mode:
                # capacity mode: codes+affine only resident (true 4x);
                # final head-rerank is skipped
                self._corpus = None
        _t = _mark("upload.quantize", _t)
        # SQ8 entry-IVF (r3c): when the wide entry scan is on, the entry
        # stage probes a quantized IVF over the corpus instead of f32-row
        # gathering entry_probes * L rows (see beam_search_impl stage 1).
        # ~0.27x corpus bytes; kmeans reuses the device corpus (one-time).
        self._entry_ivf = None
        if self.params.entry_probes >= 8 and n >= 4096:
            from velesdb_tpu.index.ivf import IvfIndex
            from velesdb_tpu.ops.quantization import sq8_quantize

            sq8src = self._sq8trav
            if sq8src is None:
                sq8src = sq8_quantize(
                    self._corpus
                    if self._corpus is not None
                    else jax.device_put(
                        jnp.asarray(
                            np.pad(
                                np.asarray(corpus, np.float32),
                                ((0, pad), (0, 0)),
                            )
                        )
                    )
                )
            eiv = IvfIndex(self.dim, self.metric)
            loaded = False
            if entry_ivf_path is not None:
                try:  # recipe reload skips the kmeans (assembly-only)
                    loaded = eiv.load(entry_ivf_path, sq8src, valid_p)
                except Exception:
                    loaded = False
            if not loaded:
                if router is not None:
                    # the approx build's router IS a kmeans clustering of
                    # this corpus: seed the entry IVF from its centroids —
                    # assembly-only (the kmeans re-run tripled warm builds).
                    # Uncapped large builds carry 30K+ router centroids
                    # (r3d); the entry scan only probes entry_probes of
                    # them, so subsample to the serving cap — fewer, larger
                    # partitions scan DMA-efficiently and the aux tables
                    # stay bounded.
                    cents_e = router[0]
                    if cents_e.shape[0] > 8192:
                        stride = np.linspace(
                            0, cents_e.shape[0] - 1, 8192
                        ).astype(np.int64)
                        cents_e = cents_e[stride]
                    eprof: dict | None = {} if profile is not None else None
                    eiv.build_from_centroids(sq8src, valid_p, cents_e,
                                             profile=eprof)
                else:
                    eprof = {} if profile is not None else None
                    eiv.build(sq8src, valid_p, profile=eprof)
                if profile is not None and eprof:
                    for _k, _v in eprof.items():
                        profile["entry." + _k] = (
                            profile.get("entry." + _k, 0.0) + _v
                        )
            if eiv._parts is not None:
                self._entry_ivf = eiv
        _t = _mark("upload.entry", _t)
        if router is not None:
            cents, rows = router
            # both arrive as host arrays (build readback / load file): keep
            # host copies so save() never reads them back through the tunnel
            self._route_host = (
                np.asarray(cents, np.float32),
                np.asarray(rows, np.int32),
            )
            self._route_cents = jax.device_put(jnp.asarray(cents, jnp.float32))
            self._route_csq = jnp.sum(
                self._route_cents * self._route_cents, axis=1
            )
            self._route_rows = jax.device_put(jnp.asarray(rows, jnp.int32))
        else:
            self._route_cents = self._route_csq = self._route_rows = None
            self._route_host = None
        # routing sample: strided over valid rows, padded by repetition
        # (fallback entry stage when no IVF router exists — small corpora)
        s = min(self.params.seed_sample, max(1, n))
        valid_rows = np.flatnonzero(valid_p[:n])
        if len(valid_rows) == 0:
            valid_rows = np.array([0])
        pick = valid_rows[
            np.linspace(0, len(valid_rows) - 1, s).astype(np.int64)
        ].astype(np.int32)
        self._seed_ids = jax.device_put(jnp.asarray(pick))
        _mark("upload.router_seeds", _t, self._seed_ids)
        # NOTE deliberately NOT staging the adjacency host copy here: the
        # ~256MB D2H through the shared tunnel drains into whatever runs
        # next — it cost ~30s of the warm 1M x 128D build when issued at
        # assignment time, and still polluted the FOLLOWING build/search
        # dispatches when issued here (r4 profile, rep-to-rep kmeans
        # skew). save() pays the one-time readback at the explicit
        # persistence point instead (_host_adj).

    def invalidate(self, _ids=None) -> None:
        self._dirty = True

    @property
    def dirty(self) -> bool:
        return self._dirty

    # ------------------------------------------------------------------
    # search
    # ------------------------------------------------------------------

    def _dispatch_cap(self) -> int:
        """Largest per-dispatch query batch the entry stage can serve.

        Wide-entry searches materialize per-query candidate tables — a
        ``[b_pad, probes]`` i32 SMEM prefetch in the probe kernel, a
        ``[B, probes*L, D]`` f32 row gather on the legacy path. Verified
        on-chip (r3e): a 4096-query dispatch at probes=64 is a 2MB SMEM
        reject (kernel) or a 69.8GB HBM allocation (legacy gather at
        L=520). :meth:`search` stitches larger batches into chunks of
        this size.
        """
        eiv = self._entry_ivf
        if eiv is not None and self.params.restarts == 1:
            from velesdb_tpu.ops.ivf_kernel import (
                MAX_KERNEL_BATCH,
                MIN_BLOCK_BYTES,
                SMEM_PROBE_BYTES,
            )
            from velesdb_tpu.ops.pallas_kernels import use_pallas

            if (
                _ENTRY_KERNEL_OK[0]
                and use_pallas()
                and eiv.part_len * self.dim >= MIN_BLOCK_BYTES
            ):
                ep = max(1, min(self.params.entry_probes,
                                eiv.c_real or eiv.c))
                cap = SMEM_PROBE_BYTES // (4 * ep)
                return 1 << max(5, cap.bit_length() - 1)  # pow2 floor
            # no kernel: chunks of <= MAX_KERNEL_BATCH keep the XLA SQ8
            # partition scan serving (the wide-probe f32 gather it
            # replaces needs probes * L * D * 4 bytes PER QUERY)
            return MAX_KERNEL_BATCH
        if self._route_rows is not None:
            ep = max(1, self.params.entry_probes) * max(1, self.params.restarts)
            rows = ep * self._route_rows.shape[1]
            cap = _ENTRY_GATHER_BUDGET // max(1, rows * self.dim * 4)
            return 1 << max(5, cap.bit_length() - 1)
        return 8192  # dense seed entry: no per-query materialization

    def search(
        self,
        queries: np.ndarray,
        k: int,
        ef: int | None = None,
        quality: SearchQuality | None = None,
        mask=None,
    ):
        """Batched ANN search. Returns ``(values [B, k], slot_indices [B, k])``
        with scores in the metric's native orientation.

        ``mask`` (optional ``[N_pad] bool``) applies *result filtering* during
        final selection; traversal still routes through filtered nodes so the
        graph stays connected (filtered-ANN standard practice).
        """
        if quality is not None:
            ef = SearchQuality.parse(quality).ef
        ef = ef or 128
        q_arr = np.atleast_2d(np.asarray(queries, np.float32))
        cap = self._dispatch_cap()
        if q_arr.shape[0] > cap:
            # stitch fixed-size sub-dispatches: full chunks share ONE
            # compile; results concatenate on device
            outs = [
                self.search(q_arr[s : s + cap], k, ef=ef, mask=mask)
                for s in range(0, q_arr.shape[0], cap)
            ]
            return (
                jnp.concatenate([o[0] for o in outs], axis=0),
                jnp.concatenate([o[1] for o in outs], axis=0),
            )
        queries = q_arr
        beam, expansions = self.params.beam_for_ef(ef, k)
        restarts = max(1, self.params.restarts)
        if restarts > 1:
            # iso-budget split: R independent sub-beams share the ef budget
            beam = max(32, ((beam // restarts + 7) // 8) * 8)
            expansions = max(32, ((expansions // restarts + 7) // 8) * 8)
        q = np.atleast_2d(np.asarray(queries, np.float32))
        b = q.shape[0]
        b_pad = _pad_pow2(b)
        qp = jnp.asarray(np.pad(q, ((0, b_pad - b), (0, 0))))
        quant = getattr(self, "_sq8trav", None)

        # entry-stage mode (r3c): quantized entry-IVF when built — Pallas
        # probe kernel at small batch, XLA SQ8 partition scan otherwise;
        # legacy f32 candidate gather only without an entry IVF or with
        # multi-restart banding (restart entries need partition ranks).
        entry_mode, entry_state, ep_eff = "legacy", None, self.params.entry_probes
        eiv = self._entry_ivf
        if eiv is not None and restarts == 1:
            from velesdb_tpu.ops.ivf_kernel import (
                MAX_KERNEL_BATCH,
                MIN_BLOCK_BYTES as _ENTRY_MIN_BLOCK,
                probe_table_fits,
            )
            from velesdb_tpu.ops.pallas_kernels import use_pallas

            ep_eff = min(self.params.entry_probes, eiv.c_real or eiv.c)
            # measured (1M x 128D, probes=64/entries=96, ef=128, b=16 /
            # b=256 QPS): kernel 2.26K / 2.52K · xla 1.67K / 0.50K ·
            # legacy f32 gather 0.72K / 0.57K (2.42K / 2.49K at the old
            # narrow probes=2, recall 0.9145 vs 0.9555) — the probe kernel
            # wins at EVERY batch size, so it serves unconditionally when
            # it lowers; the XLA SQ8 scan only beats the gather at small
            # batch (its per-probe slice loop re-gathers per query row)
            if (
                _ENTRY_KERNEL_OK[0]
                and use_pallas()
                and mask is None  # masked entries need the XLA scan's
                # mask-aware probe pruning + masked top-E (the Pallas
                # probe kernel has no mask operand)
                and eiv.part_len * self.dim >= _ENTRY_MIN_BLOCK
                and probe_table_fits(b_pad, ep_eff)
            ):
                e_aux, e_frows = eiv._kernel_state()
                entry_state = (
                    eiv._centroids, eiv._cent_sq, eiv._parts, e_aux, e_frows
                )
                entry_mode = "kernel"
            elif b_pad <= MAX_KERNEL_BATCH or mask is not None:
                # masked searches take the XLA scan at EVERY batch size:
                # its mask-aware seeding dominates any per-probe slice-loop
                # slowdown (unmasked entries on a correlated filter start
                # the beam where no expansion can pass the result filter)
                entry_state = (
                    eiv._centroids, eiv._cent_sq,
                    (eiv._parts, eiv._part_scale, eiv._part_minv),
                    eiv._part_rows, eiv._part_sq,
                )
                entry_mode = "xla"
            # else: legacy f32 gather (no kernel + large batch)

        def run(mode, state, probes):
            return _beam_search(
                qp,
                quant if quant is not None else self._corpus,
                self._adj,
                self._sqnorm,
                self._valid,
                self._seed_ids,
                mask,
                self._corpus if quant is not None else None,
                (
                    (self._route_cents, self._route_csq, self._route_rows)
                    if self._route_cents is not None
                    else None
                ),
                state,
                k=min(k, beam),
                beam=beam,
                expansions=expansions,
                degree=self._adj.shape[1],
                entry_points=min(self.params.entry_points, beam),
                metric=self.metric,
                restarts=restarts,
                entry_probes=probes,
                entry_mode=mode,
                expand_width=self.params.expand_width,
            )

        try:
            vals, idx = run(entry_mode, entry_state, ep_eff)
        except Exception as e:
            if entry_mode != "kernel":
                raise
            # Mosaic kill-switch scoped to the entry kernel only: fall back
            # to the XLA SQ8 entry scan, never to silent engine loss
            _ENTRY_KERNEL_OK[0] = False
            from velesdb_tpu.ops.demotions import record_demotion

            record_demotion("graph-entry-kernel", e)
            entry_state = (
                eiv._centroids, eiv._cent_sq,
                (eiv._parts, eiv._part_scale, eiv._part_minv),
                eiv._part_rows, eiv._part_sq,
            )
            vals, idx = run("xla", entry_state, ep_eff)
        return vals[:b], idx[:b]

    # ------------------------------------------------------------------
    # persistence (hnsw.bin dump/load analog, native_inner.rs:72,81)
    # ------------------------------------------------------------------

    def _host_adj(self) -> np.ndarray | None:
        """Host adjacency copy, materialized lazily (device-assembled builds
        defer the [n, degree] D2H until something actually persists)."""
        if self._adj_host is None and self._adj is not None:
            self._adj_host = np.asarray(self._adj)[: self.n].astype(
                np.int32, copy=False
            )
        return self._adj_host

    def save(self, path: str, version: int = 0) -> None:
        if self._adj is None:
            return
        extra = {}
        if self._route_host is not None:
            extra = {
                "route_cents": self._route_host[0],
                "route_rows": self._route_host[1],
            }
        np.savez_compressed(
            path,
            adj=self._host_adj(),
            degree=self.params.degree,
            knn_k=self.params.knn_k,
            alpha=self.params.alpha,
            entry_points=self.params.entry_points,
            metric=self.metric.value,
            n=self.n,
            version=version,
            **extra,
        )
        if self._entry_ivf is not None:
            # entry-IVF kmeans recipe (~2MB): load() re-assembles on device
            # without re-clustering
            self._entry_ivf.save(self._entry_path(path), version=version)
        elif os.path.exists(self._entry_path(path)):
            os.remove(self._entry_path(path))  # stale recipe from prior params

    @staticmethod
    def _entry_path(path: str) -> str:
        return path + ".entry.npz"

    def load(
        self, path: str, corpus: np.ndarray, valid: np.ndarray, version: int = 0
    ) -> bool:
        """Restore adjacency if it matches the current corpus size + version."""
        if not os.path.exists(path):
            return False
        data = np.load(path, allow_pickle=False)
        if (
            int(data["n"]) != corpus.shape[0]
            or str(data["metric"]) != self.metric.value
            or int(data["version"] if "version" in data else -1) != version
        ):
            return False
        self.params = GraphParams(
            degree=int(data["degree"]),
            knn_k=int(data["knn_k"]),
            alpha=float(data["alpha"]),
            # runtime knobs, not graph properties: keep the caller's settings
            # (entry_points/entry_probes size the ENTRY SCAN, not the graph)
            entry_points=self.params.entry_points,
            quantized_traversal=self.params.quantized_traversal,
            traversal_rerank=self.params.traversal_rerank,
            restarts=self.params.restarts,
            entry_probes=self.params.entry_probes,
            expand_width=self.params.expand_width,
        )
        self.n = corpus.shape[0]
        router = None
        if "route_cents" in data:
            router = (data["route_cents"], data["route_rows"])
        self._upload(corpus, valid, data["adj"], router=router,
                     entry_ivf_path=self._entry_path(path))
        self._dirty = False
        return True


# ----------------------------------------------------------------------
# kernels
# ----------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("metric", "alpha", "block"))
def _alpha_prune_scan(corpus_pad, fwd_pad, metric, alpha, block):
    """Scan the prune over node blocks in one program (one dispatch)."""
    nb = fwd_pad.shape[0] // block

    def body(_, i):
        base = jax.lax.dynamic_slice_in_dim(corpus_pad, i * block, block)
        blk = jax.lax.dynamic_slice_in_dim(fwd_pad, i * block, block)
        return None, _alpha_prune_block(base, blk, corpus_pad, metric, alpha)

    _, keeps = jax.lax.scan(body, None, jnp.arange(nb, dtype=jnp.int32))
    return keeps.reshape(fwd_pad.shape)


@functools.partial(jax.jit, static_argnames=("metric", "alpha"))
def _alpha_prune_block(base, cand_idx, corpus, metric, alpha):
    """VAMANA diversification for a block of nodes.

    ``base [Bn, D]`` nodes, ``cand_idx [Bn, K]`` distance-ordered candidates.
    Keep candidate j unless an already-kept candidate i (nearer to the node)
    satisfies ``alpha * d(c_i, c_j) <= d(node, c_j)`` (``graph.rs:526``).
    """
    cvecs = corpus[jnp.maximum(cand_idx, 0)]  # [Bn, K, D]
    node_d = _metric_dist(base[:, None, :], cvecs, metric)  # [Bn, K]
    # pairwise distances among candidates [Bn, K, K] as batched MXU
    # matmuls — the broadcast-subtract form materializes a [Bn, K, K, D]
    # elementwise intermediate (1GB/block at K=32, D=128) and runs on the
    # VPU; the dot form is ~500 MFLOP/block on the MXU (r4 build-rate work)
    if metric is DistanceMetric.EUCLIDEAN:
        csq = jnp.sum(cvecs * cvecs, axis=-1)  # [Bn, K]
        dots = jnp.einsum(
            "bkd,bld->bkl", cvecs, cvecs, preferred_element_type=jnp.float32
        )
        cc = csq[:, :, None] + csq[:, None, :] - 2.0 * dots
    elif metric is DistanceMetric.COSINE:
        cn = cvecs * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(cvecs * cvecs, axis=-1, keepdims=True), 1e-30)
        )
        cc = 1.0 - jnp.einsum(
            "bkd,bld->bkl", cn, cn, preferred_element_type=jnp.float32
        )
    else:
        cc = -jnp.einsum(
            "bkd,bld->bkl", cvecs, cvecs, preferred_element_type=jnp.float32
        )
    k = cand_idx.shape[1]
    invalid = cand_idx < 0

    def body(j, keep):
        # prune j if any kept i<j has alpha*d(i,j) <= d(node,j)
        before = jnp.arange(k) < j
        conflict = jnp.any(
            keep & before[None, :] & (alpha * cc[:, :, j] <= node_d[:, j][:, None]),
            axis=1,
        )
        keep_j = ~conflict & ~invalid[:, j]
        return keep.at[:, j].set(keep_j)

    keep0 = jnp.zeros(cand_idx.shape, bool).at[:, 0].set(~invalid[:, 0])
    return jax.lax.fori_loop(1, k, body, keep0)


def _metric_dist(a, b, metric):
    """Lower-is-better internal distance (broadcasting)."""
    if metric is DistanceMetric.EUCLIDEAN:
        return jnp.sum((a - b) ** 2, axis=-1)
    if metric is DistanceMetric.COSINE:
        an = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-30)
        bn = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-30)
        return 1.0 - jnp.sum(an * bn, axis=-1)
    return -jnp.sum(a * b, axis=-1)


def _assemble_adjacency(fwd: np.ndarray, n: int, degree: int) -> np.ndarray:
    """Forward edges + reverse-edge fill to ``degree`` (vectorized NumPy).

    Reverse edges make the graph navigable from any seed (the reference gets
    this from ``add_bidirectional_connection``, ``graph.rs:592``).
    """
    k = fwd.shape[1]
    adj = np.full((n, degree), -1, dtype=np.int32)
    width = min(k, degree)
    adj[:, :width] = fwd[:, :width]
    fill = (adj >= 0).sum(axis=1)

    # reverse edges grouped by destination
    src = np.repeat(np.arange(n, dtype=np.int32), k)
    dst = fwd.reshape(-1)
    ok = dst >= 0
    src, dst = src[ok], dst[ok]
    order = np.argsort(dst, kind="stable")
    dst_s, src_s = dst[order], src[order]
    group_start = np.searchsorted(dst_s, np.arange(n))
    pos = np.arange(len(dst_s)) - group_start[dst_s]
    slot = fill[dst_s] + pos
    sel = slot < degree
    adj[dst_s[sel], slot[sel]] = src_s[sel]

    # drop duplicate ids within each row (reverse edge already forward):
    # sort descending so -1 lands last, then blank adjacent repeats
    s = np.sort(adj, axis=1)[:, ::-1]
    dup = np.zeros_like(s, dtype=bool)
    dup[:, 1:] = (s[:, 1:] == s[:, :-1]) & (s[:, 1:] >= 0)
    s[dup] = -1
    s = np.sort(s, axis=1)[:, ::-1]

    # fill remaining empty slots with pseudo-random long-range edges: rows are
    # gathered at fixed width regardless, so these edges cost nothing at
    # search time and they de-island clustered kNN graphs (NSW-style links).
    # uint32 wrap-around hash — bit-identical to _assemble_adjacency_dev
    if n > 1:
        empty = s < 0
        rows, cols = np.nonzero(empty)
        rnd = (
            (
                rows.astype(np.uint32) * np.uint32(2654435761)
                + cols.astype(np.uint32) * np.uint32(40503)
                + np.uint32(12345)
            )
            % np.uint32(n)
        ).astype(np.int32)
        rnd = np.where(rnd == rows, (rnd + 1) % n, rnd)
        s[rows, cols] = rnd
    return s


@functools.partial(jax.jit, static_argnames=("n", "degree"))
def _assemble_adjacency_dev(fwd, *, n: int, degree: int):
    """Device analog of :func:`_assemble_adjacency` — the whole reverse-edge
    augmentation runs as ONE jitted program so the pruned kNN never round-trips
    through the host (at 1M x knn_k=32 the host scatter + the [n, degree]
    re-upload were ~50s of the build, r4 profile).

    ``fwd [n_rows, k] int32`` (-1 padded; rows >= ``n`` all -1) ->
    ``[n_rows, degree] int32`` adjacency, bit-identical to the host assembly.
    """
    n_rows, k = fwd.shape
    width = min(k, degree)
    adj = jnp.full((n_rows, degree), -1, jnp.int32)
    adj = adj.at[:, :width].set(fwd[:, :width])
    fill = jnp.sum(adj >= 0, axis=1).astype(jnp.int32)  # [n_rows]

    # reverse edges grouped by destination: stable sort by dst keeps the
    # host path's first-come slot order (src-major flat order)
    src = jnp.broadcast_to(
        jnp.arange(n_rows, dtype=jnp.int32)[:, None], (n_rows, k)
    ).reshape(-1)
    dst = fwd.reshape(-1)
    dst_key = jnp.where(dst >= 0, dst, n_rows)  # invalid edges sort to the end
    dst_s, src_s = jax.lax.sort((dst_key, src), num_keys=1, is_stable=True)
    group_start = jnp.searchsorted(
        dst_s, jnp.arange(n_rows, dtype=jnp.int32)
    ).astype(jnp.int32)
    dst_c = jnp.clip(dst_s, 0, n_rows - 1)
    pos = jnp.arange(dst_s.shape[0], dtype=jnp.int32) - group_start[dst_c]
    slot = fill[dst_c] + pos
    ok = (dst_s < n_rows) & (slot < degree)
    # (dst, slot) pairs are unique within the ok set; OOB rows drop
    adj = adj.at[
        jnp.where(ok, dst_s, n_rows), jnp.where(ok, slot, 0)
    ].set(src_s, mode="drop")

    # drop duplicate ids within each row (reverse edge already forward):
    # sort descending so -1 lands last, then blank adjacent repeats
    s = -jnp.sort(-adj, axis=1)
    dup = jnp.concatenate(
        [
            jnp.zeros((n_rows, 1), bool),
            (s[:, 1:] == s[:, :-1]) & (s[:, 1:] >= 0),
        ],
        axis=1,
    )
    s = jnp.where(dup, -1, s)
    s = -jnp.sort(-s, axis=1)

    if n > 1:
        rows_m = jnp.arange(n_rows, dtype=jnp.uint32)[:, None]
        cols_m = jnp.arange(degree, dtype=jnp.uint32)[None, :]
        rnd = (
            rows_m * jnp.uint32(2654435761)
            + cols_m * jnp.uint32(40503)
            + jnp.uint32(12345)
        ) % jnp.uint32(n)
        rnd = rnd.astype(jnp.int32)
        row_ids = jnp.arange(n_rows, dtype=jnp.int32)[:, None]
        rnd = jnp.where(rnd == row_ids, (rnd + 1) % n, rnd)
        s = jnp.where(s < 0, rnd, s)
    # pad rows (>= n) stay empty, matching the host path's -1 padding
    return jnp.where(jnp.arange(n_rows, dtype=jnp.int32)[:, None] < n, s, -1)


def beam_search_impl(
    queries,  # [B, D] f32
    corpus,  # [N_pad, D] f32 — or SQ8Vectors (quantized traversal)
    adj,  # [N_pad, degree] int32
    sqnorm,  # [N_pad] f32
    valid,  # [N_pad] bool
    seed_ids,  # [S] int32 routing sample
    mask,  # [N_pad] bool or None — result filter
    rerank_corpus=None,  # [N_pad, D] f32 — f32-rescore the final pool
    router=None,  # (cents [P,D], cent_sq [P], part_rows [P,L]) — IVF entry
    entry_state=None,  # SQ8 entry-IVF arrays (see entry_mode)
    *,
    k: int,
    beam: int,
    expansions: int,
    degree: int,
    entry_points: int,
    metric: DistanceMetric,
    restarts: int = 1,
    entry_probes: int = 2,
    entry_mode: str = "legacy",
    entry_interpret: bool = False,
    expand_width: int | None = None,
):
    """Batched best-first beam search (the ``search_layer`` hot loop of
    ``graph.rs:438`` re-phrased as fixed-shape tensor ops).

    Stage 1 — seed scan: exact scores against the ``[S]`` routing sample (one
    MXU matmul) pick per-query entry points (upper-layer descent analog).
    Stage 2 — beam: iterative expand/gather/score/merge at fixed shapes.

    Dual precision (``native/dual_precision.rs:33`` analog): with ``corpus``
    an :class:`SQ8Vectors`, every beam gather reads uint8 codes (1/4 the HBM
    bytes — the gather is the per-step cost) and scores via the rank-1 affine
    identity; ``rerank_corpus`` then rescores the final beam pool in f32
    before selection, recovering the quantization loss.

    Multi-restart (``restarts=R > 1``): each query runs R *independent*
    beams seeded from disjoint router partitions (or disjoint seed-rank
    bands), folded into the batch dimension so the hot loop is unchanged;
    results merge with cross-restart dedup at final selection. A single
    greedy beam converges to one basin — on big corpora ~10% of queries
    enter the wrong one and no amount of extra pool width fixes it
    (measured: ef 128->256 moved 1M x 128D recall only 0.887->0.936).
    Decorrelated restarts attack exactly that failure mode.

    Internal distances are lower-is-better: L2^2, ``1-cos``, ``-dot``.
    """
    from velesdb_tpu.ops.quantization import SQ8Vectors

    quant = isinstance(corpus, SQ8Vectors)
    b, d = queries.shape
    if metric is DistanceMetric.COSINE:
        qn = queries / jnp.maximum(
            jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-30
        )
    else:
        qn = queries
    R = max(1, restarts)
    b0 = b
    if R > 1:
        # fold restarts into the batch: row b*R + r is query b's restart r
        qn = jnp.repeat(qn, R, axis=0)
        b = b0 * R
    if quant:
        qsum = jnp.sum(qn, axis=-1, keepdims=True)  # [B, 1]
        qb = qn.astype(jnp.bfloat16)

    def gathered_dots(node_ids):
        """``q . deq(c)`` for each query's own gathered nodes [B, M]."""
        safe = jnp.maximum(node_ids, 0)
        if quant:
            cvecs = corpus.codes[safe].astype(jnp.bfloat16)  # ints <=255 exact
            cd = jnp.einsum(
                "bd,bmd->bm", qb, cvecs, preferred_element_type=jnp.float32
            )
            return cd * corpus.scale[safe] + qsum * corpus.minv[safe]
        vecs = corpus[safe]  # [B, M, D]
        # HIGHEST = true-f32 scores: beam steps are gather-latency-bound,
        # so the extra MXU emulation passes are free and the pool ordering
        # stops inheriting the ~3e-4 bf16-pass noise (r3b metrology)
        return jnp.einsum(
            "bd,bmd->bm", qn, vecs, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def q_dist(node_ids):
        """Distances from each query to its own gathered nodes [B, M]."""
        dots = gathered_dots(node_ids)
        if metric is DistanceMetric.EUCLIDEAN:
            qq = jnp.sum(qn * qn, axis=-1, keepdims=True)
            return qq + sqnorm[jnp.maximum(node_ids, 0)] - 2.0 * dots
        if metric is DistanceMetric.COSINE:
            cn = jnp.sqrt(jnp.maximum(sqnorm[jnp.maximum(node_ids, 0)], 1e-30))
            return 1.0 - dots / cn
        return -dots

    # ---- stage 1: entry points ----
    if entry_state is not None and entry_mode != "legacy":
        # SQ8 entry-IVF (upper-layer descent analog v3, r3c): the wide
        # routed entry scan that closed the 1M recall gap reads
        # entry_probes * L rows per query — as an f32 row gather that costs
        # ~2x graph QPS (XLA gathers run 2-8GB/s). Instead the entry scan
        # probes a quantized IVF over the same corpus: 1/4 the bytes, and
        # at small batch the scalar-prefetch Pallas kernel reads partitions
        # at DMA speed (ops/ivf_kernel.py). The coarse SQ8 top-E is
        # f32-rescored below before seeding the beam, so pool distances
        # stay exact (eps-recall of SQ8 coarse->exact rerank ~1.0, r3b).
        if entry_mode == "kernel":
            from velesdb_tpu.ops.ivf_kernel import ivf_probe_topk

            e_cents, e_csq, e_words, e_aux, e_frows = entry_state
            e = entry_points
            _, cand_ids = ivf_probe_topk(
                qn, e_cents, e_csq, e_words, e_aux, e_frows,
                k=e, nprobe=entry_probes, metric=metric,
                interpret=entry_interpret,
            )
        else:  # "xla": any batch size, SQ8 partition scan
            from velesdb_tpu.index.ivf import ivf_search_impl

            e_cents, e_csq, e_parts, e_prows, e_psq = entry_state
            e = entry_points
            # mask-aware seeding (r5): with a filter, the entry scan passes
            # the mask through — probe routing prunes to partitions that
            # CONTAIN masked rows and the coarse top-E returns the best
            # masked rows seen, so the beam STARTS at filtered-answer
            # candidates. On a correlated (cluster) filter the query's own
            # neighborhood holds zero masked rows and an unmasked entry
            # seeds the beam in a region where every expansion fails the
            # result filter (measured recall ~ selectivity).
            _, cand_ids = ivf_search_impl(
                qn, e_cents, e_csq, e_parts, e_prows, e_psq, mask,
                k=e, nprobe=entry_probes, metric=metric,
            )
        # exact rescore (coarse SQ8 scores only ranked the candidates):
        # the beam pool must carry the same distances q_dist produces
        init_ids = cand_ids  # [B, E] global rows, -1 empty
        cd = q_dist(init_ids)
        badc = (init_ids < 0) | ~valid[jnp.maximum(init_ids, 0)]
        init_d = jnp.where(badc, _INF, cd)
        init_ids = jnp.where(badc, -1, init_ids)
    elif router is not None:
        # IVF-routed entries (upper-layer descent analog v2): one [B, P]
        # routing matmul picks each query's top partitions; their rows score
        # exactly and the best become the beam seeds — entries start inside
        # the query's own neighborhood instead of a global strided sample
        cents, csq, rrows = router
        aff = jax.lax.dot_general(
            qn, cents, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if metric is DistanceMetric.EUCLIDEAN:
            aff = aff - 0.5 * csq[None, :]
        n_parts = cents.shape[0]
        ep = max(1, entry_probes)
        if R > 1:
            # disjoint partitions per restart: restart r enters from the
            # query's probes [ep*r, ep*r+ep) — each beam starts in a
            # different candidate basin
            nprobe_tot = min(ep * R, n_parts)
            _, pids_all = jax.lax.top_k(aff, nprobe_tot)  # [B*R, ep*R]
            r_idx = jnp.arange(b, dtype=jnp.int32) % R
            sel = jnp.minimum(
                ep * r_idx[:, None] + jnp.arange(ep, dtype=jnp.int32)[None, :],
                nprobe_tot - 1,
            )  # [B*R, ep]
            pids = jnp.take_along_axis(pids_all, sel, axis=1)
        else:
            _, pids = jax.lax.top_k(aff, min(ep, n_parts))
        cand = rrows[pids].reshape(b, -1)  # [B, 2L]
        cd = q_dist(cand)
        badc = (cand < 0) | ~valid[jnp.maximum(cand, 0)]
        cd = jnp.where(badc, _INF, cd)
        e = min(entry_points, cand.shape[1])
        neg_sd, pos = jax.lax.top_k(-cd, e)
        init_ids = jnp.take_along_axis(cand, pos, axis=1)
        init_d = -neg_sd
        eqe = init_ids[:, :, None] == init_ids[:, None, :]
        first = jnp.sum(jnp.tril(eqe, k=-1), axis=2) == 0
        init_d = jnp.where(first, init_d, _INF)
        init_ids = jnp.where(first, init_ids, -1)
    else:
        # dense seed scan fallback (no router: small/exact-built corpora)
        if quant:
            seed_vecs = (
                corpus.codes[seed_ids].astype(jnp.float32)
                * corpus.scale[seed_ids][:, None]
                + corpus.minv[seed_ids][:, None]
            )  # [S, D] dequantized (seed sample is small)
        else:
            seed_vecs = corpus[seed_ids]  # [S, D]
        seed_dots = jax.lax.dot_general(
            qn, seed_vecs, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B, S]
        if metric is DistanceMetric.EUCLIDEAN:
            seed_d = (
                jnp.sum(qn * qn, axis=-1, keepdims=True)
                + sqnorm[seed_ids][None, :]
                - 2.0 * seed_dots
            )
        elif metric is DistanceMetric.COSINE:
            seed_d = 1.0 - seed_dots / jnp.sqrt(
                jnp.maximum(sqnorm[seed_ids][None, :], 1e-30)
            )
        else:
            seed_d = -seed_dots
        seed_d = jnp.where(valid[seed_ids][None, :], seed_d, _INF)
        e = min(entry_points, max(1, seed_ids.shape[0] // R))
        if R > 1:
            # disjoint seed-rank bands per restart: restart r seeds from the
            # (r*e ... (r+1)*e) best routing-sample rows
            neg_all, pos_all = jax.lax.top_k(-seed_d, min(R * e, seed_ids.shape[0]))
            r_idx = jnp.arange(b, dtype=jnp.int32) % R
            band = jnp.minimum(
                r_idx[:, None] * e + jnp.arange(e, dtype=jnp.int32)[None, :],
                neg_all.shape[1] - 1,
            )
            neg_sd = jnp.take_along_axis(neg_all, band, axis=1)
            entry_pos = jnp.take_along_axis(pos_all, band, axis=1)
        else:
            neg_sd, entry_pos = jax.lax.top_k(-seed_d, e)
        init_ids = seed_ids[entry_pos]  # [B, E]
        init_d = -neg_sd
        # dedup repeated seeds (padded routing samples repeat ids)
        first = jnp.concatenate(
            [
                jnp.ones((b, 1), bool),
                init_ids[:, 1:] != init_ids[:, :-1],
            ],
            axis=1,
        )
        init_d = jnp.where(first, init_d, _INF)
        init_ids = jnp.where(first, init_ids, -1)

    pad = beam - e
    ids0 = jnp.concatenate(
        [init_ids, jnp.full((b, max(pad, 0)), -1, jnp.int32)], axis=1
    )[:, :beam]
    d0 = jnp.concatenate([init_d, jnp.full((b, max(pad, 0)), _INF)], axis=1)[:, :beam]
    vis0 = jnp.zeros((b, beam), bool)

    # filtered-result accumulator (r5): the pool merge keeps the best-beam
    # by UNFILTERED distance, so on a correlated filter the masked entry
    # candidates (far from the query by construction) are evicted by
    # unmasked expansions before final selection ever sees them (measured:
    # recall ~ selectivity on cluster masks even with masked seeding).
    # Standard filtered-ANN practice — expand unmasked, SELECT masked —
    # needs the selection to survive eviction: keep a running top-A buffer
    # of every scored node that passes the mask (entries + each
    # expansion), merged with the pool at final selection.
    acc_w = 0
    if mask is not None:
        acc_w = min(beam, max(2 * k, 32))
        mk0 = mask[jnp.maximum(ids0, 0)] & (ids0 >= 0)
        acc_d0 = jnp.where(mk0, d0, _INF)
        _, apos = jax.lax.top_k(-acc_d0, acc_w)
        acc_d = jnp.take_along_axis(acc_d0, apos, axis=1)
        acc_i = jnp.take_along_axis(
            jnp.where(mk0, ids0, -1), apos, axis=1
        )
    else:
        acc_d = jnp.zeros((b, 0), jnp.float32)
        acc_i = jnp.zeros((b, 0), jnp.int32)

    # multi-expansion (CAGRA-style): each iteration expands the E best
    # unvisited candidates at once — E x fewer sequential steps, the
    # dominant cost on TPU where each step is a latency-bound gather
    ew = max(1, min(expand_width or EXPAND_WIDTH, beam))
    rows = jnp.arange(b)[:, None]

    def body(_, state):
        ids, dist, vis, acc_d, acc_i = state
        sel = jnp.where(vis | (ids < 0), _INF, dist)
        neg_sel, best_pos = jax.lax.top_k(-sel, ew)  # [B, E]
        has = (-neg_sel) < _INF
        bids = jnp.take_along_axis(ids, best_pos, axis=1)  # [B, E]
        vis = vis.at[rows, best_pos].set(True)
        # expand: gather E neighbor rows per query and score them together
        nbrs = adj[jnp.maximum(bids, 0)].reshape(b, ew * degree)
        nd = q_dist(nbrs)
        has_flat = jnp.repeat(has, degree, axis=1)  # [B, E*degree]
        bad = (
            (nbrs < 0)
            | ~valid[jnp.maximum(nbrs, 0)]
            | ~has_flat
            | jnp.any(nbrs[:, :, None] == ids[:, None, :], axis=2)  # vs pool
        )
        # dedup within the expansion batch (two expanded nodes sharing a
        # neighbor): keep the first occurrence only
        eq = nbrs[:, :, None] == nbrs[:, None, :]
        first = jnp.sum(
            jnp.tril(eq, k=-1) & ~bad[:, None, :] & ~bad[:, :, None], axis=2
        ) == 0
        bad = bad | ~first
        nd = jnp.where(bad, _INF, nd)
        nids = jnp.where(bad, -1, nbrs)
        if acc_w:
            # fold mask-passing expansions into the filtered accumulator
            # (duplicates possible across steps — deduped at selection)
            amk = mask[jnp.maximum(nids, 0)] & (nids >= 0)
            cd_all = jnp.concatenate([acc_d, jnp.where(amk, nd, _INF)], axis=1)
            ci_all = jnp.concatenate(
                [acc_i, jnp.where(amk, nids, -1)], axis=1
            )
            _, aord = jax.lax.top_k(-cd_all, acc_w)
            acc_d = jnp.take_along_axis(cd_all, aord, axis=1)
            acc_i = jnp.take_along_axis(ci_all, aord, axis=1)
        # merge + keep best `beam`
        all_ids = jnp.concatenate([ids, nids], axis=1)
        all_d = jnp.concatenate([dist, nd], axis=1)
        all_v = jnp.concatenate([vis, jnp.zeros((b, ew * degree), bool)], axis=1)
        _, order = jax.lax.top_k(-all_d, beam)
        ids = jnp.take_along_axis(all_ids, order, axis=1)
        dist = jnp.take_along_axis(all_d, order, axis=1)
        vis = jnp.take_along_axis(all_v, order, axis=1)
        return ids, dist, vis, acc_d, acc_i

    steps = max(2, -(-expansions // ew))
    ids, dist, _, acc_d, acc_i = jax.lax.fori_loop(
        0, steps, body, (ids0, d0, vis0, acc_d, acc_i)
    )

    # ---- f32 rerank of the head of the pool (dual-precision 2nd pass) ----
    if rerank_corpus is not None:
        # the pool is quantized-distance-ordered; rescoring its top 4k (>=32)
        # slice recovers the quantization loss at a fraction of the gather
        # bytes a full-beam rerank would cost (at 768D the full rerank
        # erased the quantized-traversal win)
        r_width = min(beam, max(32, 4 * k))
        rids = ids[:, :r_width]
        rvecs = rerank_corpus[jnp.maximum(rids, 0)]  # [B, R, D]
        rdots = jnp.einsum(
            "bd,bmd->bm", qn, rvecs, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # true-f32 head rerank
        )
        if metric is DistanceMetric.EUCLIDEAN:
            qq = jnp.sum(qn * qn, axis=-1, keepdims=True)
            rsq = jnp.sum(rvecs * rvecs, axis=-1)
            exact = qq + rsq - 2.0 * rdots
        elif metric is DistanceMetric.COSINE:
            rn = jnp.sqrt(
                jnp.maximum(jnp.sum(rvecs * rvecs, axis=-1), 1e-30)
            )
            exact = 1.0 - rdots / rn
        else:
            exact = -rdots
        head = jnp.where(
            jnp.isinf(dist[:, :r_width]) | (rids < 0),
            dist[:, :r_width],
            exact,
        )
        dist = jnp.concatenate([head, dist[:, r_width:]], axis=1)

    # ---- final selection (apply result filter here) ----
    if mask is not None:
        keep = mask[jnp.maximum(ids, 0)] & (ids >= 0)
        dist = jnp.where(keep, dist, _INF)
        if acc_w:
            if rerank_corpus is not None:
                # accumulator distances rode the quantized basis — rescore
                # its (few) rows exactly, like the pool-head rerank above
                avecs = rerank_corpus[jnp.maximum(acc_i, 0)]
                adots = jnp.einsum(
                    "bd,bmd->bm", qn, avecs,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                if metric is DistanceMetric.EUCLIDEAN:
                    qq = jnp.sum(qn * qn, axis=-1, keepdims=True)
                    asq = jnp.sum(avecs * avecs, axis=-1)
                    aex = qq + asq - 2.0 * adots
                elif metric is DistanceMetric.COSINE:
                    an = jnp.sqrt(
                        jnp.maximum(jnp.sum(avecs * avecs, axis=-1), 1e-30)
                    )
                    aex = 1.0 - adots / an
                else:
                    aex = -adots
                acc_d = jnp.where(jnp.isinf(acc_d) | (acc_i < 0), acc_d, aex)
            # union pool + accumulator (pool FIRST so its f32-reranked head
            # copies win the first-occurrence dedup), pre-trim, dedup ids
            ids = jnp.concatenate([ids, acc_i], axis=1)
            dist = jnp.concatenate([dist, acc_d], axis=1)
            m = min(ids.shape[1], 2 * k + acc_w)
            _, pre = jax.lax.top_k(-dist, m)
            ids = jnp.take_along_axis(ids, pre, axis=1)
            dist = jnp.take_along_axis(dist, pre, axis=1)
            dup = jnp.sum(
                jnp.tril(ids[:, :, None] == ids[:, None, :], k=-1), axis=2
            ) > 0
            dist = jnp.where(dup, _INF, dist)
            ids = jnp.where(dup, -1, ids)
    if R > 1:
        # merge restarts: unfold to [B0, R*beam], dedup ids found by more
        # than one restart (keep the best-ranked copy), then select. Top
        # R*k candidates are enough — each id appears at most R times, so
        # they always contain >= k unique ids.
        # width is `beam`, or the deduped union width when a mask is set
        w = ids.shape[1]
        ids = ids.reshape(b0, R * w)
        dist = dist.reshape(b0, R * w)
        m = min(R * w, max(R * k, k))
        _, pre = jax.lax.top_k(-dist, m)
        mids = jnp.take_along_axis(ids, pre, axis=1)  # [B0, m]
        mdist = jnp.take_along_axis(dist, pre, axis=1)
        dup = jnp.sum(
            jnp.tril(mids[:, :, None] == mids[:, None, :], k=-1), axis=2
        ) > 0
        ids = jnp.where(dup, -1, mids)
        dist = jnp.where(dup, _INF, mdist)
    _, order = jax.lax.top_k(-dist, k)
    out_ids = jnp.take_along_axis(ids, order, axis=1)
    out_d = jnp.take_along_axis(dist, order, axis=1)
    # back to native score orientation
    if metric is DistanceMetric.EUCLIDEAN:
        out_v = jnp.sqrt(jnp.maximum(out_d, 0.0))
    elif metric is DistanceMetric.COSINE:
        out_v = 1.0 - out_d
    else:
        out_v = -out_d
    out_v = jnp.where(jnp.isinf(out_d), jnp.where(out_d > 0, jnp.inf, -jnp.inf), out_v)
    if metric.higher_is_better:
        out_v = jnp.where(jnp.isinf(out_d) & (out_d > 0), -jnp.inf, out_v)
    return out_v, jnp.where(jnp.isinf(out_d), -1, out_ids)


_beam_search = functools.partial(
    jax.jit,
    static_argnames=(
        "k", "beam", "expansions", "degree", "entry_points", "metric",
        "restarts", "entry_probes", "entry_mode", "entry_interpret",
        "expand_width",
    ),
)(beam_search_impl)
