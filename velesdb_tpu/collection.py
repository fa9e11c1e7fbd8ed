"""Collection: the per-dataset orchestrator binding storage, indexes, device state.

Counterpart of the reference's ``Collection`` (``collection/types.rs:132-165``
and ``collection/core/crud.rs``): one named dataset = durable host storage
(memmap vectors + payload WAL) + device-resident search state. The TPU twist:
the canonical store is host-side and append-oriented; the device holds padded,
immutable snapshots refreshed lazily ("batch inserts into buffer rebuilds",
SURVEY.md §7 hard part (b)) so every search is a pure jitted function over
static shapes.
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Any, Iterable

import numpy as np

from velesdb_tpu.column.store import ColumnStore
from velesdb_tpu.index.brute import BruteForceIndex
from velesdb_tpu.index.graph_index import GraphIndex
from velesdb_tpu.index.params import GraphParams, SearchQuality
from velesdb_tpu.ops import DistanceMetric, StorageMode
from velesdb_tpu.storage.payload_log import PayloadLog
from velesdb_tpu.storage.vector_store import VectorStore

# Below this row count exact search is both faster and perfectly accurate, so
# the ANN graph only kicks in past it (HnswParams::for_dataset_size analog).
# On TPU the crossover is far higher than on CPU: the streamed MXU exact
# kernel serves ~77K QPS at 100K x 768D with recall 1.0, while graph
# traversal is expansion-latency-bound — so exact is the default engine
# until the corpus outgrows one chip's HBM streaming budget.
ANN_MIN_ROWS = 2_000_000

_ANN_METRICS = (
    DistanceMetric.COSINE,
    DistanceMetric.EUCLIDEAN,
    DistanceMetric.DOT_PRODUCT,
)
_ANN_MODES = (StorageMode.FULL, StorageMode.F16, StorageMode.BF16)

__all__ = ["Collection", "SearchResult", "CollectionType"]


class CollectionType:
    """Parity with ``CollectionType`` (``collection/types.rs:32``)."""

    VECTOR = "vector"
    METADATA_ONLY = "metadata_only"
    GRAPH = "graph"


class SearchResult(dict):
    """A search hit: ``{"id", "score", "payload"}`` (dict for JSON surfaces)."""

    @property
    def id(self) -> int:
        return self["id"]

    @property
    def score(self) -> float:
        return self["score"]

    @property
    def payload(self):
        return self["payload"]


class Collection:
    """A named vector collection with durable storage and device search."""

    def __init__(
        self,
        path: str,
        name: str,
        dim: int,
        metric: DistanceMetric = DistanceMetric.COSINE,
        storage_mode: StorageMode = StorageMode.FULL,
        collection_type: str = CollectionType.VECTOR,
        create: bool = False,
    ):
        self.path = path
        self.name = name
        self.dim = int(dim)
        self.metric = DistanceMetric.parse(metric)
        self.storage_mode = StorageMode.parse(storage_mode)
        self.collection_type = collection_type
        self._lock = threading.RLock()
        if create:
            os.makedirs(path, exist_ok=True)
            self._save_config()
        self.vectors = VectorStore(path, self.dim, create=create)
        self.payloads = PayloadLog(path)
        self._brute = BruteForceIndex(self.dim, self.metric, self.storage_mode)
        self._device_dirty = True
        self._slot_ids: np.ndarray | None = None  # [used] int64, -1 = tombstone
        self.ann: GraphIndex | None = None
        self.ann_min_rows = ANN_MIN_ROWS
        if self.metric in _ANN_METRICS and self.storage_mode in _ANN_MODES:
            self.ann = GraphIndex(self.dim, self.metric)
        self.ivf = None  # IvfIndex, built on demand (planner-selected engine)
        self.index_kind = "auto"  # auto | exact | graph | ivf
        # Quantized collections auto-engage the oversample+f32-rerank pass on
        # plain search() (dual-precision default, ``native/dual_precision.rs``
        # analog): SQ8 stand-alone recall ~0.94-0.95 at the flagship configs
        # is below the quality profiles' bar; rerank lifts it to >=0.99 for a
        # small host-side rescoring cost. Set False to serve raw quantized
        # scores.
        self.auto_rerank = True
        # serving oversample for the quantized rerank pass; the storage
        # recall gate (_ensure_storage_gate) widens it when the calibrated
        # serve recall misses the profile bar
        self._rerank_oversample = 4.0
        self._storage_gate_used = None
        self._planner = None  # QueryPlanner (lazy)
        self.columns = ColumnStore()
        self.columns.set_id_source(self.vectors.occupancy)
        self._columns_built = False
        # text indexes build lazily from the payload log at first text query
        self.text_index = None  # Bm25Index
        self.trigram_index = None  # TrigramIndex
        self._text_built = False
        # knowledge graph state builds lazily at first graph op
        self.graph = None  # CollectionGraph
        self.reindex_events: list[dict] = []  # auto-reindex audit trail
        self._result_cache = None  # SearchResultCache when enabled
        # incremental ANN maintenance (reference: HNSW inserts stay O(log N)
        # per row forever, native/graph.rs:158; here mutations land in a
        # per-engine DELTA — stale slots excluded from the stale index and
        # searched exactly from a compact device snapshot — and a full
        # rebuild only triggers past ``delta_rebuild_fraction``)
        self._stale: dict[str, set[int]] = {"graph": set(), "ivf": set()}
        self._mut_counter = 0
        self.delta_rebuild_fraction = 0.10
        self._delta_cache: dict[str, tuple] = {}
        # TTL rows + auto-vacuum (ColumnStore TTL / AutoVacuumConfig analog).
        # Durable in ttl.json so deadlines survive reopen (advisor finding:
        # memory-only TTLs silently resurrected expiring rows on restart).
        self._ttl: dict[int, float] = self._load_ttl()  # vid -> unix expiry
        # TTL writes are BATCHED (advisor r2: rewriting ttl.json per
        # single-row upsert made TTL'd ingest O(N^2) in file I/O): mutations
        # set a dirty flag; the file flushes once per flush()/close()/
        # expire_rows()/bulk op.
        self._ttl_dirty = False
        self._last_ttl_flush = 0.0
        self._auto_vacuum: dict | None = None
        self._last_auto_vacuum = 0.0
        # (engine, batch-bucket, k_fetch, ef) shape classes already timed:
        # the FIRST dispatch of a class pays XLA compile (seconds) — feeding
        # it to the planner's latency EMA would misprice the engine for the
        # whole session, so warm-up dispatches are excluded from recording.
        self._timed_sigs: set[tuple] = set()

    # -- config ------------------------------------------------------------

    def _save_config(self) -> None:
        cfg = {
            "name": self.name,
            "dim": self.dim,
            "metric": self.metric.value,
            "storage_mode": self.storage_mode.value,
            "collection_type": self.collection_type,
            "version": 1,
        }
        tmp = os.path.join(self.path, "config.json.tmp")
        with open(tmp, "w") as f:
            json.dump(cfg, f, indent=2)
        os.replace(tmp, os.path.join(self.path, "config.json"))

    def _load_ttl(self) -> dict[int, float]:
        p = os.path.join(self.path, "ttl.json")
        try:
            with open(p) as f:
                return {int(k): float(v) for k, v in json.load(f).items()}
        except (OSError, ValueError):
            return {}

    _TTL_FLUSH_DEBOUNCE_S = 2.0

    def _flush_ttl(self, debounce: bool = False) -> None:
        """``debounce=True`` (single-row mutation path) flushes at most once
        per debounce window — bounds the crash-durability gap to ~2s without
        reintroducing the O(N^2) per-row full-file rewrite."""
        if not self._ttl_dirty:
            return
        if debounce and (
            time.monotonic() - self._last_ttl_flush < self._TTL_FLUSH_DEBOUNCE_S
        ):
            return
        self._save_ttl()
        self._ttl_dirty = False
        self._last_ttl_flush = time.monotonic()

    def _save_ttl(self) -> None:
        p = os.path.join(self.path, "ttl.json")
        if not self._ttl:
            if os.path.exists(p):
                os.remove(p)
            return
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump({str(k): v for k, v in self._ttl.items()}, f)
        os.replace(tmp, p)

    @classmethod
    def open(cls, path: str) -> "Collection":
        with open(os.path.join(path, "config.json")) as f:
            cfg = json.load(f)
        return cls(
            path,
            cfg["name"],
            cfg["dim"],
            metric=cfg.get("metric", "cosine"),
            storage_mode=cfg.get("storage_mode", "full"),
            collection_type=cfg.get("collection_type", CollectionType.VECTOR),
        )

    # -- CRUD (parity with collection/core/crud.rs) ------------------------

    def upsert(
        self, vid: int, vector, payload: dict | None = None, ttl: float | None = None
    ) -> None:
        """Validate dim -> store vector -> store payload -> mark device dirty
        (reference pipeline ``crud.rs:19-128``; quantization and text indexing
        happen lazily at device refresh instead of per-row). ``ttl`` (seconds)
        marks the row for expiry (ColumnStore TTL analog, ``types.rs:258``)."""
        vec = np.asarray(vector, dtype=np.float32)
        if vec.shape != (self.dim,):
            raise ValueError(
                f"dimension mismatch: expected {self.dim}, got {vec.shape}"
            )
        with self._lock:
            slot = self.vectors.store(int(vid), vec)
            if payload is not None:
                self.payloads.store(int(vid), payload)
            if self._columns_built:
                self.columns.upsert_row(slot, payload)
            if self._text_built:
                self._index_text(slot, payload)
            if self.graph is not None:
                self.graph.index_node(int(vid), payload)
            if ttl is not None:
                self._ttl[int(vid)] = time.time() + ttl
                self._ttl_dirty = True
            elif self._ttl.pop(int(vid), None) is not None:
                self._ttl_dirty = True
            self._flush_ttl(debounce=True)
            self._on_mutation([int(vid)], slots=[slot])

    def upsert_bulk(
        self,
        ids: Iterable[int],
        vectors,
        payloads: Iterable[dict] | None = None,
        ttl: float | None = None,
    ) -> None:
        """Bulk variant (``crud.rs:175``); ``ttl`` applies to every row."""
        vecs = np.asarray(vectors, dtype=np.float32)
        ids = [int(i) for i in ids]
        if vecs.ndim != 2 or vecs.shape[1] != self.dim:
            raise ValueError(
                f"dimension mismatch: expected [N, {self.dim}], got {vecs.shape}"
            )
        if len(ids) != vecs.shape[0]:
            raise ValueError("ids and vectors length mismatch")
        with self._lock:
            slots = self.vectors.store_batch(ids, vecs)
            payloads = list(payloads) if payloads is not None else None
            if payloads is not None:
                for vid, payload in zip(ids, payloads):
                    if payload is not None:
                        self.payloads.store(vid, payload)
            if self._columns_built:
                for i, slot in enumerate(slots):
                    self.columns.upsert_row(
                        slot, payloads[i] if payloads is not None else None
                    )
            if self._text_built:
                for i, slot in enumerate(slots):
                    self._index_text(
                        slot, payloads[i] if payloads is not None else None
                    )
            if self.graph is not None:
                for i, vid in enumerate(ids):
                    self.graph.index_node(
                        vid, payloads[i] if payloads is not None else None
                    )
            if ttl is not None:
                expiry = time.time() + ttl
                for vid in ids:
                    self._ttl[vid] = expiry
                self._ttl_dirty = True
            else:
                # Mirror single-row upsert: a re-upsert without ttl clears
                # any stale deadline instead of letting the row expire.
                if any(self._ttl.pop(vid, None) is not None for vid in ids):
                    self._ttl_dirty = True
            self._flush_ttl()  # one write per bulk call
            self._on_mutation(ids, slots=slots)

    def get(self, vid: int):
        """Fetch ``(vector, payload)`` or None."""
        vec = self.vectors.retrieve(vid)
        if vec is None:
            return None
        return vec, self.payloads.retrieve(vid)

    def delete(self, vid: int) -> bool:
        with self._lock:
            slot = self.vectors.id_to_slot.get(int(vid))
            existed = self.vectors.delete(vid)
            self.payloads.delete(vid)
            if existed:
                if self._columns_built and slot is not None:
                    self.columns.remove_row(slot)
                if self._text_built and slot is not None:
                    self.text_index.remove_document(slot)
                    self.trigram_index.remove_document(slot)
                if self.graph is not None:
                    self.graph.remove_node(int(vid))
                self._on_mutation([int(vid)], slots=[slot])
            return existed

    def count(self) -> int:
        return len(self.vectors)

    def __len__(self) -> int:
        return self.count()

    def _on_mutation(self, ids: list[int], slots: list[int | None] | None = None) -> None:
        self._device_dirty = True
        self._mut_counter += 1
        if self.columns is not None:
            self.columns.invalidate(ids)
        if self.text_index is not None:
            self.text_index.invalidate(ids)
        # ANN engines absorb mutations through the delta buffer; a full
        # rebuild only triggers once the delta outgrows its budget. Only
        # LIVE indexes track deltas — before the first build (or once
        # dirty) the coming full build covers every row anyway, and an
        # unbounded slot set at 10M rows is real memory.
        track_graph = (
            self.ann is not None and not self.ann.dirty and self.ann.n_pad > 0
        )
        track_ivf = self.ivf is not None and not self.ivf.dirty
        if track_graph or track_ivf:
            if slots is None:
                slots = [self.vectors.id_to_slot.get(int(v)) for v in ids]
            live = [int(s) for s in slots if s is not None]
            thresh = max(
                1024, int(self.delta_rebuild_fraction * max(self.count(), 1))
            )
            if track_graph:
                self._stale["graph"].update(live)
                if len(self._stale["graph"]) > thresh:
                    self.ann.invalidate(ids)
            if track_ivf:
                self._stale["ivf"].update(live)
                if len(self._stale["ivf"]) > thresh:
                    self.ivf.invalidate(ids)
        if self._result_cache is not None:
            self._result_cache.invalidate()

    def _delta_snapshot(self, engine: str):
        """Compact device snapshot of the engine's stale rows (current
        vectors + liveness), cached per mutation counter. Returns None when
        the delta is empty."""
        stale = self._stale[engine]
        if not stale:
            return None
        cached = self._delta_cache.get(engine)
        if cached is not None and cached[0] == self._mut_counter:
            return cached
        import jax
        import jax.numpy as jnp

        slots = np.fromiter(stale, np.int64, len(stale))
        free = set(self.vectors._free_slots)
        alive = np.fromiter((s not in free for s in slots), bool, len(slots))
        vecs = np.array(self.vectors.slot_view()[slots])
        n_pad = 1 << max(8, int(len(slots) - 1).bit_length())
        vecs = np.pad(vecs, ((0, n_pad - len(slots)), (0, 0)))
        valid = np.pad(alive, (0, n_pad - len(slots)))
        slots_p = np.pad(slots, (0, n_pad - len(slots)), constant_values=-1)
        entry = (
            self._mut_counter,
            jax.device_put(jnp.asarray(vecs)),
            slots_p,
            np.array(valid),
        )
        self._delta_cache[engine] = entry
        return entry

    def _ann_delta_search(self, engine: str, q: np.ndarray, k_fetch: int,
                          ef: int | None, mask, ivf_nprobe: int | None = None):
        """ANN search with incremental-delta semantics: stale slots are
        excluded from the (possibly stale) index results and searched
        EXACTLY from the compact delta snapshot; the two top-k lists merge
        host-side. Search latency stays flat under sustained upserts while
        index build work stays O(delta) (VERDICT round-1 #3)."""
        used = max(self.vectors.used_slots, 1)
        delta = self._delta_snapshot(engine)
        base_mask = None if mask is None else np.asarray(mask)[:used]
        ex_mask = base_mask
        if delta is not None:
            ex = np.ones(used, bool)
            ex[[s for s in self._stale[engine] if s < used]] = False
            ex_mask = ex if base_mask is None else (base_mask & ex)
        if engine == "ivf":
            vals, idx = self.ivf.search(q, k_fetch, ef=ef, mask=ex_mask,
                                        nprobe=ivf_nprobe)
        else:
            ann_mask = (
                _pad_mask(ex_mask, self.ann.n_pad) if ex_mask is not None else None
            )
            vals, idx = self.ann.search(q, k_fetch, ef=ef, mask=ann_mask)
        if delta is None:
            return vals, idx
        from velesdb_tpu.ops.streamed import streamed_topk

        _, dvecs, dslots, dalive = delta
        dval = dalive
        if base_mask is not None:
            in_range = (dslots >= 0) & (dslots < used)
            dval = dval & np.where(in_range, base_mask[np.maximum(dslots, 0)], False)
        dk = min(k_fetch, dvecs.shape[0])
        dv, di = streamed_topk(
            q, dvecs, valid=dval, k=dk, metric=self.metric
        )
        import jax as _jax

        # one tunnel round trip for all four device outputs (each
        # np.asarray would pay its own RTT — see search_batch)
        vals, idx, dv, di = _jax.device_get((vals, idx, dv, di))
        dslots_sel = np.where(di >= 0, dslots[np.maximum(di, 0)], -1).astype(
            np.int64
        )
        allv = np.concatenate([np.asarray(vals), dv], axis=1)
        alli = np.concatenate([np.asarray(idx), dslots_sel], axis=1)
        hib = self.metric.higher_is_better
        order = np.argsort(-allv if hib else allv, axis=1, kind="stable")[
            :, :k_fetch
        ]
        return (
            np.take_along_axis(allv, order, axis=1),
            np.take_along_axis(alli, order, axis=1),
        )

    # -- device state ------------------------------------------------------

    def refresh_device(self) -> None:
        """Upload the current host slot array as padded device state."""
        self._maybe_auto_vacuum()
        with self._lock:
            if not self._device_dirty:
                return
            used = self.vectors.used_slots
            slots = np.array(self.vectors.slot_view()[: max(used, 1)])
            slot_ids, valid = self.vectors.occupancy()
            if used == 0:
                slots = np.zeros((1, self.dim), np.float32)
                slot_ids = np.full(1, -1, np.int64)
                valid = np.zeros(1, bool)
            self._slot_ids = slot_ids
            self._brute.rebuild(slots, valid)
            self._device_dirty = False

    def _ensure_ann(self, force: bool = False) -> bool:
        """Build (or restore) the graph index if this collection should use it.

        Auto-reindex (``collection/auto_reindex/mod.rs`` analog): when the
        dataset outgrows the parameters the index was built with, the restore
        path rejects the stale index and a rebuild with
        ``GraphParams.auto(dim, n)`` runs; each rebuild appends an event to
        :attr:`reindex_events`. ``force`` (explicit ``index_kind='graph'``)
        bypasses the auto-build size gate — the user asked for the engine.
        """
        if self.ann is None:
            return False
        if not force and self.ann.dirty and self.count() < self.ann_min_rows:
            # no fresh index and the corpus is below the auto-build payoff
            # size — but an ALREADY-BUILT index keeps serving at any size
            return False
        if self.ann.dirty:
            used = self.vectors.used_slots
            slots = np.array(self.vectors.slot_view()[:used])
            _, valid = self.vectors.occupancy()
            ann_path = os.path.join(self.path, "ann.npz")
            version = self.vectors.version
            want = GraphParams.auto(self.dim, used)
            # entry-scan knobs are runtime (load keeps the caller's): lift
            # defaults to the auto sizing so a REOPENED 1M collection gets
            # the wide SQ8 entry-IVF, honoring user-raised values (r3c)
            import dataclasses as _dc

            cur = self.ann.params
            self.ann.params = _dc.replace(
                cur,
                entry_probes=max(cur.entry_probes, want.entry_probes),
                entry_points=max(cur.entry_points, want.entry_points),
            )
            if (
                not self.ann.load(ann_path, slots, valid, version=version)
                or self.ann.params.degree < want.degree
            ):
                import time as _time

                old = self.ann.params
                self.ann.params = want
                # borrow the resident device corpus (skips three 300MB-class
                # host->device transfers inside the build); cosine _full is
                # pre-normalized, which cosine scoring is invariant to
                self.ann.build(slots, valid, corpus_dev=self._brute._full)
                self.ann.save(ann_path, version=version)
                self.reindex_events.append(
                    {
                        "at": _time.time(),
                        "rows": used,
                        "from_degree": old.degree,
                        "to_degree": want.degree,
                    }
                )
            # fresh build/restore covers every row: the delta drains
            self._stale["graph"].clear()
            self._delta_cache.pop("graph", None)
            self._calibrate_engine("graph")
        return True

    def _calibrate_engine(self, engine: str, sample: int = 128) -> None:
        """Measured recall probe after an index build, recorded per quality
        profile's ef. The planner's honesty gate (``choose(min_recall=...)``)
        demotes engines that measure below the active profile's bar —
        however cheap the cost model thinks they are (VERDICT r2 weak #2).

        Probe queries are sampled stored rows PERTURBED by one NN-distance
        of gaussian noise — raw stored rows would measure self-retrieval
        recall (the query is a graph node / sits in its own partition),
        which systematically overestimates real-query recall."""
        used = self.vectors.used_slots
        if used < 32:
            return
        # the NN-distance probe below goes through the brute engine — make
        # sure device state exists (a caller driving _ensure_ann directly,
        # e.g. an explicit index build before any search, reaches here with
        # _brute._full unset; r3d: that silently disabled the recall gate)
        self.refresh_device()
        take = min(sample, used)
        slots = np.linspace(0, used - 1, take).astype(np.int64)
        base = np.array(self.vectors.slot_view()[slots])
        k = 10
        try:
            # distance of each sampled row to its nearest OTHER row sets a
            # realistic query offset (metric-agnostic: euclidean in vector
            # space is how "a new query near the corpus" is generated)
            _, nn = self._brute.search(base, 2)
            nn = np.asarray(nn)
            other = np.where(nn[:, 1] >= 0, nn[:, 1], np.maximum(nn[:, 0], 0))
            nn_vecs = np.array(self.vectors.slot_view()[other])
            d1 = np.linalg.norm(base - nn_vecs, axis=1, keepdims=True)
            rngc = np.random.default_rng(0)
            noise = rngc.standard_normal(base.shape).astype(np.float32)
            noise /= np.maximum(np.linalg.norm(noise, axis=1, keepdims=True), 1e-9)
            q = base + noise * d1
            # Scoring basis (r3c metrology fix): id-match against the DEVICE
            # brute oracle caps exact-grade engines at ~0.96 on clustered
            # data — MXU f32 (~3e-4) swaps near-ties DIFFERENTLY per engine,
            # so a host-perfect engine failed the ACCURATE profile's 0.97
            # bar. Calibrate on the HOST basis instead: eps-recall vs the
            # host-f32 kth score (curve.py's recall_eps, the primary
            # artifact metric since r3b). Falls back to device id-match only
            # when the host corpus copy would be unreasonable (capacity
            # collections are quantized and covered by calibrate_storage).
            host_basis = used * self.dim * 4 <= 4 << 30
            kth = ei = None
            hib = self.metric.higher_is_better
            if host_basis:
                view = self.vectors.slot_view()
                corpus_h = np.asarray(view[:used], np.float32)
                _, live = self.vectors.occupancy()
                live = np.asarray(live[:used], bool)
                dead = -np.inf if hib else np.inf
                kth = np.empty(take, np.float32)
                for i in range(take):
                    s = _host_scores(q[i], corpus_h, self.metric)
                    s = np.where(live, s, dead)
                    kth[i] = (
                        np.partition(-s if hib else s, k - 1)[k - 1]
                    ) * (-1.0 if hib else 1.0)
            else:
                _, ei = self._brute.search(q, k)
                ei = np.asarray(ei)
            # ladder includes sub-FAST efs (16, 32): entry-bound graphs are
            # ef-FLAT (r3d sweep: 1Mx128D ef=16 == ef=128 recall 0.954 at
            # 7.6K vs 2.3K QPS b=16) — calibrating the low rungs lets
            # downshift_ef serve them; rungs that DON'T clear the profile
            # bar are simply never picked, so small/walk-bound graphs are
            # unaffected by construction.
            for ef_probe in (16, 32, 64, 128, 256):
                if engine == "ivf":
                    _, ai = self.ivf.search(q, k, ef=ef_probe)
                else:
                    _, ai = self.ann.search(q, k, ef=ef_probe)
                ai = np.asarray(ai)
                hits = 0
                if host_basis:
                    for i in range(take):
                        ids = ai[i][ai[i] >= 0]
                        if len(ids) == 0:
                            continue
                        s = _host_scores(q[i], corpus_h[ids], self.metric)
                        if hib:
                            hits += int(
                                np.sum(s >= kth[i] - 1e-3 * abs(kth[i]) - 1e-9)
                            )
                        else:
                            hits += int(np.sum(s <= kth[i] * 1.001 + 1e-9))
                else:
                    hits = sum(
                        len(set(ai[i][ai[i] >= 0]) & set(ei[i][ei[i] >= 0]))
                        for i in range(take)
                    )
                self.planner.record_recall(
                    engine, min(hits / float(take * k), 1.0), ef=ef_probe
                )
        except Exception as e:  # calibration is advisory; the engine serves
            # ...but a swallowed error means NO recall gate at all — keep
            # the last failure inspectable (stats/debugging) instead of
            # vanishing it (r3d: a silent AttributeError disabled the gate)
            self.last_calibration_error = repr(e)

    def _ensure_storage_gate(self, quality=None) -> None:
        """Calibrate the quantized serve path and widen the rerank
        oversample until measured recall clears the profile bar (or the
        32x cap). Runs at most once per row count; failures are advisory
        and inspectable via ``last_calibration_error``."""
        used = self.vectors.used_slots
        if used < 4096:  # toy collections: the probe costs more than it informs
            return
        prev = getattr(self, "_storage_gate_used", None)
        # debounced on >=10% row drift, not equality: an upsert-interleaved
        # search workload changes used_slots between searches, and each
        # probe costs a full host-oracle pass on the serve critical path
        # (code-review r4)
        if prev is not None and abs(used - prev) < 0.1 * prev:
            return
        self._storage_gate_used = used  # set FIRST: calibrate() re-enters search
        bar = (
            SearchQuality.parse(quality).min_recall
            if quality is not None
            else SearchQuality.BALANCED.min_recall
        )
        try:
            r = self.calibrate_storage()
            while r is not None and r < bar and self._rerank_oversample < 32:
                self._rerank_oversample *= 2.0
                self._storage_recall = None  # force a fresh probe
                r = self.calibrate_storage()
        except Exception as e:
            self.last_calibration_error = repr(e)

    def calibrate_storage(self, sample: int = 128):
        """True-recall probe of QUANTIZED storage (SQ8/binary): the default
        serving path (auto-rerank included) measured against a HOST f32
        exact oracle over the memmap slot view.

        ``_calibrate_engine`` uses the brute engine as its oracle — which,
        on a quantized collection, is itself quantized, so storage-level
        recall loss is invisible to it (measured ~0.96 ceiling on dense
        clustered data at 1M, a density effect of SQ8 noise vs rank gaps).
        This probe closes that blind spot; the result is cached per row
        count, recorded with the planner under ``"storage"``, and surfaced
        by the index-info route. Returns ``None`` for full-precision
        collections (their serve path IS the oracle, modulo ~1e-3 MXU
        near-tie swaps)."""
        if self.storage_mode not in (StorageMode.SQ8, StorageMode.BINARY):
            return None
        used = self.vectors.used_slots
        if used < 32:
            return None
        cached = getattr(self, "_storage_recall", None)
        if cached is not None and cached[0] == used:
            return cached[1]
        take = min(sample, used)
        k = 10
        slots = np.linspace(0, used - 1, take).astype(np.int64)
        view = self.vectors.slot_view()
        base = np.array(view[slots])
        rngc = np.random.default_rng(0)
        noise = rngc.standard_normal(base.shape).astype(np.float32)
        noise /= np.maximum(np.linalg.norm(noise, axis=1, keepdims=True), 1e-9)
        # one-NN-distance perturbation via the host oracle itself
        corpus = np.asarray(view[:used], np.float32)
        slot_to_id = {v: k for k, v in self.vectors.id_to_slot.items()}
        live = np.zeros(used, bool)
        live[[s for s in slot_to_id if s < used]] = True
        hib = self.metric.higher_is_better
        dead_fill = -np.inf if hib else np.inf
        def oracle_topk(q, kk):
            out = np.empty((len(q), kk), np.int64)
            for i in range(len(q)):  # 128 BLAS row passes, host-side
                s = _host_scores(q[i], corpus, self.metric)
                s = np.where(live, s, dead_fill)
                order = np.argsort(-s if hib else s)
                out[i] = order[:kk]
            return out
        nn2 = oracle_topk(base, 2)
        d1 = np.linalg.norm(base - corpus[nn2[:, 1]], axis=1, keepdims=True)
        q = base + noise * d1
        gt = oracle_topk(q, k)
        # oracle slots -> stored ids (the serving path returns user ids)
        gt_ids = np.array(
            [[slot_to_id.get(int(s), -1) for s in row] for row in gt]
        )
        res = self.search_batch(q, k)
        hits = 0
        for i, row in enumerate(res):
            hits += len({r.id for r in row} & set(gt_ids[i].tolist()))
        r = hits / float(take * k)
        self._storage_recall = (used, r)
        self.planner.record_recall("storage", r)
        return r

    # -- search (parity with collection/search/vector.rs) ------------------

    def search(
        self,
        query,
        k: int = 10,
        filter: dict | None = None,
        ef: int | None = None,
        quality: SearchQuality | str | None = None,
    ):
        """Single-query search; returns hydrated results best-first."""
        if self._result_cache is not None:
            key = self._result_cache.key(
                np.asarray(query, np.float32), k, filter, ef, quality
            )
            hit = self._result_cache.get(key)
            if hit is not None:
                return hit
            res = self.search_batch([query], k, filter=filter, ef=ef, quality=quality)[0]
            self._result_cache.put(key, res)
            return res
        return self.search_batch([query], k, filter=filter, ef=ef, quality=quality)[0]

    def search_batch(
        self,
        queries,
        k: int = 10,
        filter: dict | None = None,
        ef: int | None = None,
        quality: SearchQuality | str | None = None,
        _raw: bool = False,
    ):
        """Batched search — the TPU-native primary path (one MXU pass for the
        whole batch; replaces the reference's rayon ``search_batch_parallel``,
        ``collection/search/batch.rs:154``).

        ``quality`` maps to ef via the reference's profiles
        (fast=64 / balanced=128 / accurate=256 / perfect=exact); explicit
        ``ef`` wins (the ``WITH (ef_search=..)`` override path).

        Quantized collections (SQ8/binary) route through the dual-precision
        rerank pass by default (:attr:`auto_rerank`); ``_raw=True`` is the
        internal coarse-pass escape hatch.
        """
        wants_perfect = (
            quality is not None
            and SearchQuality.parse(quality) is SearchQuality.PERFECT
        )
        if not _raw and (
            wants_perfect
            or (
                self.auto_rerank
                and self.storage_mode in (StorageMode.SQ8, StorageMode.BINARY)
            )
        ):
            if not wants_perfect:
                # storage recall gate (r4): quantized serving is calibrated
                # against the TRUE host-f32 oracle once per row count; a
                # coarse pass too lossy for the profile bar (binary sign
                # sketches at low D especially) widens its oversample until
                # it clears — the quantized-mode analog of the ANN honesty
                # gate.
                self._ensure_storage_gate(quality)
            # host-f32 rerank pass. For quantized storage it recovers the
            # quantization loss; for PERFECT it is the fidelity ceiling on
            # ANY storage: device engines select with MXU f32 (~3e-4 score
            # error -> ~0.2% distance error), which in concentrated
            # neighborhoods caps true-oracle identity recall at ~0.97 even
            # for the "exact" kernels — the host rescoring pass measures
            # 0.998 vs a true f32 oracle at 1M x 128D (r3b metrology).
            return self.search_batch_with_rerank(
                queries, k, filter=filter, ef=ef, quality=quality,
                oversample=self._rerank_oversample,
            )
        self.refresh_device()
        q = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        if q.shape[1] != self.dim:
            raise ValueError(
                f"dimension mismatch: expected {self.dim}, got {q.shape[1]}"
            )
        mask = self._filter_mask(filter)
        vals, idx, engine, sig, t0 = self._search_device(q, k, mask, ef, quality)
        # ONE device_get for both outputs: sequential np.asarray calls pay
        # one tunnel RTT EACH (measured 50.4 vs 25.3 ms for the pair) —
        # this single line is half the per-call serving latency (r3c)
        import jax as _jax

        vals, idx = _jax.device_get((vals, idx))
        out = self._hydrate(np.asarray(vals), np.asarray(idx), k)
        dt = time.perf_counter() - t0
        if sig in self._timed_sigs:
            self.planner.record_latency(engine, q.shape[0], dt)
        else:
            self._timed_sigs.add(sig)  # warm-up (compile) dispatch: untimed
        return out

    def _search_device(self, q, k, mask, ef=None, quality=None):
        """Engine-selected batched search returning DEVICE ``(vals, idx)``
        (slot indices) plus the chosen engine, the planner timing signature,
        and the dispatch start time. The caller owns the readback (single-RTT
        ``device_get``) and hydration — the fused hybrid path composes this
        with the BM25 device scorer and an on-device RRF without ever
        reading branch results back to the host."""
        quality = SearchQuality.parse(quality) if quality is not None else None
        exact = quality is SearchQuality.PERFECT or self.index_kind == "exact"
        ef_from_profile = ef is None
        if ef is None:
            ef = (quality or SearchQuality.BALANCED).ef
        engine = "exact"
        if not exact and self.metric in _ANN_METRICS:
            engine = self._choose_engine(q.shape[0], quality, ef)
        k_fetch = max(min(4 * k, ef), k) if mask is not None else k
        # index builds happen BEFORE timing starts: a first-call build would
        # otherwise poison the planner's latency EMA for that engine
        force = self.index_kind == engine
        if engine == "ivf" and not self._ensure_ivf():
            engine = "exact"
        if engine == "graph" and not self._ensure_ann(force=force):
            engine = "exact"
        # honesty gate, post-build: a freshly calibrated engine measuring
        # below the profile's recall bar demotes to exact — unless the user
        # pinned the engine via index_kind
        if engine in ("ivf", "graph") and self.index_kind != engine:
            bar = (quality or SearchQuality.BALANCED).min_recall
            r = self.planner.engine_recall(engine, ef)
            if r is not None and r < bar:
                engine = "exact"
        if engine in ("ivf", "graph") and ef_from_profile:
            # calibrated ef downshift (r3c): when a SMALLER calibrated ef
            # already clears the profile's recall bar, serve it — with
            # entry-bound graphs measured recall is ef-flat, so this is
            # 2x+ QPS at identical served quality. Explicit ef wins as-is.
            ef2 = self.planner.downshift_ef(
                engine, ef, (quality or SearchQuality.BALANCED).min_recall
            )
            if ef2 != ef:
                ef = ef2
                k_fetch = max(min(4 * k, ef), k) if mask is not None else k
        ivf_nprobe = None
        if engine in ("ivf", "graph") and mask is not None:
            # filtered-ANN starvation guards (VERDICT r3 #4): the graph
            # applies the mask at RESULT selection — traversal routes
            # through filtered nodes so the walk stays connected, but only
            # ~selectivity of the final pool passes. Size the pool so the
            # expected passing count covers k_fetch with margin, or fall
            # back to the masked exact scan when the beam cap (512) can't
            # (the mask is evaluated INSIDE the exact kernels — unlike the
            # reference's 4x over-fetch post-filter, search/vector.rs:182).
            used = max(self.vectors.used_slots, 1)
            sel = float(np.count_nonzero(np.asarray(mask)[:used])) / used
            if engine == "graph":
                has_masked_entry = (
                    self.ann is not None
                    and getattr(self.ann, "_entry_ivf", None) is not None
                )
                if has_masked_entry:
                    # r5: with an entry IVF the beam SEEDS from the best
                    # masked rows (mask-aware probe pruning + masked top-E)
                    # and a running accumulator keeps every mask-passing
                    # scored node through pool eviction — the pool no
                    # longer starves at low selectivity (measured: cluster
                    # masks went recall ~sel -> 1.0 at base ef). A modest
                    # ef bump still helps RANDOM sparse masks by scoring
                    # more nodes; cap it at the beam cap instead of
                    # falling back to exact.
                    if sel <= 0.0:
                        engine = "exact"
                    else:
                        need = int(np.ceil(1.5 * k_fetch / max(sel, 1e-9)))
                        if need > ef:
                            ef = min(((need + 7) // 8) * 8, 512)
                else:
                    need = int(np.ceil(1.5 * k_fetch / max(sel, 1e-9)))
                    if sel <= 0.0 or need > 512:
                        engine = "exact"
                    elif need > ef:
                        ef = ((need + 7) // 8) * 8
            elif self.ivf is not None and self.ivf.part_len:
                # IVF analog (r4): the probe pool is nprobe*L rows BEFORE
                # the in-kernel mask, so ~nprobe*L*sel candidates survive —
                # bump nprobe to keep that above k_fetch with margin, or
                # fall back to exact once the bumped coverage approaches a
                # half-corpus scan (the streamed kernel wins there anyway)
                L = self.ivf.part_len
                base_np = self.ivf.nprobe_for(ef)
                need_np = int(np.ceil(
                    1.5 * k_fetch / (max(sel, 1e-9) * L)
                ))
                if sel <= 0.0:
                    engine = "exact"
                elif need_np > base_np:
                    # quantize the bump to a /8 grid: nprobe is a jit-static
                    # arg, so raw selectivity-derived values would compile a
                    # fresh program per distinct filter (code-review r4 —
                    # same shape-churn class as the graph branch's ef rounding)
                    need_np = ((need_np + 7) // 8) * 8
                    cap = self.ivf.c_real or self.ivf.c
                    if need_np > cap or need_np * L * 2 >= used:
                        engine = "exact"
                    else:
                        ivf_nprobe = need_np
        t0 = time.perf_counter()
        if engine in ("ivf", "graph"):
            vals, idx = self._ann_delta_search(engine, q, k_fetch, ef, mask,
                                               ivf_nprobe=ivf_nprobe)
        else:
            vals, idx = self._brute.search(q, k, mask=mask)
        sig = (engine, self.planner._bucket(q.shape[0]), k_fetch, ef)
        return vals, idx, engine, sig, t0

    @property
    def planner(self):
        if self._planner is None:
            from velesdb_tpu.velesql.planner import QueryPlanner

            self._planner = QueryPlanner()
        return self._planner

    def _choose_engine(self, batch: int, quality=None, ef: int | None = None) -> str:
        """Cost-based engine pick (``query_cost/cost_model.rs`` analog):
        explicit ``index_kind`` wins; otherwise the planner compares exact
        streaming vs IVF probing vs graph beam search at this batch size.
        An engine is a candidate when its index is ALREADY BUILT (any size)
        or the corpus is past ``ann_min_rows`` (auto-build pays off);
        measured latency EMAs override the static model as they accrue, and
        calibrated recall below the quality profile's bar disqualifies."""
        if self.index_kind in ("graph", "ivf"):
            return self.index_kind
        used = max(self.vectors.used_slots, 1)
        big = self.count() >= self.ann_min_rows
        have_ivf = big or (self.ivf is not None and not self.ivf.dirty)
        have_graph = self.ann is not None and (
            big or (self.ann.n_pad > 0 and not self.ann.dirty)
        )
        if not (have_ivf or have_graph):
            return "exact"
        part_len = self.ivf.part_len if self.ivf is not None and self.ivf.part_len else 512
        # true serving nprobe (coverage-calibrated, spill-scaled): spill=2
        # doubles both part_len AND the probe count — the static model must
        # see the real bytes/query or it under-costs spilled IVF at large
        # batch, where exact/graph dominate both axes (VERDICT r3 weak #4)
        nprobe = (
            self.ivf.nprobe_for(ef)
            if self.ivf is not None and self.ivf.part_len
            else 32
        )
        gp = self.ann.params if self.ann is not None else None
        beam, expansions = (
            gp.beam_for_ef(128, 10) if gp is not None else (128, 64)
        )
        choice = self.planner.choose(
            used,
            self.dim,
            batch,
            have_ivf=have_ivf,
            ivf_nprobe=nprobe,
            ivf_part_len=part_len,
            have_graph=have_graph,
            graph_expansions=expansions,
            graph_degree=gp.degree if gp is not None else 48,
            min_recall=(
                SearchQuality.parse(quality).min_recall
                if quality is not None
                else SearchQuality.BALANCED.min_recall
            ),
            ef=ef,
        )
        return choice.engine

    def _ensure_ivf(self) -> bool:
        """Build (or restore) the IVF index for planner-selected searches."""
        if self.metric not in _ANN_METRICS:
            return False
        from velesdb_tpu.index.ivf import IvfIndex

        if self.ivf is None:
            # Measured (r3, 1Mx128D): plain probing ceilings at ~0.949
            # recall regardless of nprobe (boundary neighbors live in
            # partitions whose centroid never ranks), while spill=2 clears
            # 0.95 (0.954 @ nprobe=64, 5.8K QPS b16). Default to spill=2
            # whenever the doubled partition memory fits the HBM budget.
            used = max(self.vectors.used_slots, 1)
            spill = 2 if used * self.dim * 4 * 2 < 8 << 30 else 1
            self.ivf = IvfIndex(self.dim, self.metric, spill=spill)
        if self.ivf.dirty:
            used = self.vectors.used_slots
            slots = np.array(self.vectors.slot_view()[:used])
            _, valid = self.vectors.occupancy()
            path = os.path.join(self.path, "ivf.npz")
            version = self.vectors.version
            src = slots
            if self.storage_mode in _ANN_MODES and self._brute._full is not None:
                src = self._brute._full[:used]  # resident device corpus
            elif (
                self.storage_mode is StorageMode.SQ8
                and self._brute._sq8 is not None
            ):
                # quantized-storage IVF: partitions stay uint8 (the ANN
                # engine at one-chip capacity — codes fit where f32 cannot)
                sq = self._brute._sq8
                src = type(sq)(
                    sq.codes[:used], sq.scale[:used], sq.minv[:used]
                )
            if not self.ivf.load(path, src, valid, version=version):
                self.ivf.build(src, valid)
                self.ivf.save(path, version=version)
            # fresh build/restore covers every row: the delta drains
            self._stale["ivf"].clear()
            self._delta_cache.pop("ivf", None)
            self._calibrate_engine("ivf")
        return True

    def search_with_rerank(
        self,
        query,
        k: int = 10,
        oversample: float = 4.0,
        filter: dict | None = None,
        ef: int | None = None,
    ):
        """Quantized first pass + exact f32 rerank (dual-precision search,
        ``native/dual_precision.rs`` / ``search_with_rerank``
        ``index/search.rs:118``): fetch ``oversample*k`` candidates with the
        collection's storage mode (SQ8/binary/…), rescore them in f32, keep
        the exact top-k. Highest win on quantized collections."""
        return self.search_batch_with_rerank(
            [query], k, oversample=oversample, filter=filter, ef=ef
        )[0]

    def search_batch_with_rerank(
        self,
        queries,
        k: int = 10,
        oversample: float = 4.0,
        filter: dict | None = None,
        ef: int | None = None,
        quality: SearchQuality | str | None = None,
    ):
        self.refresh_device()
        q = np.atleast_2d(np.asarray(queries, np.float32))
        m = max(k, int(round(oversample * k)))
        coarse = self.search_batch(
            q, m, filter=filter, ef=ef, quality=quality, _raw=True
        )
        # ONE vectorized hydration of every candidate (the per-id
        # ``retrieve`` loop cost ~B*m host lookups/copies per batch) and
        # host-numpy exact rescoring — zero extra device dispatches
        all_ids = [[r.id for r in row] for row in coarse]
        flat = [vid for ids in all_ids for vid in ids]
        vecs, found = self.vectors.retrieve_batch(flat)
        out = []
        pos = 0
        hib = self.metric.higher_is_better
        for b, row in enumerate(coarse):
            ids = all_ids[b]
            if not ids:
                out.append([])
                continue
            v = vecs[pos : pos + len(ids)]
            f = np.asarray(found[pos : pos + len(ids)], bool)
            pos += len(ids)
            # an id deleted between the coarse pass and hydration comes back
            # as a zero vector (advisor r2: for euclidean a zero vector can
            # OUTRANK real candidates) — drop the misses before rescoring
            if not f.all():
                keep = np.flatnonzero(f)
                if keep.size == 0:
                    out.append([])
                    continue
                v = v[keep]
                ids = [ids[int(j)] for j in keep]
                row = [row[int(j)] for j in keep]
            scores = _host_scores(q[b], v, self.metric)
            order = np.argsort(-scores if hib else scores)
            out.append(
                [
                    SearchResult(
                        id=ids[j],
                        score=float(scores[j]),
                        payload=row[j]["payload"],
                    )
                    for j in order[:k]
                ]
            )
        return out

    def search_batch_with_filters(
        self,
        queries,
        k: int = 10,
        filters: list[dict | None] | None = None,
        ef: int | None = None,
        quality=None,
    ):
        """Batched search with PER-QUERY filters (``search/batch.rs`` batch
        search with per-query filters). Queries sharing a filter run as one
        device batch; distinct filters become separate batches."""
        q = np.atleast_2d(np.asarray(queries, np.float32))
        if filters is None:
            return self.search_batch(q, k, ef=ef, quality=quality)
        if len(filters) != q.shape[0]:
            raise ValueError("filters/queries length mismatch")
        groups: dict[str, list[int]] = {}
        for i, f in enumerate(filters):
            groups.setdefault(json.dumps(f, sort_keys=True, default=str), []).append(i)
        out: list = [None] * q.shape[0]
        for key, idxs in groups.items():
            res = self.search_batch(
                q[idxs], k, filter=filters[idxs[0]], ef=ef, quality=quality
            )
            for slot, row in zip(idxs, res):
                out[slot] = row
        return out

    def multi_query_search(
        self,
        queries,
        k: int = 10,
        strategy="rrf",
        weights=None,
        filter: dict | None = None,
        ef: int | None = None,
    ):
        """Fuse several query vectors into ONE result list
        (``multi_query_search`` with FusionStrategy, ``search/batch.rs:231``)."""
        from velesdb_tpu.fusion import FusionStrategy

        strategy = FusionStrategy.parse(strategy)
        per_query = self.search_batch(queries, max(2 * k, k), filter=filter, ef=ef)
        fused = strategy.fuse(
            [[(r.id, r.score) for r in row] for row in per_query],
            k,
            weights=weights,
        )
        return [
            SearchResult(id=vid, score=score, payload=self.payloads.retrieve(vid))
            for vid, score in fused
        ]

    # -- result cache (cache/ analog) ----------------------------------------

    def enable_result_cache(self, capacity: int = 512) -> None:
        from velesdb_tpu.cache import SearchResultCache

        self._result_cache = SearchResultCache(capacity)

    def cache_stats(self) -> dict | None:
        return self._result_cache.stats() if self._result_cache else None

    # -- maintenance -----------------------------------------------------------

    def expire_rows(self, now: float | None = None) -> int:
        """Delete TTL-expired rows; returns count (ColumnStore TTL analog)."""
        now = time.time() if now is None else now
        dead = [vid for vid, exp in self._ttl.items() if exp <= now]
        for vid in dead:
            self._ttl.pop(vid, None)
            self.delete(vid)
        if dead:
            self._ttl_dirty = True
        self._flush_ttl()
        return len(dead)

    def configure_auto_vacuum(
        self,
        interval_s: float = 60.0,
        fragmentation_threshold: float = 0.3,
        enabled: bool = True,
    ) -> None:
        """Auto-vacuum policy (``AutoVacuumConfig``, ``types.rs:258``):
        on device refresh, expire TTL rows every ``interval_s`` and compact
        when fragmentation exceeds the threshold."""
        self._auto_vacuum = (
            {"interval_s": interval_s, "threshold": fragmentation_threshold}
            if enabled
            else None
        )

    def _maybe_auto_vacuum(self) -> None:
        if self._auto_vacuum is None:
            return
        now = time.time()
        if now - self._last_auto_vacuum < self._auto_vacuum["interval_s"]:
            return
        self._last_auto_vacuum = now
        self.expire_rows(now)
        if self.vectors.fragmentation_ratio > self._auto_vacuum["threshold"]:
            self.vacuum()

    def vacuum(self) -> dict:
        """Compact tombstoned slots and rebuild slot-keyed indexes
        (``index/vacuum.rs`` + ``compaction.rs`` analog)."""
        with self._lock:
            reclaimed = self.vectors.vacuum()
            if reclaimed:
                # slot numbers changed: all slot-keyed state must rebuild —
                # including the ANN delta (its slot ids are now meaningless)
                self.columns = ColumnStore()
                self.columns.set_id_source(self.vectors.occupancy)
                self._columns_built = False
                self.text_index = None
                self.trigram_index = None
                self._text_built = False
                for st in self._stale.values():
                    st.clear()
                self._delta_cache.clear()
                if self.ann is not None:
                    self.ann.invalidate()
                if self.ivf is not None:
                    self.ivf.invalidate()
                self._on_mutation([])
            return {
                "reclaimed_slots": reclaimed,
                "fragmentation": self.vectors.fragmentation_ratio,
            }

    def _ensure_columns(self) -> None:
        """Lazily populate the column store from the payload log (cold open)."""
        if self._columns_built:
            return
        for vid, payload in self.payloads.payloads.items():
            slot = self.vectors.id_to_slot.get(vid)
            if slot is not None:
                self.columns.upsert_row(slot, payload)
        self._columns_built = True

    def _filter_mask(self, filt):
        mask = self._raw_filter_mask(filt)
        if mask is None:
            return None
        used = max(self.vectors.used_slots, 1)
        return _pad_mask(mask, self._brute.n_pad or used)

    def _raw_filter_mask(self, filt):
        """``[used_slots] bool`` mask for a filter dict (unpadded)."""
        if filt is None:
            return None
        self._ensure_columns()
        used = max(self.vectors.used_slots, 1)
        return self.columns.mask_for_filter(filt, used)

    # -- text + hybrid search (parity with collection/search/text.rs) -------

    def _index_text(self, slot: int, payload) -> None:
        from velesdb_tpu.text.tokenizer import extract_text

        text = extract_text(payload) if payload is not None else ""
        if text:
            self.text_index.add_document(slot, text)
            self.trigram_index.add_document(slot, text)
        else:
            self.text_index.remove_document(slot)
            self.trigram_index.remove_document(slot)

    def _ensure_text(self) -> None:
        """Lazily build BM25 + trigram indexes from the payload log (the
        reference indexes payload strings at upsert, ``crud.rs:19-128``; we
        defer to first text query so vector-only workloads pay nothing)."""
        if self._text_built:
            return
        from velesdb_tpu.text.bm25 import Bm25Index
        from velesdb_tpu.text.trigram import TrigramIndex

        self.text_index = Bm25Index()
        self.trigram_index = TrigramIndex()
        self._text_built = True
        for vid, payload in self.payloads.payloads.items():
            slot = self.vectors.id_to_slot.get(vid)
            if slot is not None:
                self._index_text(slot, payload)

    def text_search(self, query: str, k: int = 10, filter: dict | None = None):
        """BM25 full-text search (``text_search``, ``search/text.rs``)."""
        return self.text_search_batch([query], k, filter=filter)[0]

    def text_search_batch(self, queries, k: int = 10, filter: dict | None = None):
        self._ensure_text()
        used = max(self.vectors.used_slots, 1)
        mask = self._raw_filter_mask(filter)
        vals, slots = self.text_index.search_batch(
            list(queries), k, used, mask=mask
        )
        slot_ids, _ = self.vectors.occupancy()
        self._slot_ids = slot_ids
        out = []
        for b in range(vals.shape[0]):
            row = []
            for v, s in zip(vals[b], slots[b]):
                if s < 0 or v <= 0 or s >= slot_ids.shape[0]:
                    continue
                vid = int(slot_ids[s])
                if vid < 0:
                    continue
                row.append(
                    SearchResult(
                        id=vid, score=float(v), payload=self.payloads.retrieve(vid)
                    )
                )
            out.append(row)
        return out

    def hybrid_search(
        self,
        query_vector,
        query_text: str,
        k: int = 10,
        vector_weight: float = 0.5,
        filter: dict | None = None,
    ):
        """Vector + BM25 fusion via weighted RRF (k=60), fetching 2k from
        each branch (``hybrid_search``, ``search/text.rs:113-221``). Rides
        the fused single-readback batch path."""
        return self.hybrid_search_batch(
            [query_vector], [query_text], k,
            vector_weight=vector_weight, filter=filter,
        )[0]

    def hybrid_search_batch(
        self,
        query_vectors,
        query_texts,
        k: int = 10,
        vector_weight: float = 0.5,
        filter: dict | None = None,
    ):
        """Batched vector + BM25 fusion (weighted RRF k=60) — the TPU-native
        hybrid serving path (the reference fans rayon tasks per query,
        ``search/batch.rs:231``; here the batch IS the parallelism). Both
        branches stay device-resident and fuse in a jitted RRF program
        (:mod:`velesdb_tpu.ops.fused_rrf`), so the whole hybrid batch pays
        ONE readback RTT and one filter-mask evaluation instead of two of
        each plus a host fusion loop. Used by the hybrid throughput
        benchmark (BASELINE config #4).

        Quantized collections with :attr:`auto_rerank` keep the host-fused
        two-branch form: their vector branch is the host-f32 rerank pass,
        which reads back by construction."""
        if not self._hybrid_fused_ok:
            return self._hybrid_host_fused(
                query_vectors, query_texts, k, vector_weight, filter
            )
        return self._hybrid_fused_batch(
            query_vectors, query_texts, k,
            w_vec=vector_weight, w_txt=1.0 - vector_weight, filter=filter,
        )

    @property
    def _hybrid_fused_ok(self) -> bool:
        """Quantized collections with :attr:`auto_rerank` can't device-fuse:
        their vector branch is the host-f32 rerank pass."""
        return not (
            self.auto_rerank
            and self.storage_mode in (StorageMode.SQ8, StorageMode.BINARY)
        )

    def _hybrid_fused_batch(self, query_vectors, query_texts, k, *, w_vec,
                            w_txt, filter, ef=None, quality=None,
                            rrf_k=None, fetch=None):
        """Device-fused hybrid core: vector engine + BM25 scorer outputs stay
        on device, one jitted RRF (:mod:`velesdb_tpu.ops.fused_rrf`), one
        readback. ``rrf_k=None`` = the reference's 60; explicit values serve
        VelesQL ``USING FUSION RRF`` (where both weights are 1)."""
        import jax as _jax
        import jax.numpy as jnp

        from velesdb_tpu.ops.fused_rrf import rrf_fuse_topk

        if fetch is None:
            fetch = max(2 * k, k)
        fetch = max(fetch, k)
        self.refresh_device()
        self._ensure_text()
        q = np.atleast_2d(np.asarray(query_vectors, dtype=np.float32))
        if q.shape[1] != self.dim:
            raise ValueError(
                f"dimension mismatch: expected {self.dim}, got {q.shape[1]}"
            )
        raw_mask = self._raw_filter_mask(filter)
        mask = None
        if raw_mask is not None:
            used = max(self.vectors.used_slots, 1)
            mask = _pad_mask(raw_mask, self._brute.n_pad or used)
        got = self._hybrid_mono_dispatch(
            q, query_texts, k, fetch, raw_mask, mask,
            w_vec=w_vec, w_txt=w_txt, rrf_k=rrf_k, ef=ef, quality=quality,
        )
        if got is not None:
            fused_vals, fused_idx = got
            slot_ids, _ = self.vectors.occupancy()
            self._slot_ids = slot_ids
            fused_vals, fused_idx = _jax.device_get((fused_vals, fused_idx))
            return self._hydrate(
                np.asarray(fused_vals), np.asarray(fused_idx), k
            )
        v_vals, v_idx, _engine, _sig, _t0 = self._search_device(
            q, fetch, mask, ef, quality
        )
        used = max(self.vectors.used_slots, 1)
        txt = self.text_index.search_batch_dev(
            list(query_texts), fetch, used, mask=raw_mask
        )
        if txt is None:  # no term hits: vector ranks alone (host parity)
            t_vals = jnp.zeros((q.shape[0], fetch), jnp.float32)
            t_idx = jnp.full((q.shape[0], fetch), -1, jnp.int32)
        else:
            t_vals, t_idx = txt
        slot_ids, _ = self.vectors.occupancy()
        self._slot_ids = slot_ids
        fused_vals, fused_idx = rrf_fuse_topk(
            v_vals, v_idx, t_vals, t_idx,
            jnp.float32(w_vec), jnp.float32(w_txt),
            None if rrf_k is None else jnp.float32(rrf_k),
            k=k,
        )
        fused_vals, fused_idx = _jax.device_get((fused_vals, fused_idx))
        return self._hydrate(
            np.asarray(fused_vals), np.asarray(fused_idx), k
        )

    def _hybrid_mono_dispatch(self, q, query_texts, k, fetch, raw_mask,
                              mask, *, w_vec, w_txt, rrf_k, ef, quality):
        """Serve the hybrid query as ONE jitted program when the vector
        branch would run the exact FULL-precision engine (the common case;
        `ops/hybrid_mono.py`). Returns device ``(vals, idx)`` or ``None``
        to fall through to the 3-program form (ANN engines, quantized
        storage, explicit ef/quality, empty text index).

        Why: the 3-program form pays a per-array H2D plus a per-program
        dispatch wall through the tunnel — ~5 round trips/batch measured
        while device compute is ~1ms (docs/BENCHMARKS.md hybrid stage
        decomposition). Here every host input ships in ONE ``device_put``
        and the device side is one dispatch + the one [B, k] readback."""
        if ef is not None or quality is not None:
            return None
        if self.storage_mode is not StorageMode.FULL:
            return None
        if self.index_kind in ("graph", "ivf"):
            return None
        engine = "exact"
        if self.metric in _ANN_METRICS:
            engine = self._choose_engine(
                q.shape[0], None, SearchQuality.BALANCED.ef
            )
        if engine != "exact":
            return None
        brute = self._brute
        core = brute.serve_engine(fetch)
        assist = None
        statics = {}
        if core == "streamed-scan":
            vector_core = "streamed"
        elif core == "fused-xla":
            vector_core = "fused"
        elif core in ("int8-assist-pd", "int8-assist-pd-xla",
                      "int8-assist", "int8-assist-xla"):
            # the D<512 exact serve defaults — compose the SAME shadow
            # arrays + statics brute.search would dispatch with (mirrors
            # index/brute.py lines ~698-814; masks apply in-program)
            import jax as _jax

            from velesdb_tpu.index.brute import _bucket_safe
            from velesdb_tpu.ops.bucket_kernel import bucket_chunk_for

            b_pad = ((max(q.shape[0], 8) + 7) // 8) * 8
            d_pad = ((self.dim + 127) // 128) * 128
            chunk_i8 = min(
                bucket_chunk_for(b_pad, d_pad, 1, brute.n_pad), brute.n_pad
            )
            m = min(max(2 * fetch - 4, 16), 256)
            if m < fetch or not _bucket_safe(brute.n_pad, chunk_i8, m):
                return None
            statics = {"m": m, "chunk": chunk_i8, "dim": self.dim}
            if core == "int8-assist-pd":
                from velesdb_tpu.ops.bucket_kernel import sq8pd_ptile

                rows_pd, pen_int, _pf, sdim, _mid, qu = brute._assist_pd
                ptile = brute._pd_ptile.get(chunk_i8)
                if ptile is None:
                    ptile = _jax.device_put(sq8pd_ptile(pen_int, chunk_i8))
                    brute._pd_ptile[chunk_i8] = ptile
                assist = (rows_pd, ptile, sdim, qu)
                vector_core = "assist-pd"
            elif core == "int8-assist-pd-xla":
                rows_pd, _pi, pen_f32, sdim, _mid, qu = brute._assist_pd
                assist = (rows_pd, pen_f32, sdim, qu)
                vector_core = "assist-pd-xla"
            else:
                assist = brute._assist  # (rows8, scale, minv, pen)
                vector_core = (
                    "assist" if core == "int8-assist" else "assist-xla"
                )
        else:
            return None
        used = max(self.vectors.used_slots, 1)
        prep = self.text_index.prep_batch(list(query_texts), used)
        if prep is None:
            return None
        bid, wt = prep
        ti = self.text_index
        mask_t = None
        if raw_mask is not None:
            m = np.asarray(raw_mask, bool)
            mask_t = (
                np.pad(m, (0, ti.n_pad - m.shape[0]))
                if m.shape[0] < ti.n_pad else m[: ti.n_pad]
            )
        try:
            import jax as _jax
            import jax.numpy as jnp

            from velesdb_tpu.ops.hybrid_mono import hybrid_mono_topk

            # ONE staged transfer for every host input (per-array puts pay
            # a tunnel round trip each — the measured hybrid floor)
            host_inputs = [
                q.astype(np.float32, copy=False), bid, wt,
                np.float32(w_vec),
            ]
            slots = {"q": 0, "bid": 1, "wt": 2, "w_vec": 3}
            if mask is not None:
                slots["mask_v"] = len(host_inputs)
                host_inputs.append(np.asarray(mask, bool))
            if mask_t is not None:
                slots["mask_t"] = len(host_inputs)
                host_inputs.append(mask_t)
            if w_txt is not None:
                slots["w_txt"] = len(host_inputs)
                host_inputs.append(np.float32(w_txt))
            if rrf_k is not None:
                slots["rrf_k"] = len(host_inputs)
                host_inputs.append(np.float32(rrf_k))
            staged = _jax.device_put(tuple(host_inputs))
            return hybrid_mono_topk(
                staged[slots["q"]],
                brute._full,
                brute._valid,
                brute._full_sqnorm,
                staged[slots["mask_v"]] if "mask_v" in slots else None,
                ti._block_docs,
                ti._block_scores,
                staged[slots["bid"]],
                staged[slots["wt"]],
                staged[slots["mask_t"]] if "mask_t" in slots else None,
                staged[slots["w_vec"]],
                staged[slots["w_txt"]] if "w_txt" in slots else None,
                staged[slots["rrf_k"]] if "rrf_k" in slots else None,
                assist,
                k=k,
                fetch=fetch,
                metric=self.metric,
                n_pad_t=ti.n_pad,
                vector_core=vector_core,
                **statics,
            )
        except Exception as e:  # compile/lowering failure: 3-program form
            from velesdb_tpu.ops.demotions import record_demotion

            record_demotion("hybrid-mono", e)
            return None

    def _hybrid_host_fused(self, query_vectors, query_texts, k,
                           vector_weight, filter):
        """Two-branch host-fused hybrid (the pre-r4 path): serves quantized
        collections whose vector branch IS a host rerank pass."""
        from velesdb_tpu.fusion import weighted_rrf

        fetch = max(2 * k, k)
        vec_rows = self.search_batch(query_vectors, fetch, filter=filter)
        txt_rows = self.text_search_batch(list(query_texts), fetch,
                                          filter=filter)
        out = []
        for vec_hits, txt_hits in zip(vec_rows, txt_rows):
            fused = weighted_rrf(
                [(r.id, r.score) for r in vec_hits],
                [(r.id, r.score) for r in txt_hits],
                k,
                vector_weight=vector_weight,
            )
            out.append(
                [
                    SearchResult(
                        id=vid, score=score,
                        payload=self.payloads.retrieve(vid),
                    )
                    for vid, score in fused
                ]
            )
        return out

    def like_mask(self, pattern: str, case_insensitive: bool = False):
        """``[used_slots] bool`` mask of payload texts matching LIKE pattern
        (trigram-pruned; feeds predicate pushdown)."""
        self._ensure_text()
        used = max(self.vectors.used_slots, 1)
        return self.trigram_index.match_mask(
            pattern, used, case_insensitive=case_insensitive
        )

    def _hydrate(self, vals: np.ndarray, idx: np.ndarray, k: int):
        """Map device slot indices back to user ids + payloads (host-side;
        parity with ``search/vector.rs:30-60`` hydration)."""
        out = []
        slot_ids = self._slot_ids
        for b in range(vals.shape[0]):
            row = []
            for j in range(vals.shape[1]):
                slot = int(idx[b, j])
                if slot < 0 or slot >= slot_ids.shape[0]:
                    continue
                vid = int(slot_ids[slot])
                if vid < 0 or not np.isfinite(vals[b, j]):
                    continue
                row.append(
                    SearchResult(
                        id=vid,
                        score=float(vals[b, j]),
                        payload=self.payloads.retrieve(vid),
                    )
                )
                if len(row) == k:
                    break
            out.append(row)
        return out

    # -- knowledge graph (parity with collection/graph/, match_exec.rs) -----

    def ensure_graph(self):
        """Lazily build graph state: node indexes from payloads, edges from
        ``edges.npz`` (``Database::load_collections`` graph analog)."""
        if self.graph is None:
            from velesdb_tpu.graph import CollectionGraph

            g = CollectionGraph()
            g.load_edges(self.path)
            for vid, payload in self.payloads.payloads.items():
                if vid in self.vectors.id_to_slot:
                    g.index_node(vid, payload)
            self.graph = g
        return self.graph

    def add_node(
        self,
        node_id: int,
        labels=(),
        properties: dict | None = None,
        vector=None,
    ) -> None:
        """Insert a graph node: payload = properties + reserved ``_labels``;
        vector defaults to zeros (graph-only nodes still live in slot space)."""
        from velesdb_tpu.graph import LABELS_KEY

        payload = dict(properties or {})
        payload[LABELS_KEY] = list(labels)
        vec = (
            np.zeros(self.dim, np.float32)
            if vector is None
            else np.asarray(vector, np.float32)
        )
        self.upsert(node_id, vec, payload)

    def add_edge(
        self, src: int, dst: int, label: str, properties: dict | None = None
    ) -> int:
        g = self.ensure_graph()
        for node in (src, dst):
            if int(node) not in self.vectors.id_to_slot:
                raise KeyError(f"node {node} not found")
        return g.edges.add_edge(src, dst, label, properties)

    def get_edges(self, node: int, direction: str = "out", label: str | None = None):
        return self.ensure_graph().edges.edges_of(node, direction, label)

    def neighbors(self, node: int, direction: str = "out", label: str | None = None):
        return self.ensure_graph().edges.neighbors(node, direction, label)

    def degree(self, node: int, direction: str = "out") -> int:
        return self.ensure_graph().edges.degree(node, direction)

    def traverse(
        self,
        start: int,
        max_depth: int = 3,
        direction: str = "out",
        label: str | None = None,
    ):
        """BFS traversal with guardrails (``graph/streaming.rs:247``)."""
        from velesdb_tpu.graph import traverse as _traverse

        return _traverse(
            self.ensure_graph().edges,
            start,
            direction=direction,
            label=label,
            max_depth=max_depth,
        )

    def execute_match(self, match_text: str, params: dict | None = None):
        """Cypher-ish MATCH over this collection (``match_exec.rs:104``)."""
        from velesdb_tpu.graph import execute_match as _exec

        return _exec(self, match_text, params)

    # -- durability --------------------------------------------------------

    def flush(self) -> None:
        with self._lock:
            self.vectors.flush()
            self.payloads.flush()
            self._flush_ttl()
            if self.graph is not None:
                self.graph.save(self.path)

    def close(self) -> None:
        with self._lock:
            self._flush_ttl()
            if self.graph is not None:
                self.graph.save(self.path)
            self.vectors.close()
            self.payloads.close()

    def info(self) -> dict[str, Any]:
        out = {
            "name": self.name,
            "dim": self.dim,
            "metric": self.metric.value,
            "storage_mode": self.storage_mode.value,
            "collection_type": self.collection_type,
            "count": self.count(),
        }
        # which exact kernel a plain search dispatches to (r3e: the serve
        # default is state-dependent — int8-assist needs its shadow built,
        # and sticky Mosaic kill-switches can demote)
        out["exact_serve"] = self._brute.serve_engine()
        err = getattr(self, "last_calibration_error", None)
        if err is not None:
            # a failed calibration probe means the planner recall gate is
            # flying blind for this collection — surface it (r3d: a silent
            # failure disabled the gate for a whole session)
            out["last_calibration_error"] = err
        # sticky kernel kill-switch trips (process-wide): mirror the
        # calibration-error surfacing so demoted serving is never silent
        from velesdb_tpu.ops.demotions import demotions

        dem = demotions()
        if dem:
            out["kernel_demotions"] = dem
        return out


def _host_scores(q: np.ndarray, vecs: np.ndarray, metric: DistanceMetric):
    """Exact f32 scores of one query against a few candidate rows, computed
    in numpy — rerank batches are tiny (k*oversample rows), so host math
    beats a device dispatch by the full tunnel round trip."""
    dots = vecs @ q
    if metric is DistanceMetric.DOT_PRODUCT:
        return dots
    if metric is DistanceMetric.COSINE:
        denom = np.linalg.norm(vecs, axis=1) * max(np.linalg.norm(q), 1e-30)
        return np.where(denom > 1e-30, dots / np.maximum(denom, 1e-30), 0.0)
    if metric is DistanceMetric.EUCLIDEAN:
        return np.linalg.norm(vecs - q[None, :], axis=1)
    # remaining metrics (hamming/jaccard surrogates) route through the
    # generic scorer on device
    import jax.numpy as jnp

    from velesdb_tpu.ops import pairwise_scores

    return np.asarray(pairwise_scores(jnp.asarray(q)[None, :], jnp.asarray(vecs), metric))[0]


def _pad_mask(mask: np.ndarray, n_pad: int) -> np.ndarray:
    if mask.shape[0] >= n_pad:
        return mask[:n_pad]
    return np.pad(mask, (0, n_pad - mask.shape[0]))
