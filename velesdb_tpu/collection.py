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
from typing import Any, Iterable

import numpy as np

from velesdb_tpu.index.brute import BruteForceIndex
from velesdb_tpu.ops import DistanceMetric, StorageMode
from velesdb_tpu.storage.payload_log import PayloadLog
from velesdb_tpu.storage.vector_store import VectorStore

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
        # set by later layers (ANN index, column store, text indexes, graph)
        self.ann = None
        self.columns = None
        self.text_index = None
        self.graph = None

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

    def upsert(self, vid: int, vector, payload: dict | None = None) -> None:
        """Validate dim -> store vector -> store payload -> mark device dirty
        (reference pipeline ``crud.rs:19-128``; quantization and text indexing
        happen lazily at device refresh instead of per-row)."""
        vec = np.asarray(vector, dtype=np.float32)
        if vec.shape != (self.dim,):
            raise ValueError(
                f"dimension mismatch: expected {self.dim}, got {vec.shape}"
            )
        with self._lock:
            self.vectors.store(int(vid), vec)
            if payload is not None:
                self.payloads.store(int(vid), payload)
            self._on_mutation([int(vid)])

    def upsert_bulk(
        self, ids: Iterable[int], vectors, payloads: Iterable[dict] | None = None
    ) -> None:
        """Bulk variant (``crud.rs:175``)."""
        vecs = np.asarray(vectors, dtype=np.float32)
        ids = [int(i) for i in ids]
        if vecs.ndim != 2 or vecs.shape[1] != self.dim:
            raise ValueError(
                f"dimension mismatch: expected [N, {self.dim}], got {vecs.shape}"
            )
        if len(ids) != vecs.shape[0]:
            raise ValueError("ids and vectors length mismatch")
        with self._lock:
            self.vectors.store_batch(ids, vecs)
            if payloads is not None:
                for vid, payload in zip(ids, payloads):
                    if payload is not None:
                        self.payloads.store(vid, payload)
            self._on_mutation(ids)

    def get(self, vid: int):
        """Fetch ``(vector, payload)`` or None."""
        vec = self.vectors.retrieve(vid)
        if vec is None:
            return None
        return vec, self.payloads.retrieve(vid)

    def delete(self, vid: int) -> bool:
        with self._lock:
            existed = self.vectors.delete(vid)
            self.payloads.delete(vid)
            if existed:
                self._on_mutation([int(vid)])
            return existed

    def count(self) -> int:
        return len(self.vectors)

    def __len__(self) -> int:
        return self.count()

    def _on_mutation(self, ids: list[int]) -> None:
        self._device_dirty = True
        if self.columns is not None:
            self.columns.invalidate(ids)
        if self.text_index is not None:
            self.text_index.invalidate(ids)
        if self.ann is not None:
            self.ann.invalidate(ids)

    # -- device state ------------------------------------------------------

    def refresh_device(self) -> None:
        """Upload the current host slot array as padded device state."""
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

    # -- search (parity with collection/search/vector.rs) ------------------

    def search(self, query, k: int = 10, filter: dict | None = None, ef: int | None = None):
        """Single-query search; returns hydrated results best-first."""
        return self.search_batch([query], k, filter=filter, ef=ef)[0]

    def search_batch(self, queries, k: int = 10, filter: dict | None = None, ef: int | None = None):
        """Batched search — the TPU-native primary path (one MXU pass for the
        whole batch; replaces the reference's rayon ``search_batch_parallel``,
        ``collection/search/batch.rs:154``)."""
        self.refresh_device()
        q = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        if q.shape[1] != self.dim:
            raise ValueError(
                f"dimension mismatch: expected {self.dim}, got {q.shape[1]}"
            )
        mask = self._filter_mask(filter)
        if self.ann is not None and mask is None and ef is not None:
            vals, idx = self.ann.search(q, k, ef=ef)
        else:
            vals, idx = self._brute.search(q, k, mask=mask)
        return self._hydrate(np.asarray(vals), np.asarray(idx), k)

    def _filter_mask(self, filt):
        if filt is None:
            return None
        if self.columns is None:
            raise ValueError("collection has no column store; cannot filter")
        return self.columns.mask_for_filter(filt, self.vectors.used_slots)

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

    # -- durability --------------------------------------------------------

    def flush(self) -> None:
        with self._lock:
            self.vectors.flush()
            self.payloads.flush()

    def close(self) -> None:
        with self._lock:
            self.vectors.close()
            self.payloads.close()

    def info(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "dim": self.dim,
            "metric": self.metric.value,
            "storage_mode": self.storage_mode.value,
            "collection_type": self.collection_type,
            "count": self.count(),
        }
