"""BM25 full-text scoring as device postings-block scatter-add.

TPU re-architecture of the reference's inverted index (``Bm25Index``,
``index/bm25.rs:79``: HashMap<term, PostingList> walked doc-by-doc with a
scoring heap, k1=1.2 b=0.75). Here the per-(term, doc) BM25 contribution is
**precomputed at index time** — it does not depend on the query beyond term
identity::

    score(q, d) = sum_{t in q} idf(t) * tf(t,d)*(k1+1) / (tf + k1*(1-b+b*len_d/avg_len))

so the postings lists flatten into fixed-size *blocks* of (doc_slot,
contribution) pairs. A query batch becomes:

1. host: tokenize, look up each query's terms' block ranges (dict lookups),
   pad to a rectangular ``[B, L]`` block-id matrix;
2. device (one jitted program): gather blocks -> ``[B, L, BLOCK]`` docs +
   scores, weight by per-query term multiplicity, scatter-add into a dense
   ``[B, N_pad]`` score matrix, masked top-k.

The heap walk becomes one gather + one scatter + one ``lax.top_k`` — all
batched, all fixed-shape. IDF uses the reference's BM25+ style formulation
``ln(1 + (N - df + 0.5)/(df + 0.5))``.
"""

from __future__ import annotations

import functools
import math
import threading
from collections import Counter, defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from velesdb_tpu.text.tokenizer import extract_text, tokenize

__all__ = ["Bm25Index", "BLOCK", "bm25_score_blocks"]

BLOCK = 128  # postings per device block (lane width)

K1 = 1.2
B = 0.75


class Bm25Index:
    """Full-text index: host postings builder + device block scorer.

    Mutations mark the index dirty; ``refresh()`` (cheap, incremental in
    spirit but rebuild-based like the ANN index) re-flattens postings into
    device blocks. Parity surface: ``add_document`` (``bm25.rs:133``),
    ``remove_document``, ``search`` (``bm25.rs:269``).
    """

    def __init__(self):
        self._docs: dict[int, Counter] = {}  # slot -> term counts
        self._doc_len: dict[int, int] = {}
        # guards _docs/_doc_len: refresh() snapshots under it while writer
        # threads mutate (concurrent text_search + upsert raced on dict
        # iteration otherwise)
        self._mut = threading.Lock()
        self._dirty = True
        # device state
        self._vocab: dict[str, int] = {}
        self._term_blocks: list[tuple[int, int]] = []  # term_id -> (start, count)
        self._idf: np.ndarray | None = None
        self._block_docs = None  # [NB, BLOCK] int32 device, -1 pad
        self._block_scores = None  # [NB, BLOCK] f32 device (idf included)
        self.n_pad = 0

    # -- mutation (host) -----------------------------------------------------

    def add_document(self, slot: int, text: str) -> None:
        toks = tokenize(text)
        if not toks:
            self.remove_document(slot)
            return
        with self._mut:
            self._docs[slot] = Counter(toks)
            self._doc_len[slot] = len(toks)
            self._dirty = True

    def add_payload(self, slot: int, payload) -> None:
        self.add_document(slot, extract_text(payload))

    def remove_document(self, slot: int) -> None:
        with self._mut:
            if self._docs.pop(slot, None) is not None:
                self._doc_len.pop(slot, None)
                self._dirty = True

    def invalidate(self, _ids=None) -> None:
        self._dirty = True

    def __len__(self) -> int:
        return len(self._docs)

    @property
    def dirty(self) -> bool:
        return self._dirty

    # -- build (host -> device) ----------------------------------------------

    def refresh(self, n_slots: int) -> None:
        """Flatten postings into device blocks over ``n_slots`` doc slots."""
        if not self._dirty:
            return
        self.n_pad = 1 << max(7, (max(n_slots, 1) - 1).bit_length())
        with self._mut:
            # cleared BEFORE the build so a mutation DURING it re-dirties
            # (r4 race fix); a FAILED build must restore it (below) or the
            # index would serve the stale blocks forever (code-review r4)
            self._dirty = False
            docs = dict(self._docs)
            doc_len = dict(self._doc_len)
        try:
            self._build_blocks(docs, doc_len)
        except BaseException:
            with self._mut:
                self._dirty = True
            raise

    def _build_blocks(self, docs: dict, doc_len: dict) -> None:
        n_docs = len(docs)
        if n_docs == 0:
            self._vocab = {}
            self._term_blocks = []
            self._block_docs = None
            return
        avg_len = sum(doc_len.values()) / n_docs

        postings: dict[str, list[tuple[int, float]]] = defaultdict(list)
        for slot, counts in docs.items():
            dl = doc_len[slot]
            norm = K1 * (1.0 - B + B * dl / avg_len)
            for term, tf in counts.items():
                postings[term].append((slot, tf * (K1 + 1.0) / (tf + norm)))

        vocab = {t: i for i, t in enumerate(sorted(postings))}
        idf = np.empty(len(vocab), np.float32)
        docs_blocks: list[np.ndarray] = []
        score_blocks: list[np.ndarray] = []
        term_blocks: list[tuple[int, int]] = []
        for term, tid in vocab.items():
            plist = postings[term]
            df = len(plist)
            idf[tid] = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            start = len(docs_blocks)
            arr = np.asarray(plist, np.float64)
            d = arr[:, 0].astype(np.int32)
            s = (arr[:, 1] * idf[tid]).astype(np.float32)
            for off in range(0, len(d), BLOCK):
                dd = d[off : off + BLOCK]
                ss = s[off : off + BLOCK]
                pad = BLOCK - len(dd)
                docs_blocks.append(np.pad(dd, (0, pad), constant_values=-1))
                score_blocks.append(np.pad(ss, (0, pad)))
            term_blocks.append((start, len(docs_blocks) - start))
        self._vocab = vocab
        self._idf = idf
        self._term_blocks = term_blocks
        # +1 sentinel zero-block so padded block-ids gather harmlessly
        docs_blocks.append(np.full(BLOCK, -1, np.int32))
        score_blocks.append(np.zeros(BLOCK, np.float32))
        self._block_docs = jax.device_put(jnp.asarray(np.stack(docs_blocks)))
        self._block_scores = jax.device_put(jnp.asarray(np.stack(score_blocks)))

    # -- query ---------------------------------------------------------------

    def search_batch(self, queries: list[str], k: int, n_slots: int, mask=None):
        """Batched BM25 top-k. Returns ``(scores [B, k], slots [B, k])``;
        empty slots are ``-1``. ``mask [>=n_slots] bool`` optionally restricts
        results (ColumnStore pushdown — replaces the reference's post-filter).
        """
        got = self.search_batch_dev(queries, k, n_slots, mask=mask)
        if got is None:
            b = len(queries)
            return (np.zeros((b, k), np.float32), np.full((b, k), -1, np.int64))
        # one round trip for both outputs (sequential np.asarray calls
        # each pay a tunnel RTT — see collection.search_batch, r3c)
        vals, slots = jax.device_get(got)
        return np.asarray(vals), np.asarray(slots, np.int64)

    def prep_batch(self, queries: list[str], n_slots: int):
        """Host half of a batched query: tokenize + postings-block lookup,
        padded to a rectangular ``(block_ids [B, L], weights [B, L])`` numpy
        pair, or ``None`` when no query term hits the vocabulary / the index
        is empty. The mono-fused hybrid path stages these with the query
        vectors in ONE ``device_put`` and feeds :func:`bm25_score_blocks`
        inside its single program."""
        self.refresh(n_slots)
        if self._block_docs is None:
            return None
        sentinel = self._block_docs.shape[0] - 1
        rows: list[list[int]] = []
        weights: list[list[float]] = []
        for q in queries:
            blocks: list[int] = []
            wts: list[float] = []
            for term, qtf in Counter(tokenize(q)).items():
                tid = self._vocab.get(term)
                if tid is None:
                    continue
                start, count = self._term_blocks[tid]
                blocks.extend(range(start, start + count))
                wts.extend([float(qtf)] * count)
            rows.append(blocks)
            weights.append(wts)
        max_l = max((len(r) for r in rows), default=0)
        if max_l == 0:
            return None
        b = len(queries)
        l_pad = 1 << (max_l - 1).bit_length()
        bid = np.full((b, l_pad), sentinel, np.int32)
        wt = np.zeros((b, l_pad), np.float32)
        for i, (r, w) in enumerate(zip(rows, weights)):
            bid[i, : len(r)] = r
            wt[i, : len(w)] = w
        return bid, wt

    def search_batch_dev(self, queries: list[str], k: int, n_slots: int,
                         mask=None):
        """Device-resident batched BM25 top-k: ``(scores, slots)`` as DEVICE
        arrays (``slots == -1`` for empty), or ``None`` when no query term
        hits the vocabulary / the index is empty. The fused hybrid path
        composes this with the vector engine's device output and an
        on-device RRF — no per-branch readback RTT."""
        prep = self.prep_batch(queries, n_slots)
        if prep is None:
            return None
        bid, wt = prep
        mask_dev = None
        if mask is not None:
            m = np.asarray(mask, bool)
            m = np.pad(m, (0, self.n_pad - m.shape[0])) if m.shape[0] < self.n_pad else m[: self.n_pad]
            mask_dev = jnp.asarray(m)
        return _bm25_score(
            jnp.asarray(bid),
            jnp.asarray(wt),
            self._block_docs,
            self._block_scores,
            mask_dev,
            n_pad=self.n_pad,
            k=k,
        )

    def search(self, query: str, k: int, n_slots: int, mask=None):
        """Single query -> ``[(slot, score), ...]`` best-first (``bm25.rs:269``)."""
        vals, slots = self.search_batch([query], k, n_slots, mask=mask)
        return [
            (int(s), float(v)) for s, v in zip(slots[0], vals[0]) if s >= 0 and v > 0
        ]


@functools.partial(jax.jit, static_argnames=("n_pad", "k"))
def _bm25_score(block_ids, block_wt, block_docs, block_scores, mask, *, n_pad, k):
    """Gather postings blocks, scatter-add into dense scores, top-k.

    ``block_ids [B, L]`` (sentinel-padded), ``block_wt [B, L]`` per-block query
    weight (term multiplicity), blocks ``[NB, BLOCK]``.
    """
    docs = block_docs[block_ids]  # [B, L, BLOCK]
    scores = block_scores[block_ids] * block_wt[:, :, None]
    b = block_ids.shape[0]
    flat_docs = jnp.where(docs >= 0, docs, n_pad).reshape(b, -1)  # pad row -> n_pad
    flat_scores = jnp.where(docs >= 0, scores, 0.0).reshape(b, -1)
    dense = jnp.zeros((b, n_pad + 1), jnp.float32)
    dense = dense.at[jnp.arange(b)[:, None], flat_docs].add(flat_scores)
    dense = dense[:, :n_pad]
    if mask is not None:
        dense = jnp.where(mask[None, :], dense, 0.0)
    vals, idx = jax.lax.top_k(dense, k)
    return vals, jnp.where(vals > 0.0, idx, -1)


# public name for cross-module composition (the mono-fused hybrid program
# traces this inline alongside the vector scan; ops/hybrid_mono.py)
bm25_score_blocks = _bm25_score
