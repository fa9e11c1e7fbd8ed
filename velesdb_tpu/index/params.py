"""ANN index parameters and quality profiles with auto-tuning.

Counterpart of ``index/hnsw/params.rs`` (``HnswParams::auto``, ``params.rs:40``,
``for_dataset_size`` ``:73``) and the quality profiles of ``index/mod.rs:7-12``
(Fast ef=64 / Balanced ef=128 / Accurate ef=256 / Perfect ef=2048). On TPU the
knobs map to: graph degree (adjacency row width), beam width L (candidate pool)
and expansion count (nodes expanded per query) of the batched beam search.
"""

from __future__ import annotations

import dataclasses
import enum

__all__ = ["SearchQuality", "GraphParams"]


class SearchQuality(str, enum.Enum):
    """Parity with ``SearchQuality`` quality profiles (``index/mod.rs:7-12``)."""

    FAST = "fast"
    BALANCED = "balanced"
    ACCURATE = "accurate"
    PERFECT = "perfect"  # exact (brute force) — ef=2048 in the reference

    @property
    def ef(self) -> int:
        return {
            SearchQuality.FAST: 64,
            SearchQuality.BALANCED: 128,
            SearchQuality.ACCURATE: 256,
            SearchQuality.PERFECT: 2048,
        }[self]

    @property
    def min_recall(self) -> float:
        """Recall bar the profile promises — ANN engines measuring below it
        (post-build calibration probe) are demoted to exact."""
        return {
            SearchQuality.FAST: 0.88,
            SearchQuality.BALANCED: 0.95,
            SearchQuality.ACCURATE: 0.97,
            SearchQuality.PERFECT: 1.0,
        }[self]

    @classmethod
    def parse(cls, v) -> "SearchQuality":
        return v if isinstance(v, cls) else cls(str(v).strip().lower())


@dataclasses.dataclass(frozen=True)
class GraphParams:
    """Build/search parameters of the beam-search graph index.

    ``degree`` plays the role of HNSW's M0 (layer-0 out-degree); ``knn_k`` is
    the forward kNN width before reverse-edge merge (CAGRA-style build:
    exact kNN graph -> reverse-edge augmentation -> degree-capped prune).
    """

    degree: int = 32  # adjacency row width (multiple of 8 for tiling)
    knn_k: int = 16  # forward kNN edges per node
    alpha: float = 1.2  # VAMANA-style diversification factor (prune pass)
    entry_points: int = 16  # per-query beam seeds taken from the seed scan
    entry_probes: int = 2  # router partitions exact-scored for beam entry
    seed_sample: int = 2048  # routing-set size for the dense seed scan
    quantized_traversal: bool = False  # dual-precision beam: score gathers
    # against an SQ8 shadow copy (1/4 the gather bytes), f32-rerank the
    # final pool (``native/dual_precision.rs:33`` analog). Measured r3:
    # capacity play, not a speedup — beam steps are latency-bound.
    traversal_rerank: bool = True  # False = drop the f32 corpus entirely
    # after quantizing (TRUE 4x graph capacity; head rerank skipped, small
    # recall cost recoverable via Collection.search_with_rerank host-side)
    restarts: int = 1  # independent beams per query (multi-restart search):
    # R > 1 splits the ef budget into R sub-beams seeded from disjoint
    # router partitions, merged with dedup. MEASURED RECALL-NEGATIVE at
    # 1M x 128D (ef=128: 0.914 -> 0.864 at R=2; ef=256: 0.943 -> 0.920;
    # even at 2x budget two decorrelated 128-beams lose to one 256-beam)
    # — pool width binds, not basin capture. Kept as an expert knob for
    # other topologies; do not enable by default.
    expand_width: int = 4  # beam candidates expanded per iteration (CAGRA
    # multi-expand). Sequential beam steps = ceil(expansions / expand_width),
    # and each step is a latency-bound gather round trip — wider expansion
    # trades steps for per-step bytes. Measured on the ENTRY-BOUND graphs
    # auto builds (1M x 128D ef=128 b=16): ew 4 -> 16 is 2.28K -> 2.92K QPS
    # (+28%) at IDENTICAL recall (0.9551 at every width; the walk verifies
    # entry candidates, so expansion ORDER doesn't matter). auto() sets 16.
    build_nprobe: int = 8  # partitions probed per row in the approx-kNN build
    build_passes: int = 1  # decorrelated IVF clusterings unioned in the build
    refine_rounds: int = 0  # NN-descent rounds on the approx kNN. Lifts
    # WEAK graphs strongly (kNN recall 0.25 -> 0.41 in 3 rounds on uniform
    # data) but measured no beam-search recall gain at 1M x 128D clustered
    # once the union build reaches ~0.95 kNN recall — the beam, not the
    # kNN, limits there. Off by default; a knob for low-budget builds.
    # The seed scan replaces HNSW's upper layers: instead of greedy descent
    # through sparse coarse layers (graph.rs:251 descent loop), one small
    # [B, S] matmul against a strided routing sample ranks entry points —
    # denser, batched, and immune to cluster-disconnection of the kNN graph.

    @classmethod
    def auto(cls, dim: int, n: int | None = None) -> "GraphParams":
        """Auto-tuning mirroring ``HnswParams::auto`` / ``for_dataset_size``:
        larger corpora and higher dims get wider graphs for equal recall."""
        n = n or 0
        nprobe = 8
        entry_probes, entry_points = 2, 16
        if n >= 1_000_000:
            degree, knn_k = 64, 32
            # approx-kNN quality is the 1M-scale recall limiter: measured
            # true-10NN containment in the adjacency (1M x 128D, r3) is
            # 0.73 at build nprobe=16 vs 0.95 at nprobe=32 (beam recall
            # 0.887 -> 0.90 @ef=128, 0.936 -> 0.94 @ef=256; the residual
            # gap is beam navigation, not the build). Build cost scales
            # ~linearly with nprobe x passes.
            nprobe = 32
            # ENTRY coverage is the residual search-side limiter at 1M
            # (measured r3c, same graph, ef=128: probes 2 -> 0.9145,
            # 16 -> 0.9387, 32 -> 0.9500, 64 -> 0.9555; ef=256 matches
            # ef=128 at probes=64 — the walk is entry-bound, not
            # pool-bound). The SQ8 entry-IVF makes the wide scan nearly
            # free at serving batch (probe kernel: 2.26K QPS b=16 at
            # probes=64/entries=96 vs 2.42K at the old probes=2 — and
            # recall 0.9555 vs 0.9145): BALANCED clears its 0.95 bar at
            # full speed. High dims keep a narrower scan (entry bytes
            # scale with D; probes=16 measured at 100Kx768 — see below).
            entry_probes = 64 if dim <= 256 else 16
            entry_points = 96
        elif n >= 100_000:
            degree, knn_k = 48, 24
            # measured 100Kx768 cosine b=16: kernel probes=16/entries=96
            # serves 0.9676 @ef=64 at 5.27K QPS — beating the narrow-entry
            # ef=128 point (0.9586 @ 2.45K) on BOTH axes; ef=128 lifts to
            # 0.9676 @ 2.48K (entry-bound here too)
            entry_probes, entry_points = 16, 96
        else:
            degree, knn_k = 32, 16
        if dim >= 1024:
            degree = max(degree, 48)
        # expand_width=16 on entry-bound graphs (>=100K rows build an entry
        # scan wide enough that beam recall is expansion-order-independent):
        # measured ef=128 b=16 QPS +28% at 1Mx128D (2.28K -> 2.92K) and +24%
        # at 100Kx768D (2.48K -> 3.07K) at IDENTICAL recall; ew=32 regresses
        # (2.61K at 1M — per-step bytes overtake the saved round trips).
        # Small corpora keep the narrow default: their legacy 2-probe entry
        # leaves recall walk-dependent, where expansion order still matters.
        ew = 16 if n >= 100_000 else cls.expand_width
        # build_passes=1 since r4: the 2-pass decorrelated union was tuned
        # when beam recall was BUILD-limited; with the SQ8 entry-IVF the
        # serve ladder is entry-bound and MEASURED IDENTICAL at 1 pass
        # (exp_build_quality, 1M x 128D warm: 32x2 = 24.0s @ host recall
        # 0.9977/1.000 at ef 16/128 vs 32x1 = 12.3s @ 0.9977/1.000) —
        # halving the build keeps every rung of the measured ladder.
        return cls(degree=degree, knn_k=knn_k, build_nprobe=nprobe,
                   build_passes=1,
                   entry_probes=entry_probes, entry_points=entry_points,
                   expand_width=ew)

    def beam_for_ef(self, ef: int, k: int) -> tuple[int, int]:
        """Map an ef budget to (beam width L, expansions).

        HNSW with ef expands ~ef nodes before termination, so ``expansions
        = ef`` matches the reference's quality-label semantics (round-1
        mapped ef/2, which left ef=128 at recall 0.92 vs the 0.95 bar —
        measured on 100K x 768D clustered: ef/2 -> 0.918, ef -> >=0.95 at
        the same per-expansion cost).
        """
        ef = max(ef, k)
        beam = max(32, min(512, _round8(ef)))
        expansions = max(8, min(512, _round8(ef)))
        return beam, expansions


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8
