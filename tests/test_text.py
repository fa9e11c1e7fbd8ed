"""BM25 / trigram / fusion tests with pure-Python reference scoring.

Mirrors the reference's co-located unit tests for ``bm25.rs`` and
``index/trigram/`` (SURVEY.md §4): device block scoring is validated against
a straightforward host BM25 implementation.
"""

import math
from collections import Counter

import numpy as np
import pytest

from velesdb_tpu.fusion import FusionStrategy, rrf_fuse, weighted_rrf
from velesdb_tpu.text import Bm25Index, TrigramIndex, tokenize
from velesdb_tpu.text.bm25 import B, K1
from velesdb_tpu.text.trigram import like_to_regex

DOCS = {
    0: "the quick brown fox jumps over the lazy dog",
    1: "a fast auburn fox leaps across a sleepy canine",
    2: "grumpy wizards make toxic brew for the evil queen",
    3: "the five boxing wizards jump quickly",
    4: "pack my box with five dozen liquor jugs",
    5: "quick brown foxes are quick",
}


def reference_bm25(docs: dict[int, str], query: str) -> dict[int, float]:
    toks = {d: tokenize(t) for d, t in docs.items()}
    n = len(docs)
    avg = sum(len(t) for t in toks.values()) / n
    scores: dict[int, float] = {}
    for term, qtf in Counter(tokenize(query)).items():
        df = sum(1 for t in toks.values() if term in t)
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, t in toks.items():
            tf = t.count(term)
            if tf == 0:
                continue
            dl = len(t)
            s = idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avg))
            scores[d] = scores.get(d, 0.0) + qtf * s
    return scores


@pytest.fixture
def bm25():
    idx = Bm25Index()
    for slot, text in DOCS.items():
        idx.add_document(slot, text)
    return idx


def test_bm25_matches_reference_scoring(bm25):
    for query in ["quick fox", "wizards", "five boxing quick", "the quick quick"]:
        ref = reference_bm25(DOCS, query)
        got = dict(bm25.search(query, 10, len(DOCS)))
        assert set(got) == set(ref), query
        for d, s in ref.items():
            assert got[d] == pytest.approx(s, rel=1e-4), (query, d)


def test_bm25_batch_and_ranking(bm25):
    vals, slots = bm25.search_batch(["quick fox", "liquor jugs"], 3, len(DOCS))
    assert slots.shape == (2, 3)
    # doc 5 says quick twice + foxes; doc 0 has quick fox — both must rank
    ref = reference_bm25(DOCS, "quick fox")
    best = max(ref, key=ref.get)
    assert slots[0, 0] == best
    assert slots[1, 0] == 4  # only doc 4 has liquor jugs


def test_bm25_unknown_term_and_empty(bm25):
    assert bm25.search("zzz unknown", 5, len(DOCS)) == []
    empty = Bm25Index()
    assert empty.search("anything", 5, 1) == []


def test_bm25_remove_and_update(bm25):
    bm25.remove_document(5)
    got = dict(bm25.search("quick", 10, len(DOCS)))
    assert 5 not in got
    bm25.add_document(5, "entirely different words now")
    got = dict(bm25.search("different words", 10, len(DOCS)))
    assert 5 in got


def test_bm25_mask_pushdown(bm25):
    mask = np.zeros(len(DOCS), bool)
    mask[[1, 2]] = True
    got = dict(bm25.search("fox wizards", 10, len(DOCS), mask=mask))
    assert set(got) <= {1, 2}
    assert 1 in got and 2 in got


def test_bm25_long_postings_multiblock():
    # >BLOCK docs sharing one term exercises multi-block postings
    idx = Bm25Index()
    n = 300
    for slot in range(n):
        idx.add_document(slot, f"common word{slot % 7}")
    got = dict(idx.search("common", n, n))
    assert len(got) == n


# -- trigram / LIKE ---------------------------------------------------------


@pytest.fixture
def trigram():
    idx = TrigramIndex()
    for slot, text in DOCS.items():
        idx.add_document(slot, text)
    return idx


def test_like_mask_basic(trigram):
    mask = trigram.match_mask("%quick%", len(DOCS))
    assert set(np.flatnonzero(mask)) == {0, 3, 5}
    mask = trigram.match_mask("%QUICK%", len(DOCS), case_insensitive=True)
    assert set(np.flatnonzero(mask)) == {0, 3, 5}
    assert not trigram.match_mask("%QUICK%", len(DOCS)).any()


def test_like_underscore_and_anchors(trigram):
    # anchored pattern: full-string semantics
    mask = trigram.match_mask("the quick%", len(DOCS))
    assert set(np.flatnonzero(mask)) == {0}
    mask = trigram.match_mask("%j_mps%", len(DOCS))
    assert set(np.flatnonzero(mask)) == {0}


def test_like_cross_word_literal(trigram):
    # literal run spanning a word boundary must still match
    # ("brown foxes" in doc 5 also contains the substring "brown fox")
    mask = trigram.match_mask("%brown fox%", len(DOCS))
    assert set(np.flatnonzero(mask)) == {0, 5}
    mask = trigram.match_mask("%brown fox j%", len(DOCS))
    assert set(np.flatnonzero(mask)) == {0}


def test_like_short_pattern_fallback(trigram):
    mask = trigram.match_mask("%my%", len(DOCS))
    assert set(np.flatnonzero(mask)) == {4}


def test_like_regex_escaping():
    rx = like_to_regex("50\\% off%", False)
    assert rx.match("50% off today")
    assert not rx.match("500 off today")


def test_trigram_remove(trigram):
    trigram.remove_document(0)
    assert set(np.flatnonzero(trigram.match_mask("%quick%", len(DOCS)))) == {3, 5}


# -- fusion -------------------------------------------------------------------


def test_rrf_fuse_prefers_multi_list_hits():
    a = [(1, 0.9), (2, 0.8), (3, 0.7)]
    b = [(2, 10.0), (4, 9.0)]
    fused = rrf_fuse([a, b], 3)
    assert fused[0][0] == 2
    assert {vid for vid, _ in fused} <= {1, 2, 3, 4}


def test_weighted_rrf_weight_extremes():
    vec = [(1, 0.9), (2, 0.8)]
    txt = [(3, 5.0), (4, 4.0)]
    assert weighted_rrf(vec, txt, 1, vector_weight=1.0)[0][0] == 1
    assert weighted_rrf(vec, txt, 1, vector_weight=0.0)[0][0] == 3


@pytest.mark.parametrize(
    "strategy,expected_first",
    [
        (FusionStrategy.AVERAGE, 2),
        (FusionStrategy.MAXIMUM, 1),
        (FusionStrategy.WEIGHTED_HIT, 2),
    ],
)
def test_fusion_strategies(strategy, expected_first):
    a = [(1, 1.0), (2, 0.6)]
    b = [(2, 0.6), (3, 0.1)]
    fused = strategy.fuse([a, b], 3)
    assert fused[0][0] == expected_first


def test_weighted_average_fusion():
    a = [(1, 1.0)]
    b = [(2, 1.0)]
    fused = FusionStrategy.WEIGHTED_AVERAGE.fuse([a, b], 2, weights=[3.0, 1.0])
    assert fused[0][0] == 1 and fused[0][1] == pytest.approx(0.75)


def test_fusion_parse_rejects_unknown():
    with pytest.raises(ValueError):
        FusionStrategy.parse("bogus")
