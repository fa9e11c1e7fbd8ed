"""E2E assertions over the e-commerce showcase (reference parity:
``examples/ecommerce_recommendation/`` — 5K products / 11 metadata fields /
behavior-derived edges / 4 query types; scaled down for CI)."""

import sys
from pathlib import Path

import numpy as np
import pytest

from velesdb_tpu.database import Database

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from examples.ecommerce_demo import (  # noqa: E402
    build_shop,
    q1_vector,
    q2_vector_filtered,
    q3_graph,
    q4_combined,
)


@pytest.fixture(scope="module")
def shopdb(tmp_path_factory):
    db = Database.open(tmp_path_factory.mktemp("shop"))
    shop, vectors, n_edges = build_shop(db, n_products=800, n_users=150, seed=3)
    return db, shop, vectors, n_edges


def _anchor_with_edges(shop, n):
    for pid in range(n):
        if shop.neighbors(pid, "out", "bought_together"):
            return pid
    raise AssertionError("no product has bought_together edges")


def test_build_shape(shopdb):
    db, shop, vectors, n_edges = shopdb
    assert shop.count() == 800
    assert n_edges > 500
    _vec, pay = shop.get(0)
    # the reference's 11 metadata fields
    assert set(pay) == {
        "name", "category", "subcategory", "brand", "price", "rating",
        "review_count", "in_stock", "stock_quantity", "release_year",
        "discount_pct",
    }


def test_q1_vector_similarity(shopdb, rng):
    db, shop, vectors, _ = shopdb
    anchor = 123
    q = vectors[anchor] + 0.02 * rng.standard_normal(128).astype(np.float32)
    hits = q1_vector(shop, q)
    assert hits[0].id == anchor
    # same-shelf clustering: most top-10 share the anchor's subcategory
    sub = shop.get(anchor)[1]["subcategory"]
    same = sum(1 for h in hits if shop.get(h.id)[1]["subcategory"] == sub)
    assert same >= 7


def test_q2_filters_enforced(shopdb, rng):
    db, shop, vectors, _ = shopdb
    q = vectors[42] + 0.02 * rng.standard_normal(128).astype(np.float32)
    rows = q2_vector_filtered(db, q)
    assert rows, "filtered similarity returned nothing"
    for r in rows:
        pay = shop.get(r["id"])[1]
        assert pay["in_stock"] is True
        assert pay["price"] < 500
    sims = [r["sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_q3_graph_traversal(shopdb):
    db, shop, vectors, _ = shopdb
    anchor = _anchor_with_edges(shop, 800)
    rows = q3_graph(shop, anchor)
    assert rows
    linked = set(shop.neighbors(anchor, "out", "bought_together"))
    assert {r["id"] for r in rows} <= linked


def test_q4_combined_business_rules(shopdb, rng):
    db, shop, vectors, _ = shopdb
    anchor = _anchor_with_edges(shop, 800)
    q = vectors[anchor] + 0.02 * rng.standard_normal(128).astype(np.float32)
    out = q4_combined(db, shop, q, anchor, k=10, price_cap=1000.0)
    assert out
    for r in out:
        pay = shop.get(r["id"])[1]
        assert pay["in_stock"] and pay["rating"] >= 4.0 and pay["price"] < 1000
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
