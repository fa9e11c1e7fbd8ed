"""E-commerce demo: vector + filter + graph + hybrid on 5K products.

Counterpart of the reference's README e-commerce benchmark (5K products,
128D: vector 187µs / vector+filter 55µs / graph lookup 88µs / combined
202µs on AVX-512). Prints the same four measurements on this hardware.
"""

import tempfile
import time

import numpy as np

from velesdb_tpu import Database

rng = np.random.default_rng(1)
N, D = 5000, 128
db = Database.open(tempfile.mkdtemp(prefix="shop-"))
shop = db.create_collection("products", dim=D)

cats = ["audio", "video", "kitchen", "garden", "toys"]
vectors = rng.standard_normal((N, D)).astype(np.float32)
shop.upsert_bulk(
    range(N),
    vectors,
    [
        {
            "title": f"{cats[i % 5]} product {i}",
            "category": cats[i % 5],
            "price": round(float(rng.uniform(3, 500)), 2),
            "rating": round(float(rng.uniform(1, 5)), 1),
        }
        for i in range(N)
    ],
)
# co-purchase graph: each product links to 3 pseudo-random companions
for i in range(0, N, 7):
    for j in rng.integers(0, N, 3):
        shop.add_edge(i, int(j), "co_purchased")
shop.flush()

q = vectors[1234] + 0.05 * rng.standard_normal(D).astype(np.float32)
price_filter = {"type": "lt", "field": "price", "value": 100}


def timed(label, fn, warmups=3, iters=20):
    for _ in range(warmups):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:34s} {dt * 1e6:10.0f} us")
    return dt


print(f"e-commerce demo: {N} products, {D}D (reference: 187/55/88/202 us)")
timed("vector similarity query", lambda: shop.search(q, k=10))
timed("vector + filter", lambda: shop.search(q, k=10, filter=price_filter))
timed("graph lookup (co-purchase)", lambda: shop.neighbors(1232, "out", "co_purchased"))
timed(
    "combined vector+graph+filter",
    lambda: shop.execute_match(
        "MATCH (a)-[:co_purchased]->(b) WHERE a.price < 100 "
        "AND similarity(a, $v) > 0.0 RETURN b.title AS t LIMIT 10",
        {"v": q},
    ),
)

# batched throughput — where the TPU engine actually lives
batch = np.repeat(q[None, :], 256, axis=0) + 0.01 * rng.standard_normal(
    (256, D)
).astype(np.float32)
dt = timed("BATCHED 256-query search", lambda: shop.search_batch(batch, k=10))
print(f"{'-> throughput':34s} {256 / dt:10,.0f} qps")
