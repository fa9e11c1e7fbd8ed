"""Fuzz-style invariant tests.

Counterpart of the reference's cargo-fuzz targets (``fuzz_velesql_parser``,
``fuzz_distance_metrics``, ``fuzz_snapshot_parser`` — invariants in
``docs/FUZZING.md:34-60``: no panic, NaN-safe, roundtrip). Deterministic
pseudo-random mutation instead of libFuzzer, same contracts:

- the VelesQL parser either parses or raises ParseError — never anything else
- distance kernels never emit NaN for finite inputs
- payload snapshots roundtrip through mutation-corrupted files (reject or
  recover, never crash or return wrong data silently)
"""

import json
import os
import random
import string

import numpy as np
import pytest

from velesdb_tpu.ops import DistanceMetric, pairwise_scores
from velesdb_tpu.velesql import ParseError, parse

SEED_QUERIES = [
    "SELECT * FROM t",
    "SELECT a, b AS c FROM t WHERE x = 1 AND y LIKE '%z%' LIMIT 5",
    "SELECT * FROM t WHERE v NEAR $q AND p < 10 ORDER BY similarity(v, $q) DESC",
    "SELECT cat, COUNT(*) FROM t GROUP BY cat HAVING COUNT(*) > 1",
    "SELECT * FROM a JOIN b ON a.x = b.y WHERE a.z IN (1, 2, 3)",
    "SELECT * FROM t WHERE body MATCH 'hello world' WITH (ef_search=64)",
    "SELECT * FROM t WHERE ts > NOW() - INTERVAL '3 days' OFFSET 2",
]


def _mutate(rng: random.Random, text: str) -> str:
    ops = rng.randrange(4)
    if not text:
        return rng.choice(SEED_QUERIES)
    i = rng.randrange(len(text))
    if ops == 0:  # delete a span
        j = min(len(text), i + rng.randrange(1, 8))
        return text[:i] + text[j:]
    if ops == 1:  # insert noise
        noise = "".join(
            rng.choice(string.printable) for _ in range(rng.randrange(1, 6))
        )
        return text[:i] + noise + text[i:]
    if ops == 2:  # duplicate a span
        j = min(len(text), i + rng.randrange(1, 12))
        return text[:i] + text[i:j] + text[i:]
    return text[:i] + rng.choice("()'$,.*=<>") + text[i + 1 :]


def test_parser_never_crashes_on_mutations():
    rng = random.Random(1234)
    corpus = list(SEED_QUERIES)
    parsed = 0
    for _ in range(800):
        base = rng.choice(corpus)
        text = base
        for _ in range(rng.randrange(1, 4)):
            text = _mutate(rng, text)
        try:
            parse(text)
            parsed += 1
            corpus.append(text)  # grammar-valid mutants breed further
        except ParseError:
            pass  # the ONLY acceptable failure mode
    assert parsed > 10  # sanity: some mutants still parse


def test_distance_kernels_nan_safe(rng):
    """Zero vectors, denormals, huge values — finite in, finite out."""
    specials = np.stack(
        [
            np.zeros(16, np.float32),
            np.full(16, 1e-38, np.float32),
            np.full(16, 1e18, np.float32),
            np.ones(16, np.float32),
            -np.ones(16, np.float32),
            rng.standard_normal(16).astype(np.float32),
        ]
    )
    for metric in DistanceMetric:
        s = np.asarray(pairwise_scores(specials, specials, metric))
        assert not np.isnan(s).any(), f"{metric} produced NaN"


def test_snapshot_fuzz_corruption(tmp_path):
    from velesdb_tpu.storage.payload_log import PayloadLog

    rng = random.Random(7)
    d = str(tmp_path / "p")
    log = PayloadLog(d)
    for i in range(30):
        log.store(i, {"n": i, "s": "x" * (i % 7)})
    log.close()
    snap = os.path.join(d, "payloads.snapshot")
    original = open(snap, "rb").read()

    for trial in range(25):
        blob = bytearray(original)
        for _ in range(rng.randrange(1, 5)):
            pos = rng.randrange(len(blob))
            blob[pos] ^= 1 << rng.randrange(8)
        with open(snap, "wb") as f:
            f.write(bytes(blob))
        # corrupt snapshot must be rejected (falls back to log replay) or,
        # if the flipped bits dodge the CRC (1 in 2^32), still parse clean —
        # never crash, and every surviving value must be self-consistent
        log2 = PayloadLog(d)
        for k, v in log2.payloads.items():
            assert isinstance(v, dict)
        log2._log.close()
    # restore intact snapshot: full recovery
    with open(snap, "wb") as f:
        f.write(original)
    log3 = PayloadLog(d)
    assert len(log3) == 30 and log3.retrieve(29)["n"] == 29
    log3.close()
