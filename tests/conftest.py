"""Test harness config: run on CPU with a virtual 8-device mesh.

Mirrors the reference's test strategy (SURVEY.md §4): real engine, no fakes —
but multi-device sharding is validated on a virtual CPU mesh via
``--xla_force_host_platform_device_count`` so no TPU pod is needed.
"""

import os

# Force CPU for the test suite (the one real TPU chip is reserved for bench
# runs; sharding tests want the virtual 8-device CPU mesh). Override with
# VELESDB_TEST_PLATFORM=tpu to run the suite on real hardware. The env var
# alone is not enough here — the axon TPU plugin ignores JAX_PLATFORMS — so we
# also set the config knob, which must happen before any computation runs.
_platform = os.environ.get("VELESDB_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", _platform)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tmp_db_dir(tmp_path):
    return str(tmp_path / "db")
