"""Test config: run everything on a faked 8-device CPU mesh.

SURVEY.md §4: multi-chip tests use XLA's host-platform device-count override —
the TPU-world equivalent of "multi-node without a real cluster".

The environment may pre-import jax with JAX_PLATFORMS pointing at a remote TPU
(high per-dispatch latency), so we override via jax.config BEFORE any backend
initialization rather than via os.environ alone.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
