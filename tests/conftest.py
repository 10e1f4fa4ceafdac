"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths (psum / all_to_all / shard_map) run in CI on fake
devices per SURVEY.md §4 item (4).  Must run before jax initializes.
"""

import os

# Force CPU even when the shell exports JAX_PLATFORMS=axon (the TPU tunnel):
# unit tests validate math + sharding on an 8-device virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon site customization pins JAX_PLATFORMS=axon at interpreter startup;
# the config override below wins regardless.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_graph(rng, n=50, e=200, d=16, with_edge_feat=True):
    senders = rng.integers(0, n, size=e).astype(np.int32)
    receivers = rng.integers(0, n, size=e).astype(np.int32)
    x = rng.standard_normal((n, d)).astype(np.float32)
    ef = rng.standard_normal((e, d)).astype(np.float32) if with_edge_feat else None
    return x, senders, receivers, ef
