"""Shared timing harness for the probe scripts.

Dependent-scan timing with a forced scalar readback — the only reliable
discipline on the tunneled TPU (BASELINE.md measurement notes:
block_until_ready returns early; per-dispatch enqueue ~3 ms is subtracted).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_scan(step_fn, x0, aux, iters=10):
    """Time ``step_fn(x, aux) -> array`` chained through a lax.scan carry."""
    @jax.jit
    def run(x0, aux):
        def body(x, _):
            out = step_fn(x, aux)
            probe = out[0, 0]
            return x.at[0, 0].add((probe * 1e-9).astype(x.dtype)), probe
        x, probes = jax.lax.scan(body, x0, None, length=iters)
        return jnp.sum(probes)

    float(run(x0, aux))
    t0 = time.perf_counter()
    float(run(x0, aux))
    return max((time.perf_counter() - t0 - 0.003) / iters, 1e-9)


def bench_scalar_scan(step_fn, x0, aux, iters=8):
    """Variant for steps that reduce to a scalar probe themselves."""
    @jax.jit
    def run(x0, aux):
        def body(c, _):
            probe = step_fn(x0, aux, c)
            return c + probe * 1e-12, probe
        c, probes = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return jnp.sum(probes) + c

    float(run(x0, aux))
    t0 = time.perf_counter()
    float(run(x0, aux))
    return max((time.perf_counter() - t0 - 0.003) / iters, 1e-9)
