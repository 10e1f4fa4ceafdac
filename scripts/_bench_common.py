"""Shared timing harness for the probe scripts.

Dependent-scan timing with a forced scalar readback — the only reliable
discipline on the tunneled TPU (BASELINE.md measurement notes:
block_until_ready returns early).  TWO-POINT method (r4): every dispatched
run pays a constant overhead — enqueue plus the first-readback tunnel RTT,
measured ~2.6 ms and run-to-run variable — which a fixed subtraction
under-corrects and which diluted the r1-r3 per-iter rates by up to 25% on
fast kernels.  Timing a short and a 4x-length scan of the SAME body and
differencing cancels the constant exactly; best-of-5 per length strips
queue-noise outliers.
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


def _two_point(make_run, x0, aux, iters, reps: int = 5):
    # ASSUMPTION: best-of-``reps`` reaches the overhead FLOOR (~2.6 ms)
    # on both lengths, so differencing cancels it; a rare high-tail draw
    # (the band reaches 24 ms) surviving all reps on ONE length would
    # skew the difference — 5 reps makes that unlikely, and back-to-back
    # bench.py runs measure 0.4% spread under this scheme (BASELINE r4).
    def best_of(run):
        float(run(x0, aux))                       # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(x0, aux))
            best = min(best, time.perf_counter() - t0)
        return best

    t_s = best_of(make_run(iters))
    t_l = best_of(make_run(4 * iters))
    if t_l - t_s < t_s * 0.05:
        # Sanity: the long run should cost visibly more than the short one.
        # A (near-)non-positive difference means queue noise swamped the
        # body time — the clamped value below would report an absurd rate.
        print(f"# WARNING: two-point difference suspect (t_s={t_s * 1e3:.2f} "
              f"ms, t_l={t_l * 1e3:.2f} ms); rate unreliable",
              file=sys.stderr, flush=True)
    return max((t_l - t_s) / (3 * iters), 1e-9)


def bench_scan(step_fn, x0, aux, iters=10):
    """Time ``step_fn(x, aux) -> array`` chained through a lax.scan carry."""
    def make_run(length):
        @jax.jit
        def run(x0, aux):
            def body(x, _):
                out = step_fn(x, aux)
                probe = out[0, 0]
                return x.at[0, 0].add((probe * 1e-9).astype(x.dtype)), probe
            x, probes = jax.lax.scan(body, x0, None, length=length)
            return jnp.sum(probes)
        return run

    return _two_point(make_run, x0, aux, iters)


def bench_scalar_scan(step_fn, x0, aux, iters=8):
    """Variant for steps that reduce to a scalar probe themselves."""
    def make_run(length):
        @jax.jit
        def run(x0, aux):
            def body(c, _):
                probe = step_fn(x0, aux, c)
                return c + probe * 1e-12, probe
            c, probes = jax.lax.scan(body, jnp.float32(0), None,
                                     length=length)
            return jnp.sum(probes) + c
        return run

    return _two_point(make_run, x0, aux, iters)
