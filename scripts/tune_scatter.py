"""Sweep the fused-aggregation kernel parameters on the attached chip.

Measures the full fwd+bwd SAGE aggregation (the bench.py workload) for a
grid of (pipeline, node_block, edge_chunk, slots) and prints a sorted
table.  Run on the real TPU; use the winner as bench.py / EdgeLayout
defaults for this hardware.

Usage:  python scripts/tune_scatter.py [--quick]
"""

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_config(x0, s_np, r_np, n_pad_base, *, pipeline, node_block,
                 edge_chunk, slots, iters, bf16=True):
    from stemgnn_tpu.core.graph import round_up
    from stemgnn_tpu.ops.edge_layout import build_edge_layout
    from stemgnn_tpu.ops.fused_sage import fused_sage_aggregate

    n_pad = round_up(n_pad_base, node_block)
    layout = jax.device_put(build_edge_layout(
        s_np, r_np, n_pad, node_block=node_block, edge_chunk=edge_chunk))
    x = x0
    if x.shape[0] != n_pad:
        x = jnp.zeros((n_pad, x0.shape[1]), x0.dtype).at[:x0.shape[0]].set(x0)

    def step(x, layout):
        return jax.grad(lambda x: jnp.sum(fused_sage_aggregate(
            x, layout, None, reduce="mean", relu=True,
            bf16_messages=bf16, pipeline=pipeline) ** 2))(x)

    @jax.jit
    def run(x0, layout):
        def body(x, _):
            out = step(x, layout)
            probe = out[0, 0]
            return x.at[0, 0].add(probe * 1e-9), probe
        x, probes = jax.lax.scan(body, x0, None, length=iters)
        return jnp.sum(probes)

    # slots only affects the rolling kernel; thread via a partial rebuild
    if pipeline == "rolling" and slots != 2:
        from stemgnn_tpu.ops import scatter_pallas as sp
        orig = sp.scatter_rows_sorted
        import functools

        def patched(*a, **k):
            k["slots"] = slots
            return orig(*a, **k)
        sp.scatter_rows_sorted = patched
        # invalidate fused_sage's closure cache so it picks up the patch
        from stemgnn_tpu.ops import fused_sage as fs
        fs._make.cache_clear()
        try:
            float(run(x, layout))
            t0 = time.perf_counter()
            float(run(x, layout))
            dt = (time.perf_counter() - t0 - 0.003) / iters
        finally:
            sp.scatter_rows_sorted = orig
            fs._make.cache_clear()
        return dt
    float(run(x, layout))
    t0 = time.perf_counter()
    float(run(x, layout))
    return (time.perf_counter() - t0 - 0.003) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from stemgnn_tpu.data.synthetic import random_power_law_graph

    if jax.default_backend() == "tpu":
        n, e, d = 169_343, 1_166_243, 768
    else:
        n, e, d = 20_000, 100_000, 256
        args.iters = min(args.iters, 3)

    _, s_np, r_np, _ = random_power_law_graph(n, e, d, seed=0,
                                              with_edge_feat=False)
    x0 = jax.jit(lambda k: jax.random.normal(k, (n, d), jnp.float32))(
        jax.random.PRNGKey(0))

    if args.quick:
        grid = [("rolling", 128, 512, 2), ("block", 128, 512, 2)]
    else:
        grid = []
        for nb, eb in itertools.product([128, 256, 512], [256, 512, 1024]):
            grid.append(("rolling", nb, eb, 2))
        grid += [("rolling", 128, 512, 3), ("rolling", 256, 512, 3),
                 ("block", 128, 512, 2), ("block", 256, 512, 2)]

    results = []
    for pipeline, nb, eb, slots in grid:
        try:
            dt = bench_config(x0, s_np, r_np, n, pipeline=pipeline,
                              node_block=nb, edge_chunk=eb, slots=slots,
                              iters=args.iters)
            eps = e / dt
            results.append((eps, pipeline, nb, eb, slots))
            print(f"{pipeline:8s} nb={nb:4d} eb={eb:5d} slots={slots}  "
                  f"{dt*1e3:8.2f} ms  {eps/1e6:7.2f} M edges/s", flush=True)
        except Exception as exc:
            print(f"{pipeline:8s} nb={nb:4d} eb={eb:5d} slots={slots}  "
                  f"FAILED {type(exc).__name__}: {exc}", flush=True)

    results.sort(reverse=True)
    print("\nbest:", results[0] if results else None)


if __name__ == "__main__":
    main()
