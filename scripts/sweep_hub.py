#!/usr/bin/env python
"""Hub-path parameter sweep on the bench graph, post-bf16-store (r4).

The r3 H sweep ran with f32 hub-partial stores; bf16 stores halved the
gather-hub matmul cost, which may shift the H optimum and the tail
edge_chunk/slots tradeoffs.  Sweeps (H, edge_chunk, slots) for the
hub+sc candidate and prints a sorted table.

  python scripts/sweep_hub.py [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from stemgnn_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from stemgnn_tpu.core.graph import round_up
    from stemgnn_tpu.data.synthetic import random_power_law_graph
    from stemgnn_tpu.ops.edge_layout import build_edge_layout
    from stemgnn_tpu.ops.fused_sage import fused_sage_aggregate

    n, e0, d = 169_343, 1_166_243, 768
    _, s_raw, r_raw, _ = random_power_law_graph(n, e0, d, seed=0,
                                                with_edge_feat=False)
    pair = np.unique(np.stack([np.concatenate([s_raw, r_raw]),
                               np.concatenate([r_raw, s_raw])], 1), axis=0)
    s_np, r_np = pair[:, 0].astype(np.int64), pair[:, 1].astype(np.int64)
    e = len(s_np)
    n_pad = round_up(n, 128)
    x0 = jax.jit(lambda k: jax.random.normal(k, (n_pad, d), jnp.bfloat16))(
        jax.random.PRNGKey(0))

    def run_cfg(h, ec, slots):
        lay = jax.device_put(build_edge_layout(
            s_np, r_np, n_pad, edge_chunk=ec, hub_size=h, sc_hub_size=h,
            hub_min_coverage=-1.0))

        def step(x, lay):
            return jax.grad(lambda x: jnp.sum(fused_sage_aggregate(
                x, lay, None, reduce="mean", relu=True, bf16_messages=True,
                bf16_out=True, slots=slots).astype(jnp.float32) ** 2))(x)

        @jax.jit
        def loop(x, lay):
            def body(c, _):
                out = step(c, lay)
                probe = out[0, 0]
                return c.at[0, 0].add((probe * 1e-9).astype(c.dtype)), probe
            xx, probes = jax.lax.scan(body, x, None, length=args.iters)
            return jnp.sum(probes)

        float(loop(x0, lay))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(x0, lay))
            ts.append(max((time.perf_counter() - t0 - 0.003) / args.iters,
                          1e-9))
        return min(ts)

    results = []
    for h, ec, slots in [(768, 512, 4), (512, 512, 4), (384, 512, 4),
                         (1024, 512, 4), (768, 1024, 4), (768, 512, 8),
                         (512, 1024, 4)]:
        try:
            dt = run_cfg(h, ec, slots)
            results.append((e / dt / 1e6, h, ec, slots))
            print(f"H={h:5d} ec={ec:5d} slots={slots}: "
                  f"{dt*1e3:6.2f} ms  {e/dt/1e6:6.1f}M edges/s", flush=True)
        except Exception as ex:
            print(f"H={h} ec={ec} slots={slots} FAILED: "
                  f"{type(ex).__name__}: {ex}"[:200], flush=True)
    results.sort(reverse=True)
    print("best:", results[0] if results else None, flush=True)


if __name__ == "__main__":
    main()
