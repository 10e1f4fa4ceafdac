"""Phase breakdown + parameter sweep for the fused SpMM bench (dev tool).

Times, with the dependent-scan discipline of bench.py (block_until_ready is
unreliable on the tunneled backend):
  * the raw XLA bf16 row gather (the floor-setting op),
  * the Pallas scatter kernel alone (fwd structure),
  * fused fwd, and fused fwd+bwd under {slots, edge_chunk, node_block} sweeps.

Usage: python scripts/bench_probe.py [--sweep]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

import jax
import jax.numpy as jnp

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from _bench_common import bench_scan, bench_scalar_scan  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", action="store_true")
    args = ap.parse_args()

    from stemgnn_tpu.core.graph import round_up
    from stemgnn_tpu.data.synthetic import random_power_law_graph
    from stemgnn_tpu.ops.edge_layout import build_edge_layout
    from stemgnn_tpu.ops.fused_sage import fused_sage_aggregate
    from stemgnn_tpu.ops.scatter_pallas import scatter_rows_sorted

    n, e, d = 169_343, 1_166_243, 768
    _, s_np, r_np, _ = random_power_law_graph(n, e, d, seed=0,
                                              with_edge_feat=False)
    n_pad = round_up(n, 256)
    layouts = {}

    def layout(ec, nb):
        key = (ec, nb)
        if key not in layouts:
            layouts[key] = jax.device_put(build_edge_layout(
                s_np, r_np, n_pad, edge_chunk=ec, node_block=nb))
        return layouts[key]

    lay0 = layout(512, 128)
    e_pad = lay0.num_edges_padded
    x0 = jax.jit(lambda k: jax.random.normal(k, (n_pad, d), jnp.float32))(
        jax.random.PRNGKey(0)).astype(jnp.bfloat16)
    gb = 1e-9

    # 1. raw bf16 gather by sender (random rows), forced output
    def g_step(x, senders):
        out = jnp.take(x, senders, axis=0, mode="clip")
        # force every element: fold back into an [N,D]-free scalar chain via
        # a cheap [E,D] reduce (reads all of out)
        return x.at[0, 0].add(jnp.sum(out.astype(jnp.float32)) * 1e-12)

    dt = bench_scan(lambda x, a: g_step(x, a), x0, lay0.senders_r)
    tot = e_pad * d * 2 * gb
    print(f"gather bf16 [E,D]: {dt*1e3:8.2f} ms  {tot/dt:6.1f} GB/s "
          f"(read side {e_pad*d*2*gb/dt:5.1f})")

    # 2. scatter kernel alone (relu + mean-scale epilogue, bf16 out)
    m0 = jax.jit(lambda k: jax.random.normal(k, (e_pad, d), jnp.bfloat16))(
        jax.random.PRNGKey(1))
    inv_deg = (1.0 / jnp.maximum(lay0.in_degree, 1.0)).astype(
        jnp.float32)[:, None]

    def k_step(m, aux):
        lr, bp, sc = aux
        out = scatter_rows_sorted(m, lr, bp, num_nodes_padded=n_pad,
                                  fast=True, relu=True, scale=sc,
                                  slots=4, out_dtype=jnp.bfloat16)
        return m.at[0, 0].add(out[0, 0] * 1e-9)

    dt = bench_scan(k_step, m0, (lay0.lrow_r, lay0.block_ptr_r, inv_deg))
    tot = (e_pad * d * 2 + e_pad * 4 + n_pad * d * 2) * gb
    print(f"scatter kernel   : {dt*1e3:8.2f} ms  {tot/dt:6.1f} GB/s")

    # 3. fused forward only
    def fwd_step(x, lay):
        return fused_sage_aggregate(x, lay, None, reduce="mean", relu=True,
                                    bf16_messages=True, bf16_out=True,
                                    slots=4)

    dt = bench_scan(fwd_step, x0, lay0)
    print(f"fused fwd        : {dt*1e3:8.2f} ms  {e/dt/1e6:6.2f} M edges/s")

    # 4. fused fwd+bwd (bench.py step)
    def make_step(slots):
        def step(x, lay):
            return jax.grad(lambda x: jnp.sum(fused_sage_aggregate(
                x, lay, None, reduce="mean", relu=True, bf16_messages=True,
                bf16_out=True, slots=slots).astype(jnp.float32) ** 2))(x)
        return step

    dt = bench_scan(make_step(4), x0, lay0)
    print(f"fused fwd+bwd    : {dt*1e3:8.2f} ms  {e/dt/1e6:6.2f} M edges/s")

    if args.sweep:
        for ec, nb, slots in [(512, 128, 2), (512, 128, 6), (512, 128, 8),
                              (1024, 128, 2), (1024, 128, 4),
                              (512, 256, 4), (1024, 256, 2), (1024, 256, 4),
                              (2048, 256, 2)]:
            try:
                lay = layout(ec, nb)
                dt = bench_scan(make_step(slots), x0, lay)
                print(f"sweep ec={ec:5d} nb={nb:3d} slots={slots}: "
                      f"{dt*1e3:8.2f} ms  {e/dt/1e6:6.2f} M edges/s",
                      flush=True)
            except Exception as exc:
                print(f"sweep ec={ec} nb={nb} slots={slots}: FAILED "
                      f"{type(exc).__name__}: {exc}", flush=True)


if __name__ == "__main__":
    main()
