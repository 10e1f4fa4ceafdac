"""Windowed in-kernel gather (gwin) benchmark on a LOCALITY-ordered graph.

The single-chip bench graph (bench.py) is a synthetic *random* power-law
graph: sender ids within a receiver-sorted edge chunk span the whole node
range, so nothing can beat the XLA random row gather (BASELINE.md round-2
conclusion — the remaining levers "need graph locality").  Real citation /
co-purchase graphs DO have locality (papers cite temporally-near papers;
ogbn-arxiv node ids are ordered by paper id ~ time), and RCM reordering
(ops/reorder.py) manufactures it for everything else.

This script measures the lever on a graph with that structure: a banded
power-law graph (each non-hub edge lands within a bounded id-offset of its
source, hub edges go to global power-law hubs).  Paths compared, fwd+bwd,
fused bf16 activations, hub2048 everywhere:

  * gather   — hub-dense + XLA tail gather + Pallas scatter (bench.py champ)
  * windowed — hub-dense + gathered_scatter_rows_sorted tail (the gwin path:
               sequential x-window DMAs + one-hot MXU gather in-kernel, no
               [E, D] message materialization)

Run on the TPU:  python scripts/bench_gwin.py
CPU smoke:       python scripts/bench_gwin.py --force_cpu --iters 2
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def banded_power_law_graph(num_nodes: int, num_edges: int, band: int,
                           hub_frac: float = 0.4, alpha: float = 1.5,
                           seed: int = 0):
    """Senders uniform; receivers: with prob ``hub_frac`` a global power-law
    hub (rank-ordered), else within ±band of the sender (locality)."""
    rng = np.random.default_rng(seed)
    senders = rng.integers(0, num_nodes, num_edges).astype(np.int64)
    ranks = np.arange(1, num_nodes + 1, dtype=np.float64)
    cdf = np.cumsum(ranks ** (-alpha))
    cdf /= cdf[-1]
    hub_r = np.searchsorted(cdf, rng.random(num_edges)).astype(np.int64)
    local_r = np.clip(senders + rng.integers(-band, band + 1, num_edges),
                      0, num_nodes - 1)
    is_hub = rng.random(num_edges) < hub_frac
    receivers = np.where(is_hub, hub_r, local_r)
    return senders, receivers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--force_cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--band", type=int, default=192)
    ap.add_argument("--hub_frac", type=float, default=0.4)
    ap.add_argument("--nodes", type=int, default=169_343)
    ap.add_argument("--edges", type=int, default=1_166_243)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--locsplit", action="store_true",
                    help="also bench the LocSplit two-launch vs merged "
                         "single-kernel paths (hubs off)")
    args = ap.parse_args()

    import jax
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from scripts._bench_common import bench_scan
    from stemgnn_tpu.core.graph import round_up
    from stemgnn_tpu.ops.edge_layout import build_edge_layout
    from stemgnn_tpu.ops.fused_sage import fused_sage_aggregate

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        args.nodes, args.edges, args.dim = 20_000, 100_000, 256
    n, d = args.nodes, args.dim
    s0, r0 = banded_power_law_graph(n, args.edges, args.band, args.hub_frac)
    # symmetrize + coalesce, matching the reference arxiv workload
    pair = np.unique(np.stack([np.concatenate([s0, r0]),
                               np.concatenate([r0, s0])], 1), axis=0)
    s_np, r_np = pair[:, 0], pair[:, 1]
    e = s_np.shape[0]
    n_pad = round_up(n, 128)
    interpret = not on_tpu

    lay_g = jax.device_put(build_edge_layout(s_np, r_np, n_pad,
                                             edge_chunk=512, hub_size=2048,
                                             feat_dim_hint=d, gwin="off"))
    lay_w = jax.device_put(build_edge_layout(s_np, r_np, n_pad,
                                             edge_chunk=512, hub_size=2048,
                                             feat_dim_hint=d, gwin="auto"))
    tail = lay_w.hub_r.tail if lay_w.hub_r is not None else lay_w
    tail_e = int(np.asarray(tail.mask_r).sum())
    print(f"# edges {e}  tail edges {tail_e}  gwin_w {tail.gwin_w}  "
          f"use_gwin_r {tail.use_gwin_r}  use_gwin_s "
          f"{(lay_w.hub_s.tail if lay_w.hub_s else lay_w).use_gwin_s}  "
          f"mean nsub {float(np.asarray(tail.gwin_nsub_r).mean()):.2f}",
          flush=True)

    def step(x, lay):
        return jax.grad(lambda x: jnp.sum(fused_sage_aggregate(
            x, lay, None, reduce="mean", relu=True, bf16_messages=True,
            bf16_out=True, interpret=interpret,
            slots=4).astype(jnp.float32) ** 2))(x)

    x0 = jax.jit(lambda k: jax.random.normal(k, (n_pad, d), jnp.bfloat16))(
        jax.random.PRNGKey(0))
    for name, lay in (("gather", lay_g), ("windowed", lay_w)):
        dt = bench_scan(step, x0, lay, iters=args.iters)
        print(json.dumps({"path": name, "ms_per_step": round(dt * 1e3, 3),
                          "edges_per_s": round(e / dt)}), flush=True)

    if args.locsplit:
        # LocSplit comparison (r3 VERDICT item 4): the same mixed graph with
        # hubs OFF, so stray (hub-bound) edges go through the split —
        # two-launch chain vs the merged single kernel.
        lay_ls = jax.device_put(build_edge_layout(
            s_np, r_np, n_pad, edge_chunk=512, feat_dim_hint=d,
            loc_split="on", loc_merge=True))
        sp = lay_ls.split_r
        print(f"# locsplit: loc_frac {sp.loc_frac:.3f}  "
              f"strays {int(np.asarray(sp.m_scnt).sum())}  "
              f"m_gwin_w {sp.m_gwin_w}", flush=True)

        def step_ls(merged):
            def f(x, lay):
                return jax.grad(lambda x: jnp.sum(fused_sage_aggregate(
                    x, lay, None, reduce="mean", relu=True,
                    bf16_messages=True, bf16_out=True, interpret=interpret,
                    slots=4, loc_merged=merged).astype(jnp.float32) ** 2))(x)
            return f

        for name, merged in (("locsplit_2launch", False),
                             ("locsplit_merged", True)):
            dt = bench_scan(step_ls(merged), x0, lay_ls, iters=args.iters)
            print(json.dumps({"path": name,
                              "ms_per_step": round(dt * 1e3, 3),
                              "edges_per_s": round(e / dt)}), flush=True)


if __name__ == "__main__":
    main()
