"""On-chip measurement of the hub-augmented fused SAGE path vs the plain
gather path, on the bench graph (directed) and its symmetrized variant."""

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
    ap.add_argument("--hub", type=int, default=2048)
    args = ap.parse_args()

    from stemgnn_tpu.core.graph import round_up
    from stemgnn_tpu.data.synthetic import random_power_law_graph
    from stemgnn_tpu.ops.edge_layout import build_edge_layout
    from stemgnn_tpu.ops.fused_sage import fused_sage_aggregate

    n, e, d = 169_343, 1_166_243, 768
    _, s_np, r_np, _ = random_power_law_graph(n, e, d, seed=0,
                                              with_edge_feat=False)
    n_pad = round_up(n, 128)
    # symmetrized variant with the same edge count (directed half each way)
    half = e // 2
    s_sym = np.concatenate([s_np[:half], r_np[:half + e % 2]])
    r_sym = np.concatenate([r_np[:half], s_np[:half + e % 2]])

    x0 = jax.jit(lambda k: jax.random.normal(k, (n_pad, d), jnp.float32))(
        jax.random.PRNGKey(0)).astype(jnp.bfloat16)

    def step(x, lay):
        return jax.grad(lambda x: jnp.sum(fused_sage_aggregate(
            x, lay, None, reduce="mean", relu=True, bf16_messages=True,
            bf16_out=True, slots=4).astype(jnp.float32) ** 2))(x)

    def fwd(x, lay):
        return fused_sage_aggregate(x, lay, None, reduce="mean", relu=True,
                                    bf16_messages=True, bf16_out=True,
                                    slots=4)

    for tag, ss, rr in [("directed", s_np, r_np), ("symmetric", s_sym, r_sym)]:
        for hub in (0, args.hub):
            lay = jax.device_put(build_edge_layout(
                ss, rr, n_pad, edge_chunk=512, hub_size=hub))
            if hub:
                cov = lambda h: f"{h.coverage:.3f}" if h else "off"
                print(f"{tag} hub={hub}: coverage fwd={cov(lay.hub_r)} "
                      f"bwd={cov(lay.hub_s)}", flush=True)
            tf = bench_scan(fwd, x0, lay)
            tb = bench_scan(step, x0, lay)
            print(f"{tag:9s} hub={hub:5d}: fwd {tf*1e3:7.2f} ms | fwd+bwd "
                  f"{tb*1e3:7.2f} ms  {e/tb/1e6:6.2f} M edges/s", flush=True)


if __name__ == "__main__":
    main()
