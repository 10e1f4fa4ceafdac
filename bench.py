"""Benchmark: SpMM (SAGE aggregation) fwd+bwd edges/s/chip.

The driver's primary metric (BASELINE.json): edges/s/chip for the sparse
aggregation that dominates the model's FLOP/byte profile
(SURVEY.md §3.3 — MySAGEConv's gather + relu(x_j+xe) + segment-mean and its
backward scatter).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the fraction of the per-chip HBM-bandwidth roofline
achieved (the reference publishes no numbers — BASELINE.md — so
speed-of-light fraction is the comparable scalar; 1.0 == roofline).

Roofline model per edge (no cache reuse assumed, f32):
  fwd: read src row (D*4 B) ; amortized writes O(N*D) << E*D
  bwd: read grad-out row via dst + scatter-add src grad row (2 * D*4 B)
  => ~3 * D * 4 bytes/edge fwd+bwd.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# Per-chip HBM bandwidth (B/s) by platform for the roofline denominator.
_HBM_BW = {
    "tpu v5 lite": 819e9,     # v5e
    "tpu v5": 2765e9,         # v5p
    "tpu v4": 1228e9,
    "cpu": 50e9,
}


def _detect_bw():
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu").lower()
    for k, v in _HBM_BW.items():
        if k in kind:
            return v
    return _HBM_BW["cpu"]


def main():
    from stemgnn_tpu.data.synthetic import random_power_law_graph
    from stemgnn_tpu.ops.spmm import gather_scatter_aggregate

    on_tpu = jax.default_backend() == "tpu"
    # arxiv-class workload on TPU; small on CPU.
    if on_tpu:
        n, e, d = 169_343, 1_166_243, 768
    else:
        n, e, d = 20_000, 100_000, 256

    x_np, s_np, r_np, _ = random_power_law_graph(n, e, d, seed=0,
                                                 with_edge_feat=False)
    # receiver-sorted edges (the framework's canonical layout)
    order = np.argsort(r_np, kind="stable")
    s_np, r_np = s_np[order], r_np[order]

    x = jnp.asarray(x_np)
    s = jnp.asarray(s_np)
    r = jnp.asarray(r_np)

    def loss(x):
        out = gather_scatter_aggregate(x, s, r, None, num_nodes=n,
                                       reduce="mean", relu=True,
                                       indices_are_sorted=True)
        return jnp.sum(out * out)

    step = jax.jit(jax.grad(loss))

    g = step(x)
    g.block_until_ready()           # compile + warmup
    iters = 10 if on_tpu else 3
    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(x)
    g.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    edges_per_s = e / dt
    roofline = _detect_bw() / (3 * d * 4)
    result = {
        "metric": "spmm_fwd_bwd_edges_per_s_per_chip",
        "value": round(edges_per_s),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / roofline, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
