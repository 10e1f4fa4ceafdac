"""Phase breakdown of the bench step at bench shapes (v5e tunnel).

Decomposes the driver metric's fwd+bwd step to locate the non-roofline
residual: full grad step vs forward-only aggregate vs the harness's own
loss/cotangent machinery with no aggregation at all.  All timings use the
same two-point dependent-scan + scalar-readback discipline as bench.py
(best-of-5 per length, short vs 4x differenced — scripts/_bench_common.py).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

from _bench_common import bench_scan as bench  # noqa: E402  (two-point)


def main():
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
    e = s_np.shape[0]
    n_pad = round_up(n, 128)
    x0 = jax.jit(lambda k: jax.random.normal(k, (n_pad, d), jnp.float32))(
        jax.random.PRNGKey(0)).astype(jnp.bfloat16)
    lay = jax.device_put(build_edge_layout(
        s_np, r_np, n_pad, edge_chunk=512, hub_size=512, sc_hub_size=512,
        hub_min_coverage=-1.0))

    def agg(x, lay):
        return fused_sage_aggregate(x, lay, None, reduce="mean", relu=True,
                                    bf16_messages=True, bf16_out=True,
                                    slots=4)

    cases = {
        # the full driver-metric step
        "full_fwd_bwd": lambda x, l: jax.grad(
            lambda x: jnp.sum(agg(x, l).astype(jnp.float32) ** 2))(x),
        # forward aggregate only (sum-forced)
        "fwd_only": lambda x, l: agg(x, l) + 0 * x[0, 0],
        # harness-only: identical loss/cotangent machinery, aggregation
        # replaced by an elementwise pass (isolates grad-of-sum-of-squares
        # + scan-carry cost shared by every candidate)
        "harness_only": lambda x, l: jax.grad(
            lambda x: jnp.sum((x * jnp.bfloat16(1.0001)
                               ).astype(jnp.float32) ** 2))(x),
    }
    res = {}
    for name, fn in cases.items():
        res[name] = bench(fn, x0, lay)
        print(f"{name}: {res[name] * 1e3:.2f} ms "
              f"({e / res[name] / 1e6:.1f}M edges/s-equivalent)", flush=True)
    bwd = res["full_fwd_bwd"] - res["fwd_only"]
    print(f"derived: bwd ~= {bwd * 1e3:.2f} ms; harness share of full = "
          f"{res['harness_only'] / res['full_fwd_bwd'] * 100:.1f}%")

    # ---- component rooflines: the four dense hub blocks are the step's
    # FLOPs; time each standalone and report MXU fraction (v5e bf16 peak
    # 197 TFLOP/s).  Probe = sum(out^2): nonlinear, so XLA cannot push the
    # reduce into the dot and slice the computation away.
    from _bench_common import bench_scalar_scan
    hub = lay.hub_r
    h = int(hub.cnt.shape[1])
    flops = 2.0 * hub.cnt.shape[0] * h * d
    # scatter-hub flops from sc_cnt's OWN shape — only equal to ``flops``
    # while sc_hub_size == hub_size (ADVICE r4)
    sc_flops = 2.0 * hub.sc_cnt.shape[0] * hub.sc_cnt.shape[1] * d

    # The scan carry ``c`` perturbs the SMALL operand each iteration so
    # XLA cannot hoist the matmul out of the loop; the sum-of-squares
    # probe (nonlinear) blocks reduce-through-dot rewrites.  Reported
    # times are slight over-estimates: they include the perturb pass and
    # the probe's read of the output.
    def hub_mm(x, lay, c):
        xh = jax.nn.relu(jnp.take(x, lay.hub_r.hub_ids, axis=0)
                         + (c * 1e-20).astype(x.dtype))      # [H, D] tiny
        out = jax.lax.dot_general(
            lay.hub_r.cnt, xh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16)
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-12

    def sc_mm(x, lay, c):
        f_all = jax.nn.relu(x)                               # hoisted: ok
        sc = lay.hub_r.sc_cnt * (1 + c * 1e-20).astype(x.dtype)
        out = jax.lax.dot_general(
            sc, f_all,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jnp.sum(out ** 2) * 1e-12

    for name, fn, fl in (("gather_hub_matmul", hub_mm, flops),
                         ("scatter_hub_matmul", sc_mm, sc_flops)):
        dt = bench_scalar_scan(fn, x0, lay)
        print(f"{name} (H={h}): {dt * 1e3:.2f} ms = "
              f"{fl / dt / 197e12 * 100:.0f}% of bf16 MXU peak "
              f"(upper bound incl. perturb + probe passes)", flush=True)


if __name__ == "__main__":
    main()
