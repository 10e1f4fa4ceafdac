"""Probe: is the XLA row gather row-rate-limited or bandwidth-limited?

Plus: hub coverage stats f(H) for the bench power-law graph (fraction of
edges whose sender is among the H highest-out-degree nodes).
"""

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
    from stemgnn_tpu.data.synthetic import random_power_law_graph

    n, e = 169_343, 1_166_243
    _, s_np, r_np, _ = random_power_law_graph(n, e, 8, seed=0,
                                              with_edge_feat=False)

    # hub coverage
    deg = np.bincount(s_np, minlength=n)
    order = np.argsort(-deg)
    cum = np.cumsum(deg[order])
    for h in (512, 1024, 2048, 4096, 8192, 16384):
        print(f"hub H={h:6d}: covers {cum[h-1]/e*100:5.1f}% of edges")
    rdeg = np.bincount(r_np, minlength=n)
    cumr = np.cumsum(rdeg[np.argsort(-rdeg)])
    for h in (2048, 4096, 8192):
        print(f"recv-hub H={h:6d}: covers {cumr[h-1]/e*100:5.1f}% of edges")

    senders = jnp.asarray(np.sort(s_np))        # receiver-sorted ~ random
    senders_rand = jnp.asarray(s_np)

    for d, dt_name, dtype in [(768, "bf16", jnp.bfloat16),
                              (768, "f32", jnp.float32),
                              (384, "bf16", jnp.bfloat16),
                              (1536, "bf16", jnp.bfloat16),
                              (192, "bf16", jnp.bfloat16)]:
        x = jax.jit(lambda k: jax.random.normal(
            k, (n, d), jnp.float32).astype(dtype))(jax.random.PRNGKey(0))

        def g_step(x, idx, c):
            out = jnp.take(x, idx, axis=0, mode="clip")
            return jnp.sum(out.astype(jnp.float32) * (1 + c * 1e-20))

        t = bench_scalar_scan(g_step, x, senders_rand, iters=8)
        rows_ns = t / e * 1e9
        gbs = e * d * np.dtype(dtype).itemsize / t / 1e9
        print(f"gather D={d:5d} {dt_name:4s}: {t*1e3:7.2f} ms  "
              f"{rows_ns:5.1f} ns/row  {gbs:6.1f} GB/s")

    # sorted indices variant
    x = jax.jit(lambda k: jax.random.normal(
        k, (n, 768), jnp.float32).astype(jnp.bfloat16))(jax.random.PRNGKey(0))

    def g_sorted(x, idx, c):
        out = jnp.take(x, idx, axis=0, mode="clip",
                       indices_are_sorted=True)
        return jnp.sum(out.astype(jnp.float32) * (1 + c * 1e-20))

    t = bench_scalar_scan(g_sorted, x, senders, iters=8)
    print(f"gather D=768 bf16 sorted-hint: {t*1e3:7.2f} ms  "
          f"{t/e*1e9:5.1f} ns/row")


if __name__ == "__main__":
    main()
