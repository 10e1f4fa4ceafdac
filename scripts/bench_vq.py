"""VQ forward fwd+bwd timing: fused nearest-code Pallas kernel vs XLA.

VERDICT r2 item 9 ("win or delete"): measure the opt-in fused kernel
(ops/vq_pallas.py) against the plain XLA path at the flagship pretrain
shapes (cosine codebook, 4 heads x 128 codes x 768 code_dim,
deterministic argmax — reference pretrain.py:113-118) over a range of N.
Dependent-scan timing with scalar readback (the tunnel discipline,
bench.py).  Prints one JSON line per (path, N).
"""

import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2048,8192,40960")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from stemgnn_tpu.core.config import VQConfig
    from stemgnn_tpu.utils.jax_cache import enable_persistent_cache
    from stemgnn_tpu.vq import vq_apply, vq_init
    enable_persistent_cache()

    for n in [int(s) for s in args.sizes.split(",")]:
        for fused in (False, True):
            cfg = VQConfig(dim=768, codebook_size=128, codebook_dim=768,
                           heads=4, kmeans_init=False, fused_kernel=fused)
            key = jax.random.PRNGKey(0)
            params, state = vq_init(key, cfg)
            z = jax.random.normal(key, (n, 768), jnp.float32)

            def step(z, params, state):
                def loss(z):
                    out = vq_apply(params, state, cfg, z, training=True,
                                   rng=jax.random.PRNGKey(1))
                    return jnp.sum(out["quantize"] ** 2) + out["loss"]
                return jax.grad(loss)(z)

            @jax.jit
            def run(z, params, state):
                def body(z, _):
                    g = step(z, params, state)
                    probe = g[0, 0]
                    return z.at[0, 0].add((probe * 1e-9).astype(z.dtype)), \
                        probe
                z, probes = jax.lax.scan(body, z, None, length=args.iters)
                return jnp.sum(probes)

            float(run(z, params, state))
            t0 = time.perf_counter()
            float(run(z, params, state))
            dt = max((time.perf_counter() - t0 - 0.003) / args.iters, 1e-9)
            print(json.dumps({"metric": "vq_fwd_bwd_ms", "n": n,
                              "fused": fused,
                              "value": round(dt * 1e3, 3), "unit": "ms"}),
                  flush=True)


if __name__ == "__main__":
    main()
