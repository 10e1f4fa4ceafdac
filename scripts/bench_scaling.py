"""Multi-device scaling benchmark: halo-partitioned SAGE aggregation.

Measures fwd+bwd edges/s of the node-sharded halo-exchange aggregation
(stemgnn_tpu/parallel/halo.py — local aggregation overlapped with
all_to_all boundary exchange) at 1, 2, ..., N devices on one synthetic
power-law graph, and reports scaling efficiency vs the single-device rate
(driver target: >= 80% at N hosts, BASELINE.md).

On a real TPU slice this is the headline scaling number.  Without one it
still runs on a virtual CPU mesh (``--force_cpu_devices N``) to validate
the mechanics; those rates are NOT hardware-meaningful.

Usage:
  python scripts/bench_scaling.py                     # all visible devices
  python scripts/bench_scaling.py --force_cpu_devices 8 --edges 200000
Prints one JSON line per device count.
"""

import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=100_000)
    ap.add_argument("--edges", type=int, default=800_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--force_cpu_devices", type=int, default=0,
                    help="provision a virtual CPU mesh of this size")
    ap.add_argument("--device_counts", type=str, default="",
                    help="comma list, default 1,2,4,...,N")
    args = ap.parse_args()

    import jax
    if args.force_cpu_devices:
        jax.config.update("jax_num_cpu_devices", args.force_cpu_devices)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from stemgnn_tpu.data.synthetic import random_power_law_graph
    from stemgnn_tpu.parallel.halo import (build_halo_partition, _local,
                                           halo_sage_aggregate)
    from stemgnn_tpu.parallel.mesh import make_mesh

    devices = jax.devices()
    n, e, d = args.nodes, args.edges, args.dim
    if args.device_counts:
        counts = [int(c) for c in args.device_counts.split(",")]
    else:
        counts, c = [], 1
        while c <= len(devices):
            counts.append(c)
            c *= 2
    _, s_np, r_np, _ = random_power_law_graph(n, e, d, seed=0,
                                              with_edge_feat=False)
    rng = np.random.default_rng(0)
    base_rate = None
    for n_dev in counts:
        mesh = make_mesh(axis_names=("edge",), devices=devices[:n_dev])
        part, nb, _ = build_halo_partition(s_np, r_np, n, n_dev)
        x = rng.standard_normal((n_dev * nb, d)).astype(np.float32)

        def step(x_sh, part):
            def loss_fn(x_sh):
                def fwd(x_loc, part):
                    out = halo_sage_aggregate(x_loc[0], _local(part),
                                              axis="edge")
                    return jax.lax.psum(jnp.sum(out.astype(jnp.float32) ** 2),
                                        "edge")
                spec = {k: P("edge") for k in part}
                return jax.shard_map(
                    fwd, mesh=mesh, in_specs=(P("edge"), spec),
                    out_specs=P(), check_vma=False)(
                        x_sh.reshape(n_dev, nb, d), part)
            return jax.grad(loss_fn)(x_sh)

        @jax.jit
        def run(x, part):
            def body(x, _):
                dx = step(x, part)
                probe = dx.reshape(-1)[0]
                return x.at[0, 0].add(probe * 1e-9), probe
            x, probes = jax.lax.scan(body, x, None, length=args.iters)
            return jnp.sum(probes)

        part_dev = jax.device_put(part)
        x_dev = jnp.asarray(x)
        float(run(x_dev, part_dev))                      # compile + warm
        t0 = time.perf_counter()
        float(run(x_dev, part_dev))
        dt = max((time.perf_counter() - t0) / args.iters, 1e-9)
        rate = e / dt
        if base_rate is None:
            base_rate = rate
        print(json.dumps({
            "metric": "halo_sage_fwd_bwd_edges_per_s",
            "devices": n_dev,
            "value": round(rate),
            "unit": "edges/s",
            "efficiency_vs_1dev": round(rate / (base_rate * n_dev), 4),
            # virtual CPU meshes share one host: efficiency there validates
            # mechanics only, not the >=80% hardware target
            "platform": devices[0].platform,
        }), flush=True)


if __name__ == "__main__":
    main()
