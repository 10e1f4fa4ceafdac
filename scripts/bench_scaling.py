"""Multi-device scaling benchmark: halo-partitioned SAGE aggregation.

Measures fwd+bwd edges/s of the node-sharded halo-exchange aggregation
(stemgnn_tpu/parallel/halo.py — local aggregation overlapped with
all_to_all boundary exchange) at 1, 2, ..., N devices on one synthetic
power-law graph, and reports scaling efficiency vs the single-device rate
(driver target: >= 80% at N hosts, BASELINE.md).

Runs BOTH aggregation paths per device count:
  * xla   — gather + segment_sum (portable),
  * fused — per-shard Pallas one-hot MXU scatter layouts
            (parallel.halo.build_halo_layouts; interpret mode off-TPU),
so scaling is measured on the kernels that earn the single-chip number
(VERDICT r1 item 1).  Each line also carries the static COMMUNICATION
diagnostics of the partition — per-layer all_to_all bytes, boundary edge
fraction, halo slots — which are hardware-independent and tracked
round-over-round in BASELINE.md even when only a virtual CPU mesh exists.

Usage:
  python scripts/bench_scaling.py                     # all visible devices
  python scripts/bench_scaling.py --force_cpu_devices 8 --edges 200000
Prints one JSON line per (path, device count).

SAFE-RUN RECIPE for real TPU pods (this script wedged the tunneled v5e in
round 2 — scan + shard_map + collectives under grad is the heaviest
program family in the repo):
  1. Precompile via the persistent cache on a throwaway run with
     ``--iters 1 --device_counts <N>`` so the timed run starts from the
     cache (first compiles take minutes and a killed client mid-compile
     wedges the chip).
  2. Run ONE device count per process (``--device_counts 8``), never a
     sweep in one process: a wedge then costs one point, not the run.
  3. Never kill the process mid-program; if it stalls, wait >= 30 min
     (the chip recovers on its own; short-timeout probes prolong it).
  4. On shared/tunneled chips prefer ``--paths xla`` first to validate the
     mesh, then ``fused``.
CPU-mesh runs (``--force_cpu_devices``) are always safe and produce the
hardware-independent communication diagnostics.
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
    ap.add_argument("--paths", type=str, default="",
                    help="comma list of xla,fused (default: both on TPU, "
                         "xla-only on CPU unless --fused_interpret)")
    ap.add_argument("--fused_interpret", action="store_true",
                    help="run the fused path in Pallas interpret mode on "
                         "CPU (slow; mechanics/diagnostics only)")
    ap.add_argument("--hub_size", type=int, default=0)
    ap.add_argument("--balance", action="store_true",
                    help="degree-balanced node relabeling before the "
                         "partition (equalizes per-shard edge load)")
    ap.add_argument("--order", default="none",
                    choices=["none", "balance", "rcm", "community"],
                    help="node ordering before the partition: balance "
                         "(= --balance) vs contiguous-RCM ownership "
                         "(locality + fewer boundary edges)")
    ap.add_argument("--graph", default="powerlaw",
                    choices=["powerlaw", "community"],
                    help="community: shuffled community-structured graph "
                         "(data.synthetic.community_power_law_graph) — the "
                         "case where RCM ownership pays")
    args = ap.parse_args()

    import jax
    if args.force_cpu_devices:
        jax.config.update("jax_num_cpu_devices", args.force_cpu_devices)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from stemgnn_tpu.data.synthetic import random_power_law_graph
    from stemgnn_tpu.parallel.halo import (_local, _shard_layout,
                                           build_halo_layouts,
                                           build_halo_partition,
                                           halo_sage_aggregate,
                                           halo_sage_aggregate_fused)
    from stemgnn_tpu.parallel.mesh import make_mesh

    devices = jax.devices()
    on_tpu = devices[0].platform == "tpu"
    n, e, d = args.nodes, args.edges, args.dim
    if args.paths:
        paths = args.paths.split(",")
    else:
        paths = ["xla", "fused"] if (on_tpu or args.fused_interpret) \
            else ["xla"]
    if args.device_counts:
        counts = [int(c) for c in args.device_counts.split(",")]
    else:
        counts, c = [], 1
        while c <= len(devices):
            counts.append(c)
            c *= 2
    if args.graph == "community":
        from stemgnn_tpu.data.synthetic import community_power_law_graph
        _, s_np, r_np, _ = community_power_law_graph(
            n, e, d, seed=0, with_edge_feat=False)
    else:
        _, s_np, r_np, _ = random_power_law_graph(n, e, d, seed=0,
                                                  with_edge_feat=False)
    order = "balance" if args.balance else args.order
    if order in ("rcm", "community"):
        # contiguous ownership: relabel ONCE (device-count independent)
        from stemgnn_tpu.ops.reorder import (community_order, rcm_order,
                                             relabel)
        perm = (rcm_order if order == "rcm" else community_order)(
            s_np, r_np, n)
        s_np, r_np, _ = relabel(perm, s_np, r_np)
        s_np, r_np = s_np.astype(np.int32), r_np.astype(np.int32)
    rng = np.random.default_rng(0)
    base_rate = {}
    for n_dev in counts:
        mesh = make_mesh(axis_names=("edge",), devices=devices[:n_dev])
        s_c, r_c, n_c = s_np, r_np, n
        if order == "balance" and n_dev > 1:
            from stemgnn_tpu.parallel.halo import degree_balanced_relabel
            new_of_old, nb_bal = degree_balanced_relabel(r_np, n, n_dev)
            s_c, r_c = new_of_old[s_np], new_of_old[r_np]
            n_c = n_dev * nb_bal
        part, nb, R = build_halo_partition(s_c, r_c, n_c, n_dev)
        x = rng.standard_normal((n_dev * nb, d)).astype(np.float32)

        # static communication diagnostics (hardware-independent): the only
        # cross-device traffic per layer is the all_to_all of send_idx-
        # selected rows — S * S * R * d floats total across the mesh.
        boundary_edges = int(part["m_rem"].sum())
        a2a_bytes_per_layer = n_dev * n_dev * R * d * 4
        # load balance across shards (SURVEY §7.3 risk: power-law graphs
        # skew contiguous-range partitions): max/mean edges per shard
        per_shard = part["m_loc"].sum(1) + part["m_rem"].sum(1)
        imbalance = float(per_shard.max() / max(per_shard.mean(), 1.0))
        diag = {
            "halo_slots_R": int(R),
            "boundary_edge_frac": round(boundary_edges / max(e, 1), 4),
            "all_to_all_MB_per_layer": round(a2a_bytes_per_layer / 1e6, 2),
            "shard_edge_imbalance": round(imbalance, 3),
        }

        lay_loc = lay_rem = None
        if "fused" in paths and n_dev >= 1:
            lay_loc, lay_rem = build_halo_layouts(
                part, nb, R, n_dev, node_block=min(128, nb),
                edge_chunk=512, hub_size=args.hub_size)
            lay_loc = jax.device_put(jax.tree.map(jnp.asarray, lay_loc))
            lay_rem = jax.device_put(jax.tree.map(jnp.asarray, lay_rem))

        def make_step(path):
            interpret = not on_tpu

            def step(x_sh, part, ll=None, lr=None):
                def loss_fn(x_sh):
                    def fwd(x_loc, part, *lays):
                        if path == "fused":
                            out = halo_sage_aggregate_fused(
                                x_loc[0], _local(part),
                                _shard_layout(lays[0]),
                                _shard_layout(lays[1]), None, axis="edge",
                                interpret=interpret, bf16_messages=True)
                        else:
                            out = halo_sage_aggregate(x_loc[0], _local(part),
                                                      axis="edge")
                        return jax.lax.psum(
                            jnp.sum(out.astype(jnp.float32) ** 2), "edge")
                    spec = {k: P("edge") for k in part}
                    lay_args, lay_specs = (), ()
                    if path == "fused":
                        lay_args = (ll, lr)
                        lay_specs = tuple(
                            jax.tree.map(lambda _: P("edge"), la)
                            for la in lay_args)
                    return jax.shard_map(
                        fwd, mesh=mesh, in_specs=(P("edge"), spec)
                        + lay_specs, out_specs=P(), check_vma=False)(
                            x_sh.reshape(n_dev, nb, d), part, *lay_args)
                return jax.grad(loss_fn)(x_sh)

            @jax.jit
            def run(x, part, ll=None, lr=None):
                def body(x, _):
                    dx = step(x, part, ll, lr)
                    probe = dx.reshape(-1)[0]
                    return x.at[0, 0].add(probe * 1e-9), probe
                x, probes = jax.lax.scan(body, x, None, length=args.iters)
                return jnp.sum(probes)
            return run

        part_dev = jax.device_put(part)
        x_dev = jnp.asarray(x)
        for path in paths:
            run = make_step(path)
            lay_args = (lay_loc, lay_rem) if path == "fused" else ()
            float(run(x_dev, part_dev, *lay_args))       # compile + warm
            t0 = time.perf_counter()
            float(run(x_dev, part_dev, *lay_args))
            dt = max((time.perf_counter() - t0) / args.iters, 1e-9)
            rate = e / dt
            if path not in base_rate:
                base_rate[path] = rate
            print(json.dumps({
                "metric": f"halo_sage_fwd_bwd_edges_per_s_{path}",
                "devices": n_dev,
                "value": round(rate),
                "unit": "edges/s",
                "efficiency_vs_1dev": round(
                    rate / (base_rate[path] * n_dev), 4),
                # virtual CPU meshes share one host: efficiency there
                # validates mechanics only, not the >=80% hardware target
                "platform": devices[0].platform,
                **diag,
            }), flush=True)


if __name__ == "__main__":
    main()
