"""CPU-mesh reproducer for the scan+shard_map+collectives wedge.

Runs the exact program family that wedged the tunneled v5e in round 2
(docs/wedge.md): ``jit(scan(grad(shard_map(fused halo aggregation with
all_to_all + psum))))`` — at small scale on a virtual CPU mesh, where it
is safe. Completion means the wedge does NOT reproduce on this backend;
a hang here would be a genuine upstream reproducer worth minimizing.

REFUSES to run on TPU (the whole point is not to wedge the shared chip);
pass --force_tpu only on a dedicated pod you are allowed to stall for
30 minutes.
"""

import argparse
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--nodes", type=int, default=2_000)
    ap.add_argument("--edges", type=int, default=12_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--scan_len", type=int, default=8)
    ap.add_argument("--force_tpu", action="store_true")
    args = ap.parse_args()

    import jax
    if not args.force_tpu:
        jax.config.update("jax_num_cpu_devices", args.devices)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from stemgnn_tpu.data.synthetic import random_power_law_graph
    from stemgnn_tpu.parallel.halo import (_local, _shard_layout,
                                           build_halo_layouts,
                                           build_halo_partition,
                                           halo_sage_aggregate_fused)
    from stemgnn_tpu.parallel.mesh import make_mesh

    devices = jax.devices()
    if devices[0].platform == "tpu" and not args.force_tpu:
        raise SystemExit("refusing to run the wedge family on a TPU "
                         "without --force_tpu (docs/wedge.md)")
    n_dev = min(args.devices, len(devices))
    mesh = make_mesh(axis_names=("edge",), devices=devices[:n_dev])
    n, e, d = args.nodes, args.edges, args.dim
    _, s_np, r_np, _ = random_power_law_graph(n, e, d, seed=0,
                                              with_edge_feat=False)
    part, nb, R = build_halo_partition(s_np, r_np, n, n_dev, pad_multiple=8)
    lay_loc, lay_rem = build_halo_layouts(part, nb, R, n_dev,
                                          node_block=min(128, nb),
                                          edge_chunk=128)
    lay_loc = jax.device_put(jax.tree.map(jnp.asarray, lay_loc))
    lay_rem = jax.device_put(jax.tree.map(jnp.asarray, lay_rem))
    interpret = devices[0].platform != "tpu"
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (n_dev * nb, d)).astype(np.float32))
    part_dev = {k: jnp.asarray(v) for k, v in part.items()}

    def step(x_sh, part, ll, lr):
        def loss_fn(x_sh):
            def fwd(x_loc, part, ll, lr):
                out = halo_sage_aggregate_fused(
                    x_loc[0], _local(part), _shard_layout(ll),
                    _shard_layout(lr), None, axis="edge",
                    interpret=interpret, bf16_messages=True)
                return jax.lax.psum(jnp.sum(out.astype(jnp.float32) ** 2),
                                    "edge")
            spec = {k: P("edge") for k in part}
            lay_specs = tuple(jax.tree.map(lambda _: P("edge"), la)
                              for la in (ll, lr))
            return jax.shard_map(
                fwd, mesh=mesh, in_specs=(P("edge"), spec) + lay_specs,
                out_specs=P(), check_vma=False)(
                    x_sh.reshape(n_dev, nb, d), part, ll, lr)
        return jax.grad(loss_fn)(x_sh)

    @jax.jit
    def run(x, part, ll, lr):
        def body(x, _):
            dx = step(x, part, ll, lr)
            probe = dx.reshape(-1)[0]
            return x + dx * 1e-9, probe
        x, probes = jax.lax.scan(body, x, None, length=args.scan_len)
        return jnp.sum(probes)

    t0 = time.perf_counter()
    out = float(run(x, part_dev, lay_loc, lay_rem))
    t1 = time.perf_counter()
    out2 = float(run(x, part_dev, lay_loc, lay_rem))
    t2 = time.perf_counter()
    assert np.isfinite(out) and np.isfinite(out2)
    print(f"wedge family completed on {devices[0].platform} x{n_dev}: "
          f"scan_len={args.scan_len}, first {t1 - t0:.1f}s "
          f"(incl. compile), second {t2 - t1:.1f}s — no wedge")


if __name__ == "__main__":
    main()
