"""Marginal halo-pretrain step time at arxiv scale (r5 follow-up).

The instrumented driver shows ~0.65 s dispatch+readback per epoch at 169K
nodes while the single-chip probe's marginal step is 0.162 s.  This probe
separates per-dispatch overhead from device time: N back-to-back step
dispatches with ONE final scalar readback (async chain; the first
readback forces the chain) vs 4N — two-point differencing at the
dispatch level, no scan anywhere near shard_map (docs/wedge.md).
"""

import argparse
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))

from stemgnn_tpu.utils.jax_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--mp", action="store_true")
    ap.add_argument("--halo_hub", type=int, default=512)
    ap.add_argument("--edge_p", type=float, default=0.2)
    ap.add_argument("--feat_p", type=float, default=0.2)
    ap.add_argument("--topo_ratio", type=float, default=0.1)
    ap.add_argument("--sem_lambda", type=float, default=1.0)
    ap.add_argument("--dataset", default="arxiv_synthetic")
    args = ap.parse_args()

    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from stemgnn_tpu.core.config import (EncoderConfig, PretrainConfig,
                                         VQConfig)
    from stemgnn_tpu.data.merge import merge_datasets
    from stemgnn_tpu.data.registry import load_dataset
    from stemgnn_tpu.data.sampler import get_train_node_idx
    from stemgnn_tpu.models.pretrain import pretrain_init
    from stemgnn_tpu.parallel.halo_pretrain import (
        make_halo_pretrain_step, prepare_halo_pretrain_graph)
    from stemgnn_tpu.parallel.mesh import make_mesh
    from stemgnn_tpu.train.optim import make_optimizer

    cfg = PretrainConfig(
        encoder=EncoderConfig(input_dim=768, hidden_dim=768, num_layers=2,
                              normalize="batch", dropout=0.15,
                              compute_dtype="bfloat16" if args.mp
                              else "float32"),
        vq=VQConfig(dim=768, codebook_size=128, codebook_dim=768, heads=4,
                    commitment_weight=10.0, orthogonal_reg_weight=1.0,
                    orthogonal_reg_max_codes=32,
                    compute_dtype="bfloat16" if args.mp else "float32"),
        teacher_bf16=args.mp, loss_bf16=args.mp,
        edge_p=args.edge_p, feat_p=args.feat_p,
        topo_recon_ratio=args.topo_ratio, sem_lambda=args.sem_lambda)

    ds = load_dataset(args.dataset, feat_dim=768, seed=42)
    merged = merge_datasets([ds])
    node_feat = np.asarray(merged["node_text_feat"],
                           np.float32)[np.asarray(merged["x"])]
    xe = merged.get("xe")
    t0 = time.perf_counter()
    sg, nb, layouts, edge_table = prepare_halo_pretrain_graph(
        node_feat, np.asarray(merged["edge_index"]), 1,
        xe_ids=None if xe is None else np.asarray(xe, np.int32),
        edge_table=merged.get("edge_text_feat"), hub_size=args.halo_hub)
    print(f"prepare: {time.perf_counter() - t0:.1f} s "
          f"(nb={nb})", flush=True)
    mesh = make_mesh(axis_sizes=(1, 1), axis_names=("data", "edge"),
                     devices=np.asarray(jax.devices()[:1]))
    tx = make_optimizer(cfg.lr, cfg.weight_decay, grad_clip=cfg.grad_clip,
                        use_scheduler=False)
    step = make_halo_pretrain_step(cfg, tx, mesh, layouts, edge_table)
    params, teacher, state = pretrain_init(jax.random.PRNGKey(0), cfg)
    opt_state = tx.init(params)
    n = node_feat.shape[0]
    rng_np = np.random.default_rng(0)
    seeds = get_train_node_idx(np.asarray(merged["ptr"]), [1.0], rng_np)
    w = np.zeros((1, nb), np.float32)
    np.add.at(w[0], seeds, 1.0)
    seed_w = jnp.asarray(w.reshape(1, 1, nb))
    rngs = jax.random.split(jax.random.PRNGKey(1), 1)

    def run(k):
        p, t, o, s = params, teacher, opt_state, state
        m = None
        for _ in range(k):
            p, t, o, s, m = step(p, t, o, s, rngs, seed_w, sg, *layouts)
        return float(m["loss"])   # ONE readback forces the whole chain

    run(1)                        # compile + warm
    best = {}
    for k in (args.reps, 4 * args.reps):
        b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run(k)
            b = min(b, time.perf_counter() - t0)
        best[k] = b
        print(f"chain of {k}: best {b:.2f} s ({b / k * 1e3:.0f} ms/step "
              f"incl. shared overhead)", flush=True)
    marg = (best[4 * args.reps] - best[args.reps]) / (3 * args.reps)
    print(f"marginal step (two-point): {marg * 1e3:.0f} ms; per-dispatch "
          f"overhead ~= {(best[args.reps] / args.reps - marg) * 1e3:.0f} ms",
          flush=True)


if __name__ == "__main__":
    main()
