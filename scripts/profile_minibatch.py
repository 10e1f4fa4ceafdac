#!/usr/bin/env python
"""Profile the minibatch pretrain step: host sampling vs device time
(r3 VERDICT item 7 — offline_all2 runs ~15 ms/step vs 7.6 ms for WN18RR;
this records the breakdown and whether the native C++ sampler is engaged).

  python scripts/profile_minibatch.py --mix offline_all2
  python scripts/profile_minibatch.py --mix WN18RR
"""

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
from stemgnn_tpu.utils.jax_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402

from stemgnn_tpu.core import config as cfglib  # noqa: E402
from stemgnn_tpu.data import native_sampler  # noqa: E402
from stemgnn_tpu.data.merge import merge_datasets  # noqa: E402
from stemgnn_tpu.data.registry import load_dataset  # noqa: E402
from stemgnn_tpu.data.sampler import (CSCGraph,  # noqa: E402
                                      NeighborBatchIterator,
                                      get_train_node_idx)

ROOT = osp.join(osp.dirname(osp.abspath(__file__)), "..")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mix", default="offline_all2")
    ap.add_argument("--text_encoder", default="tfidf")
    ap.add_argument("--batch_size", type=int, default=512)
    ap.add_argument("--fanout", type=int, default=10)
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--feat_dim", type=int, default=768)
    args = ap.parse_args()

    weights_map = cfglib.load_yaml(osp.join(ROOT, "configs", "pt_data.yaml"))
    mix = weights_map.get(args.mix, {args.mix: 1.0})
    names, weights = list(mix.keys()), list(mix.values())
    print(f"mix {names} weights {weights}; native sampler: "
          f"{native_sampler.native_available()}", flush=True)
    datasets = [load_dataset(n, feat_dim=args.feat_dim, seed=42,
                             text_encoder=args.text_encoder)
                for n in names]
    merged = merge_datasets(datasets)
    num_nodes = merged["x"].shape[0]
    csc = CSCGraph.from_edge_index(np.asarray(merged["edge_index"]),
                                   num_nodes)
    print(f"merged graph: {num_nodes} nodes, "
          f"{merged['edge_index'].shape[1]} edges", flush=True)

    cfg = cfglib.PretrainConfig(
        encoder=cfglib.EncoderConfig(input_dim=args.feat_dim,
                                     hidden_dim=args.feat_dim, num_layers=2,
                                     normalize="batch", dropout=0.15),
        vq=cfglib.VQConfig(dim=args.feat_dim, codebook_size=128,
                           codebook_dim=args.feat_dim, heads=4,
                           commitment_weight=10.0,
                           orthogonal_reg_weight=1.0,
                           orthogonal_reg_max_codes=32),
        batch_size=args.batch_size, fanout=args.fanout, seed=42)

    rng_np = np.random.default_rng(42)
    seeds = get_train_node_idx(np.asarray(merged["ptr"]), weights, rng_np)

    def make_it():
        return NeighborBatchIterator(
            csc, merged["node_text_feat"], merged.get("edge_text_feat"),
            merged["x"], merged.get("xe"), seeds, cfg.batch_size,
            [cfg.fanout] * 2, rng_np, drop_last=True, indexed=True)

    # ---- host-side sampling alone
    it = make_it()
    batches = []
    t0 = time.perf_counter()
    for g, n_seeds, _ in it:
        batches.append(g)
        if len(batches) >= args.steps:
            break
    t_host = (time.perf_counter() - t0) / len(batches)
    npads = sorted({g.num_nodes_padded for g in batches})
    epads = sorted({g.num_edges_padded for g in batches})
    real_n = np.mean([int(np.sum(g.node_mask)) for g in batches])
    real_e = np.mean([int(np.sum(g.edge_mask)) for g in batches])
    print(f"host sampling: {t_host*1e3:.2f} ms/batch "
          f"({len(batches)} batches)", flush=True)
    print(f"padding buckets: nodes {npads} (real avg {real_n:.0f}), "
          f"edges {epads} (real avg {real_e:.0f})", flush=True)
    bytes_b = sum(np.asarray(v).nbytes
                  for v in jax.tree_util.tree_leaves(batches[0]))
    print(f"per-batch H2D payload (indexed): {bytes_b/1e6:.2f} MB",
          flush=True)

    # ---- device step over PRE-SAMPLED batches (steady-state loop step:
    # RNG + metric accumulation inside the dispatch; scalar readback at
    # the end forces the chain)
    from stemgnn_tpu.models.pretrain import pretrain_init
    from stemgnn_tpu.train.optim import make_optimizer
    from stemgnn_tpu.train.pretrain_loop import (make_pretrain_loop_step,
                                                 make_pretrain_step)
    import jax.numpy as jnp
    node_table = jnp.asarray(np.asarray(merged["node_text_feat"],
                                        np.float32))
    etf = merged.get("edge_text_feat")
    edge_table = None if etf is None else jnp.asarray(
        np.asarray(etf, np.float32))

    key = jax.random.PRNGKey(0)
    params, teacher, state = pretrain_init(jax.random.PRNGKey(1), cfg)
    tx = make_optimizer(cfg.lr, cfg.weight_decay, grad_clip=cfg.grad_clip)
    opt_state = tx.init(params)
    step0 = make_pretrain_step(cfg, tx, bs=cfg.batch_size, indexed=True)
    loop_step = make_pretrain_loop_step(cfg, tx, bs=cfg.batch_size,
                                        indexed=True)

    # group batches per padded shape (each shape = one executable)
    key, k0 = jax.random.split(key)
    params, teacher, opt_state, state, metrics = step0(
        params, teacher, opt_state, state, batches[0], k0, node_table,
        edge_table)
    metrics_sum = metrics
    # warm every shape
    for g in batches:
        params, teacher, opt_state, state, key, metrics_sum = loop_step(
            params, teacher, opt_state, state, g, key, metrics_sum,
            node_table, edge_table)
    float(metrics_sum["loss"])          # drain
    t0 = time.perf_counter()
    for g in batches:
        params, teacher, opt_state, state, key, metrics_sum = loop_step(
            params, teacher, opt_state, state, g, key, metrics_sum,
            node_table, edge_table)
    float(metrics_sum["loss"])          # force the chain
    t_dev = (time.perf_counter() - t0) / len(batches)
    print(f"device step (pre-sampled batches, incl. H2D at dispatch): "
          f"{t_dev*1e3:.2f} ms/step", flush=True)

    # ---- full overlapped loop (host sampling interleaved, as run_pretrain)
    it = make_it()
    n = 0
    t0 = time.perf_counter()
    for g, n_seeds, _ in it:
        params, teacher, opt_state, state, key, metrics_sum = loop_step(
            params, teacher, opt_state, state, g, key, metrics_sum,
            node_table, edge_table)
        n += 1
        if n >= args.steps:
            break
    float(metrics_sum["loss"])
    t_full = (time.perf_counter() - t0) / n
    print(f"full loop (host sampling + device): {t_full*1e3:.2f} ms/step "
          f"-> host {t_host*1e3:.1f} + device-or-overlap "
          f"{(t_full-t_host)*1e3:.1f}", flush=True)


if __name__ == "__main__":
    main()
