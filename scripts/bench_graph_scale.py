#!/usr/bin/env python
"""chempcba-scale synthetic graph-task end-to-end (r3 VERDICT item 6).

Generates ~400K synthetic molecules as SMILES, featurizes them through the
from-scratch chem pipeline (data/chem.py — parser, perception, text
features, indexed dedup bundles), then runs the real minibatch graph
finetune (multitask BCE over 128 tasks, per-task AUC eval — reference
task/graph.py:7-97, loader utils/loader.py:48-72) on the chip, recording
s/epoch and the host-batch-building vs device split.

  python scripts/bench_graph_scale.py --num_graphs 400000 --epochs 2
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from stemgnn_tpu.utils.jax_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

_ATOMS = ["C", "C", "C", "C", "N", "O", "C", "S", "F"]


def random_smiles(rng) -> str:
    """Valence-safe random molecule: a carbon-ish chain with branches and
    an optional ring closure, single/double bonds."""
    n = int(rng.integers(6, 22))
    out = []
    open_ring = -1
    depth = 0
    for i in range(n):
        a = _ATOMS[rng.integers(0, len(_ATOMS))]
        if i > 0 and a == "C" and rng.random() < 0.12:
            out.append("=")
        out.append(a)
        if a == "C" and open_ring < 0 and 1 < i < n - 4 \
                and rng.random() < 0.15:
            out.append("1")
            open_ring = i
        if a in ("C", "N") and i < n - 2 and depth < 2 \
                and rng.random() < 0.22:
            out.append("(")
            depth += 1
        elif depth > 0 and rng.random() < 0.4:
            out.append(")")
            depth -= 1
    while depth > 0:
        out.append(")")
        depth -= 1
    if open_ring >= 0:
        out.append("C1")
    return "".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_graphs", type=int, default=400_000)
    ap.add_argument("--num_tasks", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch_size", type=int, default=512)
    ap.add_argument("--feat_dim", type=int, default=768)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke testing)")
    ap.add_argument("--eval_bf16", type=int, default=0, choices=[0, 1],
                    help="bf16 eval forward (r5, cfg.eval_bf16)")
    ap.add_argument("--eval_every", type=int, default=1)
    ap.add_argument("--eval_batch_size", type=int, default=0,
                    help="eval batches larger than train (0 = batch_size)")
    ap.add_argument("--eval_train_auc", type=int, default=1,
                    choices=[0, 1])
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(args.seed)

    # ---- generate + featurize through the real chem pipeline
    t0 = time.perf_counter()
    smiles, bad = [], 0
    from stemgnn_tpu.data.chem import SmilesError, parse_smiles
    while len(smiles) < args.num_graphs:
        s = random_smiles(rng)
        try:
            parse_smiles(s)
        except SmilesError:
            bad += 1
            continue
        smiles.append(s)
    t_gen = time.perf_counter() - t0
    print(f"generated {len(smiles)} SMILES ({bad} rejects) in {t_gen:.1f} s",
          flush=True)

    # pcba-like labels: 128 tasks, ~60% NaN, learnable from atom counts
    n_c = np.asarray([s.count("C") for s in smiles], np.float64)
    n_het = np.asarray([s.count("N") + s.count("O") + s.count("S")
                        for s in smiles], np.float64)
    w = rng.standard_normal((2, args.num_tasks))
    score = np.stack([n_c, n_het], 1) @ w
    labels = (score > np.median(score, axis=0)).astype(np.float64)
    labels[rng.random(labels.shape) < 0.6] = np.nan
    split_names = rng.choice(["train", "valid", "test"], len(smiles),
                             p=[0.8, 0.1, 0.1])

    t0 = time.perf_counter()
    from stemgnn_tpu.data.chem import mol_dataset_from_smiles
    graphs, labels, split = mol_dataset_from_smiles(
        smiles, labels, split_names, dim=args.feat_dim, indexed=True)
    t_feat = time.perf_counter() - t0
    import resource
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"featurized (indexed bundle): {t_feat:.1f} s, host RSS "
          f"{rss_gb:.2f} GB, node table {graphs.node_table.shape}, "
          f"edge table {graphs.edge_table.shape}", flush=True)

    # ---- host-only batch-building pass (the host side of an epoch)
    from stemgnn_tpu.train.finetune_loop import _batch_graph_list
    tr_idx = np.where(split["train"])[0]
    t0 = time.perf_counter()
    n_b = 0
    for _ in _batch_graph_list(graphs, labels, tr_idx, args.batch_size):
        n_b += 1
    t_host = time.perf_counter() - t0
    print(f"host batch building: {t_host:.2f} s/epoch ({n_b} train batches, "
          f"{t_host/max(n_b,1)*1e3:.1f} ms/batch)", flush=True)

    # ---- real finetune epochs on the chip
    import jax

    from stemgnn_tpu.core.config import (EncoderConfig, FinetuneConfig,
                                         VQConfig)
    from stemgnn_tpu.train.finetune_loop import run_finetune
    d = args.feat_dim
    cfg = FinetuneConfig(
        encoder=EncoderConfig(input_dim=d, hidden_dim=d, num_layers=2,
                              normalize="batch", dropout=0.15),
        vq=VQConfig(dim=d, codebook_size=128, codebook_dim=d, heads=4,
                    commitment_weight=0.25, kmeans_init=True),
        task="graph", epochs=args.epochs, early_stop=args.epochs,
        batch_size=args.batch_size, lr=1e-3, repeat=1,
        num_classes=args.num_tasks, eval_bf16=bool(args.eval_bf16),
        eval_every=args.eval_every, eval_batch_size=args.eval_batch_size,
        eval_train_auc=bool(args.eval_train_auc))
    print(f"devices: {jax.devices()}", flush=True)
    t0 = time.perf_counter()
    logger = run_finetune((graphs, labels, split), cfg, verbose=True)
    t_total = time.perf_counter() - t0
    best = logger.get_best()
    print(f"finetune: {t_total:.1f} s total for {args.epochs} epochs "
          f"(incl. compile + per-epoch 3-split AUC eval) -> "
          f"{t_total/args.epochs:.1f} s/epoch upper bound; host share "
          f"{t_host:.1f} s/epoch ({100*t_host*args.epochs/t_total:.0f}%)",
          flush=True)
    print(f"AUC best val={best['val']['mean']:.2f} "
          f"test={best['test']['mean']:.2f}", flush=True)


if __name__ == "__main__":
    main()
