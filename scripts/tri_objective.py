#!/usr/bin/env python
"""Tri-objective (Fit / OOD / Perturb) evaluation.

Re-design of /root/reference/STEM-GNN/scripts/tri_objective.py: bucket nodes
by feature-structure alignment into ID + OOD1/2/3 (:260-340), train inside
ID, report

  * Fit     — ID-test accuracy,
  * OOD     — min accuracy over the OOD buckets (:746),
  * Perturb — mean ID-test accuracy of the best snapshot under a
              missing-feature sweep p in {0.2, 0.4, 0.6, 0.8} (:750-773).
"""

import numpy as np

from _common import (base_parser, build_cfg, emit, load_node_dataset,
                     parse_with_sweep,
                     load_pretrained)
from stemgnn_tpu.eval.buckets import compute_alignment_buckets, stratified_split
from stemgnn_tpu.eval.perturb import apply_missing_features
from stemgnn_tpu.eval.runner import (evaluate_snapshot_on, nanmean_std,
                                     train_node_with_buckets)

PERTURB_PROBS = (0.2, 0.4, 0.6, 0.8)


def main():
    p = base_parser("tri_objective")
    p.add_argument("--perturb_scope", default="all",
                   choices=["test", "valtest", "all"])
    args = parse_with_sweep(p)
    ds = load_node_dataset(args)
    cfg = build_cfg(args, ds.num_classes)
    pretrained = load_pretrained(args)

    stat, bounds, buckets, no_nbrs, invalid = compute_alignment_buckets(
        ds.node_features(), ds.edge_index, ds.num_nodes)
    print(f"alignment buckets sizes: "
          f"{{ {', '.join(f'{k}:{len(v)}' for k, v in buckets.items())} }}")

    per_run = []
    for r in range(args.runs):
        tr, va, te = stratified_split(buckets["ID"], np.asarray(ds.labels),
                                      seed=args.seed + r)
        split = {"train": tr, "valid": va, "test": te}
        best = train_node_with_buckets(ds, cfg, split, buckets,
                                       pretrained=pretrained,
                                       seed=args.seed + r, verbose=args.debug)
        fit = best["split_acc"]["test"]
        ood = min(best["bucket_acc"][k] for k in ("OOD1", "OOD2", "OOD3"))
        perturb_accs = []
        for prob in PERTURB_PROBS:
            ds_p = apply_missing_features(ds, split, missing_prob=prob,
                                          seed=args.seed + r,
                                          perturb=args.perturb_scope)
            res = evaluate_snapshot_on(ds_p, cfg, best)
            perturb_accs.append(res["test"])
        assert len(perturb_accs) == len(PERTURB_PROBS)
        row = {"fit": fit, "ood": ood,
               "perturb": float(np.mean(perturb_accs)),
               **{f"perturb_p{p_}": a for p_, a in zip(PERTURB_PROBS,
                                                       perturb_accs)},
               **best["bucket_acc"], "best_epoch": best["epoch"]}
        per_run.append(row)
        print(f"[run {r}] fit={fit:.2f} ood={ood:.2f} "
              f"perturb={row['perturb']:.2f}")

    summary = {}
    for k in ["fit", "ood", "perturb"]:
        m, s = nanmean_std([row[k] for row in per_run])
        summary[f"final/{k}_mean"], summary[f"final/{k}_std"] = m, s
    emit({"buckets": {k: len(v) for k, v in buckets.items()},
          "boundaries": bounds, "runs": per_run, "summary": summary}, args)


if __name__ == "__main__":
    main()
