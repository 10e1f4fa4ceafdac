#!/usr/bin/env python
"""Missing-feature robustness evaluation.

Re-design of /root/reference/STEM-GNN/scripts/missing_feature.py: train on
the clean graph (standard splits), then re-evaluate the best-val snapshot on
a graph whose scoped nodes had feature dims Bernoulli-masked with prob
``missing_prob`` (+ optional relative-L2 noise on kept dims, :132-215,
re-eval :656-713).
"""

import numpy as np

from _common import (base_parser, build_cfg, emit, load_node_dataset,
                     parse_with_sweep,
                     load_pretrained)
from stemgnn_tpu.eval.perturb import apply_missing_features
from stemgnn_tpu.eval.runner import (evaluate_snapshot_on, nanmean_std,
                                     train_node_with_buckets)


def main():
    p = base_parser("missing_feature")
    p.add_argument("--missing_prob", type=float, default=0.4)
    p.add_argument("--perturb", default="valtest",
                   choices=["test", "valtest", "all"])
    p.add_argument("--relative_noise_alpha", type=float, default=0.0)
    p.add_argument("--save_tsv", type=int, default=0, choices=[0, 1],
                   help="write the reference's per-split TSV artifact "
                        "(missing_feature.py:739-763) next to the "
                        "pretrain checkpoint (or cwd)")
    p.add_argument("--tsv_name", default="")
    args = parse_with_sweep(p)
    ds = load_node_dataset(args)
    cfg = build_cfg(args, ds.num_classes)
    pretrained = load_pretrained(args)

    per_run = []
    for r in range(min(args.runs, len(ds.splits))):
        split = ds.splits[r % len(ds.splits)]
        best = train_node_with_buckets(ds, cfg, split, {},
                                       pretrained=pretrained,
                                       seed=args.seed + r, verbose=args.debug)
        clean = best["split_acc"]
        ds_pert = apply_missing_features(
            ds, split, missing_prob=args.missing_prob, seed=args.seed + r,
            perturb=args.perturb,
            relative_noise_alpha=args.relative_noise_alpha)
        pert = evaluate_snapshot_on(ds_pert, cfg, best)
        row = {**{f"clean/{k}": v for k, v in clean.items()},
               **{f"perturbed/{k}": v for k, v in pert.items()
                  if k in ("train", "valid", "test")},
               "best_epoch": best["epoch"]}
        per_run.append(row)
        print(f"[run {r}] clean_test={clean['test']:.2f} "
              f"perturbed_test={pert['test']:.2f}")

    summary = {}
    for k in ["clean/test", "perturbed/test"]:
        m, s = nanmean_std([row[k] for row in per_run])
        summary[f"final/{k}_mean"], summary[f"final/{k}_std"] = m, s
    if args.save_tsv:
        _write_tsv(args, per_run)
    emit({"missing_prob": args.missing_prob, "perturb": args.perturb,
          "runs": per_run, "summary": summary}, args)


def _write_tsv(args, per_run):
    """Reference TSV artifact (missing_feature.py:739-763): one row per
    split — ``split<TAB>[missing_val<TAB>]missing_test`` — written next to
    the pretrain checkpoint under an auto-generated name."""
    import csv
    import os
    import os.path as osp
    log_val = args.perturb in ("valtest", "all")
    tsv_name = args.tsv_name or (
        f"finetune_{args.finetune_dataset}_missing_p{args.missing_prob}_"
        f"alpha{args.relative_noise_alpha}_{args.perturb}_"
        f"seed{args.seed}.tsv")
    tsv_path = osp.join(args.pretrain_path or ".", tsv_name)
    if osp.dirname(tsv_path):
        os.makedirs(osp.dirname(tsv_path), exist_ok=True)
    with open(tsv_path, "w", newline="") as f:
        header = ["split", "missing_test"]
        if log_val:
            header.insert(1, "missing_val")
        writer = csv.writer(f, delimiter="\t")
        writer.writerow(header)
        for idx, row in enumerate(per_run):
            data_row = [idx]
            if log_val:
                data_row.append(row["perturbed/valid"])
            data_row.append(row["perturbed/test"])
            writer.writerow(data_row)
    print(f"[saved] {tsv_path}")


if __name__ == "__main__":
    main()
