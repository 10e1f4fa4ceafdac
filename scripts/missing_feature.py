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
    args = p.parse_args()
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
    emit({"missing_prob": args.missing_prob, "perturb": args.perturb,
          "runs": per_run, "summary": summary}, args)


if __name__ == "__main__":
    main()
