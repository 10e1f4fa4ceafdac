#!/usr/bin/env python
"""Degree-shift OOD evaluation.

Re-design of /root/reference/STEM-GNN/scripts/degree_shift_ood.py: bucket
nodes by undirected degree (bottom/top 15% = OOD-low/high, middle = ID,
:37-72), stratified 50/25/25 split per class within ID (:103-126), full-batch
node finetune with best-val snapshots, report ID vs OOD accuracy over runs
with nan-aware mean±std (:314-431).
"""

import numpy as np

from _common import (base_parser, build_cfg, emit, load_node_dataset,
                     parse_with_sweep,
                     load_pretrained)
from stemgnn_tpu.eval.buckets import compute_degree_buckets, stratified_split
from stemgnn_tpu.eval.runner import nanmean_std, train_node_with_buckets


def main():
    args = parse_with_sweep(base_parser("degree_shift_ood"))
    ds = load_node_dataset(args)
    cfg = build_cfg(args, ds.num_classes)
    pretrained = load_pretrained(args)

    deg, bounds, buckets = compute_degree_buckets(ds.edge_index, ds.num_nodes)
    print(f"degree buckets: low<= {bounds[0]:.0f}, high>= {bounds[1]:.0f} "
          f"sizes={{ {', '.join(f'{k}:{len(v)}' for k, v in buckets.items())} }}")

    per_run = []
    for r in range(args.runs):
        tr, va, te = stratified_split(buckets["ID"], np.asarray(ds.labels),
                                      seed=args.seed + r)
        split = {"train": tr, "valid": va, "test": te}
        best = train_node_with_buckets(ds, cfg, split, buckets,
                                       pretrained=pretrained,
                                       seed=args.seed + r,
                                       verbose=args.debug)
        row = dict(best["bucket_acc"], **{f"split/{k}": v
                                          for k, v in best["split_acc"].items()},
                   best_epoch=best["epoch"])
        per_run.append(row)
        print(f"[run {r}] " + " ".join(
            f"{k}={v:.2f}" for k, v in best["bucket_acc"].items()))

    summary = {}
    for k in ["ID", "OOD-low", "OOD-high"]:
        m, s = nanmean_std([row[k] for row in per_run])
        summary[f"final/{k}_mean"] = m
        summary[f"final/{k}_std"] = s
    m, s = nanmean_std([min(row["OOD-low"], row["OOD-high"])
                        for row in per_run])
    summary["final/OOD_worst_mean"] = m
    summary["final/OOD_worst_std"] = s
    emit({"buckets": {k: len(v) for k, v in buckets.items()},
          "boundaries": bounds, "runs": per_run, "summary": summary}, args)


if __name__ == "__main__":
    main()
