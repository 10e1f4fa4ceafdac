#!/usr/bin/env python
"""Homophily-shift OOD evaluation.

Re-design of /root/reference/STEM-GNN/scripts/homophily_shift_ood.py: bucket
nodes by mean cosine feature similarity to neighbors (15/85 cut, :95-175),
with invalid/zero-norm feature handling; same scaffold as the degree script.
"""

import numpy as np

from _common import (base_parser, build_cfg, emit, load_node_dataset,
                     parse_with_sweep,
                     load_pretrained)
from stemgnn_tpu.eval.buckets import compute_homophily_buckets, stratified_split
from stemgnn_tpu.eval.runner import nanmean_std, train_node_with_buckets


def main():
    args = parse_with_sweep(base_parser("homophily_shift_ood"))
    ds = load_node_dataset(args)
    cfg = build_cfg(args, ds.num_classes)
    pretrained = load_pretrained(args)

    hom, bounds, buckets, no_nbrs, invalid = compute_homophily_buckets(
        ds.node_features(), ds.edge_index, ds.num_nodes)
    print(f"homophily buckets: low<= {bounds[0]:.3f}, high>= {bounds[1]:.3f} "
          f"(no-neighbor nodes={no_nbrs}, invalid-feature nodes={invalid})")

    per_run = []
    for r in range(args.runs):
        tr, va, te = stratified_split(buckets["ID"], np.asarray(ds.labels),
                                      seed=args.seed + r)
        best = train_node_with_buckets(
            ds, cfg, {"train": tr, "valid": va, "test": te}, buckets,
            pretrained=pretrained, seed=args.seed + r, verbose=args.debug)
        per_run.append(dict(best["bucket_acc"], best_epoch=best["epoch"]))
        print(f"[run {r}] " + " ".join(
            f"{k}={v:.2f}" for k, v in best["bucket_acc"].items()))

    summary = {}
    for k in ["ID", "OOD-low", "OOD-high"]:
        m, s = nanmean_std([row[k] for row in per_run])
        summary[f"final/{k}_mean"], summary[f"final/{k}_std"] = m, s
    emit({"buckets": {k: len(v) for k, v in buckets.items()},
          "boundaries": bounds, "diagnostics": {
              "no_feature_neighbors": no_nbrs, "invalid_features": invalid},
          "runs": per_run, "summary": summary}, args)


if __name__ == "__main__":
    main()
