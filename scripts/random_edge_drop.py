#!/usr/bin/env python
"""Random-edge-drop robustness evaluation.

Re-design of /root/reference/STEM-GNN/scripts/random_edge_drop.py: train on
the clean graph, then re-evaluate the best-val snapshot on a graph with
candidate edges (touching scoped nodes) dropped per-undirected-pair or
per-directed-edge, never dropping all (:103-229, re-eval :648-724).
"""

from _common import (base_parser, build_cfg, emit, load_node_dataset,
                     parse_with_sweep,
                     load_pretrained)
from stemgnn_tpu.eval.perturb import apply_random_edge_drops
from stemgnn_tpu.eval.runner import (evaluate_snapshot_on, nanmean_std,
                                     train_node_with_buckets)


def main():
    p = base_parser("random_edge_drop")
    p.add_argument("--drop_prob", type=float, default=0.2)
    p.add_argument("--perturb", default="test",
                   choices=["test", "valtest", "all"])
    p.add_argument("--drop_mode", default="per_undirected",
                   choices=["per_undirected", "per_edge"])
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
        ds_pert = apply_random_edge_drops(
            ds, split, drop_prob=args.drop_prob, seed=args.seed + r,
            perturb=args.perturb, drop_mode=args.drop_mode)
        pert = evaluate_snapshot_on(ds_pert, cfg, best)
        per_run.append({**{f"clean/{k}": v for k, v in best["split_acc"].items()},
                        **{f"perturbed/{k}": v for k, v in pert.items()
                           if k in ("train", "valid", "test")},
                        "best_epoch": best["epoch"]})
        print(f"[run {r}] clean_test={best['split_acc']['test']:.2f} "
              f"perturbed_test={pert['test']:.2f}")

    summary = {}
    for k in ["clean/test", "perturbed/test"]:
        m, s = nanmean_std([row[k] for row in per_run])
        summary[f"final/{k}_mean"], summary[f"final/{k}_std"] = m, s
    emit({"drop_prob": args.drop_prob, "drop_mode": args.drop_mode,
          "perturb": args.perturb, "runs": per_run, "summary": summary}, args)


if __name__ == "__main__":
    main()
