"""Measure graph-task HOST-side eval batch-building cost at chempcba scale.

VERDICT r1 item 10: for >50k-graph datasets the trainer re-streams and
re-featurizes eval batches every epoch x 3 splits
(train/finetune_loop.py:_run_graph_task); at 437k graphs the materialized
format's per-batch feature concatenation was suspected to dominate epoch
time.  This script times `_batch_graph_list` alone (pure host work) for the
materialized ([n_i, D] float rows per graph) vs indexed (int ids + shared
tables) bundle formats, on synthetic molecule-sized graphs, and prints
per-epoch extrapolations to 437k graphs.  Results recorded in BASELINE.md.

Usage:  python scripts/bench_graph_eval.py [--n 50000] [--dim 768]
"""

import argparse
import time

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")   # host-side measurement

from stemgnn_tpu.core.graph import IndexedGraphList  # noqa: E402


def synth(n_graphs, dim, rng, indexed):
    node_table = rng.standard_normal((120, dim)).astype(np.float32)
    edge_table = rng.standard_normal((20, dim)).astype(np.float32)
    items = []
    for _ in range(n_graphs):
        na = int(rng.integers(8, 40))          # chempcba mean ~26 atoms
        ne = int(rng.integers(na, 2 * na + 8))
        x = rng.integers(0, 120, na).astype(np.int32)
        xe = rng.integers(0, 20, ne).astype(np.int32)
        s = rng.integers(0, na, ne).astype(np.int32)
        r = rng.integers(0, na, ne).astype(np.int32)
        if indexed:
            items.append({"x": x, "senders": s, "receivers": r, "xe": xe})
        else:
            items.append({"node_feat": node_table[x], "senders": s,
                          "receivers": r, "edge_feat": edge_table[xe]})
    if indexed:
        return IndexedGraphList(items, node_table, edge_table)
    return items


def time_stream(graphs, labels, batch_size=64):
    from stemgnn_tpu.train.finetune_loop import _batch_graph_list
    idxs = np.arange(len(graphs))
    t0 = time.perf_counter()
    n_batches = 0
    for g, lab, n in _batch_graph_list(graphs, labels, idxs, batch_size):
        n_batches += 1
    dt = time.perf_counter() - t0
    return dt, n_batches


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--batch_size", type=int, default=64)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, (args.n, 1)).astype(float)

    out = {}
    for name, indexed in (("materialized", False), ("indexed", True)):
        graphs = synth(args.n, args.dim, rng, indexed)
        # host RAM of the bundle
        if indexed:
            nbytes = sum(i["x"].nbytes + i["xe"].nbytes + i["senders"].nbytes
                         + i["receivers"].nbytes for i in graphs.items)
            nbytes += graphs.node_table.nbytes + graphs.edge_table.nbytes
        else:
            nbytes = sum(g["node_feat"].nbytes + g["edge_feat"].nbytes
                         + g["senders"].nbytes + g["receivers"].nbytes
                         for g in graphs)
        dt, nb = time_stream(graphs, labels, args.batch_size)
        per_graph_us = dt / args.n * 1e6
        # one epoch at chempcba scale = 1 train pass + 3 eval streams
        epoch_437k = 4 * per_graph_us * 437_000 / 1e6
        out[name] = (dt, nb, nbytes, per_graph_us, epoch_437k)
        print(f"{name:13s}: {dt:7.2f} s / {nb} batches "
              f"({per_graph_us:6.1f} us/graph), bundle RAM "
              f"{nbytes / 1e9:6.2f} GB, extrapolated host cost/epoch "
              f"@437k graphs x4 passes: {epoch_437k:6.1f} s")
        del graphs

    speedup = out["materialized"][3] / out["indexed"][3]
    ram = out["materialized"][2] / out["indexed"][2]
    print(f"indexed speedup {speedup:.1f}x, RAM {ram:.0f}x smaller")


if __name__ == "__main__":
    main()
