"""Node-reordering permutations for gather locality.

The fused aggregation's HBM bottleneck is the random row gather (x by sender,
dout by receiver).  Reordering node ids so that rows referenced together sit
together turns those gathers into near-sequential streams:

  * ``degree_order`` — hot (high-degree) rows first: the most-referenced rows
    concentrate in a small, reused address range.
  * ``rcm_order`` — reverse Cuthill–McKee (BFS from a peripheral low-degree
    node, neighbors visited in degree order): minimizes index bandwidth for
    mesh/community graphs, so each edge chunk touches a compact row range.

Host-side, once per graph; compose with
:func:`stemgnn_tpu.ops.edge_layout.build_edge_layout` by relabeling the edge
list and permuting the feature matrix.  No reference counterpart (PyG leaves
ordering to the dataset); this is TPU-native memory-system tuning.
"""

from __future__ import annotations

import numpy as np


def degree_order(senders, receivers, num_nodes: int) -> np.ndarray:
    """Permutation ``perm`` with ``perm[new_id] = old_id``, highest total
    degree first."""
    deg = np.zeros(num_nodes, np.int64)
    np.add.at(deg, np.asarray(senders, np.int64), 1)
    np.add.at(deg, np.asarray(receivers, np.int64), 1)
    return np.argsort(-deg, kind="stable").astype(np.int64)


def rcm_order(senders, receivers, num_nodes: int) -> np.ndarray:
    """Reverse Cuthill–McKee over the undirected graph.  Returns
    ``perm[new_id] = old_id``; isolated nodes go last."""
    s = np.asarray(senders, np.int64)
    r = np.asarray(receivers, np.int64)
    # undirected CSR
    u = np.concatenate([s, r])
    v = np.concatenate([r, s])
    deg = np.bincount(u, minlength=num_nodes)
    indptr = np.zeros(num_nodes + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    order = np.argsort(u, kind="stable")
    indices = v[order]

    visited = np.zeros(num_nodes, bool)
    out = np.empty(num_nodes, np.int64)
    pos = 0
    # process components from lowest-degree unvisited seed
    seed_order = np.argsort(deg, kind="stable")
    seed_i = 0
    while pos < num_nodes:
        while seed_i < num_nodes and visited[seed_order[seed_i]]:
            seed_i += 1
        if seed_i >= num_nodes:
            break
        seed = seed_order[seed_i]
        visited[seed] = True
        out[pos] = seed
        head, pos = pos, pos + 1
        while head < pos:
            node = out[head]
            head += 1
            nbrs = indices[indptr[node]: indptr[node + 1]]
            nbrs = nbrs[~visited[nbrs]]
            if nbrs.size:
                nbrs = np.unique(nbrs)          # dedupe multi-edges
                nbrs = nbrs[np.argsort(deg[nbrs], kind="stable")]
                visited[nbrs] = True
                out[pos: pos + nbrs.size] = nbrs
                pos += nbrs.size
    return out[::-1].copy()                     # the "reverse" in RCM


def relabel(perm: np.ndarray, senders, receivers, node_arrays=()):
    """Apply ``perm`` (new->old): returns (senders', receivers',
    [arr[perm] for arr in node_arrays]).  Edge (j, i) keeps its slot; only
    ids change, so edge-aligned arrays (types, masks) are untouched."""
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm), dtype=perm.dtype)
    s2 = inv[np.asarray(senders, np.int64)]
    r2 = inv[np.asarray(receivers, np.int64)]
    return s2, r2, [np.asarray(a)[perm] for a in node_arrays]
