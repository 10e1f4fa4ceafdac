"""Edge-partitioned full-graph training — the GNN analog of sequence/context
parallelism (SURVEY.md §2.7, BASELINE.json north star).

One large graph is sharded by *edges* across the mesh's ``edge`` axis; node
features and parameters are replicated.  Each chip aggregates messages over
its local edge shard into partial per-node sums, combined with one ``psum``
over ICI — communication cost O(N*D) per layer, independent of edge count,
which is the right trade for power-law graphs where edges >> nodes.

(The follow-up optimization — 1-D destination-range partitioning with
all_to_all halo exchange of boundary features overlapped with local
aggregation — drops the psum to a boundary gather; the partitioning utilities
here already produce destination-contiguous shards to enable it.)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stemgnn_tpu.core.graph import round_up
from stemgnn_tpu.ops import segment


def partition_edges_by_destination(senders: np.ndarray, receivers: np.ndarray,
                                   num_shards: int,
                                   edge_feat: Optional[np.ndarray] = None):
    """Host-side prep: sort edges by destination and split into
    ``num_shards`` equal padded shards (destination-contiguous, so each
    shard's segment reduce touches a compact node range).

    Returns dict of stacked arrays with leading shard axis:
    senders/receivers [S, E_shard], edge_mask [S, E_shard],
    (edge_feat [S, E_shard, D]).
    """
    order = np.argsort(receivers, kind="stable")
    s, r = senders[order], receivers[order]
    ef = edge_feat[order] if edge_feat is not None else None
    e = len(s)
    per = round_up((e + num_shards - 1) // num_shards, 128)
    S = num_shards
    out_s = np.zeros((S, per), np.int32)
    out_r = np.zeros((S, per), np.int32)
    out_m = np.zeros((S, per), bool)
    out_ef = np.zeros((S, per) + ef.shape[1:], ef.dtype) if ef is not None else None
    for i in range(S):
        lo, hi = i * per, min((i + 1) * per, e)
        k = max(hi - lo, 0)
        if k > 0:
            out_s[i, :k] = s[lo:hi]
            out_r[i, :k] = r[lo:hi]
            out_m[i, :k] = True
            if out_ef is not None:
                out_ef[i, :k] = ef[lo:hi]
    res = {"senders": out_s, "receivers": out_r, "edge_mask": out_m}
    if out_ef is not None:
        res["edge_feat"] = out_ef
    return res


def sharded_sage_aggregate(x, shard_senders, shard_receivers, shard_edge_mask,
                           shard_edge_feat=None, *, axis: str,
                           reduce: str = "mean", relu: bool = True):
    """Per-shard partial aggregation + cross-shard psum.

    Called inside shard_map with ``x`` replicated and shard_* local to the
    device (leading shard axis already split away).  Matches
    :func:`stemgnn_tpu.ops.spmm.sage_aggregate` semantics exactly.
    """
    n = x.shape[0]
    if shard_edge_mask is None:
        shard_edge_mask = jnp.ones_like(shard_senders, dtype=bool)
    x_src = jnp.take(x, shard_senders, axis=0)
    msg = x_src if shard_edge_feat is None else x_src + shard_edge_feat
    if relu:
        msg = jax.nn.relu(msg)
    msg = jnp.where(shard_edge_mask[:, None], msg, 0.0)
    partial_sum = jax.ops.segment_sum(msg, shard_receivers, num_segments=n)
    total = jax.lax.psum(partial_sum, axis)
    if reduce == "sum":
        return total
    ones = shard_edge_mask.astype(x.dtype)
    partial_deg = jax.ops.segment_sum(ones, shard_receivers, num_segments=n)
    deg = jax.lax.psum(partial_deg, axis)
    return total / jnp.maximum(deg, 1.0)[:, None]
