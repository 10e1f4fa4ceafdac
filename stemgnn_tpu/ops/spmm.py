"""Sparse SAGE aggregation: the framework's core message-passing primitive.

Computes, per destination node i over its valid in-edges (j -> i):

    out[i] = reduce_{(j,i) in E} relu(x[j] + edge_feat[(j,i)])

matching the reference's ``MySAGEConv.message`` (``relu(x_j + xe)``,
STEM-GNN/model/encoder.py:94-97) fused with mean/sum aggregation
(encoder.py:99-102 uses ``spmm(adj_t, x, reduce='mean')``).

Two execution paths:

  * ``gather_scatter_aggregate`` — pure XLA (gather + segment reduce).  Works
    on CPU and TPU, is the autodiff reference, and is the default on CPU.
  * ``stemgnn_tpu.ops.spmm_pallas`` — fused Pallas TPU kernel (gather stays in
    XLA, message+scatter fused as local one-hot MXU matmuls over
    receiver-sorted edge blocks).  Selected on TPU when the edge list is
    receiver-sorted.

Both are exposed through :func:`sage_aggregate`, which dispatches on backend.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from stemgnn_tpu.ops import segment


def _messages(x_src, edge_feat, edge_mask, relu: bool):
    m = x_src if edge_feat is None else x_src + edge_feat
    if relu:
        m = jax.nn.relu(m)
    if edge_mask is not None:
        m = jnp.where(edge_mask[:, None], m, 0.0)
    return m


def gather_scatter_aggregate(x, senders, receivers, edge_feat=None,
                             edge_mask=None, num_nodes: Optional[int] = None,
                             reduce: str = "mean", relu: bool = True,
                             indices_are_sorted: bool = False):
    """XLA gather + segment-reduce path (CPU fallback / autodiff reference)."""
    num_nodes = num_nodes or x.shape[0]
    x_src = jnp.take(x, senders, axis=0)
    msg = _messages(x_src, edge_feat, edge_mask, relu)
    if reduce == "sum":
        return segment.segment_sum(msg, receivers, num_nodes, mask=edge_mask,
                                   indices_are_sorted=indices_are_sorted)
    if reduce == "mean":
        return segment.segment_mean(msg, receivers, num_nodes, mask=edge_mask,
                                    indices_are_sorted=indices_are_sorted)
    if reduce == "max":
        return segment.segment_max(msg, receivers, num_nodes, mask=edge_mask,
                                   indices_are_sorted=indices_are_sorted)
    raise ValueError(f"unsupported reduce: {reduce}")


def sage_aggregate(x, senders, receivers, edge_feat=None, edge_mask=None,
                   num_nodes: Optional[int] = None, reduce: str = "mean",
                   relu: bool = True, layout=None, edge_table=None,
                   bf16_messages: bool = True, shard_axis: Optional[str] = None,
                   dynamic_edge_mask: bool = False, drop_hash=None):
    """Dispatching front-end for the fused SAGE aggregation.

    ``layout`` is an :class:`stemgnn_tpu.ops.edge_layout.EdgeLayout`
    (receiver/sender-sorted edge blocks + one-hot scatter matrices); passing
    it on TPU unlocks the Pallas scatter kernel with ``edge_table`` [T, D]
    per-edge-type features gathered on the fly.  Without it, the portable XLA
    gather + segment-reduce path runs (with ``edge_feat`` [E, D] materialized
    features).

    ``drop_hash`` = (seed, p): pair-hash per-step edge dropout
    (train/augment.dropout_edges_undirected's decisions as a closed form)
    — the hub-preserving alternative to ``dynamic_edge_mask`` for the
    fused path (ops/fused_sage.py); non-fused paths derive the identical
    per-edge keep from the hash and fold it into ``edge_mask``.
    """
    num_nodes = num_nodes or x.shape[0]
    if shard_axis is not None:
        # Edge-partitioned full-graph mode (called under shard_map with
        # replicated x and per-device edge shards): partial local aggregation
        # + one psum over the mesh axis.
        from stemgnn_tpu.parallel.edge_partition import sharded_sage_aggregate
        return sharded_sage_aggregate(x, senders, receivers, edge_mask,
                                      shard_edge_feat=edge_feat,
                                      axis=shard_axis, reduce=reduce,
                                      relu=relu)
    on_tpu = jax.default_backend() == "tpu"
    # the fused path sources edge features from (edge_table, layout.xe) —
    # never take it when only materialized edge_feat carries them
    fused_ok = (layout is not None and on_tpu and reduce in ("mean", "sum")
                and not (edge_feat is not None and edge_table is None))
    hash_ok = (drop_hash is not None and relu
               and (edge_table is None or edge_table.shape[0] == 1))
    if drop_hash is not None and not (fused_ok and hash_ok):
        # derive the per-edge keep (identical decisions) and fall back to
        # the materialized-mask plumbing below
        from stemgnn_tpu.ops.pairhash import pair_hash_uniform
        seed, p = drop_hash
        keep = pair_hash_uniform(jnp.asarray(seed, jnp.int32), senders,
                                 receivers) >= p
        edge_mask = keep if edge_mask is None else \
            jnp.logical_and(edge_mask, keep)
        dynamic_edge_mask = True
        drop_hash = None
    if fused_ok:
        from stemgnn_tpu.ops.fused_sage import fused_sage_aggregate
        # NOTE: a static layout bakes the edge validity mask; a RUNTIME
        # edge mask (e.g. the pretrain edge-dropout augmentation) must be
        # declared via dynamic_edge_mask so it is folded into the messages
        # and the mean's degree
        return fused_sage_aggregate(
            x, layout, edge_table, reduce=reduce, relu=relu,
            bf16_messages=bf16_messages,
            edge_keep=edge_mask if dynamic_edge_mask else None,
            drop_hash=drop_hash)
    if edge_feat is None and edge_table is not None:
        # layout-only graphs (edge_feat never materialized) must not fall
        # back silently without their per-edge type features
        xe = getattr(layout, "xe_r", None) if layout is not None else None
        if xe is None:
            raise ValueError(
                "edge_table given without layout xe ids or edge_feat — "
                "cannot run the non-fused path with type features")
        # reconstruct in layout (receiver-sorted) edge order
        edge_feat = jnp.take(edge_table, xe, axis=0)
        lmask = layout.mask_r
        if dynamic_edge_mask and edge_mask is not None:
            # permute the runtime edge mask (original order) into layout
            # order and fold it in — messages AND the mean's degree
            if layout.perm_r2o is None:
                raise ValueError(
                    "dynamic_edge_mask on the layout fallback path needs "
                    "layout.perm_r2o (rebuild the layout)")
            keep = jnp.take(edge_mask, layout.perm_r2o, axis=0)
            lmask = jnp.logical_and(lmask, keep.astype(bool))
        # receivers_r is only BLOCK-grouped since the within-block
        # gather-key sort (edge_layout block ordering) — NOT globally
        # sorted, so the sorted-indices hint would be a correctness bug
        return gather_scatter_aggregate(
            x, layout.senders_r, layout.receivers_r, edge_feat=edge_feat,
            edge_mask=lmask, num_nodes=num_nodes, reduce=reduce,
            relu=relu)
    return gather_scatter_aggregate(
        x, senders, receivers, edge_feat=edge_feat, edge_mask=edge_mask,
        num_nodes=num_nodes, reduce=reduce, relu=relu)
