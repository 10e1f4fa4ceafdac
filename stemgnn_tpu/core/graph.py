"""Fixed-shape padded graph containers.

TPU-first replacement for the reference's PyG ``Data`` objects
(/root/reference/STEM-GNN — COO ``edge_index`` + Python attribute bags with
dynamic shapes).  Everything under jit must have a static shape, so graphs are
stored as flat arrays padded to a bucket size, with validity masks:

  * ``senders``/``receivers``: int32 ``[E_pad]`` COO endpoints.  Padded edges
    carry ``senders = receivers = 0`` and ``edge_mask = False``; every kernel
    multiplies messages by the mask so padding contributes exactly zero.
  * ``node_feat``: ``[N_pad, D]`` dense features (rows beyond ``n_node`` are
    zero).
  * ``edge_feat``: optional ``[E_pad, D]`` dense per-edge features (the
    reference's ``edge_text_feat[data.xe]`` materialization,
    STEM-GNN/pretrain.py:38).

Graphs are pytrees (flax.struct dataclasses) so they flow through jit / grad /
shard_map untouched.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


def round_up(x: int, m: int) -> int:
    """Round ``x`` up to a multiple of ``m``."""
    return ((x + m - 1) // m) * m


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0,
                    value=0) -> np.ndarray:
    """Pad ``arr`` along ``axis`` so its length is a multiple of ``multiple``."""
    size = arr.shape[axis]
    target = round_up(max(size, 1), multiple)
    if target == size:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, target - size)
    return np.pad(arr, widths, constant_values=value)


@struct.dataclass
class Graph:
    """A padded, fixed-shape graph (single graph or disjoint batch).

    Semantics mirror the reference's pretrain/finetune graph payloads
    (x / edge_index / edge_attr triplets, STEM-GNN/pretrain.py:31-45) but with
    static shapes.  ``n_node`` / ``n_edge`` are traced scalars holding the true
    counts; ``node_mask`` / ``edge_mask`` are the materialized validity masks.
    """

    node_feat: jax.Array            # [N_pad, D] float
    senders: jax.Array              # [E_pad] int32 (source node of each edge)
    receivers: jax.Array            # [E_pad] int32 (destination node)
    node_mask: jax.Array            # [N_pad] bool
    edge_mask: jax.Array            # [E_pad] bool
    n_node: jax.Array               # [] int32 true node count
    n_edge: jax.Array               # [] int32 true edge count
    edge_feat: Optional[jax.Array] = None   # [E_pad, D] float or None
    # Disjoint-batch segment ids (graph id per node), for graph-level pooling.
    node_graph_id: Optional[jax.Array] = None  # [N_pad] int32
    n_graph: Optional[jax.Array] = None        # [] int32
    # Optional precomputed kernel layout (ops.edge_layout.EdgeLayout) +
    # per-edge-type feature table [T, D].  When present (and on TPU), the
    # encoder's aggregation runs the fused Pallas/hub-dense path with type
    # features gathered from the small table on the fly, instead of the XLA
    # gather/segment path over materialized [E_pad, D] edge_feat.
    layout: Optional[object] = None
    edge_table: Optional[jax.Array] = None

    @property
    def num_nodes_padded(self) -> int:
        return self.node_feat.shape[0]

    @property
    def num_edges_padded(self) -> int:
        return self.senders.shape[0]

    @property
    def feat_dim(self) -> int:
        return self.node_feat.shape[-1]

    def replace_feat(self, node_feat, edge_feat=None) -> "Graph":
        return self.replace(node_feat=node_feat,
                            edge_feat=self.edge_feat if edge_feat is None
                            else edge_feat)


def make_graph(node_feat, senders, receivers, edge_feat=None,
               node_pad_to: Optional[int] = None,
               edge_pad_to: Optional[int] = None,
               node_multiple: int = 8, edge_multiple: int = 128,
               node_graph_id=None, n_graph: Optional[int] = None) -> Graph:
    """Build a padded :class:`Graph` from host (numpy) arrays.

    Padding defaults align the node axis to the fp32 sublane (8) and the edge
    axis to the lane width (128) so downstream Pallas kernels see tileable
    shapes.
    """
    node_feat = np.asarray(node_feat)
    senders = np.asarray(senders, dtype=np.int32)
    receivers = np.asarray(receivers, dtype=np.int32)
    n, e = node_feat.shape[0], senders.shape[0]

    n_pad = node_pad_to if node_pad_to is not None else round_up(max(n, 1), node_multiple)
    e_pad = edge_pad_to if edge_pad_to is not None else round_up(max(e, 1), edge_multiple)
    if n_pad < n or e_pad < e:
        raise ValueError(f"pad sizes ({n_pad},{e_pad}) smaller than data ({n},{e})")

    nf = np.zeros((n_pad,) + node_feat.shape[1:], dtype=node_feat.dtype)
    nf[:n] = node_feat
    s = np.zeros((e_pad,), dtype=np.int32)
    s[:e] = senders
    r = np.zeros((e_pad,), dtype=np.int32)
    r[:e] = receivers
    nm = np.zeros((n_pad,), dtype=bool)
    nm[:n] = True
    em = np.zeros((e_pad,), dtype=bool)
    em[:e] = True

    ef = None
    if edge_feat is not None:
        edge_feat = np.asarray(edge_feat)
        ef = np.zeros((e_pad,) + edge_feat.shape[1:], dtype=edge_feat.dtype)
        ef[:e] = edge_feat

    gid = None
    ng = None
    if node_graph_id is not None:
        node_graph_id = np.asarray(node_graph_id, dtype=np.int32)
        gid = np.zeros((n_pad,), dtype=np.int32)
        gid[:n] = node_graph_id
        # Padding nodes point at a dead trailing graph slot so pooled sums
        # ignore them.
        ng_val = int(n_graph) if n_graph is not None else int(node_graph_id.max()) + 1 if n else 0
        gid[n:] = ng_val
        ng = jnp.asarray(ng_val, dtype=jnp.int32)

    return Graph(
        node_feat=jnp.asarray(nf),
        senders=jnp.asarray(s),
        receivers=jnp.asarray(r),
        node_mask=jnp.asarray(nm),
        edge_mask=jnp.asarray(em),
        n_node=jnp.asarray(n, dtype=jnp.int32),
        n_edge=jnp.asarray(e, dtype=jnp.int32),
        edge_feat=None if ef is None else jnp.asarray(ef),
        node_graph_id=None if gid is None else jnp.asarray(gid),
        n_graph=ng,
    )


@struct.dataclass
class IndexedGraph:
    """A padded graph carrying feature-table INDICES instead of features.

    The TPU-native batch format for sampled-subgraph training: the node text
    feature table ([N_global, D]) and edge-type table ([T, D]) live on device
    once; per-step host->device traffic is the int32 id arrays only (~D x
    smaller than shipping gathered feature rows — at 768-dim f32 that is
    3 KB -> 4 B per node).  :func:`materialize` performs the reference's
    ``node_text_feat[data.x]`` / ``edge_text_feat[data.xe]`` gathers
    (STEM-GNN/pretrain.py:31-38) on device inside the jitted step.
    """

    node_ids: jax.Array             # [N_pad] int32 into the node table
    senders: jax.Array              # [E_pad] int32 (batch-local)
    receivers: jax.Array            # [E_pad] int32 (batch-local)
    node_mask: jax.Array            # [N_pad] bool
    edge_mask: jax.Array            # [E_pad] bool
    n_node: jax.Array               # [] int32
    n_edge: jax.Array               # [] int32
    xe_ids: Optional[jax.Array] = None   # [E_pad] int32 into the edge table
    # per-node graph segment ids for disjoint graph batches (graph-task
    # pooling); None for single-graph batches
    node_graph_id: Optional[jax.Array] = None   # [N_pad] int32
    n_graph: Optional[int] = None

    @property
    def num_nodes_padded(self) -> int:
        return self.node_ids.shape[0]

    @property
    def num_edges_padded(self) -> int:
        return self.senders.shape[0]


def make_indexed_graph(node_ids, senders, receivers, xe_ids=None,
                       node_pad_to: Optional[int] = None,
                       edge_pad_to: Optional[int] = None,
                       node_multiple: int = 8,
                       edge_multiple: int = 128,
                       node_graph_id=None, n_graph=None) -> IndexedGraph:
    """Host prep of an :class:`IndexedGraph` (numpy in, device arrays out)."""
    node_ids = np.asarray(node_ids, np.int32)
    senders = np.asarray(senders, np.int32)
    receivers = np.asarray(receivers, np.int32)
    n, e = node_ids.shape[0], senders.shape[0]
    n_pad = node_pad_to if node_pad_to is not None else round_up(max(n, 1), node_multiple)
    e_pad = edge_pad_to if edge_pad_to is not None else round_up(max(e, 1), edge_multiple)
    if n_pad < n or e_pad < e:
        raise ValueError(f"pad sizes ({n_pad},{e_pad}) < data ({n},{e})")

    def pad1(a, width, dtype=np.int32):
        out = np.zeros(width, dtype)
        out[: len(a)] = a
        return out

    nm = np.zeros(n_pad, bool)
    nm[:n] = True
    em = np.zeros(e_pad, bool)
    em[:e] = True
    # NUMPY leaves on purpose: the batch transfers once at the jitted step's
    # dispatch.  Eager jnp.asarray per field costs a blocking round trip
    # each on remote-dispatch transports (~37 ms/batch measured on the
    # tunneled v5e vs ~1 ms host-side), and np.stack for the data-parallel
    # path stays host-side instead of a device round trip.
    return IndexedGraph(
        node_ids=pad1(node_ids, n_pad),
        senders=pad1(senders, e_pad),
        receivers=pad1(receivers, e_pad),
        node_mask=nm, edge_mask=em,
        n_node=np.int32(n), n_edge=np.int32(e),
        xe_ids=None if xe_ids is None else pad1(xe_ids, e_pad),
        node_graph_id=None if node_graph_id is None else (
            # padded rows get an out-of-range segment id so pooled segments
            # [0, n_graph) never receive padding contributions
            pad1(np.asarray(node_graph_id, np.int32), n_pad)
            + np.where(nm, 0, np.int32(n_graph if n_graph else 1))),
        n_graph=n_graph)


def materialize_graph(ig: IndexedGraph, node_table, edge_table=None) -> Graph:
    """Device-side feature gather: IndexedGraph + tables -> Graph.

    Jit-compatible; padded rows gather row 0 and stay masked.
    """
    node_feat = jnp.take(node_table, ig.node_ids, axis=0, mode="clip")
    node_feat = jnp.where(ig.node_mask[:, None], node_feat, 0.0)
    ef = None
    if edge_table is not None and ig.xe_ids is not None:
        ef = jnp.take(edge_table, ig.xe_ids, axis=0, mode="clip")
        ef = jnp.where(ig.edge_mask[:, None], ef, 0.0)
    return Graph(node_feat=node_feat, senders=ig.senders,
                 receivers=ig.receivers, node_mask=ig.node_mask,
                 edge_mask=ig.edge_mask, n_node=ig.n_node, n_edge=ig.n_edge,
                 edge_feat=ef, node_graph_id=ig.node_graph_id,
                 n_graph=ig.n_graph)


def pad_graph(g: Graph, node_pad_to: int, edge_pad_to: int) -> Graph:
    """Re-pad an already-padded device graph to larger bucket sizes."""
    n_pad, e_pad = g.num_nodes_padded, g.num_edges_padded
    if node_pad_to < n_pad or edge_pad_to < e_pad:
        raise ValueError("cannot shrink padding")
    dn, de = node_pad_to - n_pad, edge_pad_to - e_pad

    def padn(x, width):
        return jnp.pad(x, [(0, width)] + [(0, 0)] * (x.ndim - 1))

    return g.replace(
        node_feat=padn(g.node_feat, dn),
        senders=padn(g.senders, de),
        receivers=padn(g.receivers, de),
        node_mask=padn(g.node_mask, dn),
        edge_mask=padn(g.edge_mask, de),
        edge_feat=None if g.edge_feat is None else padn(g.edge_feat, de),
        node_graph_id=None if g.node_graph_id is None else padn(g.node_graph_id, dn),
    )


def sort_edges_by_receiver(senders: np.ndarray, receivers: np.ndarray):
    """Host-side stable sort of COO edges by destination.

    Sorted order makes ``segment_sum(indices_are_sorted=True)`` fast and lets
    the Pallas SpMM kernel process contiguous destination ranges per edge
    block.  Returns (senders, receivers, perm).
    """
    perm = np.argsort(receivers, kind="stable")
    return senders[perm], receivers[perm], perm


def compute_in_degree(receivers, edge_mask, num_nodes: int):
    """In-degree per node counting only valid edges (for mean aggregation)."""
    ones = edge_mask.astype(jnp.float32)
    return jax.ops.segment_sum(ones, receivers, num_segments=num_nodes)


class IndexedGraphList:
    """List-like bundle of id-based graph dicts + the shared feature
    tables.  The graph-task dataset format for huge molecule corpora: host
    memory is O(atoms) ints (not O(atoms x D) floats), and the trainer's
    batches stay indexed until the device-side gather."""

    def __init__(self, items, node_table, edge_table=None):
        self.items = items
        self.node_table = node_table
        self.edge_table = edge_table

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]

    def __iter__(self):
        return iter(self.items)


def batch_indexed_graphs(graphs, node_pad_to: Optional[int] = None,
                         edge_pad_to: Optional[int] = None) -> IndexedGraph:
    """Disjoint union of id-based host graphs (dicts with keys x / senders /
    receivers / [xe]) into one padded IndexedGraph with per-node graph ids —
    the graph-task batch format whose host work and H2D payload are int-only
    (features gather on device from the shared dedup tables)."""
    offsets = np.cumsum([0] + [np.asarray(g["x"]).shape[0] for g in graphs])
    node_ids = np.concatenate([np.asarray(g["x"], np.int32) for g in graphs])
    senders = np.concatenate(
        [np.asarray(g["senders"], np.int32) + offsets[i]
         for i, g in enumerate(graphs)])
    receivers = np.concatenate(
        [np.asarray(g["receivers"], np.int32) + offsets[i]
         for i, g in enumerate(graphs)])
    xe = None
    if graphs and graphs[0].get("xe") is not None:
        xe = np.concatenate([np.asarray(g["xe"], np.int32) for g in graphs])
    gid = np.concatenate(
        [np.full(np.asarray(g["x"]).shape[0], i, np.int32)
         for i, g in enumerate(graphs)])
    return make_indexed_graph(node_ids, senders, receivers, xe_ids=xe,
                              node_pad_to=node_pad_to,
                              edge_pad_to=edge_pad_to,
                              node_graph_id=gid, n_graph=len(graphs))


def batch_graphs(graphs, node_pad_to: Optional[int] = None,
                 edge_pad_to: Optional[int] = None) -> Graph:
    """Disjoint union of host-side graphs (the ``Batch.from_data_list`` analog,
    reference STEM-GNN/dataset/process_datasets.py:181-182), padded.

    Accepts dicts with keys node_feat / senders / receivers / [edge_feat].
    """
    offsets = np.cumsum([0] + [np.asarray(g["node_feat"]).shape[0] for g in graphs])
    node_feat = np.concatenate([np.asarray(g["node_feat"]) for g in graphs], axis=0)
    senders = np.concatenate(
        [np.asarray(g["senders"], np.int32) + offsets[i] for i, g in enumerate(graphs)])
    receivers = np.concatenate(
        [np.asarray(g["receivers"], np.int32) + offsets[i] for i, g in enumerate(graphs)])
    edge_feat = None
    if graphs and graphs[0].get("edge_feat") is not None:
        edge_feat = np.concatenate([np.asarray(g["edge_feat"]) for g in graphs], axis=0)
    gid = np.concatenate(
        [np.full(np.asarray(g["node_feat"]).shape[0], i, np.int32)
         for i, g in enumerate(graphs)])
    return make_graph(node_feat, senders, receivers, edge_feat=edge_feat,
                      node_pad_to=node_pad_to, edge_pad_to=edge_pad_to,
                      node_graph_id=gid, n_graph=len(graphs))
