"""Precomputed edge layouts for the fused TPU aggregation kernels.

Host-side, once per graph: sort the COO edge list by receiver (forward
scatter) and by sender (backward scatter), record per-node-block edge offsets
(``block_ptr``) so the Pallas kernel can walk each output block's contiguous
edge range, and keep edge-type ids in both orders so per-edge features are
gathered from the small type table on the fly (never materialized [E, D] in
host memory).

This is the TPU-native replacement for PyG's SparseTensor/CSC machinery
behind ``spmm`` (reference STEM-GNN/model/encoder.py:99-102).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from stemgnn_tpu.core.graph import round_up


@struct.dataclass
class EdgeLayout:
    """Device-resident, static per graph.  All edge arrays are padded to a
    multiple of the kernel edge-chunk; padded slots carry receiver sentinel
    ``num_nodes_padded`` (outside every block range) and mask False."""
    # receiver-sorted (forward scatter)
    senders_r: jax.Array          # [E_pad] int32
    receivers_r: jax.Array        # [E_pad] int32
    xe_r: Optional[jax.Array]     # [E_pad] int32 edge-type ids or None
    mask_r: jax.Array             # [E_pad] bool
    block_ptr_r: jax.Array        # [N_pad/NB + 1] int32
    lrow_r: jax.Array             # [1, E_pad] int32: receiver mod NB for
                                  #   valid edges, NB (sentinel) for padding —
                                  #   the kernel builds the one-hot scatter
                                  #   matrix from this in VMEM (4 B/edge of
                                  #   DMA instead of NB B/edge)
    # sender-sorted (backward scatter)
    senders_s: jax.Array          # [E_pad] int32 (sorted)
    receivers_s: jax.Array        # [E_pad] int32
    xe_s: Optional[jax.Array]     # [E_pad] int32
    mask_s: jax.Array             # [E_pad] bool
    block_ptr_s: jax.Array        # [N_pad/NB + 1] int32
    lrow_s: jax.Array             # [1, E_pad] int32 (sender mod NB)
    # degrees for mean-reduction (valid in-edges per node)
    in_degree: jax.Array          # [N_pad] float32
    # sender-sorted position -> receiver-sorted position (for permuting
    # forward residuals into backward order); padded slots point at a padded
    # receiver-sorted slot
    perm_s2r: Optional[jax.Array] = None   # [E_pad] int32
    # x-window metadata for the in-kernel relu-mask recompute of the
    # backward (ops.scatter_pallas.masked_scatter_rows_sorted): senders are
    # sorted, so each edge chunk's source rows live in a narrow node-id
    # window — the kernel streams those x rows sequentially instead of
    # re-gathering an [E, D] pre-activation.  Per sender-sorted edge chunk:
    win_lo_s: Optional[jax.Array] = None    # [C] int32 window start node id
    win_nsub_s: Optional[jax.Array] = None  # [C] int32 ceil(span / win_w)
    # static metadata
    node_block: int = struct.field(pytree_node=False, default=128)
    edge_chunk: int = struct.field(pytree_node=False, default=512)
    win_w: int = struct.field(pytree_node=False, default=0)  # 0 = absent

    @property
    def num_edges_padded(self) -> int:
        return self.senders_r.shape[0]

    @property
    def num_nodes_padded(self) -> int:
        return self.in_degree.shape[0]


def _block_ptr(sorted_keys: np.ndarray, n_pad: int, nb: int) -> np.ndarray:
    bounds = np.arange(0, n_pad + nb, nb)
    return np.searchsorted(sorted_keys, bounds, side="left").astype(np.int32)


def build_edge_layout(senders, receivers, num_nodes_padded: int,
                      xe_ids=None, edge_mask=None, node_block: int = 128,
                      edge_chunk: int = 512) -> EdgeLayout:
    """Host numpy prep.  ``senders``/``receivers`` may include padded slots
    (edge_mask False); they are re-pointed at the sentinel and sorted last."""
    senders = np.asarray(senders, np.int32)
    receivers = np.asarray(receivers, np.int32)
    e = senders.shape[0]
    if edge_mask is None:
        edge_mask = np.ones(e, bool)
    else:
        edge_mask = np.asarray(edge_mask, bool)
    if num_nodes_padded % node_block != 0:
        raise ValueError(f"num_nodes_padded {num_nodes_padded} not a multiple "
                         f"of node_block {node_block}")
    xe_ids = None if xe_ids is None else np.asarray(xe_ids, np.int32)

    sentinel = num_nodes_padded
    s = np.where(edge_mask, senders, sentinel)
    r = np.where(edge_mask, receivers, sentinel)

    e_pad = round_up(max(e, edge_chunk), edge_chunk)

    def pack(sort_key, a, b, xe, mask):
        order = np.argsort(sort_key, kind="stable")
        out = {}
        for name, arr, fill in (("a", a[order], sentinel),
                                ("b", b[order], sentinel),
                                ("m", mask[order], False)):
            full = np.full(e_pad, fill, dtype=arr.dtype)
            full[:e] = arr
            out[name] = full
        if xe is not None:
            fullx = np.zeros(e_pad, np.int32)
            fullx[:e] = xe[order]
            out["xe"] = fullx
        else:
            out["xe"] = None
        return out, order

    fw, order_r = pack(r, s, r, xe_ids, edge_mask)
    bw, order_s = pack(s, s, r, xe_ids, edge_mask)

    # position of each original edge in the receiver-sorted order
    inv_r = np.empty(e, np.int32)
    inv_r[order_r] = np.arange(e, dtype=np.int32)
    perm = np.full(e_pad, e_pad - 1, np.int32)   # padded slots -> padded slot
    perm[:e] = inv_r[order_s]

    bp_r = _block_ptr(fw["b"], num_nodes_padded, node_block)
    bp_s = _block_ptr(bw["a"], num_nodes_padded, node_block)

    deg = np.zeros(num_nodes_padded, np.float32)
    np.add.at(deg, receivers[edge_mask], 1.0)

    to_dev = lambda x: None if x is None else jnp.asarray(x)

    def lrow(keys, mask):
        # per-edge local row within the owning node block; the sentinel
        # node_block never matches a block row, masking padded edges
        local = np.where(mask, keys % node_block, node_block)
        return local.astype(np.int32)[None, :]

    # Per sender-sorted chunk: x-window start + subwindow count (for the
    # masked-scatter kernel's in-kernel pre-activation recompute).  The
    # window width is shared (static): >= the largest chunk span, so dense
    # graphs (many edges per node) use one narrow window per chunk.
    num_chunks = e_pad // edge_chunk
    snd = bw["a"].reshape(num_chunks, edge_chunk)
    msk = bw["m"].reshape(num_chunks, edge_chunk)
    valid_chunk = msk.any(axis=1)
    lo = np.where(valid_chunk,
                  np.where(msk, snd, np.int64(sentinel)).min(axis=1), 0)
    lo = lo - lo % 8       # sublane-aligned window starts (Mosaic tiling)
    hi = np.where(valid_chunk, np.where(msk, snd, -1).max(axis=1), -1)
    span = np.maximum(hi - lo + 1, 0)
    max_span = int(span.max()) if len(span) else 0
    # cap the window at 512 rows (VMEM); wider spans walk nsub subwindows
    win_w = min(max(round_up(max_span, 128), 128), 512, num_nodes_padded)
    nsub = np.where(valid_chunk, -(-span // win_w), 0).astype(np.int32)

    return EdgeLayout(
        senders_r=to_dev(fw["a"]), receivers_r=to_dev(fw["b"]),
        xe_r=to_dev(fw["xe"]), mask_r=to_dev(fw["m"]),
        block_ptr_r=to_dev(bp_r), lrow_r=to_dev(lrow(fw["b"], fw["m"])),
        senders_s=to_dev(bw["a"]), receivers_s=to_dev(bw["b"]),
        xe_s=to_dev(bw["xe"]), mask_s=to_dev(bw["m"]),
        block_ptr_s=to_dev(bp_s), lrow_s=to_dev(lrow(bw["a"], bw["m"])),
        in_degree=to_dev(deg), perm_s2r=to_dev(perm),
        win_lo_s=to_dev(lo.astype(np.int32)), win_nsub_s=to_dev(nsub),
        node_block=node_block, edge_chunk=edge_chunk, win_w=win_w)


def layout_from_graph(g, node_block: int = 128,
                      edge_chunk: int = 512) -> EdgeLayout:
    """Build a layout from a padded Graph whose nodes are already a multiple
    of ``node_block`` (re-pad first if not)."""
    n_pad = g.num_nodes_padded
    if n_pad % node_block:
        raise ValueError("re-pad graph nodes to a multiple of node_block")
    return build_edge_layout(
        np.asarray(g.senders), np.asarray(g.receivers), n_pad,
        edge_mask=np.asarray(g.edge_mask),
        node_block=node_block, edge_chunk=edge_chunk)
