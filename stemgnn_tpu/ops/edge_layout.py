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
class HubDense:
    """Hub-dense decomposition of one scatter direction.

    On power-law graphs a few high-gather-frequency "hub" nodes source a
    large fraction of messages, and the XLA row gather feeding the scatter
    kernel is row-rate-limited (~22 ns/row on v5e regardless of row width).
    In the factored-relu path each message is a pure per-source row, so all
    hub contributions collapse into a dense MXU matmul

        out_hub = CNT @ f(x[hub_ids]),   CNT[n, h] = #edges hub_h -> n

    (plain XLA, ~1-2 ms at arxiv scale vs ~11 ms of gather), while the
    remaining "tail" edges run through the normal Pallas scatter over a
    tail-only sub-layout.  An in-kernel one-hot reconstruction was tried
    first and measured *slower* (the [wh, eb] one-hot builds are VPU-bound at
    ~10 us/chunk); the dense-count form moves that work to the MXU once per
    graph.  CNT is bfloat16 — exact while every (node, hub) multiplicity is
    < 256 (the builder asserts).
    """
    hub_ids: jax.Array     # [H] int32 hub node ids (gather side)
    cnt: jax.Array         # [N_pad, H] bf16 dense count block of A
    tail: "EdgeLayout"     # sub-layout over non-hub edges only
    # Scatter-side hub block (round-2 VERDICT item 1): among the edges NOT
    # covered by the gather-side hubs, those whose *scatter* key is a
    # high-frequency node (a hub receiver in the forward / hub sender in
    # the factored backward) collapse into a transposed dense matmul
    #
    #     out[sc_ids] += sc_cnt @ f(x)        sc_cnt[k, j] = #edges j->sc_k
    #
    # over ALL source rows — removing them from the gather-bound tail.
    # These edges' gather keys are near-uniform (everything points at a
    # hub), so they are exactly the edges locality windows can never cover.
    sc_ids: Optional[jax.Array] = None    # [H2_pad] int32 (padded -> row 0,
                                          #   zero sc_cnt rows)
    sc_cnt: Optional[jax.Array] = None    # [H2_pad, N_pad] bf16
    # TYPED hubs (T <= 32 edge-type tables, round-2 VERDICT item 7): hubs
    # are (gather node, edge type) PAIRS — the dense operand row for
    # virtual hub k is f(x[hub_ids[k]] + T[hub_xe[k]]), so the matmul
    # covers typed messages at unchanged [N, H] memory.  Forward direction
    # only (the typed relu mask is per-edge, so the factored backward does
    # not apply); None for single-type/untyped graphs.
    hub_xe: Optional[jax.Array] = None    # [H_pad] int32 type per virtual hub
    hub_size: int = struct.field(pytree_node=False, default=2048)
    coverage: float = struct.field(pytree_node=False, default=0.0)
    sc_size: int = struct.field(pytree_node=False, default=0)
    sc_coverage: float = struct.field(pytree_node=False, default=0.0)


@struct.dataclass
class LocSplit:
    """Per-direction local/stray edge split (mixed-locality graphs).

    The windowed in-kernel gather is gated per DIRECTION, and one far edge
    per chunk blows that chunk's window — so on community graphs with a few
    percent of random long-range edges the whole direction falls back to
    gathers even though ~90% of edges are window-coverable.  The split puts
    edges whose gather key lies within ``reach`` rows of their scatter
    block into a ``loc`` sub-layout (windowed kernels, break-even-gated on
    the subset's own windows) and the rest into a ``stray`` sub-layout
    (gather + scatter).  The two kernels CHAIN through the scatter
    epilogue's additive ``init`` (stray partial sums feed the windowed
    call), so the split costs one extra kernel launch and zero [N, D]
    passes.  Only the named direction of each sub-layout is used.

    The ``m_*`` fields are the SINGLE-KERNEL variant (r3 VERDICT item 4):
    all edges in one (scatter-block, stray-class, gather) order; stray
    edges carry sentinel keys (zero window contribution) plus a stray-rank
    stream, and each chunk with strays pulls one slice of the compact
    pre-gathered stray buffer inside the kernel — one launch, no [N, D]
    partial-sum round trip.  ``m_stray_keys`` are the gather-side node ids
    in rank order (the wrapper gathers ``x[m_stray_keys]`` as the buffer;
    padded to leave >= edge_chunk rows of tail slack)."""
    loc: "EdgeLayout"
    stray: "EdgeLayout"
    m_keys: Optional[jax.Array] = None       # [1, E_pad] int32 (stray=sent.)
    m_lrow: Optional[jax.Array] = None       # [1, E_pad] int32
    m_block_ptr: Optional[jax.Array] = None  # [N_pad/NB + 1] int32
    m_win_lo: Optional[jax.Array] = None     # [C] int32 (local edges only)
    m_win_nsub: Optional[jax.Array] = None   # [C] int32
    m_sidx: Optional[jax.Array] = None       # [1, E_pad] int32 (-1 local)
    m_soff: Optional[jax.Array] = None       # [C] int32
    m_scnt: Optional[jax.Array] = None       # [C] int32
    m_stray_keys: Optional[jax.Array] = None  # [S_pad] int32
    loc_frac: float = struct.field(pytree_node=False, default=0.0)
    m_gwin_w: int = struct.field(pytree_node=False, default=0)


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
    # sorted position -> original edge index, per direction: lets runtime
    # per-edge values (e.g. an in-step random edge-dropout mask, original
    # order) be permuted into kernel order with one tiny int gather
    perm_r2o: Optional[jax.Array] = None   # [E_pad] int32
    perm_s2o: Optional[jax.Array] = None   # [E_pad] int32
    # x-window metadata for the in-kernel relu-mask recompute of the
    # backward (ops.scatter_pallas.masked_scatter_rows_sorted): senders are
    # sorted, so each edge chunk's source rows live in a narrow node-id
    # window — the kernel streams those x rows sequentially instead of
    # re-gathering an [E, D] pre-activation.  Per sender-sorted edge chunk:
    win_lo_s: Optional[jax.Array] = None    # [C] int32 window start node id
    win_nsub_s: Optional[jax.Array] = None  # [C] int32 ceil(span / win_w)
    # GATHER-side window metadata (ops.scatter_pallas.
    # gathered_scatter_rows_sorted): the *other* endpoint's node-id window
    # per chunk — senders within receiver-sorted chunks (forward messages),
    # receivers within sender-sorted chunks (factored-backward grad rows).
    # On locality-ordered graphs (community structure / RCM reordering,
    # ops.reorder) these windows are narrow and the kernel replaces the XLA
    # random row gather + [E, D] message materialization with sequential
    # window DMAs + one-hot MXU matmuls.  ``use_gwin_*`` is the host-side
    # break-even decision (see _gwin_decide).
    gwin_lo_r: Optional[jax.Array] = None    # [C] int32
    gwin_nsub_r: Optional[jax.Array] = None  # [C] int32
    gwin_lo_s: Optional[jax.Array] = None    # [C] int32
    gwin_nsub_s: Optional[jax.Array] = None  # [C] int32
    # hub-dense decompositions per scatter direction (build_edge_layout
    # hub_size > 0; None when the graph lacks hub concentration)
    hub_r: Optional[HubDense] = None
    hub_s: Optional[HubDense] = None
    # local/stray splits per direction (build_edge_layout loc_split; only
    # built when the whole-direction gwin gate failed but the local subset
    # clears it — mixed-locality graphs)
    split_r: Optional[LocSplit] = None
    split_s: Optional[LocSplit] = None
    # static metadata
    node_block: int = struct.field(pytree_node=False, default=128)
    edge_chunk: int = struct.field(pytree_node=False, default=512)
    win_w: int = struct.field(pytree_node=False, default=0)  # 0 = absent
    gwin_w: int = struct.field(pytree_node=False, default=0)  # 0 = absent
    use_gwin_r: bool = struct.field(pytree_node=False, default=False)
    use_gwin_s: bool = struct.field(pytree_node=False, default=False)

    @property
    def num_edges_padded(self) -> int:
        return self.senders_r.shape[0]

    @property
    def num_nodes_padded(self) -> int:
        return self.in_degree.shape[0]


def _block_ptr(sorted_keys: np.ndarray, n_pad: int, nb: int) -> np.ndarray:
    # keys are BLOCK-grouped (within-block order is by the gather key, see
    # block_sort below), so searchsorted must compare block indices, not
    # raw node ids
    blocks = np.asarray(sorted_keys, np.int64) // nb
    bounds = np.arange(0, n_pad // nb + 1)
    return np.searchsorted(blocks, bounds, side="left").astype(np.int32)


# Break-even model constants live in per-chip profiles with calibration
# provenance (ops.chip_profile); the builders below read the ambient
# profile at build time so switching device_kind switches models.
from stemgnn_tpu.ops.chip_profile import current_profile


def _chunk_windows(keys: np.ndarray, mask: np.ndarray, edge_chunk: int,
                   sentinel: int):
    """Per-chunk node-id window of ``keys``: (lo [C] 8-aligned, span [C])."""
    num_chunks = keys.shape[0] // edge_chunk
    k = keys.reshape(num_chunks, edge_chunk)
    m = mask.reshape(num_chunks, edge_chunk)
    valid = m.any(axis=1)
    lo = np.where(valid, np.where(m, k, np.int64(sentinel)).min(axis=1), 0)
    lo = lo - lo % 8       # sublane-aligned window starts (Mosaic tiling)
    hi = np.where(valid, np.where(m, k, -1).max(axis=1), -1)
    span = np.maximum(hi - lo + 1, 0)
    return lo.astype(np.int64), span.astype(np.int64)


def _gwin_decide(nsub: np.ndarray, gwin_w: int, num_valid_edges: int,
                 edge_chunk: int, feat_dim: int) -> bool:
    """Break-even gate for the windowed in-kernel gather of one direction:
    estimated windowed cost (sequential window DMAs + one-hot MXU matmuls)
    must beat the current path (XLA random row gather + [E, D] bf16 message
    write + kernel re-read) with margin.  All in bf16 bytes."""
    d = feat_dim
    prof = current_profile()
    windowed = float(nsub.sum()) * (gwin_w * d * 2.0 / prof.seq_bps
                                    + 2.0 * edge_chunk * gwin_w * d
                                    / prof.mxu_bf16_flops)
    gather = num_valid_edges * (prof.gather_fixed_s
                                + d * 2.0 / prof.gather_bps
                                + d * 2.0 / prof.stream_bps
                                + d * 2.0 / prof.seq_bps)
    return windowed * 1.2 < gather


def _per_edge_gather_saving(d: int, prof) -> float:
    """Modeled cost a hub-covered edge avoids: the XLA row gather + the
    [E, D] bf16 message write + the kernel's re-read."""
    return (prof.gather_fixed_s + d * 2.0 / prof.gather_bps
            + d * 2.0 / prof.stream_bps + d * 2.0 / prof.seq_bps)


def _auto_hub_size(freq: np.ndarray, cap: int, num_nodes_padded: int,
                   d: int, prof) -> int:
    """Pick the hub size minimizing modeled cost: dense-block cost grows
    linearly in H while coverage is concave, so the optimum is usually far
    below a generous cap (round-3 v5e sweep: 768 beats 2048 by 1.5x on the
    bench graph).  ``freq`` is the (unsorted) gather-key frequency array;
    returns 0 when no H wins with >= 20% margin."""
    csum = np.cumsum(np.sort(freq)[::-1])
    per_edge = _per_edge_gather_saving(d, prof)
    best_h, best_score = 0, 0.0
    cap = min(cap, len(csum))
    grid = sorted(set(list(range(128, cap + 1, 128)) + [cap]) - {0})
    for h in grid:
        h_pad = round_up(h, 128)
        # effective MXU rate saturates with the contraction size: at small
        # h_pad the [N, h_pad] @ [h_pad, D] matmul is pipeline/weight-load
        # bound (round-3 v5e sweep measured 768 ~ 512 > 256-biased-model
        # predictions)
        mxu_eff = prof.mxu_bf16_flops * min(1.0, h_pad / 512.0)
        dense = (2.0 * num_nodes_padded * h_pad * d / mxu_eff
                 + num_nodes_padded * h_pad * 2.0 / prof.hbm_bps)
        score = float(csum[h - 1]) * per_edge - 1.2 * dense
        if score > best_score:
            best_h, best_score = h, score
    return best_h


def _build_loc_split(senders, receivers, edge_mask, xe_ids, direction: str,
                     enabled_already: bool, num_nodes_padded: int,
                     node_block: int, edge_chunk: int,
                     feat_dim_hint: int, loc_split: str, loc_reach: int,
                     loc_merge: bool = False):
    """One direction's LocSplit, or None when it would not pay (the
    whole-direction gate already enabled windows, the local fraction is too
    small, or the local subset's own break-even gate fails)."""
    force = loc_split == "on"
    if enabled_already and not force:
        return None
    scatter_key, gather_key = ((receivers, senders) if direction == "r"
                               else (senders, receivers))
    # "local" is measured from each scatter BLOCK's median gather key (not
    # from the block's own id range): on community-ordered graphs the
    # block's edges cluster around the community's row range, and a
    # +-loc_reach window about the median covers them with ~one subwindow
    # per chunk — which is what the windowed kernel's break-even needs.
    blk = scatter_key.astype(np.int64) // node_block
    g64 = gather_key.astype(np.int64)
    valid = np.nonzero(edge_mask)[0]
    order = valid[np.lexsort((g64[valid], blk[valid]))]
    sb, sg = blk[order], g64[order]
    nblocks = num_nodes_padded // node_block + 1
    lo = np.searchsorted(sb, np.arange(nblocks))
    hi = np.searchsorted(sb, np.arange(nblocks), side="right")
    med = np.zeros(nblocks, np.int64)
    nz = hi > lo
    if len(sg):
        mid = np.minimum((lo + hi) // 2, len(sg) - 1)
        med[nz] = sg[mid[nz]]
    dist = g64 - med[np.minimum(blk, nblocks - 1)]
    local = edge_mask & (np.abs(dist) <= loc_reach)
    frac = float(local.sum()) / max(int(edge_mask.sum()), 1)
    # r4 chip measurement (scripts/bench_gwin.py --locsplit): at 62%-local
    # the split LOSES to the plain gather path (92.7 vs 89.7 ms) while at
    # 90%-local it wins by 19% (68.9 vs 81.7) — the stray pass amortizes
    # only when strays are a small minority, so the auto gate requires
    # strong locality
    if not force and frac < 0.8:
        return None
    stray_mask = edge_mask & ~local
    sub_kw = dict(node_block=node_block, edge_chunk=edge_chunk,
                  to_device=False, feat_dim_hint=feat_dim_hint)
    loc_lay = build_edge_layout(
        senders[local], receivers[local], num_nodes_padded,
        xe_ids=None if xe_ids is None else xe_ids[local],
        gwin="on" if force else "auto", **sub_kw)
    if not (loc_lay.use_gwin_r if direction == "r" else loc_lay.use_gwin_s):
        return None
    stray_lay = build_edge_layout(
        senders[stray_mask], receivers[stray_mask], num_nodes_padded,
        xe_ids=None if xe_ids is None else xe_ids[stray_mask],
        gwin="off", **sub_kw)
    # the merged single-kernel metadata is a measured negative on v5e
    # (BASELINE r4), so its build (full-edge lexsort + per-chunk walk) and
    # its ~3x [E_pad] int32 device footprint are opt-in (bench/tests)
    merged = _build_merged_split(scatter_key, gather_key, local, stray_mask,
                                 num_nodes_padded, node_block,
                                 edge_chunk) if loc_merge else {}
    return LocSplit(loc=loc_lay, stray=stray_lay, loc_frac=frac, **merged)


def _build_merged_split(scatter_key, gather_key, local, stray_mask,
                        num_nodes_padded: int, node_block: int,
                        edge_chunk: int):
    """Single-kernel LocSplit metadata (LocSplit ``m_*`` fields): all valid
    edges in ONE (scatter-block, stray-class, gather) order.  Local edges
    keep their gather keys (window-coverable by construction); stray edges
    carry the sentinel key plus a consecutive stray rank so the kernel
    pulls their pre-gathered rows from a compact side buffer per chunk."""
    sentinel = num_nodes_padded
    valid = local | stray_mask
    idx = np.nonzero(valid)[0]
    blk = scatter_key[idx].astype(np.int64) // node_block
    cls = stray_mask[idx].astype(np.int64)
    g = gather_key[idx].astype(np.int64)
    order = np.lexsort((g, cls, blk))
    idx = idx[order]
    e = len(idx)
    e_pad = round_up(max(e, edge_chunk), edge_chunk)
    num_chunks = e_pad // edge_chunk

    sk = np.full(e_pad, sentinel, np.int64)
    sk[:e] = scatter_key[idx]
    gk = np.full(e_pad, sentinel, np.int64)
    gk[:e] = gather_key[idx]
    is_stray = np.zeros(e_pad, bool)
    is_stray[:e] = stray_mask[idx]
    is_local = np.zeros(e_pad, bool)
    is_local[:e] = ~stray_mask[idx]

    lrow = np.where(is_local | is_stray, sk % node_block,
                    node_block).astype(np.int32)[None, :]
    block_ptr = _block_ptr(sk, num_nodes_padded, node_block)

    # window metadata over LOCAL edges only; strays masked out entirely
    keys = np.where(is_local, gk, sentinel).astype(np.int32)
    lo, span = _chunk_windows(keys, is_local, edge_chunk, sentinel)
    max_span = int(span.max()) if len(span) else 0
    gwin_w = min(max(round_up(max_span, 128), 128), 512, num_nodes_padded)
    nsub = np.where(span > 0, -(-span // gwin_w), 0).astype(np.int32)

    # consecutive stray ranks in merged order, with each chunk's FIRST
    # rank 8-aligned: the kernel DMAs the chunk's buffer slice from
    # stray_off, and Mosaic requires HBM slice starts divisible by the
    # sublane tiling (8) — alignment gaps are dead buffer rows
    ch = np.arange(e_pad) // edge_chunk
    scnt = np.bincount(ch[is_stray], minlength=num_chunks).astype(np.int32)
    soff = np.zeros(num_chunks, np.int32)
    sidx = np.full(e_pad, -1, np.int32)
    next_rank = 0
    for c in np.nonzero(scnt)[0]:
        next_rank = -(-next_rank // 8) * 8
        soff[c] = next_rank
        rows = np.nonzero(is_stray[c * edge_chunk:(c + 1) * edge_chunk])[0]
        sidx[c * edge_chunk + rows] = next_rank + np.arange(len(rows))
        next_rank += len(rows)
    stray_keys = np.zeros(round_up(next_rank + edge_chunk, 8), np.int32)
    stray_keys[sidx[is_stray]] = gk[is_stray].astype(np.int32)

    return dict(m_keys=keys[None, :], m_lrow=lrow,
                m_block_ptr=block_ptr,
                m_win_lo=lo.astype(np.int32), m_win_nsub=nsub,
                m_sidx=sidx[None, :], m_soff=soff, m_scnt=scnt,
                m_stray_keys=stray_keys, m_gwin_w=gwin_w)


def _build_hub_dense(senders, receivers, edge_mask, gather_by: str,
                     num_nodes_padded: int, hub_size: int, node_block: int,
                     edge_chunk: int, min_coverage: float,
                     tail_e_pad_to: int = 0,
                     feat_dim_hint: int = 768,
                     to_device: bool = True, gwin: str = "auto",
                     sc_hub_size: int = 0,
                     loc_split: str = "off",
                     loc_reach: int = 256,
                     xe_ids=None, num_edge_types: int = 1) -> "HubDense":
    """Hub-dense decomposition for one direction.  ``gather_by`` names which
    endpoint the XLA gather indexes (the scatter key is the other one):
    the forward scatters by receiver and gathers senders; the factored
    backward scatters by sender and gathers receivers.

    TYPED mode (``num_edge_types`` in (1, 32] with ``xe_ids``): hubs are
    (gather node, edge type) pairs — the dense operand row for virtual hub
    k is f(x[hub_ids[k]] + T[hub_xe[k]]), covering typed messages at
    unchanged [N, H] memory (HubDense.hub_xe).  Forward direction only:
    the typed relu mask is per-edge, so the factored backward's per-source
    gate does not exist and ``gather_by == 'receiver'`` returns None.

    Gating: beyond the raw ``min_coverage`` floor, the decomposition must
    clear an estimated BREAK-EVEN — the dense CNT block costs are
    coverage-independent (an [N_pad, h_pad] bf16 read + an N*h*D MXU
    matmul), so a barely-qualifying graph would pay full dense cost for a
    small gather saving.  Estimated saving = covered_rows * gather-row
    latency; estimated cost = matmul FLOPs / MXU rate + CNT bytes / HBM
    rate.  A negative ``min_coverage`` bypasses ALL gating (the stacked
    halo builder gates globally instead)."""
    gidx = senders if gather_by == "sender" else receivers
    sidx = receivers if gather_by == "sender" else senders
    typed = num_edge_types > 1 and xe_ids is not None
    if typed and (num_edge_types > 32 or gather_by != "sender"):
        return None
    if typed:
        t_n = num_edge_types
        pair = gidx.astype(np.int64) * t_n + xe_ids.astype(np.int64)
        freq = np.bincount(pair[edge_mask],
                           minlength=num_nodes_padded * t_n)
        h = min(hub_size, num_nodes_padded * t_n)
    else:
        freq = np.bincount(gidx[edge_mask], minlength=num_nodes_padded)
        h = min(hub_size, num_nodes_padded)
    if min_coverage >= 0:
        # AUTO mode: hub_size is a CAP — pick the H minimizing modeled cost
        # (0 = no hub pays).  Forced mode (min_coverage < 0, the stacked
        # halo builder) keeps the exact requested H for pytree uniformity.
        h = _auto_hub_size(freq, h, num_nodes_padded, feat_dim_hint,
                           current_profile())
        if h == 0:
            return None
    if typed:
        hub_pairs = np.argsort(-freq, kind="stable")[:h]
        hub_ids = (hub_pairs // t_n).astype(np.int32)
        hub_xe = (hub_pairs % t_n).astype(np.int32)
        covered = float(freq[hub_pairs].sum())
    else:
        hub_ids = np.argsort(-freq, kind="stable")[:h].astype(np.int32)
        hub_xe = None
        covered = float(freq[hub_ids].sum())
    coverage = covered / max(edge_mask.sum(), 1)
    if min_coverage >= 0 and coverage < min_coverage:
        return None
    if typed:
        rank = np.full(num_nodes_padded * num_edge_types, 2 ** 30, np.int64)
        rank[hub_pairs] = np.arange(h)
        edge_rank = rank[pair]
    else:
        rank = np.full(num_nodes_padded, 2 ** 30, np.int64)
        rank[hub_ids] = np.arange(h)
        edge_rank = rank[gidx]
    is_hub = edge_mask & (edge_rank < h)
    tail = edge_mask & ~is_hub

    # Scatter-side hub block over the remaining edges (see HubDense): dense
    # sc_cnt[H2, N] @ f(x) replaces their per-edge gathers.  Gated by
    # coverage + the same break-even style as the gather side, with the
    # extra f(x) [N, D] materialization pass charged to the dense cost.
    sc_ids_pad = cnt_sc = None
    h2 = 0
    sc_cov = 0.0
    if sc_hub_size and not typed:   # typed messages are per-(source, type):
                                    # the transposed block is not factorable
        freq_sc = np.bincount(sidx[tail], minlength=num_nodes_padded)
        h2 = min(sc_hub_size, num_nodes_padded)
        if min_coverage >= 0:   # AUTO: sc_hub_size is a cap (as above); the
            # f(x) [N, D] materialization the fwd block needs is an
            # H-independent cost, charged as an accept-margin via a second
            # score check below
            prof = current_profile()
            d = feat_dim_hint
            h2 = _auto_hub_size(freq_sc, h2, num_nodes_padded, d, prof)
            if h2:
                csum = np.cumsum(np.sort(freq_sc)[::-1])
                fx_pass = num_nodes_padded * d * 4.0 / prof.stream_bps
                h2_pad_est = round_up(h2, 128)
                dense = (2.0 * num_nodes_padded * h2_pad_est * d
                         / prof.mxu_bf16_flops
                         + num_nodes_padded * h2_pad_est * 2.0
                         / prof.hbm_bps)
                if (float(csum[h2 - 1]) * _per_edge_gather_saving(d, prof)
                        < 1.2 * (dense + fx_pass)):
                    h2 = 0
        sc_ids = np.argsort(-freq_sc, kind="stable")[:h2].astype(np.int32)
        covered_sc = float(freq_sc[sc_ids].sum())
        sc_cov = covered_sc / max(edge_mask.sum(), 1)
        if min_coverage >= 0 and sc_cov < min_coverage:
            h2 = 0
        if h2 == 0:
            sc_cov = 0.0
        else:
            sc_rank = np.full(num_nodes_padded, 2 ** 30, np.int64)
            sc_rank[sc_ids] = np.arange(h2)
            is_sc = tail & (sc_rank[sidx] < h2)
            sc_rows = sc_rank[sidx[is_sc]].astype(np.int64)
            sc_cols = gidx[is_sc].astype(np.int64)
            ok = True
            if sc_rows.size:
                _, mult = np.unique(sc_rows * (num_nodes_padded + 1)
                                    + sc_cols, return_counts=True)
                ok = mult.max(initial=0) < 256   # exact-bf16 counts
            if not ok:
                h2 = 0
                sc_cov = 0.0
            else:
                tail = tail & ~is_sc
                h2_pad = round_up(h2, 128)
                if to_device:
                    cnt_sc = jnp.zeros((h2_pad, num_nodes_padded),
                                       jnp.float32).at[
                        (jnp.asarray(sc_rows, jnp.int32),
                         jnp.asarray(sc_cols, jnp.int32))].add(1.0).astype(
                        jnp.bfloat16)
                else:
                    cnt_np = np.zeros((h2_pad, num_nodes_padded), np.float32)
                    np.add.at(cnt_np, (sc_rows, sc_cols), 1.0)
                    cnt_sc = cnt_np
                sc_ids_pad = np.zeros(h2_pad, np.int32)
                sc_ids_pad[:h2] = sc_ids

    h_pad = round_up(h, 128)
    hub_rows = sidx[is_hub].astype(np.int64)
    hub_cols = edge_rank[is_hub].astype(np.int64)
    # exact-bf16 multiplicity guard without materializing cnt on host
    if hub_rows.size:
        _, mult = np.unique(hub_rows * h_pad + hub_cols, return_counts=True)
        if mult.max(initial=0) >= 256:
            # parallel-edge multiplicity beyond exact bf16 integers: skip
            # the decomposition rather than aggregate inexactly
            return None
    if to_device:
        # build the dense count block ON DEVICE from the small index
        # arrays (one scatter-add): at arxiv scale cnt is ~0.7 GB and the
        # host->device link may be slow (34 MB/s on the tunnel) — shipping
        # ints instead of the dense block turns ~20 s of H2D into ~0.1 s
        cnt = jnp.zeros((num_nodes_padded, h_pad), jnp.float32).at[
            (jnp.asarray(hub_rows, jnp.int32),
             jnp.asarray(hub_cols, jnp.int32))].add(1.0).astype(jnp.bfloat16)
    else:
        cnt_np = np.zeros((num_nodes_padded, h_pad), np.float32)
        np.add.at(cnt_np, (hub_rows, hub_cols), 1.0)
        cnt = cnt_np.astype(np.float32)  # numpy leaves (stacked halo build)
    hub_ids_pad = np.zeros(h_pad, np.int32)
    hub_ids_pad[:h] = hub_ids
    hub_xe_pad = None
    if typed:
        hub_xe_pad = np.zeros(h_pad, np.int32)
        hub_xe_pad[:h] = hub_xe

    tail_layout = build_edge_layout(
        senders[tail], receivers[tail], num_nodes_padded,
        xe_ids=None if xe_ids is None else xe_ids[tail],
        node_block=node_block, edge_chunk=edge_chunk,
        e_pad_to=tail_e_pad_to, to_device=False,
        feat_dim_hint=feat_dim_hint, gwin=gwin,
        loc_split=loc_split, loc_reach=loc_reach)
    return HubDense(hub_ids=hub_ids_pad, cnt=cnt,
                    tail=tail_layout, hub_size=h, coverage=coverage,
                    sc_ids=sc_ids_pad, sc_cnt=cnt_sc, sc_size=h2,
                    sc_coverage=sc_cov, hub_xe=hub_xe_pad)


def build_edge_layout(senders, receivers, num_nodes_padded: int,
                      xe_ids=None, edge_mask=None, node_block: int = 128,
                      edge_chunk: int = 512, hub_size: int = 0,
                      hub_min_coverage: float = 0.1,
                      to_device: bool = True, win_floor: int = 0,
                      e_pad_to: int = 0,
                      hub_tail_e_pad_to: int = 0,
                      feat_dim_hint: int = 768,
                      gwin: str = "auto",
                      sc_hub_size: int = 0,
                      loc_split: str = "off",
                      loc_reach: int = 256,
                      loc_merge: bool = False,
                      num_edge_types: int = 1) -> EdgeLayout:
    """Host numpy prep.  ``senders``/``receivers`` may include padded slots
    (edge_mask False); they are re-pointed at the sentinel and sorted last.

    ``hub_size > 0`` additionally builds hub-dense decompositions per
    direction (``hub_r``/``hub_s``, see HubDense) when the top ``hub_size``
    gather-frequency nodes cover at least ``hub_min_coverage`` of the edges;
    the factored-relu fused aggregation then computes hub messages as a
    dense MXU matmul instead of row gathers.

    ``win_floor``/``e_pad_to`` force minimum values on the derived static
    window width / padded edge count so a *family* of layouts (one per mesh
    shard, stacked into a single pytree for shard_map) shares identical
    static metadata and array shapes.

    ``gwin``: windowed in-kernel gather metadata/decision — "auto" builds
    the per-chunk gather-side windows and enables the windowed kernels when
    the break-even model predicts a win (locality-ordered graphs), "on"
    forces them on (tests), "off" skips entirely (uniform static metadata
    for stacked shard-layout families)."""
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

    e_pad = round_up(max(e, edge_chunk, e_pad_to), edge_chunk)

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

    # Within-block gather-key sorting: the kernels only need edges GROUPED
    # per scatter node block (block_ptr granularity; the one-hot P matmul
    # matches lrow within the block range, order-free), so the secondary
    # sort key is the gather-side node id — consecutive edge chunks then
    # cover ascending gather windows inside each block, tightening the
    # windowed in-kernel gather (gwin) without changing kernel semantics
    # (round-2 VERDICT item 1, "within-receiver-block sender sorting").
    kb = np.int64(num_nodes_padded + 2)
    fw, order_r = pack((r.astype(np.int64) // node_block) * kb + s,
                       s, r, xe_ids, edge_mask)
    bw, order_s = pack((s.astype(np.int64) // node_block) * kb + r,
                       s, r, xe_ids, edge_mask)

    # position of each original edge in the receiver-sorted order
    inv_r = np.empty(e, np.int32)
    inv_r[order_r] = np.arange(e, dtype=np.int32)
    perm = np.full(e_pad, e_pad - 1, np.int32)   # padded slots -> padded slot
    perm[:e] = inv_r[order_s]

    def sorted_to_orig(order):
        # padded sorted slots point at any index (they are layout-masked)
        out = np.full(e_pad, max(min(e, e_pad - 1), 0), np.int32)
        out[:e] = order
        return out

    perm_r2o = sorted_to_orig(order_r)
    perm_s2o = sorted_to_orig(order_s)

    bp_r = _block_ptr(fw["b"], num_nodes_padded, node_block)
    bp_s = _block_ptr(bw["a"], num_nodes_padded, node_block)

    deg = np.zeros(num_nodes_padded, np.float32)
    np.add.at(deg, receivers[edge_mask], 1.0)

    # Arrays are ALWAYS assembled as host numpy; with to_device=True the
    # finished pytree ships in ONE jax.device_put at the end (per-array
    # eager jnp.asarray costs a blocking round trip each on tunneled
    # transports — ~1 s/array, and a hub+split layout has ~100 arrays).
    # Only the dense CNT blocks build ON device (from small index arrays,
    # _build_hub_dense) — shipping them dense would be ~20 s each.
    to_dev = (lambda x: x)

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
    lo, span = _chunk_windows(bw["a"], bw["m"], edge_chunk, sentinel)
    max_span = int(span.max()) if len(span) else 0
    max_span = max(max_span, win_floor)
    # cap the window at 512 rows (VMEM); wider spans walk nsub subwindows
    win_w = min(max(round_up(max_span, 128), 128), 512, num_nodes_padded)
    nsub = np.where(span > 0, -(-span // win_w), 0).astype(np.int32)

    # gather-side windows: senders within receiver-sorted chunks (forward)
    # and receivers within sender-sorted chunks (factored backward)
    gwin_fields = dict(gwin_lo_r=None, gwin_nsub_r=None, gwin_lo_s=None,
                       gwin_nsub_s=None, gwin_w=0, use_gwin_r=False,
                       use_gwin_s=False)
    if gwin != "off":
        glo_r, gspan_r = _chunk_windows(fw["a"], fw["m"], edge_chunk, sentinel)
        glo_s, gspan_s = _chunk_windows(bw["b"], bw["m"], edge_chunk, sentinel)
        gmax = int(max(gspan_r.max(initial=0), gspan_s.max(initial=0)))
        gwin_w = min(max(round_up(gmax, 128), 128), 512, num_nodes_padded)
        gns_r = np.where(gspan_r > 0, -(-gspan_r // gwin_w), 0).astype(np.int32)
        gns_s = np.where(gspan_s > 0, -(-gspan_s // gwin_w), 0).astype(np.int32)
        n_valid = int(edge_mask.sum())
        force = gwin == "on"
        gwin_fields = dict(
            gwin_lo_r=glo_r.astype(np.int32), gwin_nsub_r=gns_r,
            gwin_lo_s=glo_s.astype(np.int32), gwin_nsub_s=gns_s,
            gwin_w=gwin_w,
            use_gwin_r=force or _gwin_decide(gns_r, gwin_w, n_valid,
                                             edge_chunk, feat_dim_hint),
            use_gwin_s=force or _gwin_decide(gns_s, gwin_w, n_valid,
                                             edge_chunk, feat_dim_hint))

    hub_r = hub_s = None
    if hub_size:
        hub_r = _build_hub_dense(senders, receivers, edge_mask, "sender",
                                 num_nodes_padded, hub_size, node_block,
                                 edge_chunk, hub_min_coverage,
                                 tail_e_pad_to=hub_tail_e_pad_to,
                                 feat_dim_hint=feat_dim_hint,
                                 to_device=to_device, gwin=gwin,
                                 sc_hub_size=sc_hub_size,
                                 loc_split=loc_split, loc_reach=loc_reach,
                                 xe_ids=xe_ids,
                                 num_edge_types=num_edge_types)
        hub_s = _build_hub_dense(senders, receivers, edge_mask, "receiver",
                                 num_nodes_padded, hub_size, node_block,
                                 edge_chunk, hub_min_coverage,
                                 tail_e_pad_to=hub_tail_e_pad_to,
                                 feat_dim_hint=feat_dim_hint,
                                 to_device=to_device, gwin=gwin,
                                 sc_hub_size=sc_hub_size,
                                 loc_split=loc_split, loc_reach=loc_reach,
                                 xe_ids=xe_ids,
                                 num_edge_types=num_edge_types)

    # Local/stray split per direction (LocSplit): attempted only when the
    # whole-direction windowed gate failed — mixed-locality graphs where a
    # minority of long-range edges blows every chunk window.  "on" forces
    # the split (tests) regardless of gates.  A direction with a hub-dense
    # decomposition skips the top-level split (its TAIL gets one instead,
    # via the loc_split threading above).
    split_r = split_s = None
    if loc_split != "off" and gwin != "off":
        split_r = None if hub_r is not None else _build_loc_split(
            senders, receivers, edge_mask, xe_ids, "r",
            gwin_fields["use_gwin_r"], num_nodes_padded, node_block,
            edge_chunk, feat_dim_hint, loc_split, loc_reach, loc_merge)
        split_s = None if hub_s is not None else _build_loc_split(
            senders, receivers, edge_mask, xe_ids, "s",
            gwin_fields["use_gwin_s"], num_nodes_padded, node_block,
            edge_chunk, feat_dim_hint, loc_split, loc_reach, loc_merge)

    lay = EdgeLayout(
        senders_r=to_dev(fw["a"]), receivers_r=to_dev(fw["b"]),
        xe_r=to_dev(fw["xe"]), mask_r=to_dev(fw["m"]),
        block_ptr_r=to_dev(bp_r), lrow_r=to_dev(lrow(fw["b"], fw["m"])),
        senders_s=to_dev(bw["a"]), receivers_s=to_dev(bw["b"]),
        xe_s=to_dev(bw["xe"]), mask_s=to_dev(bw["m"]),
        block_ptr_s=to_dev(bp_s), lrow_s=to_dev(lrow(bw["a"], bw["m"])),
        in_degree=to_dev(deg), perm_s2r=to_dev(perm),
        perm_r2o=to_dev(perm_r2o), perm_s2o=to_dev(perm_s2o),
        hub_r=hub_r, hub_s=hub_s, split_r=split_r, split_s=split_s,
        win_lo_s=to_dev(lo.astype(np.int32)), win_nsub_s=to_dev(nsub),
        gwin_lo_r=to_dev(gwin_fields["gwin_lo_r"]),
        gwin_nsub_r=to_dev(gwin_fields["gwin_nsub_r"]),
        gwin_lo_s=to_dev(gwin_fields["gwin_lo_s"]),
        gwin_nsub_s=to_dev(gwin_fields["gwin_nsub_s"]),
        node_block=node_block, edge_chunk=edge_chunk, win_w=win_w,
        gwin_w=gwin_fields["gwin_w"],
        use_gwin_r=gwin_fields["use_gwin_r"],
        use_gwin_s=gwin_fields["use_gwin_s"])
    # one transfer for the whole pytree (device-built CNT leaves are
    # already resident and pass through device_put untouched)
    return jax.device_put(lay) if to_device else lay


def force_gwin(lay: EdgeLayout, gwin_w: int, use_r: bool,
               use_s: bool) -> EdgeLayout:
    """Recompute the gather-window metadata at a FORCED static width and set
    the use flags.  Used by the stacked-shard layout builder (parallel/halo)
    to make every member of a layout family share identical static metadata
    (one treedef feeds shard_map); layouts must hold host numpy arrays."""
    sentinel = lay.num_nodes_padded
    eb = lay.edge_chunk
    gwin_w = min(gwin_w, lay.num_nodes_padded)

    def windows(keys, mask):
        lo, span = _chunk_windows(np.asarray(keys), np.asarray(mask), eb,
                                  sentinel)
        nsub = np.where(span > 0, -(-span // gwin_w), 0).astype(np.int32)
        return lo.astype(np.int32), nsub

    glo_r, gns_r = windows(lay.senders_r, lay.mask_r)
    glo_s, gns_s = windows(lay.receivers_s, lay.mask_s)
    return lay.replace(gwin_lo_r=glo_r, gwin_nsub_r=gns_r,
                       gwin_lo_s=glo_s, gwin_nsub_s=gns_s, gwin_w=gwin_w,
                       use_gwin_r=use_r, use_gwin_s=use_s)


def layout_from_graph(g, node_block: int = 128, edge_chunk: int = 512,
                      xe_ids=None, hub_size: int = 0,
                      num_edge_types: int = 1) -> EdgeLayout:
    feat_dim = int(g.node_feat.shape[-1]) if getattr(g, "node_feat", None) \
        is not None else 768
    """Build a layout from a padded Graph whose nodes are already a multiple
    of ``node_block`` (re-pad first if not).  ``xe_ids`` are per-edge type
    ids aligned with the graph's (padded) edge arrays."""
    n_pad = g.num_nodes_padded
    if n_pad % node_block:
        raise ValueError("re-pad graph nodes to a multiple of node_block")
    return build_edge_layout(
        np.asarray(g.senders), np.asarray(g.receivers), n_pad,
        xe_ids=xe_ids, edge_mask=np.asarray(g.edge_mask),
        node_block=node_block, edge_chunk=edge_chunk, hub_size=hub_size,
        feat_dim_hint=feat_dim, num_edge_types=num_edge_types)


def attach_layout(g, xe_ids=None, edge_table=None, node_block: int = 128,
                  edge_chunk: int = 512, hub_size: int = 0):
    """Return ``g`` with a precomputed EdgeLayout (+ optional type-feature
    table [T, D]) attached, unlocking the fused TPU aggregation path in the
    encoder (models/task.encode picks both up from the graph).  ``xe_ids``
    may be unpadded ([n_edge]) — padded slots get type 0 and are masked.

    A single-row ``edge_table`` keeps the aggregation factored (hub-dense
    capable); with it attached, ``g.edge_feat`` need not be materialized.
    Edge-type hubs interact with dropout-style edge masking only through
    message zeroing, so layouts must be attached to graphs whose edge set is
    fixed (full-batch finetune/eval — not the pretrain edge-dropout path
    unless hub_size == 0 and masks are folded into messages)."""
    e_pad = g.num_edges_padded
    if xe_ids is not None:
        xe_ids = np.asarray(xe_ids, np.int32)
        if xe_ids.shape[0] < e_pad:
            xe_ids = np.concatenate(
                [xe_ids, np.zeros(e_pad - xe_ids.shape[0], np.int32)])
    t_rows = 1 if edge_table is None else int(np.shape(edge_table)[0])
    if t_rows > 32:
        hub_size = 0   # typed virtual hubs cover T <= 32 (HubDense.hub_xe)
    lay = layout_from_graph(g, node_block=node_block, edge_chunk=edge_chunk,
                            xe_ids=xe_ids, hub_size=hub_size,
                            num_edge_types=t_rows)
    if edge_table is not None:
        edge_table = jnp.asarray(edge_table)
    return g.replace(layout=jax.device_put(lay), edge_table=edge_table)
