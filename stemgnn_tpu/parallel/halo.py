"""Halo-exchange edge-partitioned full-graph mode (v2 of the scale-out path).

V1 (:mod:`stemgnn_tpu.parallel.edge_partition`) replicates node features and
psums an [N, D] partial aggregate per layer — communication O(N*D) per layer
regardless of how local the graph is.  This module implements the design
SURVEY.md §7.1 calls the GNN analog of ring/context parallelism:

  * **1-D destination-range node ownership** — device ``i`` owns the
    contiguous node block ``[i*Nb, (i+1)*Nb)`` of the padded id space and
    *all* in-edges of its nodes, so every segment-reduce is local and the
    full in-degree is locally computable.
  * **all_to_all halo exchange** — the only cross-device traffic per layer is
    the boundary: features of remote *source* nodes referenced by local
    edges.  The request lists are static (host-precomputed), so the exchange
    is one ``jax.lax.all_to_all`` of shape [S, R, D] where R is the max
    per-peer boundary size — O(boundary * D), not O(N * D).
  * **overlap** — local-source edges are aggregated from ``x_local`` with no
    data dependency on the all_to_all, so XLA's async collectives run the
    ICI transfer under the local gather/segment-sum (the double-buffering of
    SURVEY.md §7.3 falls out of the dependence structure; no manual
    scheduling needed).

Math contract: identical to the single-device
:func:`stemgnn_tpu.ops.spmm.gather_scatter_aggregate` on the owned node block
(tests/test_parallel.py asserts equivalence), i.e. the reference's
``MySAGEConv`` aggregation semantics (STEM-GNN/model/encoder.py:94-102).
The reference's only distributed collective is the VQ codebook all_reduce
(STEM-GNN/model/vq.py:666-674); graph-topology communication like this has no
reference counterpart — it is the TPU-native scale-out design.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stemgnn_tpu.core.config import EncoderConfig
from stemgnn_tpu.nn.layers import batchnorm_apply, dropout, linear_apply


def _round_up(v: int, m: int) -> int:
    return ((max(v, 1) + m - 1) // m) * m


def build_halo_partition(senders: np.ndarray, receivers: np.ndarray,
                         num_nodes: int, num_shards: int,
                         edge_feat: Optional[np.ndarray] = None,
                         pad_multiple: int = 128,
                         xe_ids: Optional[np.ndarray] = None):
    """Host-side partitioner.

    Splits the edge list by destination ownership and precomputes the static
    halo-exchange plan.  Returns a dict of stacked arrays with leading shard
    axis ``S`` (feed through shard_map with ``P(axis)`` on every entry) plus
    two host ints:

      * ``nodes_per_shard`` — Nb, the owned node-block size (padded),
      * ``halo_slots`` — R, the per-peer boundary buffer size.

    Per shard ``i`` the edge set is split into *local-source* edges (sender
    owned by ``i``; sender ids remapped to ``[0, Nb)``) and *remote-source*
    edges (sender ids remapped to halo-buffer slots ``owner*R + slot``).
    ``send_idx[i, j]`` lists the local node indices device ``i`` must ship to
    device ``j`` (zero-padded; padded slots are never referenced by any
    remote edge, so their garbage payload is dead).
    """
    S = num_shards
    nb = _round_up(-(-num_nodes // S), pad_multiple)
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    if xe_ids is not None:
        xe_ids = np.asarray(xe_ids, np.int32)
    owner = receivers // nb
    src_owner = senders // nb

    # Per-shard edge splits and per-(i, j) boundary request lists.
    loc, rem, requests = [], [], {}
    for i in range(S):
        sel = owner == i
        s_i, r_i, so_i = senders[sel], receivers[sel] - i * nb, src_owner[sel]
        ef_i = edge_feat[sel] if edge_feat is not None else None
        xe_i = xe_ids[sel] if xe_ids is not None else None
        is_loc = so_i == i
        loc.append((s_i[is_loc] - i * nb, r_i[is_loc],
                    ef_i[is_loc] if ef_i is not None else None,
                    xe_i[is_loc] if xe_i is not None else None))
        # Remote sources: dedupe per owner, assign stable slots.
        s_rem, r_rem, so_rem = s_i[~is_loc], r_i[~is_loc], so_i[~is_loc]
        ef_rem = ef_i[~is_loc] if ef_i is not None else None
        xe_rem = xe_i[~is_loc] if xe_i is not None else None
        slot_of = {}
        for j in range(S):
            if j == i:
                continue
            uniq = np.unique(s_rem[so_rem == j])
            requests[(i, j)] = uniq
            for k, node in enumerate(uniq):
                slot_of[int(node)] = (j, k)
        rem.append((s_rem, r_rem, ef_rem, slot_of, xe_rem))

    R = _round_up(max([len(v) for v in requests.values()] + [1]),
                  min(pad_multiple, 8))
    el = _round_up(max(max(len(t[0]) for t in loc), 1), pad_multiple)
    er = _round_up(max(max(len(t[0]) for t in rem), 1), pad_multiple)

    d = edge_feat.shape[1] if edge_feat is not None else 0
    out = {
        "s_loc": np.zeros((S, el), np.int32),
        "r_loc": np.zeros((S, el), np.int32),
        "m_loc": np.zeros((S, el), bool),
        "s_rem": np.zeros((S, er), np.int32),
        "r_rem": np.zeros((S, er), np.int32),
        "m_rem": np.zeros((S, er), bool),
        "send_idx": np.zeros((S, S, R), np.int32),
    }
    if edge_feat is not None:
        out["ef_loc"] = np.zeros((S, el, d), edge_feat.dtype)
        out["ef_rem"] = np.zeros((S, er, d), edge_feat.dtype)
    if xe_ids is not None:
        out["xe_loc"] = np.zeros((S, el), np.int32)
        out["xe_rem"] = np.zeros((S, er), np.int32)

    for i in range(S):
        s_l, r_l, ef_l, xe_l = loc[i]
        k = len(s_l)
        out["s_loc"][i, :k] = s_l
        out["r_loc"][i, :k] = r_l
        out["m_loc"][i, :k] = True
        if ef_l is not None:
            out["ef_loc"][i, :k] = ef_l
        if xe_l is not None:
            out["xe_loc"][i, :k] = xe_l
        s_r, r_r, ef_r, slot_of, xe_r = rem[i]
        k = len(s_r)
        halo_ids = np.fromiter(
            ((lambda jk: jk[0] * R + jk[1])(slot_of[int(s)]) for s in s_r),
            np.int32, count=k)
        out["s_rem"][i, :k] = halo_ids
        out["r_rem"][i, :k] = r_r
        out["m_rem"][i, :k] = True
        if ef_r is not None:
            out["ef_rem"][i, :k] = ef_r
        if xe_r is not None:
            out["xe_rem"][i, :k] = xe_r
        # send_idx rows live on the *owning* device j.
        for j in range(S):
            if j == i:
                continue
            req = requests[(i, j)]
            out["send_idx"][j, i, : len(req)] = req - j * nb

    return out, nb, R


def _local(part):
    """Strip the leading length-1 shard axis shard_map leaves on each entry."""
    return {k: v[0] for k, v in part.items()}


def degree_balanced_relabel(receivers, num_nodes: int, num_shards: int,
                            pad_multiple: int = 128):
    """Node relabeling that balances per-shard edge load under the
    contiguous-range ownership of :func:`build_halo_partition`.

    Power-law graphs skew range partitions badly (SURVEY §7.3 risk: a hub
    node's whole in-edge mass lands on one shard; measured 3.9x max/mean on
    a zipf graph at S=4).  Snake-dealing nodes by descending in-degree into
    the S ownership ranges equalizes each range's total in-degree to first
    order.  Returns ``(new_of_old [num_nodes] int64, nb)``: node ``v``'s
    new id is ``new_of_old[v]``, placed inside its range ``[i*nb,
    (i+1)*nb)`` where ``nb`` matches build_halo_partition's padded
    per-shard block (call the partitioner with ``num_shards * nb`` nodes
    and the relabeled edge endpoints; scatter per-node arrays with
    ``arr_new[new_of_old] = arr_old``).
    """
    S = num_shards
    nb = _round_up(-(-num_nodes // S), pad_multiple)
    deg = np.bincount(np.asarray(receivers, np.int64), minlength=num_nodes)
    by_deg = np.argsort(-deg, kind="stable")
    cap = nb
    sizes = np.zeros(S, np.int64)
    new_of_old = np.empty(num_nodes, np.int64)
    for i, node in enumerate(by_deg):
        r, c = divmod(i, S)
        b = c if r % 2 == 0 else S - 1 - c        # snake for 2nd order
        if sizes[b] >= cap:                        # range full: spill
            b = int(np.argmin(sizes))
        new_of_old[node] = b * nb + sizes[b]
        sizes[b] += 1
    return new_of_old, nb


def relabel_dataset_balanced(ds, num_shards: int, pad_multiple: int = 128):
    """Return ``(ds_new, new_of_old)``: a copy of the TAGDataset with node
    ids relabeled by :func:`degree_balanced_relabel` (ghost slots padded
    in) so a subsequent halo partition is edge-load-balanced.  Per-node
    arrays (x, labels, split masks) scatter into the new id space; ghosts
    get x id 0, label 0, all-False masks — they are never valid nodes."""
    import dataclasses

    ei = np.asarray(ds.edge_index)
    new_of_old, nb = degree_balanced_relabel(ei[1], ds.num_nodes,
                                             num_shards, pad_multiple)
    n_eff = num_shards * nb

    def scatter(arr, fill=0, dtype=None):
        a = np.asarray(arr)
        out = np.full((n_eff,) + a.shape[1:], fill,
                      dtype or a.dtype)
        out[new_of_old] = a
        return out

    splits = None
    if ds.splits is not None:
        splits = [{k: scatter(v, fill=False) for k, v in s.items()}
                  for s in ds.splits]
    return dataclasses.replace(
        ds,
        x=scatter(ds.x),
        edge_index=np.stack([new_of_old[ei[0]], new_of_old[ei[1]]]),
        labels=None if ds.labels is None else scatter(ds.labels),
        splits=splits), new_of_old


def build_halo_layouts(part, nb: int, R: int, num_shards: int, *,
                       node_block: int = 128, edge_chunk: int = 512,
                       hub_size: int = 0, hub_min_coverage: float = 0.1,
                       sc_hub_size: int = 0,
                       feat_dim_hint: int = 768, num_edge_types: int = 1):
    """Per-shard :class:`~stemgnn_tpu.ops.edge_layout.EdgeLayout` pairs for
    the fused Pallas aggregation, stacked along a leading shard axis.

    ``part`` is the stacked output of :func:`build_halo_partition` (numpy).
    Returns ``(lay_loc, lay_rem)``:

      * ``lay_loc`` — layouts over the local-source edges; node space is the
        owned block ``[0, nb)`` for both gather (senders) and scatter
        (receivers).
      * ``lay_rem`` — layouts over the remote-source edges; senders index the
        halo buffer ``[0, S*R)``, receivers the owned block, so the node
        space is ``round_up(max(S*R, nb), node_block)`` (the halo buffer and
        the output both live padded to that size inside the fused aggregate).

    Static metadata (``win_w``, hub presence, padded shapes) is forced
    uniform across shards so the per-shard layouts stack into one pytree
    that feeds through shard_map with a ``P(axis)`` spec on every leaf.
    Hub-dense decompositions (``hub_size > 0``) are kept only when EVERY
    shard clears ``hub_min_coverage`` (the pytree structure must match).
    """
    import jax.tree_util as jtu

    from stemgnn_tpu.ops.edge_layout import build_edge_layout

    S = num_shards
    if nb % node_block:
        raise ValueError(f"nodes-per-shard {nb} must be a multiple of "
                         f"node_block {node_block} (pick pad_multiple "
                         f"accordingly in build_halo_partition)")
    m_rem = _round_up(max(S * R, nb), node_block)
    e_loc = part["s_loc"].shape[1]
    e_rem = part["s_rem"].shape[1]

    def build_all(senders, receivers, masks, xes, n_pad, e_pad_to, hub):
        sc = sc_hub_size if (hub and num_edge_types <= 1) else 0
        tail_pad = [e_pad_to]

        def one(i, win_floor=0, sc_size=None):
            # hubs built unconditionally per shard (min_coverage -1); the
            # keep/strip decision below is global so every shard has the
            # same pytree structure.  Scatter-side hubs (r5): only for
            # single-type tables, mirroring fused_full_graph's gate.
            return build_edge_layout(
                senders[i], receivers[i], n_pad,
                xe_ids=None if xes is None else xes[i],
                edge_mask=masks[i], node_block=node_block,
                edge_chunk=edge_chunk, hub_size=hub,
                hub_min_coverage=-1.0, to_device=False,
                win_floor=win_floor, e_pad_to=e_pad_to,
                hub_tail_e_pad_to=tail_pad[0],
                sc_hub_size=sc if sc_size is None else sc_size,
                feat_dim_hint=feat_dim_hint,
                num_edge_types=num_edge_types)
        lays = [one(i) for i in range(S)]
        if sc:
            # structural uniformity: every shard's hub must agree on
            # having (or not having) the sc block — the two forms carry
            # DIFFERENT tails, so on a mismatch REBUILD the family without
            # sc (stripping fields would drop the sc-covered edges)
            def sc_state(lay):
                return tuple(
                    (None if (getattr(lay, s) is None
                              or getattr(lay, s).sc_cnt is None)
                     else tuple(getattr(lay, s).sc_cnt.shape))
                    for s in ("hub_r", "hub_s"))
            if len({sc_state(lay) for lay in lays}) > 1:
                sc = 0
                lays = [one(i, sc_size=0) for i in range(S)]
        if hub:
            # Tails padded to e_pad_to waste the hub win — the kernels
            # would scan full-size masked arrays (measured: hubs NET
            # NEGATIVE at 29% coverage, BASELINE r5).  Rebuild with the
            # family-max ACTUAL tail size instead (uniform across shards,
            # so the stacked pytree still has one treedef per leaf).
            def tails(lay):
                for s_ in ("hub_r", "hub_s"):
                    h = getattr(lay, s_)
                    if h is not None:
                        yield int(h.tail.senders_r.shape[0])
                        # LocSplit sub-tails share the same pad; their
                        # arrays derive from the tail build
            sizes = [t for lay in lays for t in tails(lay)]
            real = []
            for lay in lays:
                for s_ in ("hub_r", "hub_s"):
                    h = getattr(lay, s_)
                    if h is not None:
                        m = h.tail.mask_r
                        real.append(int(np.asarray(m).sum()))
            if sizes and real:
                need = _round_up(max(real) + 1, edge_chunk)
                if need < max(sizes):
                    tail_pad[0] = need
                    lays = [one(i) for i in range(S)]
        win = max(lay.win_w for lay in lays)
        lays = [lay if lay.win_w == win else one(i, win_floor=win)
                for i, lay in enumerate(lays)]

        def unify_gwin(members):
            """Force identical windowed-gather statics across a layout
            family (per-shard width/decision are statics; the stacked
            pytree needs one treedef).  A direction is enabled only when
            EVERY shard's break-even gate enabled it."""
            from stemgnn_tpu.ops.edge_layout import force_gwin
            w = max(m.gwin_w for m in members)
            ur = all(m.use_gwin_r for m in members) and w > 0
            us = all(m.use_gwin_s for m in members) and w > 0
            return [m if (m.gwin_w == w and m.use_gwin_r == ur
                          and m.use_gwin_s == us)
                    else force_gwin(m, w, ur, us) for m in members]

        lays = unify_gwin(lays)
        if hub:
            # keep a direction's hubs only if every shard built one (the
            # exact-bf16-multiplicity guard can refuse) AND the aggregate
            # edge-weighted coverage clears the threshold
            n_edges = np.array([m.sum() for m in masks], np.float64)
            def keep(getter):
                hs = [getter(lay) for lay in lays]
                if any(h is None for h in hs):
                    return False
                cov = sum(h.coverage * e for h, e in zip(hs, n_edges))
                return cov / max(n_edges.sum(), 1.0) >= hub_min_coverage
            keep_r = keep(lambda lay: lay.hub_r)
            keep_s = keep(lambda lay: lay.hub_s)

            def norm(lay):
                def fix(h):
                    # zero the per-shard static metadata (coverage stats,
                    # sc_size) so the stacked pytree has ONE treedef
                    return h.replace(coverage=0.0, sc_coverage=0.0,
                                     sc_size=0 if h.sc_cnt is None
                                     else int(h.sc_cnt.shape[0]),
                                     tail=h.tail.replace(win_w=win))
                return lay.replace(
                    hub_r=fix(lay.hub_r) if keep_r else None,
                    hub_s=fix(lay.hub_s) if keep_s else None)
            lays = [norm(lay) for lay in lays]
            for side in ("hub_r", "hub_s"):
                hs = [getattr(lay, side) for lay in lays]
                if hs[0] is None:
                    continue
                tails = unify_gwin([h.tail for h in hs])
                lays = [lay.replace(**{side: h.replace(tail=t)})
                        for lay, h, t in zip(lays, hs, tails)]
        return jtu.tree_map(lambda *xs: np.stack(xs), *lays)

    xe_loc = part.get("xe_loc")
    xe_rem = part.get("xe_rem")
    lay_loc = build_all(part["s_loc"], part["r_loc"], part["m_loc"], xe_loc,
                        nb, e_loc, hub_size)
    lay_rem = build_all(part["s_rem"], part["r_rem"], part["m_rem"], xe_rem,
                        m_rem, e_rem, hub_size)
    return lay_loc, lay_rem


def build_halo_drop_gids(part, nb: int, R: int, num_shards: int,
                         m_rem: int):
    """GLOBAL-id tables for the hub-preserving pair-hash edge dropout
    (ops/fused_sage.py ``drop_hash``): local layout row index -> global
    node id, per shard.

      * loc layouts: both sides index the owned block ``[0, nb)`` of
        shard ``i`` -> global ``i*nb + local``.
      * rem layouts: senders index halo slots (slot ``j*R + k`` on shard
        ``me`` = owner ``j``'s ``send_idx[j, me, k]``-th local node),
        receivers the owned block; both padded to the rem layouts' node
        space ``m_rem`` with a sentinel id (never referenced by a valid
        edge or a nonzero count-matrix entry).

    Returns ``(gid_loc [S, nb], gid_rem_src [S, m_rem],
    gid_rem_dst [S, m_rem])`` int32 numpy arrays.
    """
    S = num_shards
    sentinel = np.int32(S * nb)
    gid_loc = (np.arange(S, dtype=np.int64)[:, None] * nb
               + np.arange(nb, dtype=np.int64)[None, :]).astype(np.int32)
    send_idx = np.asarray(part["send_idx"])              # [S(own), S, R]
    gid_rem_src = np.full((S, m_rem), sentinel, np.int32)
    gid_rem_dst = np.full((S, m_rem), sentinel, np.int32)
    for me in range(S):
        for j in range(S):
            gid_rem_src[me, j * R:(j + 1) * R] = (
                j * nb + send_idx[j, me]).astype(np.int32)
        gid_rem_dst[me, :nb] = gid_loc[me]
    return gid_loc, gid_rem_src, gid_rem_dst


def _shard_layout(lay):
    """Strip the leading shard axis from a stacked layout pytree."""
    import jax.tree_util as jtu
    return jtu.tree_map(lambda a: a[0], lay)


def halo_sage_aggregate_fused(x_local, part, lay_loc, lay_rem,
                              edge_table=None, *, axis: str,
                              reduce: str = "mean", relu: bool = True,
                              interpret: bool = False,
                              bf16_messages: bool = True,
                              keep_loc=None, keep_rem=None,
                              drop_hash=None, gids=None):
    """Fused-kernel variant of :func:`halo_sage_aggregate`.

    Local and remote edge shards each run the Pallas one-hot MXU scatter
    (+ hub-dense decomposition when the layouts carry one) with ``reduce=
    'sum'``; the mean divides by the combined in-degree at the end so the
    result matches :func:`halo_sage_aggregate` /
    :func:`stemgnn_tpu.ops.spmm.gather_scatter_aggregate` on the owned node
    block.  ``lay_loc``/``lay_rem`` are the per-shard (already stripped)
    layouts from :func:`build_halo_layouts`; per-edge type features come
    from ``edge_table`` [T, D] via the layouts' xe ids.  ``keep_loc``/
    ``keep_rem`` are optional runtime 0/1 edge masks in the partition's
    (padded, pre-sort) edge order — the pretrain edge-dropout augmentation.
    """
    from stemgnn_tpu.ops.fused_sage import fused_sage_aggregate
    from stemgnn_tpu.ops.pairhash import pair_hash_uniform

    nb, d = x_local.shape
    halo = halo_exchange(x_local, part["send_idx"], axis)
    m_rem = lay_rem.num_nodes_padded
    halo_p = jnp.pad(halo, ((0, m_rem - halo.shape[0]), (0, 0)))
    dynamic = keep_loc is not None or keep_rem is not None
    if dynamic and (keep_loc is None or keep_rem is None):
        raise ValueError("runtime edge masks must cover both edge shards: "
                         "pass keep_loc AND keep_rem")
    # drop_hash = (seed, p) + gids = ((src,dst)_loc, (src,dst)_rem)
    # GLOBAL-id tables: the hub-preserving pair-hash dropout — every shard
    # hashes global pairs, so S-shard == single-device masks exactly
    if drop_hash is not None:
        assert not dynamic, "drop_hash and keep_* are exclusive"
        assert gids is not None, "drop_hash in halo mode needs gids"
    ids_loc, ids_rem = gids if gids is not None else (None, None)
    sum_loc = fused_sage_aggregate(
        x_local, lay_loc, edge_table, reduce="sum", relu=relu,
        interpret=interpret, bf16_messages=bf16_messages,
        edge_keep=keep_loc, drop_hash=drop_hash, drop_ids=ids_loc)
    sum_rem = fused_sage_aggregate(
        halo_p, lay_rem, edge_table, reduce="sum", relu=relu,
        interpret=interpret, bf16_messages=bf16_messages,
        edge_keep=keep_rem, drop_hash=drop_hash, drop_ids=ids_rem)
    agg = sum_loc.astype(jnp.float32) + sum_rem[:nb].astype(jnp.float32)
    if reduce == "sum":
        return agg
    if dynamic:
        def kept_deg(lay, keep, n_out):
            k = jnp.take(keep, lay.perm_r2o, axis=0).astype(jnp.float32)
            k = jnp.where(lay.mask_r, k, 0.0)
            # receivers_r is only BLOCK-grouped (edge_layout block_sort)
            return jax.ops.segment_sum(k, lay.receivers_r,
                                       num_segments=lay.num_nodes_padded
                                       )[:n_out]
        deg = kept_deg(lay_loc, keep_loc, nb) + \
            kept_deg(lay_rem, keep_rem, nb)
    elif drop_hash is not None:
        seed, p = drop_hash

        def hash_deg(lay, ids, n_out):
            src_ids, dst_ids = ids
            ka = jnp.take(src_ids, lay.senders_r, axis=0, mode="clip")
            kb = jnp.take(dst_ids, lay.receivers_r, axis=0, mode="clip")
            k = jnp.logical_and(lay.mask_r,
                                pair_hash_uniform(seed, ka, kb) >= p)
            return jax.ops.segment_sum(k.astype(jnp.float32),
                                       lay.receivers_r,
                                       num_segments=lay.num_nodes_padded
                                       )[:n_out]
        deg = hash_deg(lay_loc, ids_loc, nb) + \
            hash_deg(lay_rem, ids_rem, nb)
    else:
        deg = lay_loc.in_degree[:nb] + lay_rem.in_degree[:nb]
    return agg / jnp.maximum(deg, 1.0)[:, None]


def halo_exchange(x_local, send_idx, axis: str):
    """Ship boundary features: returns the halo buffer [S*R, D] where slot
    ``j*R + k`` holds owner ``j``'s ``send_idx[j, me, k]``-th local feature."""
    blocks = jnp.take(x_local, send_idx, axis=0)          # [S, R, D]
    if jax.lax.axis_size(axis) > 1:
        # all_to_all over a singleton axis is the identity; skip the
        # collective there (1-device fallbacks / CPU debugging)
        blocks = jax.lax.all_to_all(blocks, axis, split_axis=0,
                                    concat_axis=0, tiled=True)  # [S, R, D]
    return blocks.reshape(-1, x_local.shape[-1])


def halo_sage_aggregate(x_local, part, *, axis: str, reduce: str = "mean",
                        relu: bool = True):
    """Per-device SAGE aggregation over the halo layout.

    ``part`` is the per-device slice of :func:`build_halo_partition` output
    (leading shard axis already stripped).  Matches
    ``gather_scatter_aggregate(..., reduce, relu)`` on the owned node block.
    """
    nb = x_local.shape[0]

    def msgs(src_table, s, m, ef):
        v = jnp.take(src_table, s, axis=0)
        if ef is not None:
            v = v + ef
        if relu:
            v = jax.nn.relu(v)
        return jnp.where(m[:, None], v, 0.0)

    # Halo exchange first: the local-edge aggregation below has no dependence
    # on it, so XLA overlaps the ICI transfer with the local compute.
    halo = halo_exchange(x_local, part["send_idx"], axis)
    agg = jax.ops.segment_sum(
        msgs(x_local, part["s_loc"], part["m_loc"], part.get("ef_loc")),
        part["r_loc"], num_segments=nb)
    agg = agg + jax.ops.segment_sum(
        msgs(halo, part["s_rem"], part["m_rem"], part.get("ef_rem")),
        part["r_rem"], num_segments=nb)
    if reduce == "sum":
        return agg
    deg = jax.ops.segment_sum(part["m_loc"].astype(x_local.dtype),
                              part["r_loc"], num_segments=nb)
    deg = deg + jax.ops.segment_sum(part["m_rem"].astype(x_local.dtype),
                                    part["r_rem"], num_segments=nb)
    return agg / jnp.maximum(deg, 1.0)[:, None]


def halo_moe_sage_aggregate(z_local, part_rev, params_layer, weights, *,
                            axis: str):
    """MoE-SAGE expert mixing over the halo layout.

    The reference's MixtureSageLayer aggregates along *out*-edges —
    ``scatter_mean(x[col], row)``, receiver features averaged at the sender
    (encoder.py:122-124) — which is the in-edge aggregation of the REVERSED
    graph; ``part_rev`` is a halo partition built on swapped endpoints, so
    the same exchange machinery applies.  ``weights`` [Nb, K] router weights.
    """
    agg = halo_sage_aggregate(z_local, part_rev, axis=axis, reduce="mean",
                              relu=False)
    combined = jnp.concatenate([agg, z_local], axis=-1)       # [Nb, 2*in]
    out = jnp.einsum("nd,kdo->nko", combined, params_layer["weights"])
    if out.shape[-1] == z_local.shape[-1]:
        out = out + z_local[:, None, :]                        # residual
    return jnp.sum(weights[:, :, None] * out, axis=1)


def _masked_segsum(data, ids, mask, nb):
    data = jnp.where(mask.reshape(mask.shape + (1,) * (data.ndim - 1)),
                     data, 0)
    return jax.ops.segment_sum(data, ids, num_segments=nb)


def halo_gcn_apply(params, z_local, part, *, axis: str):
    """GCN layer over the halo layout == :func:`convs.gcn_apply` on the
    owned block.  Sender-side inverse-sqrt degrees ride the same halo
    exchange as the features (one all_to_all: [h | inv_sqrt] concatenated),
    receiver-side degrees are fully local (every in-edge is owned)."""
    nb = z_local.shape[0]
    h = linear_apply(params["lin"], z_local)
    deg = jax.ops.segment_sum(part["m_loc"].astype(h.dtype), part["r_loc"],
                              num_segments=nb)
    deg = deg + jax.ops.segment_sum(part["m_rem"].astype(h.dtype),
                                    part["r_rem"], num_segments=nb)
    inv = jax.lax.rsqrt(deg + 1.0)                     # +1 self-loop
    buf = halo_exchange(jnp.concatenate([h, inv[:, None]], axis=-1),
                        part["send_idx"], axis)
    h_halo, inv_halo = buf[:, :-1], buf[:, -1]
    w_loc = inv[part["s_loc"]] * inv[part["r_loc"]]
    w_rem = inv_halo[part["s_rem"]] * inv[part["r_rem"]]
    out = _masked_segsum(jnp.take(h, part["s_loc"], axis=0)
                         * w_loc[:, None], part["r_loc"], part["m_loc"], nb)
    out = out + _masked_segsum(jnp.take(h_halo, part["s_rem"], axis=0)
                               * w_rem[:, None], part["r_rem"],
                               part["m_rem"], nb)
    out = out + h * (inv ** 2)[:, None]                # self-loop term
    return out + params["bias"]


def halo_gin_apply(params, z_local, part, *, axis: str):
    """GIN layer over the halo layout == :func:`convs.gin_apply`."""
    nb = z_local.shape[0]
    halo = halo_exchange(z_local, part["send_idx"], axis)
    agg = _masked_segsum(jnp.take(z_local, part["s_loc"], axis=0),
                         part["r_loc"], part["m_loc"], nb)
    agg = agg + _masked_segsum(jnp.take(halo, part["s_rem"], axis=0),
                               part["r_rem"], part["m_rem"], nb)
    return linear_apply(params["lin"],
                        (1.0 + params["eps"]) * z_local + agg)


def halo_gat_apply(params, z_local, part, *, axis: str,
                   negative_slope: float = 0.2):
    """Single-head GAT over the halo layout == :func:`convs.gat_apply`.

    The per-receiver attention softmax is local (all in-edges owned); the
    sender-side terms (projected features + ``att_src`` logits) ride one
    halo exchange.  The combined local+remote softmax is computed with an
    explicit max/exp/sum pass over both edge sets, matching
    :func:`stemgnn_tpu.ops.segment.segment_softmax` numerics."""
    _NEG = -1e30
    nb = z_local.shape[0]
    h = linear_apply(params["lin"], z_local)
    a_src = h @ params["att_src"]
    buf = halo_exchange(jnp.concatenate([h, a_src[:, None]], axis=-1),
                        part["send_idx"], axis)
    h_halo, a_src_halo = buf[:, :-1], buf[:, -1]
    a_dst = h @ params["att_dst"]
    e_loc = jax.nn.leaky_relu(a_src[part["s_loc"]] + a_dst[part["r_loc"]],
                              negative_slope)
    e_rem = jax.nn.leaky_relu(a_src_halo[part["s_rem"]]
                              + a_dst[part["r_rem"]], negative_slope)
    e_loc = jnp.where(part["m_loc"], e_loc, _NEG)
    e_rem = jnp.where(part["m_rem"], e_rem, _NEG)
    mx = jnp.maximum(
        jax.ops.segment_max(e_loc, part["r_loc"], num_segments=nb),
        jax.ops.segment_max(e_rem, part["r_rem"], num_segments=nb))
    mx = jnp.where(mx <= _NEG / 2, 0.0, mx)
    exp_l = jnp.where(part["m_loc"], jnp.exp(e_loc - mx[part["r_loc"]]), 0.0)
    exp_r = jnp.where(part["m_rem"], jnp.exp(e_rem - mx[part["r_rem"]]), 0.0)
    den = jax.ops.segment_sum(exp_l, part["r_loc"], num_segments=nb) \
        + jax.ops.segment_sum(exp_r, part["r_rem"], num_segments=nb)
    den = jnp.maximum(den, 1e-16)
    out = _masked_segsum(jnp.take(h, part["s_loc"], axis=0)
                         * (exp_l / den[part["r_loc"]])[:, None],
                         part["r_loc"], part["m_loc"], nb)
    out = out + _masked_segsum(jnp.take(h_halo, part["s_rem"], axis=0)
                               * (exp_r / den[part["r_rem"]])[:, None],
                               part["r_rem"], part["m_rem"], nb)
    return out + params["bias"]


def halo_encoder_apply(params, state, cfg: EncoderConfig, x_local, part, *,
                       axis: str, training: bool = False, rng=None,
                       node_mask=None, part_rev=None, lay_loc=None,
                       lay_rem=None, edge_table=None,
                       interpret: bool = False, stat_axes=None,
                       keep_loc=None, keep_rem=None,
                       drop_hash=None, gids=None):
    """Encoder forward over the node-sharded halo layout.

    Semantics of :func:`stemgnn_tpu.nn.encoder.encoder_apply` for every
    backbone (sage — the flagship config, incl. MoE layers — plus
    gcn/gin/gat via their halo formulations above): per-layer halo
    exchange of the current activations, BatchNorm statistics psum-ed over
    ``axis``.  MoE layers additionally need ``part_rev`` — a partition of
    the REVERSED edge list (out-edge aggregation, encoder.py:122-124) built
    with :func:`build_halo_partition` on swapped endpoints.  The MoE env
    regularizer and router usage stats are psum-reduced so they match the
    single-device values.

    ``lay_loc``/``lay_rem`` (per-shard, stripped — see
    :func:`build_halo_layouts`) switch the SAGE aggregation to the fused
    Pallas scatter + hub-dense kernels; per-edge type features then come
    from ``edge_table`` [T, D] through the layouts' xe ids (``part`` may
    omit ``ef_loc``/``ef_rem`` entirely in that case).

    ``stat_axes``: mesh axes for the statistics psums (BatchNorm batch
    moments, MoE env regularizer + usage stats) — defaults to ``(axis,)``;
    the 2-axis halo pretrain passes ``('data', axis)`` so the replicated
    state stays consistent across data replicas.  Halo exchange always runs
    over ``axis`` alone (node ownership is sharded on that axis only).

    ``keep_loc``/``keep_rem``: runtime 0/1 edge masks in the partition's
    padded edge order (pretrain edge-dropout augmentation); folded into the
    messages AND the mean's degree on both the fused and the XLA path.
    """
    flags = cfg.moe_layer_flags()
    if cfg.backbone not in ("sage", "gcn", "gin", "gat"):
        raise ValueError(f"Unsupported backbone: {cfg.backbone}")
    if cfg.backbone != "sage":
        # gcn/gin/gat run their XLA formulations over the halo layout
        # (matching the single-device path, which is XLA for them too);
        # the fused Pallas layouts encode SAGE message semantics only.
        flags = [False] * cfg.num_layers
        lay_loc = lay_rem = None
    if any(flags) and part_rev is None:
        raise ValueError("MoE layers in halo mode need part_rev (a halo "
                         "partition of the reversed edge list)")
    from stemgnn_tpu.nn.encoder import (_activation, _gumbel_softmax,
                                        _reg_loss)

    act = _activation(cfg)
    if stat_axes is None:
        stat_axes = (axis,)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    # Decorrelate per-device dropout masks (gumbel keys stay shard-local
    # too: routing is a per-node decision).
    for ax in stat_axes:
        rng = jax.random.fold_in(rng, jax.lax.axis_index(ax))
    if drop_hash is not None and lay_loc is None:
        raise ValueError("drop_hash needs the fused halo layouts; use "
                         "keep_loc/keep_rem on the XLA halo path")
    if keep_loc is not None and lay_loc is None:
        # XLA path: fold the runtime edge mask into the partition masks —
        # halo_sage_aggregate derives both the messages and the mean's
        # degree from them
        part = dict(part,
                    m_loc=jnp.logical_and(part["m_loc"],
                                          keep_loc.astype(bool)),
                    m_rem=jnp.logical_and(part["m_rem"],
                                          keep_rem.astype(bool)))
    # mixed precision (nn/encoder.py:94-97 semantics): bf16 activations —
    # and therefore bf16 halo all_to_all exchanges — with f32 BatchNorm
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    if dt == jnp.bfloat16 and cfg.backbone != "sage":
        raise ValueError("compute_dtype=bfloat16 supports the sage backbone")
    z = x_local.astype(dt)
    new_norm_states = []
    env_idx = 0
    env_reg_total = jnp.zeros(())
    env_layers = 0
    moe_stats = []
    for i in range(cfg.num_layers):
        rng, k_drop, k_gumbel = jax.random.split(rng, 3)
        layer_p = params["layers"][i]
        if flags[i]:
            logits = linear_apply(params["env_encoders"][env_idx], z)
            if training:
                weights = _gumbel_softmax(k_gumbel, logits, cfg.tau)
                # Global E[w log pi] as psum of sums / psum of row counts —
                # unmasked, matching encoder_apply's _reg_loss (a plain mean
                # over all padded rows) so halo == single-device bitwise-ish.
                log_pi = jax.nn.log_softmax(logits, axis=-1)
                num = jnp.sum(jnp.sum(weights * log_pi, axis=-1))
                cnt = jnp.asarray(z.shape[0], z.dtype)
                env_reg_total = env_reg_total + \
                    jax.lax.psum(num, stat_axes) / \
                    jax.lax.psum(cnt, stat_axes)
                env_layers += 1
            else:
                weights = jax.nn.softmax(logits, axis=-1)
            w_stat = jax.lax.stop_gradient(weights)
            if node_mask is not None:
                w_stat = jnp.where(node_mask[:, None], w_stat, 0.0)
                count = jnp.sum(node_mask)
            else:
                count = jnp.asarray(z.shape[0])
            top1 = jax.nn.one_hot(jnp.argmax(w_stat, axis=-1),
                                  cfg.num_experts)
            if node_mask is not None:
                top1 = jnp.where(node_mask[:, None], top1, 0.0)
            moe_stats.append({
                "layer": i,
                "sum_prob": jax.lax.psum(jnp.sum(w_stat, axis=0),
                                         stat_axes),
                "sum_top1": jax.lax.psum(jnp.sum(top1, axis=0), stat_axes),
                "count": jax.lax.psum(count, stat_axes)})
            z = halo_moe_sage_aggregate(z, part_rev, layer_p, weights,
                                        axis=axis)
            env_idx += 1
        elif cfg.backbone == "gcn":
            z = halo_gcn_apply(layer_p, z, part, axis=axis)
        elif cfg.backbone == "gin":
            z = halo_gin_apply(layer_p, z, part, axis=axis)
        elif cfg.backbone == "gat":
            z = halo_gat_apply(layer_p, z, part, axis=axis)
        else:
            ef = part.get("ef_loc")
            if ef is not None and ef.shape[-1] != z.shape[-1]:
                raise ValueError(
                    "edge feature dim must equal layer input dim")
            if lay_loc is not None:
                agg = halo_sage_aggregate_fused(
                    z, part, lay_loc, lay_rem, edge_table, axis=axis,
                    reduce="mean", relu=True, interpret=interpret,
                    bf16_messages=cfg.fused_bf16_messages,
                    keep_loc=keep_loc, keep_rem=keep_rem,
                    drop_hash=drop_hash, gids=gids)
                agg = agg.astype(z.dtype)
            else:
                agg = halo_sage_aggregate(z, part, axis=axis, reduce="mean",
                                          relu=True)
            z = linear_apply(layer_p["lin_l"], agg) + \
                linear_apply(layer_p["lin_r"], z)
        if cfg.normalize != "none":
            z, ns = batchnorm_apply(params["norms"][i], state["norms"][i], z,
                                    training=training, mask=node_mask,
                                    axis_name=stat_axes)
            new_norm_states.append(ns)
        else:
            new_norm_states.append(state["norms"][i])
        if i < cfg.num_layers - 1:
            z = act(z)
            z = dropout(k_drop, z, cfg.dropout, training=training)
    env_reg = (env_reg_total / env_layers) if (training and env_layers > 0) \
        else jnp.zeros(())
    aux = {"env_reg": env_reg, "moe_stats": moe_stats}
    return z, {"norms": new_norm_states}, aux
