"""Fused SAGE aggregation with the Pallas scatter kernel + custom VJP.

Forward (reference semantics STEM-GNN/model/encoder.py:94-102):

    out[i] = mean_{(j,i) in E} relu(x[j] + T[xe(j,i)])

  * gather x rows by sender (XLA gather), add the edge-type row from the
    small table T (never materializing [E, D] type features in host memory),
    relu -> messages M in receiver-sorted order,
  * Pallas one-hot-matmul scatter (ops.scatter_pallas) sums M per receiver,
  * divide by in-degree for the mean.

Backward:

    dx[j] = sum_{(j,i)} 1[pre > 0] * dout[i]/deg[i]

  computed natively in *sender-sorted* order (no [E, D] permutation): the
  relu mask is recomputed from a cheap sorted gather of x, dout/deg is
  gathered per edge, and the same Pallas kernel scatters by sender.
  The edge-type table T is input data (frozen text embeddings), declared
  non-differentiable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stemgnn_tpu.ops.edge_layout import EdgeLayout
from stemgnn_tpu.ops.scatter_pallas import scatter_rows_sorted


def _zero_cot(tree):
    """Zero cotangents for auxiliary pytrees (float leaves -> zeros,
    int/bool leaves -> float0)."""
    def z(leaf):
        if leaf is None:
            return None
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.zeros_like(leaf)
        return np.zeros(leaf.shape, jax.dtypes.float0)
    return jax.tree_util.tree_map(z, tree)


@functools.lru_cache(maxsize=None)
def _make(reduce: str, relu: bool, with_table: bool, fast: bool,
          interpret: bool, bf16_messages: bool, relu_residual: bool,
          pipeline: str, bf16_out: bool, slots: int, single_type: bool,
          hub_bf16_acc: bool = True, loc_merged: bool = False,
          drop_p: float = 0.0):

    from stemgnn_tpu.ops.pairhash import pair_hash_uniform

    mdtype = jnp.bfloat16 if bf16_messages else jnp.float32

    # ---- drop_hash support (r5): per-step undirected-pair edge dropout
    # whose keep decision is a closed-form hash of (seed, node pair) —
    # evaluable on DENSE (node, hub) grids, so the hub count matrices mask
    # in place and the hub-dense decomposition SURVIVES the dynamic mask
    # (the per-edge ``keep`` path must bypass the hubs entirely, which
    # costs ~110 ms/step at bench scale — scripts/pretrain_step_probe.py).
    #
    # ``ids`` = optional (src_ids, dst_ids) GLOBAL-id tables mapping this
    # layout's local row indices to the hash's node vocabulary — the halo
    # per-shard layouts index local blocks / halo slots, but the dropout
    # decision must be a pure function of the GLOBAL pair so every shard
    # (and the single-device reference) draws identical masks.  None =
    # identity (single-device layouts).
    def _id_doms(layout, ids, order):
        """(row_dom, col_dom) id arrays for a direction: rows are the
        scatter/output domain, cols the gather domain."""
        if ids is None:
            iota = jnp.arange(layout.num_nodes_padded, dtype=jnp.int32)
            return iota, iota
        src_ids, dst_ids = ids
        return (dst_ids, src_ids) if order == "r" else (src_ids, dst_ids)

    def _keep_edges(seed, a, b):
        """Per-edge keep from two id arrays (already in hash vocabulary)."""
        return pair_hash_uniform(seed, a, b) >= drop_p

    def _keep_edges_dir(layout, seed, ids, order):
        """Per-edge keep for a direction's sorted arrays."""
        row_dom, col_dom = _id_doms(layout, ids, order)
        gather = layout.senders_r if order == "r" else layout.receivers_s
        scatter = layout.receivers_r if order == "r" else layout.senders_s
        return _keep_edges(seed,
                           jnp.take(col_dom, gather, axis=0, mode="clip"),
                           jnp.take(row_dom, scatter, axis=0, mode="clip"))

    def _keep_dense(seed, rows, cols):
        """[R, C] keep mask over a (row-id, col-id) grid."""
        u = pair_hash_uniform(seed, rows[:, None], cols[None, :])
        return u >= drop_p

    def _masked_hub_mats(hub, seed, row_dom, col_dom):
        """(cnt, sc_cnt) with dropped pairs zeroed; ids per _id_doms."""
        cnt = hub.cnt * _keep_dense(
            seed, row_dom, jnp.take(col_dom, hub.hub_ids, axis=0,
                                    mode="clip")).astype(hub.cnt.dtype)
        sc_cnt = hub.sc_cnt
        if sc_cnt is not None:
            sc_cnt = sc_cnt * _keep_dense(
                seed, jnp.take(row_dom, hub.sc_ids, axis=0, mode="clip"),
                col_dom).astype(sc_cnt.dtype)
        return cnt, sc_cnt

    def _drop_inv_deg(layout, seed, ids=None):
        """1 / (# kept in-edges per receiver) under the pair-hash drop —
        assembled from the same decomposition the kernels execute."""
        n_pad = layout.num_nodes_padded
        hub = layout.hub_r
        row_dom, col_dom = _id_doms(layout, ids, "r")
        if hub is not None and hub.hub_xe is None:
            cnt, sc_cnt = _masked_hub_mats(hub, seed, row_dom, col_dom)
            deg = jnp.einsum("nh->n", cnt.astype(jnp.float32))
            if sc_cnt is not None:
                sc_deg = jnp.sum(sc_cnt.astype(jnp.float32), axis=1)
                deg = deg.at[hub.sc_ids].add(sc_deg)
            t = hub.tail
            kt = jnp.logical_and(
                t.mask_r, _keep_edges_dir(t, seed, ids, "r"))
            deg = deg + jax.ops.segment_sum(kt.astype(jnp.float32),
                                            t.receivers_r,
                                            num_segments=n_pad)
        else:
            kt = jnp.logical_and(
                layout.mask_r, _keep_edges_dir(layout, seed, ids, "r"))
            deg = jax.ops.segment_sum(kt.astype(jnp.float32),
                                      layout.receivers_r,
                                      num_segments=n_pad)
        return (1.0 / jnp.maximum(deg, 1.0))[:, None]

    def _type_rows(table, xe):
        """Per-edge type feature lookup.  The XLA row gather is row-rate-
        limited (~22 ns/row on v5e) even from tiny tables, so small type
        tables go through a one-hot MXU matmul instead."""
        t_rows = table.shape[0]
        if single_type:
            return table[0][None, :]              # broadcast, no gather
        if t_rows <= 32:
            oh = jax.nn.one_hot(xe, t_rows, dtype=table.dtype)
            return jax.lax.dot_general(
                oh, table, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=table.dtype)
        return jnp.take(table, xe, axis=0)

    def messages(x, table, layout: EdgeLayout, order: str, keep=None):
        senders = layout.senders_s if order == "s" else layout.senders_r
        xe = layout.xe_s if order == "s" else layout.xe_r
        mask = layout.mask_s if order == "s" else layout.mask_r
        x = x.astype(mdtype)
        # sentinel sender == N_pad clamps to the last row (masked below)
        xs = jnp.take(x, senders, axis=0, mode="clip")
        pre = xs + _type_rows(table.astype(mdtype), xe) if with_table else xs
        # zero padded-edge slots: the clipped row may hold garbage (NaN/inf
        # in the worst case), and 0 * NaN = NaN would survive the kernel's
        # zero one-hot column
        pre = jnp.where(mask[:, None], pre, mdtype(0))
        if keep is not None:
            # runtime per-edge mask (original order) — since keep is 0/1
            # and relu(0) == 0, folding it into the PRE-activation commutes
            # with the kernels' relu: keep*relu(m) == relu(keep*m)
            pre = pre * _keep_ord(layout, keep, order)[:, None]
        return pre

    def _keep_ord(layout, keep, order):
        perm = layout.perm_s2o if order == "s" else layout.perm_r2o
        return jnp.take(keep, perm, axis=0).astype(mdtype)

    def _dyn_inv_deg(layout, keep):
        """1 / (# kept in-edges per node), for runtime-masked means."""
        k_r = jnp.take(keep, layout.perm_r2o, axis=0).astype(jnp.float32)
        k_r = jnp.where(layout.mask_r, k_r, 0.0)
        # receivers_r is only BLOCK-grouped (within-block sender sorting,
        # edge_layout block_sort) — not globally sorted
        deg = jax.ops.segment_sum(k_r, layout.receivers_r,
                                  num_segments=layout.num_nodes_padded)
        return (1.0 / jnp.maximum(deg, 1.0))[:, None]

    # With no per-edge term the message is relu(x_j): its derivative mask
    # 1[x_j > 0] depends on the *sender row only*, so the backward needs no
    # per-edge mask recompute — it gates the scatter output per node instead
    # (d relu factoring).  This drops a whole [E, D] gather from the backward.
    # A single-row type table keeps messages per-source (relu(x_j + t0)), so
    # the same factoring (and the hub-dense path) applies with a shifted
    # activation — this covers every single-edge-text dataset (cora/pubmed/
    # arxiv/wikics, reference dataset/*/gen_data.py "Without using edge
    # text" convention).
    factored = relu and (not with_table or single_type)

    def _t0(table):
        return table[0].astype(mdtype)[None, :] if (with_table
                                                    and single_type) else None

    def _inv_deg(layout):
        return (1.0 / jnp.maximum(layout.in_degree, 1.0)
                ).astype(jnp.float32)[:, None]

    def _sane(a):
        # Windowed-gather inputs are read by whole node-id windows, so every
        # row the DMA touches is a row of the computed [N_pad, D] array —
        # padded rows included, which are always finite (they derive from
        # zero-padded inputs through the same layer arithmetic as valid
        # rows).  Non-finite values can only appear if the computation
        # itself diverged, in which case the gather path is equally
        # poisoned; a defensive isfinite mask here would cost a full [N, D]
        # pass per call and silently hide such blowups (round-2 ADVICE).
        return a

    def _dir(lay, order):
        """One direction's kernel-facing arrays: (lrow, block_ptr,
        gather_keys, mask, use_gwin, gwin_lo, gwin_nsub)."""
        if order == "r":
            return (lay.lrow_r, lay.block_ptr_r, lay.senders_r, lay.mask_r,
                    lay.use_gwin_r, lay.gwin_lo_r, lay.gwin_nsub_r)
        return (lay.lrow_s, lay.block_ptr_s, lay.receivers_s, lay.mask_s,
                lay.use_gwin_s, lay.gwin_lo_s, lay.gwin_nsub_s)

    def _stray_then_windowed(src, sp, order, relu_msgs: bool = False,
                             t0=None, scale=None, gate=None,
                             out_dtype=jnp.float32, init0=None):
        """LocSplit execution: stray edges via gather + scatter (raw f32,
        chained from ``init0``), local edges via the windowed in-kernel
        gather with the stray sums as its additive init — scale/gate/cast
        in the final epilogue, zero separate [N, D] combine passes.

        When the layout carries the merged single-kernel metadata
        (LocSplit ``m_*``) and ``loc_merged`` is on, both classes run in
        ONE windowed-kernel launch: stray rows are pre-gathered compactly
        (``x[m_stray_keys]``) and pulled per chunk inside the kernel.
        MEASURED NEGATIVE on v5e, so OFF by default (BASELINE r4 row):
        strays scatter across most chunks, so nearly every chunk pays the
        eb-row side-buffer DMA + the extra one-hot matmul — at 10%% strays
        the merged kernel ran 85.8 ms vs 68.9 for this two-launch chain
        (whose [N, D] bf16 init round trip costs well under 1 ms)."""
        from stemgnn_tpu.ops.scatter_pallas import \
            gathered_scatter_rows_sorted
        st, lo = sp.stray, sp.loc
        if loc_merged and sp.m_keys is not None:
            sbuf = jnp.take(src, sp.m_stray_keys, axis=0, mode="clip")
            return gathered_scatter_rows_sorted(
                sp.m_keys, sp.m_lrow, sp.m_block_ptr, sp.m_win_lo,
                sp.m_win_nsub, _sane(src), table=t0,
                num_nodes_padded=lo.num_nodes_padded, win_w=sp.m_gwin_w,
                node_block=lo.node_block, edge_chunk=lo.edge_chunk,
                relu=relu_msgs, init=init0, scale=scale, gate=gate,
                out_dtype=out_dtype, interpret=interpret,
                stray_src=sbuf, stray_idx=sp.m_sidx, stray_off=sp.m_soff,
                stray_cnt=sp.m_scnt)
        lrow, bp, gather, mask, _, _, _ = _dir(st, order)
        m = jnp.take(src, gather, axis=0, mode="clip")
        if t0 is not None:
            m = m + t0
        m = jnp.where(mask[:, None], m, src.dtype.type(0))
        # the intermediate [N, D] stray partial sums store in bf16 when the
        # final output is bf16 anyway (same measured lever as _hub_split's
        # acc_dt: the f32 store+reload costs 2 extra half-passes)
        stray_out = scatter_rows_sorted(
            m, lrow, bp, num_nodes_padded=st.num_nodes_padded,
            node_block=st.node_block, edge_chunk=st.edge_chunk,
            fast=fast, interpret=interpret, pipeline=pipeline,
            relu=relu_msgs, slots=slots, init=init0,
            out_dtype=(jnp.bfloat16
                       if (out_dtype == jnp.bfloat16 and hub_bf16_acc)
                       else jnp.float32))
        lrow, bp, keys, _, _, wlo, wns = _dir(lo, order)
        return gathered_scatter_rows_sorted(
            keys[None, :], lrow, bp, wlo, wns, _sane(src), table=t0,
            num_nodes_padded=lo.num_nodes_padded, win_w=lo.gwin_w,
            node_block=lo.node_block, edge_chunk=lo.edge_chunk,
            relu=relu_msgs, init=stray_out, scale=scale, gate=gate,
            out_dtype=out_dtype, interpret=interpret)

    def _hub_split(src, hub, order, layout, relu_msgs: bool = False, t0=None,
                   scale=None, gate=None, out_dtype=jnp.float32, seed=None,
                   ids=None):
        """Hub-dense decomposition, FINAL output: the gather-side hub part
        is a dense CNT @ f(src[hub_ids]) MXU matmul (HubDense docstring),
        the optional scatter-side hub part a transposed dense
        sc_cnt @ f(src) matmul scattered onto 2048-odd output rows, and the
        tail runs the Pallas scatter over the tail sub-layout — windowed
        in-kernel gather when the tail layout's break-even gate enabled it
        (locality-ordered graphs), else XLA gather + scatter.  The dense
        partial sums ride the kernel's additive ``init`` and scale/gate/
        cast happen in the kernel epilogue, so no separate [N, D] combine
        pass ever touches HBM.  ``t0`` is the broadcast single-type table
        row added to every message (the factored T=1 case) or None.

        ``seed`` activates the pair-hash edge dropout: the dense count
        matrices are masked in place (see ``_masked_hub_mats``) and tail
        messages carry a per-edge keep — the hub decomposition survives
        the per-step random mask.  Splits/windowed tails fall back to the
        plain gather tail under ``seed`` (per-edge keeps cannot ride the
        in-kernel window DMA reconstruction)."""
        t = hub.tail
        m_cnt, m_sc = (hub.cnt, hub.sc_cnt) if seed is None else \
            _masked_hub_mats(hub, seed, *_id_doms(layout, ids, order))

        # Gather-hub partial-sum dtype: when the aggregate output is bf16
        # anyway, emit the [N, D] hub matmul in bf16 — the MXU still
        # accumulates f32 internally and only the output store is rounded,
        # but the f32->bf16 store HALVES the block's wall time (measured
        # v5e, scripts/int8_probe.py: 2.21 -> 0.98 ms at bench shapes; the
        # f32 [N, D] write keeps the MXU at 45% peak).  int8 was the
        # measured negative: XLA int8 dot gains <= 9% and the quantize
        # pass costs ~1.2 ms (BASELINE.md r4 row).
        acc_dt = (jnp.bfloat16 if (out_dtype == jnp.bfloat16 and hub_bf16_acc)
                  else jnp.float32)

        def mm(a, b, pt=None):
            return jax.lax.dot_general(
                a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=pt or acc_dt)

        if m_sc is not None:
            # one f(x) [N, D] pass feeds BOTH dense blocks
            f_all = src if t0 is None else src + t0
            if relu_msgs:
                f_all = jax.nn.relu(f_all)
            hub_out = mm(m_cnt, jnp.take(f_all, hub.hub_ids, axis=0))
            # the sc block's output [H2, D] is small — keep its store f32
            # and round once at the add
            hub_out = hub_out.at[hub.sc_ids].add(
                mm(m_sc, f_all, pt=jnp.float32).astype(acc_dt))
        else:
            xh = jnp.take(src, hub.hub_ids, axis=0)
            if t0 is not None:
                xh = xh + t0
            if relu_msgs:
                xh = jax.nn.relu(xh)
            hub_out = mm(m_cnt, xh)
        sp = t.split_r if order == "r" else t.split_s
        if sp is not None and seed is None:
            # tail's local/stray split chained onto the hub partial sums
            return _stray_then_windowed(src, sp, order, relu_msgs, t0,
                                        scale, gate, out_dtype,
                                        init0=hub_out)
        lrow, block_ptr, gather, mask, use_g, wlo, wns = _dir(t, order)
        if use_g and t.gwin_w and seed is None:
            from stemgnn_tpu.ops.scatter_pallas import \
                gathered_scatter_rows_sorted
            return gathered_scatter_rows_sorted(
                gather[None, :], lrow, block_ptr, wlo, wns, _sane(src),
                table=t0,
                num_nodes_padded=t.num_nodes_padded,
                win_w=t.gwin_w, node_block=t.node_block,
                edge_chunk=t.edge_chunk, relu=relu_msgs,
                init=hub_out, scale=scale, gate=gate, out_dtype=out_dtype,
                interpret=interpret)
        m = jnp.take(src, gather, axis=0, mode="clip")
        if t0 is not None:
            m = m + t0
        m = jnp.where(mask[:, None], m, src.dtype.type(0))
        if seed is not None:
            # keep * relu(m) == relu(keep * m): fold the tail keep into the
            # pre-activation so the kernel's relu/gate epilogues still apply
            m = m * _keep_edges_dir(t, seed, ids,
                                    order).astype(m.dtype)[:, None]
        return scatter_rows_sorted(
            m, lrow, block_ptr, num_nodes_padded=layout.num_nodes_padded,
            node_block=layout.node_block, edge_chunk=layout.edge_chunk,
            fast=fast, interpret=interpret, pipeline=pipeline,
            relu=relu_msgs, slots=slots,
            init=hub_out, scale=scale, gate=gate, out_dtype=out_dtype)

    def fwd_impl(x, table, layout: EdgeLayout, keep=None, seed=None,
                 ids=None, *, want_mask: bool = False):
        n_pad = layout.num_nodes_padded
        assert seed is None or factored, \
            "drop_hash needs the factored (relu, T<=1) path"
        inv_deg = (lambda: _dyn_inv_deg(layout, keep) if keep is not None
                   else _inv_deg(layout))
        if factored:
            out_dt = (jnp.bfloat16 if (bf16_out or x.dtype == jnp.bfloat16)
                      else jnp.float32)
            if (layout.hub_r is not None and mdtype == jnp.bfloat16
                    and keep is None and seed is not None):
                # pair-hash drop: hubs masked densely, tail keep per edge
                return _hub_split(
                    x.astype(mdtype), layout.hub_r, "r", layout,
                    relu_msgs=True, t0=_t0(table),
                    scale=(_drop_inv_deg(layout, seed, ids)
                           if reduce == "mean" else None),
                    out_dtype=out_dt, seed=seed, ids=ids)
            if seed is not None:
                # no hub block: per-edge keep in receiver order, dynamic
                # kept-degree mean
                pre = messages(x, table, layout, "r")
                pre = pre * _keep_edges_dir(
                    layout, seed, ids, "r").astype(mdtype)[:, None]
                sums = scatter_rows_sorted(
                    pre, layout.lrow_r, layout.block_ptr_r,
                    num_nodes_padded=n_pad, node_block=layout.node_block,
                    edge_chunk=layout.edge_chunk, fast=fast,
                    interpret=interpret, pipeline=pipeline, relu=True,
                    slots=slots,
                    scale=(_drop_inv_deg(layout, seed, ids)
                           if reduce == "mean" else None),
                    out_dtype=out_dt)
                return sums
            if (layout.hub_r is not None and mdtype == jnp.bfloat16
                    and keep is None):
                return _hub_split(
                    x.astype(mdtype), layout.hub_r, "r", layout,
                    relu_msgs=True, t0=_t0(table),
                    scale=_inv_deg(layout) if reduce == "mean" else None,
                    out_dtype=out_dt)
            if (layout.split_r is not None and mdtype == jnp.bfloat16
                    and keep is None):
                return _stray_then_windowed(
                    x.astype(mdtype), layout.split_r, "r", relu_msgs=True,
                    t0=_t0(table),
                    scale=_inv_deg(layout) if reduce == "mean" else None,
                    out_dtype=out_dt)
            if (layout.use_gwin_r and layout.gwin_w
                    and mdtype == jnp.bfloat16 and keep is None):
                # fully gather-free forward: messages rebuilt in-kernel from
                # sequential x-window DMAs (locality-gated, edge_layout gwin)
                from stemgnn_tpu.ops.scatter_pallas import \
                    gathered_scatter_rows_sorted
                return gathered_scatter_rows_sorted(
                    layout.senders_r[None, :], layout.lrow_r,
                    layout.block_ptr_r, layout.gwin_lo_r, layout.gwin_nsub_r,
                    _sane(x.astype(mdtype)), table=_t0(table),
                    num_nodes_padded=n_pad, win_w=layout.gwin_w,
                    node_block=layout.node_block,
                    edge_chunk=layout.edge_chunk, relu=True,
                    scale=_inv_deg(layout) if reduce == "mean" else None,
                    out_dtype=out_dt, interpret=interpret)
            # gather raw x; relu (and, for the static mean, 1/deg) run
            # inside the kernel; runtime-masked means scale outside
            m = messages(x, table, layout, "r", keep)
            sums = scatter_rows_sorted(
                m, layout.lrow_r, layout.block_ptr_r,
                num_nodes_padded=n_pad, node_block=layout.node_block,
                edge_chunk=layout.edge_chunk, fast=fast, interpret=interpret,
                pipeline=pipeline, relu=True, slots=slots,
                scale=(_inv_deg(layout)
                       if reduce == "mean" and keep is None else None),
                out_dtype=jnp.float32
                if (reduce == "mean" and keep is not None) else out_dt)
            if reduce == "mean" and keep is not None:
                sums = (sums * _dyn_inv_deg(layout, keep)).astype(out_dt)
            return sums
        if (layout.hub_r is not None and layout.hub_r.hub_xe is not None
                and with_table and mdtype == jnp.bfloat16 and keep is None
                and not want_mask):
            # TYPED virtual hubs (edge_layout HubDense.hub_xe): hub
            # messages relu(x[node] + T[type]) per (node, type) pair as one
            # dense CNT matmul; the typed tail runs the standard paths with
            # the hub sums fused as init.  Forward only — the backward's
            # per-edge relu mask goes through the masked-kernel path.
            hub = layout.hub_r
            tb = table.astype(mdtype)
            xh = (jnp.take(x.astype(mdtype), hub.hub_ids, axis=0)
                  + jnp.take(tb, hub.hub_xe, axis=0))
            if relu:
                xh = jax.nn.relu(xh)
            t = hub.tail
            scale = inv_deg() if reduce == "mean" else None
            out_dt2 = (jnp.bfloat16 if x.dtype == jnp.bfloat16
                       else jnp.float32)
            # bf16 store of the [N, D] hub partials when the output is bf16
            # anyway (see _hub_split's acc_dt note)
            hub_out = jax.lax.dot_general(
                hub.cnt, xh, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=(jnp.bfloat16
                                        if (out_dt2 == jnp.bfloat16
                                            and hub_bf16_acc)
                                        else jnp.float32))
            if t.use_gwin_r and t.gwin_w:
                from stemgnn_tpu.ops.scatter_pallas import \
                    gathered_scatter_rows_sorted
                return gathered_scatter_rows_sorted(
                    t.senders_r[None, :], t.lrow_r, t.block_ptr_r,
                    t.gwin_lo_r, t.gwin_nsub_r, _sane(x.astype(mdtype)),
                    table=tb, xe=t.xe_r[None, :],
                    num_nodes_padded=n_pad, win_w=t.gwin_w,
                    node_block=t.node_block, edge_chunk=t.edge_chunk,
                    relu=relu, init=hub_out, scale=scale,
                    out_dtype=out_dt2, interpret=interpret)
            xs = jnp.take(x.astype(mdtype), t.senders_r, axis=0,
                          mode="clip")
            pre = xs + _type_rows(tb, t.xe_r)
            pre = jnp.where(t.mask_r[:, None], pre, mdtype(0))
            return scatter_rows_sorted(
                pre, t.lrow_r, t.block_ptr_r, num_nodes_padded=n_pad,
                node_block=t.node_block, edge_chunk=t.edge_chunk,
                fast=fast, interpret=interpret, pipeline=pipeline,
                relu=relu, slots=slots, init=hub_out, scale=scale,
                out_dtype=out_dt2)
        if (layout.use_gwin_r and layout.gwin_w and mdtype == jnp.bfloat16
                and keep is None and not want_mask
                and (not with_table or table.shape[0] <= 32)):
            # gather-free general forward: per-edge type row added in-kernel
            # via a one-hot table matmul (small-T), x rows via window DMAs
            from stemgnn_tpu.ops.scatter_pallas import \
                gathered_scatter_rows_sorted
            sums = gathered_scatter_rows_sorted(
                layout.senders_r[None, :], layout.lrow_r, layout.block_ptr_r,
                layout.gwin_lo_r, layout.gwin_nsub_r, _sane(x.astype(mdtype)),
                table=table.astype(mdtype) if with_table else None,
                xe=layout.xe_r[None, :] if with_table else None,
                num_nodes_padded=n_pad, win_w=layout.gwin_w,
                node_block=layout.node_block, edge_chunk=layout.edge_chunk,
                relu=relu, interpret=interpret)
            if reduce == "mean":
                sums = sums * inv_deg()
            return sums.astype(x.dtype) if x.dtype == jnp.bfloat16 else sums
        pre = messages(x, table, layout, "r", keep)
        m = jax.nn.relu(pre) if relu else pre
        sums = scatter_rows_sorted(
            m, layout.lrow_r, layout.block_ptr_r,
            num_nodes_padded=n_pad, node_block=layout.node_block,
            edge_chunk=layout.edge_chunk, fast=fast, interpret=interpret,
            pipeline=pipeline)
        if reduce == "mean":
            sums = sums * inv_deg()
        sums = sums.astype(x.dtype) if x.dtype == jnp.bfloat16 else sums
        if want_mask:
            # relu(pre) > 0  <=>  pre > 0: pack the activation mask to bits
            # ([E, D/8] uint8, receiver order) — 1/16 the bytes of the bf16
            # re-gather the backward would otherwise do.
            return sums, jnp.packbits(pre > 0, axis=1, bitorder="little")
        return sums

    @jax.custom_vjp
    def f(x, table, layout, keep, seed, ids):
        return fwd_impl(x, table, layout, keep, seed, ids)

    def f_fwd(x, table, layout, keep, seed, ids):
        if relu and relu_residual and not factored:
            out, packed = fwd_impl(x, table, layout, keep, seed, ids,
                                   want_mask=True)
            return out, (packed, table, layout, keep, seed, ids)
        return fwd_impl(x, table, layout, keep, seed, ids), \
            (x, table, layout, keep, seed, ids)

    def f_bwd(res, g):
        first, table, layout, keep, seed, ids = res
        n_pad = layout.num_nodes_padded
        if factored:
            # one fused [N, D] pass: mean scaling + bf16 narrowing of g
            gp = g.astype(jnp.float32)
            if reduce == "mean":
                gp = gp * (_drop_inv_deg(layout, seed, ids)
                           if seed is not None
                           else _dyn_inv_deg(layout, keep)
                           if keep is not None else _inv_deg(layout))
            gp = gp.astype(mdtype)
            # factored relu gate: 1[x_j (+ t0) > 0], per source row (the
            # single-type shift keeps the forward's bf16 pre-activation
            # arithmetic so the mask matches bit-exactly)
            t0 = _t0(table)
            gate = first if t0 is None else first.astype(mdtype) + t0
            if (layout.hub_s is not None and mdtype == jnp.bfloat16
                    and keep is None and seed is not None):
                dx = _hub_split(gp, layout.hub_s, "s", layout, gate=gate,
                                out_dtype=first.dtype, seed=seed, ids=ids)
                return (dx, _zero_cot(table), _zero_cot(layout),
                        _zero_cot(keep), _zero_cot(seed), _zero_cot(ids))
            if seed is not None:
                # no hub block: per-edge keep in sender order
                dm = jnp.take(gp, layout.receivers_s, axis=0, mode="clip")
                dm = jnp.where(layout.mask_s[:, None], dm, mdtype(0))
                dm = dm * _keep_edges_dir(
                    layout, seed, ids, "s").astype(mdtype)[:, None]
                dx = scatter_rows_sorted(
                    dm, layout.lrow_s, layout.block_ptr_s,
                    num_nodes_padded=n_pad, node_block=layout.node_block,
                    edge_chunk=layout.edge_chunk, fast=fast,
                    interpret=interpret, pipeline=pipeline, gate=gate,
                    out_dtype=first.dtype, slots=slots)
                return (dx, _zero_cot(table), _zero_cot(layout),
                        _zero_cot(keep), _zero_cot(seed), _zero_cot(ids))
            if (layout.hub_s is not None and mdtype == jnp.bfloat16
                    and keep is None):
                # relu gate fused into the tail kernel's epilogue
                dx = _hub_split(gp, layout.hub_s, "s", layout, gate=gate,
                                out_dtype=first.dtype)
                return (dx, _zero_cot(table), _zero_cot(layout),
                        _zero_cot(keep), _zero_cot(seed),
                        _zero_cot(ids))
            if (layout.split_s is not None and mdtype == jnp.bfloat16
                    and keep is None):
                dx = _stray_then_windowed(gp, layout.split_s, "s",
                                          gate=gate, out_dtype=first.dtype)
                return (dx, _zero_cot(table), _zero_cot(layout),
                        _zero_cot(keep), _zero_cot(seed),
                        _zero_cot(ids))
            if (layout.use_gwin_s and layout.gwin_w
                    and mdtype == jnp.bfloat16 and keep is None):
                # gather-free factored backward: upstream grads rebuilt
                # in-kernel from sequential gp-window DMAs; relu gate fused
                # into the output epilogue
                from stemgnn_tpu.ops.scatter_pallas import \
                    gathered_scatter_rows_sorted
                dx = gathered_scatter_rows_sorted(
                    layout.receivers_s[None, :], layout.lrow_s,
                    layout.block_ptr_s, layout.gwin_lo_s, layout.gwin_nsub_s,
                    _sane(gp), num_nodes_padded=n_pad, win_w=layout.gwin_w,
                    node_block=layout.node_block,
                    edge_chunk=layout.edge_chunk, gate=gate,
                    out_dtype=first.dtype, interpret=interpret)
                return (dx, _zero_cot(table), _zero_cot(layout),
                        _zero_cot(keep), _zero_cot(seed),
                        _zero_cot(ids))
            dm = jnp.take(gp, layout.receivers_s, axis=0, mode="clip")
            dm = jnp.where(layout.mask_s[:, None], dm, mdtype(0))
            if keep is not None:
                dm = dm * _keep_ord(layout, keep, "s")[:, None]
            dx = scatter_rows_sorted(
                dm, layout.lrow_s, layout.block_ptr_s,
                num_nodes_padded=n_pad, node_block=layout.node_block,
                edge_chunk=layout.edge_chunk, fast=fast, interpret=interpret,
                pipeline=pipeline, gate=gate, out_dtype=first.dtype,
                slots=slots)
            return (dx, _zero_cot(table), _zero_cot(layout),
                    _zero_cot(keep), _zero_cot(seed),
                    _zero_cot(ids))
        if reduce == "mean":
            g = g * (_dyn_inv_deg(layout, keep) if keep is not None
                     else 1.0 / jnp.maximum(layout.in_degree, 1.0)[:, None])
        # per-edge upstream grad in sender-sorted order
        dm = jnp.take(g.astype(mdtype), layout.receivers_s, axis=0,
                      mode="clip")
        dm = jnp.where(layout.mask_s[:, None], dm, mdtype(0))
        if keep is not None:
            dm = dm * _keep_ord(layout, keep, "s")[:, None]
        if relu:
            if relu_residual:
                packed_s = jnp.take(first, layout.perm_s2r, axis=0,
                                    mode="clip")
                bits = jnp.unpackbits(packed_s, axis=1, count=dm.shape[1],
                                      bitorder="little")
                dm = jnp.where(bits.astype(bool), dm, mdtype(0))
            elif fast and layout.win_w and layout.win_lo_s is not None:
                # recompute the relu mask INSIDE the scatter kernel from
                # sequential x-window reads (senders sorted -> narrow
                # windows): drops the [E, D] pre-activation re-gather
                from stemgnn_tpu.ops.scatter_pallas import \
                    masked_scatter_rows_sorted
                dx = masked_scatter_rows_sorted(
                    dm, layout.lrow_s, layout.senders_s[None, :],
                    layout.block_ptr_s, layout.win_lo_s, layout.win_nsub_s,
                    first.astype(mdtype),
                    table=table.astype(mdtype) if with_table else None,
                    xe=layout.xe_s[None, :] if with_table else None,
                    num_nodes_padded=n_pad, win_w=layout.win_w,
                    node_block=layout.node_block,
                    edge_chunk=layout.edge_chunk, out_dtype=first.dtype,
                    interpret=interpret)
                return (dx, _zero_cot(table), _zero_cot(layout),
                        _zero_cot(keep), _zero_cot(seed),
                        _zero_cot(ids))
            else:
                pre_s = messages(first, table, layout, "s")
                dm = jnp.where(pre_s > 0, dm, mdtype(0))
        dx = scatter_rows_sorted(
            dm, layout.lrow_s, layout.block_ptr_s,
            num_nodes_padded=n_pad, node_block=layout.node_block,
            edge_chunk=layout.edge_chunk, fast=fast, interpret=interpret,
            pipeline=pipeline)
        dtable = _zero_cot(table)
        return (dx, dtable, _zero_cot(layout), _zero_cot(keep),
                _zero_cot(seed), _zero_cot(ids))

    f.defvjp(f_fwd, f_bwd)
    return f


def can_bake_drop(layout: EdgeLayout) -> bool:
    """Static check (host-decidable, no tracing): can drop_mask_layout
    bake runtime keeps into this layout?  False when any execution path —
    top level OR a hub tail — routes through a LocSplit (the split
    sub-layouts' windowed chain never reads the edge masks).  Top-level /
    tail windowed-gather flags are handled by the bake itself (it forces
    masked sub-layouts onto the gather path), so only splits refuse."""
    if layout.split_r is not None or layout.split_s is not None:
        return False
    for h in (layout.hub_r, layout.hub_s):
        if h is not None and (h.tail.split_r is not None
                              or h.tail.split_s is not None):
            return False
    return True


def drop_mask_layout(layout: EdgeLayout, seed, p: float, ids=None):
    """Bake a pair-hash edge dropout INTO a layout — the hoisted form of
    ``drop_hash``: callers with several aggregations over the same
    dropped view (the encoder's layers) compute the dense hub masks,
    tail keeps, and kept in-degrees ONCE per step and run the plain
    static path, instead of recomputing them inside every fused call
    (measured ~84 ms/step for the 2-layer halo pretrain at 169K/2.37M vs
    ~near-free hoisted; BASELINE r5).

    ``ids`` = optional (src_ids, dst_ids) global-id tables (halo
    per-shard layouts).  Returns a NEW layout pytree (traced arrays are
    fine — layouts are jit arguments everywhere).  Requires the factored
    configuration; refuses layouts whose windowed-gather or loc-split
    paths are enabled (those kernels rebuild messages from window DMAs
    and never read the edge masks)."""
    from stemgnn_tpu.ops.pairhash import pair_hash_uniform

    if not can_bake_drop(layout):
        raise ValueError("drop_mask_layout: LocSplit layouts (including "
                         "hub tails') cannot bake runtime keeps — their "
                         "windowed chain never reads the edge masks (use "
                         "drop_hash instead)")
    seed = jnp.asarray(seed, jnp.int32)
    if ids is None:
        src_ids = dst_ids = jnp.int32(0)       # affine identity
    else:
        src_ids = jnp.asarray(ids[0], jnp.int32)
        dst_ids = jnp.asarray(ids[1], jnp.int32)

    def _map(dom, idx):
        """Local index -> global id.  A SCALAR dom is an affine offset
        (id = dom + idx) — the halo loc layouts' contiguous ownership —
        which skips the per-edge table gather entirely (measured: the
        table-lookup form's gathers were most of the halo drop cost)."""
        if dom.ndim == 0:
            return dom + idx.astype(jnp.int32)
        return jnp.take(dom, idx, axis=0, mode="clip")

    def _full(dom, n):
        if dom.ndim == 0:
            return dom + jnp.arange(n, dtype=jnp.int32)
        return dom

    def keep_edges(gather_idx, scatter_idx, order):
        a = src_ids if order == "r" else dst_ids
        b = dst_ids if order == "r" else src_ids
        u = pair_hash_uniform(seed, _map(a, gather_idx),
                              _map(b, scatter_idx))
        return u >= p

    def mask_plain(lay: EdgeLayout):
        m_r = jnp.logical_and(lay.mask_r,
                              keep_edges(lay.senders_r, lay.receivers_r,
                                         "r"))
        m_s = jnp.logical_and(lay.mask_s,
                              keep_edges(lay.receivers_s, lay.senders_s,
                                         "s"))
        deg = jax.ops.segment_sum(m_r.astype(jnp.float32), lay.receivers_r,
                                  num_segments=lay.num_nodes_padded)
        # the windowed-gather kernels rebuild messages from window DMAs
        # and never read the edge masks — a baked keep would be silently
        # ignored (caught by the sc-tail grad parity test): force the
        # masked sub-layout onto the gather path
        return lay.replace(mask_r=m_r, mask_s=m_s, in_degree=deg,
                           use_gwin_r=False, use_gwin_s=False)

    def mask_hub(hub, order):
        if hub is None:
            return None
        row_dom = dst_ids if order == "r" else src_ids
        col_dom = src_ids if order == "r" else dst_ids
        rows = _full(row_dom, hub.cnt.shape[0])
        k = pair_hash_uniform(
            seed, rows[:, None], _map(col_dom, hub.hub_ids)[None, :]) >= p
        cnt = hub.cnt * k.astype(hub.cnt.dtype)
        sc_cnt = hub.sc_cnt
        if sc_cnt is not None:
            cols = _full(col_dom, sc_cnt.shape[1])
            k2 = pair_hash_uniform(
                seed, _map(row_dom, hub.sc_ids)[:, None],
                cols[None, :]) >= p
            sc_cnt = sc_cnt * k2.astype(sc_cnt.dtype)
        return hub.replace(cnt=cnt, sc_cnt=sc_cnt,
                           tail=mask_plain(hub.tail))

    new = mask_plain(layout)
    hub_r = mask_hub(layout.hub_r, "r")
    hub_s = mask_hub(layout.hub_s, "s")
    # kept in-degree from the decomposition the kernels execute (the
    # full-array segment sum above already equals it; the hub tails'
    # degrees are per-sub-layout and consistent by construction)
    return new.replace(hub_r=hub_r, hub_s=hub_s)


def fused_sage_aggregate(x, layout: EdgeLayout, edge_table=None, *,
                         reduce: str = "mean", relu: bool = True,
                         fast: bool = False, interpret: bool = False,
                         bf16_messages: bool = False,
                         relu_residual: bool = False,
                         pipeline: str = "rolling", bf16_out: bool = False,
                         slots: int = 2, edge_keep=None,
                         hub_bf16_acc: bool = True,
                         loc_merged: bool = False,
                         drop_hash=None, drop_ids=None):
    """TPU-fused aggregation.  ``x`` [N_pad, D] with N_pad == layout's padded
    node count; ``edge_table`` [T, D] per-edge-type features or None.

    ``bf16_messages`` computes messages (and the backward edge grads) in
    bfloat16, halving gather + scatter HBM traffic; accumulation stays f32.

    CONTRACT: padded node rows of ``x`` must be FINITE.  The windowed
    kernels DMA whole node-id windows, so a NaN/Inf sitting in a padded row
    would poison window-mates through the one-hot matmul (0 * NaN = NaN)
    where the gather path would not read it at all.  Every producer in this
    repo satisfies this (padded rows derive from zero-padded inputs through
    the same finite layer arithmetic); a defensive isfinite pass was
    measured to cost a full [N, D] sweep per call and was removed (r2
    ADVICE) — if you feed externally-constructed activations, sanitize
    padded rows yourself.

    ``hub_bf16_acc`` (default on) stores the [N, D] gather-hub dense
    partial sums in bf16 when the aggregate's own output is bf16 — the MXU
    accumulates f32 internally either way, but the halved store doubles
    that block's throughput (measured v5e, scripts/int8_probe.py); with an
    f32 output the hub partials stay f32 regardless.

    ``relu_residual`` stores the forward relu mask packed to bits and permutes
    it into sender order in the backward ([E, D/8] bytes moved) instead of
    re-gathering x to recompute it ([E, D] bf16).  Measured OFF by default:
    on the tunneled v5e the packbits/unpackbits + byte-row permutation costs
    more than the re-gather it saves (95 -> 99 ms fwd+bwd on the arxiv-class
    bench); revisit on hardware with faster bit ops / real HBM.
    Requires ``layout.perm_s2r`` (present on freshly built layouts).
    """
    assert x.shape[0] == layout.num_nodes_padded, (
        x.shape, layout.num_nodes_padded)
    with_table = edge_table is not None
    # one table row == one edge type everywhere: messages stay per-source
    # (relu(x_j + t0)) and the factored/hub machinery applies
    single_type = with_table and edge_table.shape[0] == 1
    relu_residual = relu_residual and relu and layout.perm_s2r is not None
    drop_seed, drop_p = (None, 0.0) if drop_hash is None else drop_hash
    if drop_hash is not None:
        # ``drop_hash`` = (seed, p): per-step pair-hash edge dropout — the
        # hub-preserving form of a runtime edge mask (see _make's drop
        # helpers).  Requires the factored path; mutually exclusive with a
        # materialized ``edge_keep``.
        assert edge_keep is None, "edge_keep and drop_hash are exclusive"
        assert relu and (not with_table or single_type), \
            "drop_hash requires the factored (relu, T<=1) configuration"
        drop_seed = jnp.asarray(drop_seed, jnp.int32)
    fn = _make(reduce, relu, with_table, fast or bf16_messages, interpret,
               bf16_messages, relu_residual, pipeline, bf16_out, slots,
               single_type, hub_bf16_acc, loc_merged, float(drop_p))
    if not with_table:
        edge_table = jnp.zeros((1, x.shape[1]), x.dtype)
    if drop_ids is not None:
        # (src_ids, dst_ids): local row index -> global node id for the
        # pair hash (halo per-shard layouts; see _make's drop helpers)
        assert drop_hash is not None, "drop_ids needs drop_hash"
        drop_ids = (jnp.asarray(drop_ids[0], jnp.int32),
                    jnp.asarray(drop_ids[1], jnp.int32))
    return fn(x, edge_table, layout, edge_keep, drop_seed, drop_ids)
