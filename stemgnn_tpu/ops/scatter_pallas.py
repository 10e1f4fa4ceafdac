"""Pallas TPU kernel: segment scatter-sum over receiver-sorted edges.

Replaces XLA's scatter-add HLO (the bottleneck of ``segment_sum`` on TPU)
with a blocked one-hot MXU matmul:

  grid over output node blocks (NB rows).  Each block's incoming edges form
  a contiguous range [start, end) of the receiver-sorted edge list
  (``block_ptr``).  The kernel walks the EB-aligned global chunks overlapping
  that range, streams chunks of the message matrix M [E, D] via
  double-buffered DMA, builds the transposed one-hot scatter matrix
  P [NB, EB] (P[n, e] = (local_row[e] == n and e in [start, end))) *in
  registers* from a tiny per-edge ``local_row = receiver mod NB`` int32
  stream (4 B/edge instead of NB B/edge for a materialized P), and
  accumulates

      out[block] += P_chunk @ M_chunk        — a plain (NB, EB)x(EB, D) MXU
                                               matmul, no transposes

  Because node blocks are NB rows, ``receiver mod NB`` IS the local row
  within the owning block; the [start, end) column mask kills aliased edges
  of neighboring blocks that share a boundary chunk.

Pipelines (``pipeline=``):
  * ``"rolling"`` (default) — fetch-once: chunk fetch/wait pointers live in
    SMEM and persist across the (sequential) grid, so a boundary chunk
    shared by consecutive node blocks is DMA'd once and re-used from VMEM.
    Total M traffic is exactly E_pad*D*itemsize per call — the lower bound.
  * ``"block"`` — stateless per-block walk (boundary chunks re-fetched by
    each adjacent block).  Kept as the conservative fallback; also the mode
    used under ``interpret=True`` vmap batching if the sequential-grid
    assumption ever breaks.

Precision modes:
  * fast=True  — single bf16 pass (M rounded to bf16),
  * fast=False — hi/lo bf16 split of M (2 MXU passes, ~2^-16 relative error,
    ~f32-quality for this op since P is exactly representable).

This is the SpMM core of the framework (reference semantics:
torch_geometric ``spmm``/torch_scatter behind MySAGEConv,
STEM-GNN/model/encoder.py:82,99-102).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NODE_BLOCK = 128


def _chunk_matmul(m_buf, l_buf, slot, *, chunk_id, start, end, eb, nb, fast,
                  relu, acc_ref):
    """Accumulate P_chunk @ M_chunk into the f32 accumulator for one
    resident chunk (the epilogue writes/casts it to the output block)."""
    g = chunk_id * eb + jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0)
    lr = l_buf[slot]                       # [1, eb] int32 (sentinel == nb)
    keep = (lr == rows) & (g >= start) & (g < end)
    p = keep.astype(jnp.bfloat16)
    m = m_buf[slot]
    if relu:  # fused message activation (VMEM-resident, no extra HBM pass)
        m = jnp.maximum(m, jnp.zeros((), m.dtype))

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if fast:
        acc = mm(p, m.astype(jnp.bfloat16))
    else:
        hi = m.astype(jnp.bfloat16)
        lo = (m - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = mm(p, hi) + mm(p, lo)
    acc_ref[:] += acc


def _epilogue(acc_ref, out_ref, scale_ref, gate_ref, init_ref=None):
    """Per-block output epilogue: f32 accumulator (+ additive init base) ->
    scaled/gated output.  ``init`` fuses the hub-dense partial sums into the
    kernel (one read here instead of a separate [N, D] add pass)."""
    out = acc_ref[...]
    if init_ref is not None:
        out = out + init_ref[...].astype(jnp.float32)
    if scale_ref is not None:
        out = out * scale_ref[...]
    if gate_ref is not None:
        # f32 compare: Mosaic on v5e rejects sub-f32 vector comparisons
        gate = gate_ref[...].astype(jnp.float32)
        out = jnp.where(gate > 0, out, jnp.zeros((), out.dtype))
    out_ref[:] = out.astype(out_ref.dtype)


def _block_kernel(block_ptr_ref,              # scalar prefetch [num_blocks+1]
                  *refs,                      # m, lrow [, init][, scale]
                                              # [, gate], out, scratch
                  eb: int, nb: int, fast: bool, relu: bool,
                  has_scale: bool, has_gate: bool, has_init: bool):
    """Stateless per-block walk (re-fetches shared boundary chunks)."""
    m_hbm, l_hbm = refs[0], refs[1]           # [E_pad, D] / [1, E_pad] ANY
    k = 2
    init_ref = refs[k] if has_init else None
    k += has_init
    scale_ref = refs[k] if has_scale else None
    k += has_scale
    gate_ref = refs[k] if has_gate else None
    k += has_gate
    out_ref = refs[k]                         # [NB, D] VMEM block
    m_buf, l_buf, sem_m, sem_l, acc_ref = refs[k + 1:k + 6]
    i = pl.program_id(0)
    start = block_ptr_ref[i]
    end = block_ptr_ref[i + 1]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    c0 = start // eb
    c1 = (end + eb - 1) // eb          # exclusive
    num_chunks = c1 - c0

    def get_dma(slot, c):
        off = c * eb
        cm = pltpu.make_async_copy(m_hbm.at[pl.ds(off, eb), :],
                                   m_buf.at[slot], sem_m.at[slot])
        cl = pltpu.make_async_copy(l_hbm.at[:, pl.ds(off, eb)],
                                   l_buf.at[slot], sem_l.at[slot])
        return cm, cl

    @pl.when(num_chunks > 0)
    def _():
        cm, cl = get_dma(0, c0)
        cm.start()
        cl.start()

        def body(k, _):
            slot = jax.lax.rem(k, 2)
            nxt = jax.lax.rem(k + 1, 2)

            @pl.when(k + 1 < num_chunks)
            def _():
                cm2, cl2 = get_dma(nxt, c0 + k + 1)
                cm2.start()
                cl2.start()

            cm1, cl1 = get_dma(slot, c0 + k)
            cm1.wait()
            cl1.wait()
            _chunk_matmul(m_buf, l_buf, slot, chunk_id=c0 + k, start=start,
                          end=end, eb=eb, nb=nb, fast=fast, relu=relu,
                          acc_ref=acc_ref)
            return 0

        jax.lax.fori_loop(0, num_chunks, body, 0)
    _epilogue(acc_ref, out_ref, scale_ref, gate_ref, init_ref)


def _rolling_kernel(block_ptr_ref,            # scalar prefetch [num_blocks+1]
                    *refs,                    # m, lrow [, init][, scale]
                                              # [, gate], out, scratch
                    eb: int, nb: int, fast: bool, relu: bool,
                    has_scale: bool, has_gate: bool, has_init: bool,
                    num_blocks: int, slots: int):
    """Fetch-once walk: st = SMEM [F, W] persists across the sequential grid.

    F = next global chunk to fetch, W = last chunk waited on.  Invariants
    (edges receiver-sorted, blocks visited in order, chunks consumed in
    globally non-decreasing order):
      * chunk k lives in VMEM slot k % slots from its fetch until slot reuse
        by chunk k + slots, which is only fetched after k's final consumer
        iteration has passed;
      * every fetched chunk contains >=1 valid edge (fetch guards on the
        valid-chunk count), so it is consumed — and its DMA waited — by at
        least one block before the kernel ends.
    """
    m_hbm, l_hbm = refs[0], refs[1]           # [E_pad, D] / [1, E_pad] ANY
    k_ref = 2
    init_ref = refs[k_ref] if has_init else None
    k_ref += has_init
    scale_ref = refs[k_ref] if has_scale else None
    k_ref += has_scale
    gate_ref = refs[k_ref] if has_gate else None
    k_ref += has_gate
    out_ref = refs[k_ref]                     # [NB, D] VMEM block
    m_buf, l_buf, sem_m, sem_l, st, acc_ref = refs[k_ref + 1:k_ref + 7]
    i = pl.program_id(0)
    start = block_ptr_ref[i]
    end = block_ptr_ref[i + 1]
    # number of chunks holding valid (non-sentinel) edges; sentinel-padded
    # slots sort last so valid edges are the prefix [0, block_ptr[-1]).
    c_used = (block_ptr_ref[num_blocks] + eb - 1) // eb
    acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i == 0)
    def _():
        st[0] = 0          # F: next chunk to fetch
        st[1] = -1         # W: last chunk waited

    c0 = start // eb
    # exclusive; empty blocks (start == end, e.g. trailing node padding)
    # walk zero chunks even when start is not chunk-aligned
    c1 = jnp.where(end > start, (end + eb - 1) // eb, c0)

    def start_fetch(c):
        slot = jax.lax.rem(c, slots)
        off = c * eb
        pltpu.make_async_copy(m_hbm.at[pl.ds(off, eb), :],
                              m_buf.at[slot], sem_m.at[slot]).start()
        pltpu.make_async_copy(l_hbm.at[:, pl.ds(off, eb)],
                              l_buf.at[slot], sem_l.at[slot]).start()

    def body(k, carry):
        f, w = carry
        # fetch k itself if this is its first consumer
        @pl.when(k >= f)
        def _():
            start_fetch(k)
        f = jnp.maximum(f, k + 1)
        # prefetch ahead (overlaps the wait+matmul below); slot of chunk
        # k+a held chunk k+a-slots, consumed in an earlier iteration
        for a in range(1, slots):
            ok = (k + a >= f) & (k + a < c_used)

            @pl.when(ok)
            def _():
                start_fetch(k + a)
            f = jnp.where(ok, k + a + 1, f)
        # first use of chunk k waits on its DMA; re-uses skip the wait
        slot = jax.lax.rem(k, slots)

        @pl.when(k > w)
        def _():
            pltpu.make_async_copy(m_hbm.at[pl.ds(k * eb, eb), :],
                                  m_buf.at[slot], sem_m.at[slot]).wait()
            pltpu.make_async_copy(l_hbm.at[:, pl.ds(k * eb, eb)],
                                  l_buf.at[slot], sem_l.at[slot]).wait()
        w = jnp.maximum(w, k)
        _chunk_matmul(m_buf, l_buf, slot, chunk_id=k, start=start, end=end,
                      eb=eb, nb=nb, fast=fast, relu=relu, acc_ref=acc_ref)
        return f, w

    f, w = jax.lax.fori_loop(c0, c1, body, (st[0], st[1]))
    st[0] = f
    st[1] = w
    _epilogue(acc_ref, out_ref, scale_ref, gate_ref, init_ref)


@functools.partial(jax.jit, static_argnames=("num_nodes_padded", "node_block",
                                             "edge_chunk", "out_dtype",
                                             "interpret", "fast", "pipeline",
                                             "slots", "relu"))
def scatter_rows_sorted(m, local_row, block_ptr, *, num_nodes_padded: int,
                        node_block: int = NODE_BLOCK, edge_chunk: int = 512,
                        out_dtype=jnp.float32, interpret: bool = False,
                        fast: bool = False, pipeline: str = "rolling",
                        slots: int = 2, relu: bool = False, scale=None,
                        gate=None, init=None):
    """sum-scatter M [E_pad, D] into out [N_pad, D].

    ``local_row`` [1, E_pad] int32: ``receiver mod node_block`` for valid
    edges, ``node_block`` (out-of-range sentinel) for padding; edges sorted
    by receiver; ``block_ptr`` the per-node-block edge offsets
    (ops.edge_layout.build_edge_layout).

    Fused extras (all VMEM-resident, saving separate HBM passes):
      * ``relu``  — apply max(m, 0) to each message chunk before the matmul
        (the reference's message activation, encoder.py:94-97),
      * ``scale`` — [N_pad, 1] per-output-row multiplier applied once the
        row block is complete (mean-aggregation 1/deg),
      * ``gate``  — [N_pad, D]; zero output elements where ``gate <= 0``
        (the factored relu-mask of the backward when messages carry no
        per-edge term: d relu(x_j)/dx = 1[x_j > 0] depends on the sender
        row only, so it gates the scatter *output*),
      * ``init``  — [N_pad, D] additive base added to the accumulator
        before scale/gate (the hub-dense partial sums — fusing the
        hub + tail combine into this epilogue saves a separate [N, D]
        read-add-write pass per call).
    """
    e_pad, d = m.shape
    nb, eb = node_block, edge_chunk
    assert e_pad % eb == 0 and e_pad >= eb, (e_pad, eb)
    assert num_nodes_padded % nb == 0
    assert local_row.shape == (1, e_pad), local_row.shape
    assert pipeline in ("rolling", "block"), pipeline
    num_blocks = num_nodes_padded // nb
    has_scale, has_gate = scale is not None, gate is not None
    has_init = init is not None
    if has_scale:
        assert scale.shape == (num_nodes_padded, 1), scale.shape
    if has_gate:
        assert gate.shape == (num_nodes_padded, d), gate.shape
    if has_init:
        assert init.shape == (num_nodes_padded, d), init.shape

    scratch = [
        pltpu.VMEM((slots, eb, d), m.dtype),
        pltpu.VMEM((slots, 1, eb), local_row.dtype),
        pltpu.SemaphoreType.DMA((slots,)),
        pltpu.SemaphoreType.DMA((slots,)),
    ]
    flags = dict(eb=eb, nb=nb, fast=fast, relu=relu, has_scale=has_scale,
                 has_gate=has_gate, has_init=has_init)
    if pipeline == "rolling":
        scratch.append(pltpu.SMEM((2,), jnp.int32))
        kernel = functools.partial(_rolling_kernel, num_blocks=num_blocks,
                                   slots=slots, **flags)
    else:
        assert slots == 2, "block pipeline is hard-wired double-buffered"
        kernel = functools.partial(_block_kernel, **flags)
    scratch.append(pltpu.VMEM((nb, d), jnp.float32))   # f32 accumulator

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [m, local_row]
    if has_init:
        in_specs.append(pl.BlockSpec((nb, d), lambda i, *_: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(init)
    if has_scale:
        in_specs.append(pl.BlockSpec((nb, 1), lambda i, *_: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(scale)
    if has_gate:
        in_specs.append(pl.BlockSpec((nb, d), lambda i, *_: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(gate)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nb, d), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    flops = 2 * e_pad * nb * d * (1 if fast else 2)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_nodes_padded, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=e_pad * (d * m.dtype.itemsize + 4)
            + num_nodes_padded * d * 4,
            transcendentals=0),
        # the rolling pipeline's SMEM state requires the grid to execute
        # sequentially on one core (no megacore split)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=[pltpu.GridDimensionSemantics.ARBITRARY]),
        interpret=interpret,
    )(block_ptr, *operands)


def _masked_block_kernel(block_ptr_ref, win_lo_ref, win_nsub_ref,  # scalars
                         *refs, eb: int, nb: int, w: int, n_pad: int,
                         with_table: bool, t_rows: int):
    """Per-block walk that recomputes the relu mask of the backward inside
    the kernel: for each edge chunk, the (sender-sorted) source rows live in
    a narrow node-id window [win_lo, win_lo + nsub*w), streamed from x by
    sequential DMA; the pre-activation is rebuilt with one-hot MXU matmuls

        pre = G^T @ X_window (+ H^T @ T)      G[rr,e] = (snd[e]==start+rr)
                                              H[t,e]  = (xe[e]==t)

    and the message chunk is gated by ``pre > 0`` before the scatter matmul.
    This replaces the backward's [E, D] pre-activation re-gather with
    ~N*D bytes of sequential window reads (fused_sage.f_bwd relu recompute;
    reference semantics STEM-GNN/model/encoder.py:94-97).
    """
    m_hbm, l_hbm, s_hbm, x_hbm = refs[0], refs[1], refs[2], refs[3]
    k = 4
    t_ref = refs[k] if with_table else None
    k += with_table
    xe_hbm = refs[k] if with_table else None
    k += with_table
    out_ref = refs[k]
    (m_buf, l_buf, s_buf, xe_buf, xwin_buf, sem_m, sem_l, sem_s, sem_xe,
     sem_x, acc_ref, pre_ref) = refs[k + 1:k + 13]
    i = pl.program_id(0)
    start = block_ptr_ref[i]
    end = block_ptr_ref[i + 1]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    c0 = start // eb
    c1 = (end + eb - 1) // eb
    num_chunks = c1 - c0

    def get_dma(slot, c):
        off = c * eb
        copies = [
            pltpu.make_async_copy(m_hbm.at[pl.ds(off, eb), :],
                                  m_buf.at[slot], sem_m.at[slot]),
            pltpu.make_async_copy(l_hbm.at[:, pl.ds(off, eb)],
                                  l_buf.at[slot], sem_l.at[slot]),
            pltpu.make_async_copy(s_hbm.at[:, pl.ds(off, eb)],
                                  s_buf.at[slot], sem_s.at[slot]),
        ]
        if with_table:
            copies.append(pltpu.make_async_copy(
                xe_hbm.at[:, pl.ds(off, eb)], xe_buf.at[slot],
                sem_xe.at[slot]))
        return copies

    @pl.when(num_chunks > 0)
    def _():
        for cp in get_dma(0, c0):
            cp.start()

        def body(kk, _):
            slot = jax.lax.rem(kk, 2)
            nxt = jax.lax.rem(kk + 1, 2)

            @pl.when(kk + 1 < num_chunks)
            def _():
                for cp in get_dma(nxt, c0 + kk + 1):
                    cp.start()

            for cp in get_dma(slot, c0 + kk):
                cp.wait()

            c = c0 + kk
            w0 = win_lo_ref[c]
            nsub = win_nsub_ref[c]
            snd = s_buf[slot]                    # [1, eb] int32
            pre_ref[:] = jnp.zeros_like(pre_ref)

            def sub_body(s, _):
                # win_lo is 8-aligned on the host; w and n_pad are multiples
                # of 128 -> row_start is sublane-aligned (Mosaic needs the
                # annotation to prove it for the dynamic HBM slice)
                row_start = pl.multiple_of(
                    jnp.minimum(w0 + s * w, n_pad - w), 8)
                cx = pltpu.make_async_copy(
                    x_hbm.at[pl.ds(row_start, w), :],
                    xwin_buf.at[jax.lax.rem(s, 2)], sem_x.at[jax.lax.rem(s, 2)])
                cx.start()
                cx.wait()
                rows = jax.lax.broadcasted_iota(jnp.int32, (w, eb), 0)
                # absolute-id match + subwindow ownership (windows clamped at
                # the array end may overlap; ownership dedups)
                gt = ((snd == row_start + rows)
                      & ((snd - w0) // w == s)).astype(jnp.bfloat16)
                pre_ref[:] += jax.lax.dot_general(
                    gt, xwin_buf[jax.lax.rem(s, 2)].astype(jnp.bfloat16),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return 0

            jax.lax.fori_loop(0, nsub, sub_body, 0)

            if with_table:
                trows = jax.lax.broadcasted_iota(jnp.int32, (t_rows, eb), 0)
                ht = (xe_buf[slot] == trows).astype(jnp.bfloat16)
                pre_ref[:] += jax.lax.dot_general(
                    ht, t_ref[...].astype(jnp.bfloat16),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            m = jnp.where(pre_ref[...] > 0, m_buf[slot],
                          jnp.zeros((), m_buf.dtype))
            g = c * eb + jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 1)
            rows_p = jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0)
            lr = l_buf[slot]
            keep = (lr == rows_p) & (g >= start) & (g < end)
            p = keep.astype(jnp.bfloat16)
            acc_ref[:] += jax.lax.dot_general(
                p, m.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, num_chunks, body, 0)
    out_ref[:] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_nodes_padded", "node_block",
                                             "edge_chunk", "win_w",
                                             "out_dtype", "interpret"))
def masked_scatter_rows_sorted(m, local_row, senders, block_ptr, win_lo,
                               win_nsub, x, table=None, xe=None, *,
                               num_nodes_padded: int, win_w: int,
                               node_block: int = NODE_BLOCK,
                               edge_chunk: int = 512,
                               out_dtype=jnp.float32,
                               interpret: bool = False):
    """sum-scatter of ``m`` [E_pad, D] gated by a recomputed relu mask:

        out[n] = sum_e 1[local_row[e]==n] * 1[x[senders[e]] + T[xe[e]] > 0]
                 * m[e]

    Edges sender-sorted; ``senders``/``xe`` are [1, E_pad] int32 streams;
    ``win_lo``/``win_nsub`` [C] per-chunk x-window metadata
    (ops.edge_layout).  The pre-activation is recomputed in bfloat16 (the
    bf16-message training configuration's mask semantics)."""
    e_pad, d = m.shape
    nb, eb, w = node_block, edge_chunk, win_w
    assert e_pad % eb == 0 and num_nodes_padded % nb == 0
    assert senders.shape == (1, e_pad) and local_row.shape == (1, e_pad)
    assert num_nodes_padded >= w, (num_nodes_padded, w)
    num_blocks = num_nodes_padded // nb
    num_chunks = e_pad // eb
    assert win_lo.shape == (num_chunks,) and win_nsub.shape == (num_chunks,)
    with_table = table is not None
    t_rows = 0 if table is None else table.shape[0]

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),      # m
        pl.BlockSpec(memory_space=pl.ANY),      # local_row
        pl.BlockSpec(memory_space=pl.ANY),      # senders
        pl.BlockSpec(memory_space=pl.ANY),      # x
    ]
    operands = [m, local_row, senders, x]
    if with_table:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # table
        operands.append(table)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))      # xe
        operands.append(xe)
        assert xe.shape == (1, e_pad)

    scratch = [
        pltpu.VMEM((2, eb, d), m.dtype),               # m_buf
        pltpu.VMEM((2, 1, eb), jnp.int32),             # l_buf
        pltpu.VMEM((2, 1, eb), jnp.int32),             # s_buf
        pltpu.VMEM((2, 1, eb), jnp.int32),             # xe_buf (maybe unused)
        pltpu.VMEM((2, w, d), x.dtype),                # xwin_buf
        pltpu.SemaphoreType.DMA((2,)),                 # sem_m
        pltpu.SemaphoreType.DMA((2,)),                 # sem_l
        pltpu.SemaphoreType.DMA((2,)),                 # sem_s
        pltpu.SemaphoreType.DMA((2,)),                 # sem_xe
        pltpu.SemaphoreType.DMA((2,)),                 # sem_x
        pltpu.VMEM((nb, d), jnp.float32),              # acc
        pltpu.VMEM((eb, d), jnp.float32),              # pre
    ]
    kernel = functools.partial(_masked_block_kernel, eb=eb, nb=nb, w=w,
                               n_pad=num_nodes_padded,
                               with_table=with_table, t_rows=t_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nb, d), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_nodes_padded, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * (nb + w + t_rows) * d,
            bytes_accessed=e_pad * (d * m.dtype.itemsize + 12)
            + num_nodes_padded * d * (x.dtype.itemsize + 4),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=[pltpu.GridDimensionSemantics.ARBITRARY]),
        interpret=interpret,
    )(block_ptr, win_lo, win_nsub, *operands)


def _gathered_block_kernel(block_ptr_ref, win_lo_ref, win_nsub_ref,  # scalars
                           *refs, eb: int, nb: int, w: int, n_pad: int,
                           with_table: bool, xe_stream: bool, t_rows: int,
                           relu: bool, has_scale: bool, has_gate: bool,
                           has_init: bool, with_stray: bool = False):
    """Per-block walk that GATHERS the message rows inside the kernel: for
    each (scatter-key-sorted) edge chunk, the gather-side node ids live in a
    narrow window [win_lo, win_lo + nsub*w) (locality-ordered graphs), so
    the chunk's messages are rebuilt from sequential x-window DMAs with
    one-hot MXU matmuls

        m = G^T @ X_window (+ H^T @ T | + t0),   G[rr, e] = (key[e]==lo+rr)

    optionally relu'd, then scatter-accumulated with the usual one-hot P
    matmul.  This replaces the XLA random row gather AND the [E, D] message
    materialization of the standard path (reference hot loop semantics
    STEM-GNN/model/encoder.py:94-102).  Messages are built in bf16 (the
    bf16-message training configuration).

    ``with_stray`` (the single-kernel LocSplit, r3 VERDICT item 4): edges
    whose gather keys fall outside any window carry sentinel keys (the
    window matmuls contribute zero for them) plus a stray-rank stream; a
    chunk with ``stray_cnt > 0`` DMAs one eb-row slice of the compact
    pre-gathered stray buffer and places those rows into their edge
    columns with one extra one-hot matmul — no second kernel launch, no
    [N, D] partial-sum round trip."""
    if with_stray:
        stray_off_ref, stray_cnt_ref = refs[0], refs[1]
        refs = refs[2:]
    k_hbm, l_hbm, x_hbm = refs[0], refs[1], refs[2]
    k = 3
    t_ref = refs[k] if with_table else None
    k += with_table
    xe_hbm = refs[k] if xe_stream else None
    k += xe_stream
    sidx_hbm = refs[k] if with_stray else None
    k += with_stray
    sbuf_hbm = refs[k] if with_stray else None
    k += with_stray
    init_ref = refs[k] if has_init else None
    k += has_init
    scale_ref = refs[k] if has_scale else None
    k += has_scale
    gate_ref = refs[k] if has_gate else None
    k += has_gate
    out_ref = refs[k]
    (k_buf, l_buf, xe_buf, xwin_buf, sem_k, sem_l, sem_xe, sem_x,
     acc_ref, pre_ref) = refs[k + 1:k + 11]
    if with_stray:
        sidx_buf, sbuf_vmem, sem_sidx, sem_sb = refs[k + 11:k + 15]
    i = pl.program_id(0)
    start = block_ptr_ref[i]
    end = block_ptr_ref[i + 1]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    c0 = start // eb
    c1 = jnp.where(end > start, (end + eb - 1) // eb, c0)
    num_chunks = c1 - c0

    def get_dma(slot, c):
        off = c * eb
        copies = [
            pltpu.make_async_copy(k_hbm.at[:, pl.ds(off, eb)],
                                  k_buf.at[slot], sem_k.at[slot]),
            pltpu.make_async_copy(l_hbm.at[:, pl.ds(off, eb)],
                                  l_buf.at[slot], sem_l.at[slot]),
        ]
        if xe_stream:
            copies.append(pltpu.make_async_copy(
                xe_hbm.at[:, pl.ds(off, eb)], xe_buf.at[slot],
                sem_xe.at[slot]))
        if with_stray:
            copies.append(pltpu.make_async_copy(
                sidx_hbm.at[:, pl.ds(off, eb)], sidx_buf.at[slot],
                sem_sidx.at[slot]))
        return copies

    @pl.when(num_chunks > 0)
    def _():
        for cp in get_dma(0, c0):
            cp.start()

        def body(kk, _):
            slot = jax.lax.rem(kk, 2)
            nxt = jax.lax.rem(kk + 1, 2)

            @pl.when(kk + 1 < num_chunks)
            def _():
                for cp in get_dma(nxt, c0 + kk + 1):
                    cp.start()

            for cp in get_dma(slot, c0 + kk):
                cp.wait()

            c = c0 + kk
            w0 = win_lo_ref[c]
            nsub = win_nsub_ref[c]
            key = k_buf[slot]                    # [1, eb] int32
            pre_ref[:] = jnp.zeros_like(pre_ref)

            if with_stray:
                # host guarantees 8-aligned per-chunk stray offsets
                # (Mosaic must prove HBM slice starts divisible by the
                # sublane tiling)
                soff = pl.multiple_of(stray_off_ref[c], 8)

                @pl.when(stray_cnt_ref[c] > 0)
                def _():
                    # compact stray rows [soff, soff+eb) -> edge columns via
                    # one one-hot matmul (stray ranks are consecutive in the
                    # merged edge order, so one slice covers the chunk)
                    cs = pltpu.make_async_copy(
                        sbuf_hbm.at[pl.ds(soff, eb), :], sbuf_vmem, sem_sb)
                    cs.start()
                    cs.wait()
                    jrows = jax.lax.broadcasted_iota(jnp.int32, (eb, eb), 0)
                    g2 = (sidx_buf[slot] - soff == jrows).astype(jnp.bfloat16)
                    pre_ref[:] += jax.lax.dot_general(
                        g2, sbuf_vmem[...].astype(jnp.bfloat16),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

            def sub_body(s, _):
                # window starts 8-aligned on the host; clamped windows at the
                # array end may overlap — subwindow ownership dedups
                row_start = pl.multiple_of(
                    jnp.minimum(w0 + s * w, n_pad - w), 8)
                cx = pltpu.make_async_copy(
                    x_hbm.at[pl.ds(row_start, w), :],
                    xwin_buf.at[jax.lax.rem(s, 2)],
                    sem_x.at[jax.lax.rem(s, 2)])
                cx.start()
                cx.wait()
                rows = jax.lax.broadcasted_iota(jnp.int32, (w, eb), 0)
                gt = ((key == row_start + rows)
                      & ((key - w0) // w == s)).astype(jnp.bfloat16)
                pre_ref[:] += jax.lax.dot_general(
                    gt, xwin_buf[jax.lax.rem(s, 2)].astype(jnp.bfloat16),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return 0

            jax.lax.fori_loop(0, nsub, sub_body, 0)

            if with_table:
                if xe_stream:
                    trows = jax.lax.broadcasted_iota(jnp.int32, (t_rows, eb),
                                                     0)
                    ht = (xe_buf[slot] == trows).astype(jnp.bfloat16)
                    pre_ref[:] += jax.lax.dot_general(
                        ht, t_ref[...].astype(jnp.bfloat16),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:
                    # single-row table broadcast (factored t0 shift)
                    pre_ref[:] += t_ref[...].astype(jnp.float32)

            m = pre_ref[...]
            if relu:
                m = jnp.maximum(m, 0.0)
            g = c * eb + jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 1)
            rows_p = jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0)
            lr = l_buf[slot]
            # the [start, end) range + lrow sentinel also kill padded-edge
            # columns (whose pre may be nonzero through the t0 broadcast)
            keep = (lr == rows_p) & (g >= start) & (g < end)
            p = keep.astype(jnp.bfloat16)
            acc_ref[:] += jax.lax.dot_general(
                p, m.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, num_chunks, body, 0)
    _epilogue(acc_ref, out_ref, scale_ref, gate_ref, init_ref)


@functools.partial(jax.jit, static_argnames=("num_nodes_padded", "node_block",
                                             "edge_chunk", "win_w", "relu",
                                             "out_dtype", "interpret"))
def gathered_scatter_rows_sorted(keys, local_row, block_ptr, win_lo, win_nsub,
                                 x, table=None, xe=None, *,
                                 num_nodes_padded: int, win_w: int,
                                 node_block: int = NODE_BLOCK,
                                 edge_chunk: int = 512, relu: bool = False,
                                 out_dtype=jnp.float32, scale=None, gate=None,
                                 init=None, interpret: bool = False,
                                 stray_src=None, stray_idx=None,
                                 stray_off=None, stray_cnt=None):
    """Scatter-sum with IN-KERNEL windowed gather:

        out[n] = sum_e 1[local_row[e]==n] * f(x[keys[e]] (+ T[xe[e]] | + t0))

    with f = relu when ``relu``.  ``keys`` [1, E_pad] int32 gather-side node
    ids per edge (sorted by the *scatter* key, as usual); ``win_lo``/
    ``win_nsub`` [C] the per-chunk gather-window metadata
    (ops.edge_layout gwin_*).  A 1-row ``table`` with ``xe=None`` broadcasts
    t0 to every message (the factored single-type shift); a multi-row table
    requires the ``xe`` [1, E_pad] stream.  Messages are built in bf16;
    ``scale``/``gate``/``init`` as in scatter_rows_sorted.

    Single-kernel LocSplit (all four together or none): ``stray_src``
    [S_pad, D] compact pre-gathered rows for out-of-window edges (S_pad
    must leave >= edge_chunk rows of tail slack), ``stray_idx`` [1, E_pad]
    per-edge stray rank (-1 for windowed edges, whose ``keys`` must be the
    sentinel so the windows contribute zero for them), ``stray_off``/
    ``stray_cnt`` [C] per-chunk first-rank / count (ranks are consecutive
    within a chunk under the (block, class, gather) edge order)."""
    e_pad = keys.shape[1]
    d = x.shape[1]
    nb, eb, w = node_block, edge_chunk, win_w
    assert e_pad % eb == 0 and num_nodes_padded % nb == 0
    assert keys.shape == (1, e_pad) and local_row.shape == (1, e_pad)
    assert num_nodes_padded >= w, (num_nodes_padded, w)
    num_blocks = num_nodes_padded // nb
    num_chunks = e_pad // eb
    assert win_lo.shape == (num_chunks,) and win_nsub.shape == (num_chunks,)
    with_table = table is not None
    xe_stream = xe is not None
    t_rows = 0 if table is None else table.shape[0]
    if with_table and not xe_stream:
        assert t_rows == 1, "multi-row table requires the xe stream"
    has_scale, has_gate = scale is not None, gate is not None
    has_init = init is not None
    with_stray = stray_src is not None
    if with_stray:
        assert stray_idx is not None and stray_off is not None \
            and stray_cnt is not None
        assert stray_idx.shape == (1, e_pad)
        assert stray_off.shape == (num_chunks,)
        assert stray_cnt.shape == (num_chunks,)
        assert stray_src.shape[0] >= eb and stray_src.shape[1] == d
    if has_scale:
        assert scale.shape == (num_nodes_padded, 1), scale.shape
    if has_gate:
        assert gate.shape == (num_nodes_padded, d), gate.shape
    if has_init:
        assert init.shape == (num_nodes_padded, d), init.shape

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),      # keys
        pl.BlockSpec(memory_space=pl.ANY),      # local_row
        pl.BlockSpec(memory_space=pl.ANY),      # x
    ]
    operands = [keys, local_row, x]
    if with_table:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # table
        operands.append(table)
    if xe_stream:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))      # xe
        operands.append(xe)
        assert xe.shape == (1, e_pad)
    if with_stray:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))      # stray_idx
        operands.append(stray_idx)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))      # stray_src
        operands.append(stray_src)
    if has_init:
        in_specs.append(pl.BlockSpec((nb, d), lambda i, *_: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(init)
    if has_scale:
        in_specs.append(pl.BlockSpec((nb, 1), lambda i, *_: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(scale)
    if has_gate:
        in_specs.append(pl.BlockSpec((nb, d), lambda i, *_: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(gate)

    scratch = [
        pltpu.VMEM((2, 1, eb), jnp.int32),             # k_buf
        pltpu.VMEM((2, 1, eb), jnp.int32),             # l_buf
        pltpu.VMEM((2, 1, eb), jnp.int32),             # xe_buf (maybe unused)
        pltpu.VMEM((2, w, d), x.dtype),                # xwin_buf
        pltpu.SemaphoreType.DMA((2,)),                 # sem_k
        pltpu.SemaphoreType.DMA((2,)),                 # sem_l
        pltpu.SemaphoreType.DMA((2,)),                 # sem_xe
        pltpu.SemaphoreType.DMA((2,)),                 # sem_x
        pltpu.VMEM((nb, d), jnp.float32),              # acc
        pltpu.VMEM((eb, d), jnp.float32),              # pre
    ]
    if with_stray:
        scratch += [
            pltpu.VMEM((2, 1, eb), jnp.int32),         # sidx_buf
            pltpu.VMEM((eb, d), stray_src.dtype),      # sbuf_vmem
            pltpu.SemaphoreType.DMA((2,)),             # sem_sidx
            pltpu.SemaphoreType.DMA(()),               # sem_sb
        ]
    kernel = functools.partial(_gathered_block_kernel, eb=eb, nb=nb, w=w,
                               n_pad=num_nodes_padded, with_table=with_table,
                               xe_stream=xe_stream, t_rows=t_rows, relu=relu,
                               has_scale=has_scale, has_gate=has_gate,
                               has_init=has_init, with_stray=with_stray)
    prefetch = [block_ptr, win_lo, win_nsub]
    if with_stray:
        prefetch += [stray_off, stray_cnt]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(num_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nb, d), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_nodes_padded, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            # The window-DMA term assumes ONE subwindow per chunk; chunks
            # spanning wider node ranges DMA win_nsub[c] windows each, so
            # this understates HBM traffic on wide-span graphs.  win_nsub is
            # a traced array (its sum is unknowable at trace time without a
            # host readback), and the estimate is a scheduling hint only —
            # the break-even gate that decides whether this kernel runs at
            # all (edge_layout._gwin_decide) does use the true nsub sum.
            flops=2 * e_pad * (nb + w + t_rows) * d,
            bytes_accessed=e_pad * (8 + 4 * xe_stream)
            + e_pad * w * d * x.dtype.itemsize // eb
            + num_nodes_padded * d * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=[pltpu.GridDimensionSemantics.ARBITRARY]),
        interpret=interpret,
    )(*prefetch, *operands)
