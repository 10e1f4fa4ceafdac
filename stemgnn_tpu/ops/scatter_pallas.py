"""Pallas TPU kernel: segment scatter-sum over receiver-sorted edges.

Replaces XLA's scatter-add HLO (the bottleneck of ``segment_sum`` on TPU)
with a blocked one-hot MXU matmul:

  grid over output node blocks (NB = 128 rows).  Each block's incoming edges
  form a contiguous range [start, end) of the receiver-sorted edge list
  (``block_ptr``).  The kernel walks the EB-aligned global chunks overlapping
  that range, streams chunks of the message matrix M [E, D] and of a
  *precomputed transposed* one-hot matrix P [128, E]
  (P[n, e] = (receiver[e] mod 128 == n), static per graph, stored in the
  EdgeLayout) via double-buffered DMA, masks columns outside [start, end),
  and accumulates

      out[block] += P_chunk @ M_chunk        — a plain (128, EB)x(EB, D) MXU
                                               matmul, no transposes

  Because node blocks are 128 rows, ``receiver mod 128`` IS the local row
  within the owning block, so one P matrix serves every block.

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


def _scatter_kernel(block_ptr_ref,            # scalar prefetch [num_blocks+1]
                    m_hbm, p_hbm,             # [E_pad, D] / [NB, E_pad] ANY
                    out_ref,                  # [NB, D] VMEM block
                    m_buf, p_buf, sem_m, sem_p,
                    *, eb: int, fast: bool):
    i = pl.program_id(0)
    start = block_ptr_ref[i]
    end = block_ptr_ref[i + 1]
    out_ref[:] = jnp.zeros_like(out_ref)
    c0 = start // eb
    c1 = (end + eb - 1) // eb          # exclusive
    num_chunks = c1 - c0

    def get_dma(slot, c):
        off = c * eb
        cm = pltpu.make_async_copy(m_hbm.at[pl.ds(off, eb), :],
                                   m_buf.at[slot], sem_m.at[slot])
        cp = pltpu.make_async_copy(p_hbm.at[:, pl.ds(off, eb)],
                                   p_buf.at[slot], sem_p.at[slot])
        return cm, cp

    @pl.when(num_chunks > 0)
    def _():
        cm, cp = get_dma(0, c0)
        cm.start()
        cp.start()

        def body(k, _):
            slot = jax.lax.rem(k, 2)
            nxt = jax.lax.rem(k + 1, 2)

            @pl.when(k + 1 < num_chunks)
            def _():
                cm2, cp2 = get_dma(nxt, c0 + k + 1)
                cm2.start()
                cp2.start()

            cm1, cp1 = get_dma(slot, c0 + k)
            cm1.wait()
            cp1.wait()

            # mask edge columns outside this block's [start, end) range
            g = (c0 + k) * eb + jax.lax.broadcasted_iota(
                jnp.int32, (1, eb), 1)
            keep = (g >= start) & (g < end)
            p = jnp.where(keep, p_buf[slot], 0).astype(jnp.bfloat16)
            m = m_buf[slot]

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
            out_ref[:] += acc.astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, num_chunks, body, 0)


@functools.partial(jax.jit, static_argnames=("num_nodes_padded", "edge_chunk",
                                             "out_dtype", "interpret", "fast"))
def scatter_rows_sorted(m, onehot_t, block_ptr, *, num_nodes_padded: int,
                        edge_chunk: int = 512, out_dtype=jnp.float32,
                        interpret: bool = False, fast: bool = False):
    """sum-scatter M [E_pad, D] into out [N_pad, D].

    ``onehot_t`` [128, E_pad]: transposed onehot(receiver mod 128) for valid
    edges, zero columns for padding; edges sorted by receiver; ``block_ptr``
    the per-128-node-block edge offsets (ops.edge_layout.build_edge_layout).
    """
    e_pad, d = m.shape
    nb, eb = NODE_BLOCK, edge_chunk
    assert e_pad % eb == 0 and e_pad >= eb, (e_pad, eb)
    assert num_nodes_padded % nb == 0
    assert onehot_t.shape == (nb, e_pad), onehot_t.shape
    num_blocks = num_nodes_padded // nb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((nb, d), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, eb, d), m.dtype),
            pltpu.VMEM((2, nb, eb), onehot_t.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_scatter_kernel, eb=eb, fast=fast)
    flops = 2 * e_pad * nb * d * (1 if fast else 2)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_nodes_padded, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=e_pad * (d * m.dtype.itemsize
                                    + nb * onehot_t.dtype.itemsize)
            + num_nodes_padded * d * 4,
            transcendentals=0),
        interpret=interpret,
    )(block_ptr, m, onehot_t)
