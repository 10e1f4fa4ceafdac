"""Pallas TPU kernel: fused multi-head nearest-code lookup for the VQ.

One pass over the projected inputs fuses what the XLA path materializes in
four (l2-normalize -> cosine scores [H, N, C] -> argmax -> one-hot ->
quantized vectors):

    per N-row block, per head h (static unroll):
        xn    = x_h / max(||x_h||, eps)            (VPU)
        s     = xn @ embed[h]^T                    (MXU, [NB, C])
        ind   = argmax_c s                         (VPU)
        q     = onehot(ind) @ embed[h]             (MXU, [NB, d])

HBM traffic drops from ~3 full [N, H*d] round-trips + the [H, N, C] score
tensor to exactly one read (x) and two writes (q, xn).  This is the "fused
nearest-code kernel" obligation of SURVEY.md §2.1 for the reference's
cosine-codebook hot loop (STEM-GNN/model/vq.py:650-659).

Gradient contract (matches the XLA path, vq.py:655-657): the one-hot is an
argmax output, so x receives gradients only through the emitted ``xn``
(l2-norm backward) and ``embed`` receives the per-code sum of dq.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-12   # F.normalize semantics (vq/codebook.py:l2norm)


def _kernel(x_ref, emb_ref, q_ref, xn_ref, ind_ref, inv_ref, *, h: int,
            d: int, c: int):
    for hh in range(h):
        xb = x_ref[:, hh * d:(hh + 1) * d].astype(jnp.float32)
        nrm = jnp.sqrt(jnp.sum(xb * xb, axis=-1, keepdims=True))
        inv = 1.0 / jnp.maximum(nrm, EPS)
        xn = xb * inv
        emb = emb_ref[hh].astype(jnp.float32)
        scores = jax.lax.dot_general(
            xn, emb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [NB, C]
        ind = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
                  == ind[:, None]).astype(jnp.float32)
        q = jax.lax.dot_general(
            onehot, emb, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [NB, d]
        q_ref[:, hh * d:(hh + 1) * d] = q
        xn_ref[:, hh * d:(hh + 1) * d] = xn
        ind_ref[hh, :] = ind
        inv_ref[hh, :] = inv[:, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_nearest_impl(x, embed, *, interpret: bool = False):
    n, hd = x.shape
    h, c, d = embed.shape
    assert hd == h * d, (x.shape, embed.shape)
    nb = max(bs for bs in (512, 256, 128, 8) if n % bs == 0)
    grid = (n // nb,)
    out = pl.pallas_call(
        functools.partial(_kernel, h=h, d=d, c=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, hd), lambda i: (i, 0)),
            pl.BlockSpec((h, c, d), lambda i: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((nb, hd), lambda i: (i, 0)),
            pl.BlockSpec((nb, hd), lambda i: (i, 0)),
            pl.BlockSpec((h, nb), lambda i: (0, i)),
            pl.BlockSpec((h, nb), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, hd), jnp.float32),   # q
            jax.ShapeDtypeStruct((n, hd), jnp.float32),   # xn
            jax.ShapeDtypeStruct((h, n), jnp.int32),      # ind
            jax.ShapeDtypeStruct((h, n), jnp.float32),    # 1/norm
        ],
        interpret=interpret,
    )(x, embed)
    return tuple(out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_nearest_code(x, embed, interpret: bool = False):
    """(q [N, H*d] f32, xn [N, H*d] f32, ind [H, N] int32) for a cosine
    codebook: ``ind = argmax_c <l2norm(x_h), embed[h, c]>``, ``q = embed[ind]``
    (one-hot matmul).  ``embed`` is assumed l2-normalized, as in the
    reference's CosineSimCodebook (vq.py:650).
    """
    q, xn, ind, _ = _fused_nearest_impl(x, embed, interpret=interpret)
    return q, xn, ind


def _fwd(x, embed, interpret):
    q, xn, ind, inv = _fused_nearest_impl(x, embed, interpret=interpret)
    return (q, xn, ind), (xn, ind, inv, jnp.zeros((0,) + embed.shape),
                          jnp.zeros((0,), x.dtype))


def _bwd(interpret, res, cot):
    dq, dxn, _ = cot
    xn, ind, inv, eshape_tok, xdtype_tok = res
    (h, c, d), xdtype = eshape_tok.shape[1:], xdtype_tok.dtype
    n = xn.shape[0]
    # d embed: per-code sum of dq over the rows that selected the code
    # (the one-hot einsum's transpose, vq.py:655-657)
    oh = jax.nn.one_hot(ind.T, c, dtype=jnp.float32)            # [N, H, C]
    demb = jnp.einsum("nhc,nhd->hcd", oh, dq.reshape(n, h, d))
    # dx through the l2 normalization: dx = inv * (dxn - xn <dxn, xn>)
    xn_v = xn.reshape(n, h, d)
    dxn_v = dxn.reshape(n, h, d)
    s = jnp.sum(dxn_v * xn_v, axis=-1, keepdims=True)
    dx = ((dxn_v - xn_v * s) * inv.T[..., None]).reshape(n, h * d)
    return dx.astype(xdtype), demb


fused_nearest_code.defvjp(_fwd, _bwd)
