"""Masked segment reductions.

The reference leans on torch_scatter (``scatter_mean``,
STEM-GNN/model/encoder.py:124) and PyG pooling (``global_mean_pool``,
STEM-GNN/model/ft_model.py:61-69).  Here the same reductions are pure XLA
segment ops over padded arrays: padding entries are masked to the additive /
max identity before reduction, so results match the unpadded math exactly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _mask_like(data: jax.Array, mask: Optional[jax.Array], identity) -> jax.Array:
    if mask is None:
        return data
    m = mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))
    return jnp.where(m, data, identity)


def segment_sum(data, segment_ids, num_segments: int, mask=None,
                indices_are_sorted: bool = False):
    data = _mask_like(data, mask, 0)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_mean(data, segment_ids, num_segments: int, mask=None,
                 indices_are_sorted: bool = False):
    """Mean over segments; empty segments yield zeros (torch_scatter semantics)."""
    total = segment_sum(data, segment_ids, num_segments, mask=mask,
                        indices_are_sorted=indices_are_sorted)
    ones = jnp.ones(data.shape[:1], dtype=total.dtype)
    count = segment_sum(ones, segment_ids, num_segments, mask=mask,
                        indices_are_sorted=indices_are_sorted)
    count = count.reshape(count.shape + (1,) * (total.ndim - count.ndim))
    return total / jnp.maximum(count, 1)


def segment_max(data, segment_ids, num_segments: int, mask=None,
                indices_are_sorted: bool = False):
    """Max over segments; empty segments yield zeros (PyG global_max_pool
    returns -inf for empty, but they never occur in valid batches)."""
    data = _mask_like(data, mask, _NEG_INF)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments,
                              indices_are_sorted=indices_are_sorted)
    return jnp.where(out <= _NEG_INF / 2, 0.0, out)


def segment_softmax(logits, segment_ids, num_segments: int, mask=None):
    """Per-segment softmax (used by the GAT backbone's attention)."""
    logits = _mask_like(logits, mask, _NEG_INF)
    seg_max = jax.ops.segment_max(logits, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(seg_max <= _NEG_INF / 2, 0.0, seg_max)
    shifted = logits - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (exp.ndim - mask.ndim))
        exp = jnp.where(m, exp, 0.0)
    denom = jax.ops.segment_sum(exp, segment_ids, num_segments=num_segments)
    return exp / jnp.maximum(denom[segment_ids], 1e-16)
