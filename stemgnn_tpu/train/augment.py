"""Graph augmentations as fixed-shape, RNG-keyed ops.

Re-designs of the reference's pretrain augmentations (STEM-GNN/pretrain.py:41-45):

  * ``mask_feature(x, p)`` — PyG default mode='col': whole feature columns
    zeroed with probability p.
  * ``dropout_adj(p, force_undirected=True)`` — edges dropped with probability
    p, with both directions of an undirected pair dropped together.

TPU-first difference: instead of producing a shorter edge list (dynamic
shape), edges are *masked out* — shapes stay static and downstream kernels
ignore masked edges exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mask_feature(key, x, p: float):
    """Column-mode feature masking (torch_geometric.utils.mask_feature with
    mode='col'): each feature column kept with prob 1-p."""
    keep = jax.random.bernoulli(key, 1.0 - p, (x.shape[-1],))
    return jnp.where(keep[None, :], x, 0.0)


def _pair_hash_uniform(seed, a, b):
    """Deterministic per-undirected-pair uniform in [0, 1).

    Both directions of an edge hash identically (key = (min, max)), so a
    single Bernoulli draw drops or keeps the whole undirected pair — the
    ``force_undirected=True`` semantics — without any pair-matching pass.
    Uses a 32-bit finalizer-style integer mix; quality is ample for
    augmentation purposes.
    """
    lo = jnp.minimum(a, b).astype(jnp.uint32)
    hi = jnp.maximum(a, b).astype(jnp.uint32)
    h = lo * jnp.uint32(0x85EBCA6B) ^ hi * jnp.uint32(0xC2B2AE35)
    h = h ^ (seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    return h.astype(jnp.float32) / jnp.float32(4294967296.0)


def dropout_edges_undirected(key, senders, receivers, edge_mask, p: float):
    """Drop undirected edge pairs with probability p; returns a new edge mask.

    Matches dropout_adj(force_undirected=True): one coin per undirected pair.
    """
    seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max)
    u = _pair_hash_uniform(seed, senders, receivers)
    keep = u >= p
    return jnp.logical_and(edge_mask, keep)
