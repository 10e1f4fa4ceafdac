"""Deterministic per-undirected-pair uniform hash.

One Bernoulli decision per undirected node pair, as a pure function of
(seed, min(a,b), max(a,b)) — the TPU-native form of the reference's
``dropout_adj(force_undirected=True)`` augmentation (STEM-GNN/
pretrain.py:41-45): both directions of an edge hash identically, so a
single draw drops or keeps the whole pair with no pair-matching pass, no
dynamic shapes, and — because the decision is a closed-form function of
the node ids — it can be evaluated on DENSE (node, hub) grids too, which
is what lets the hub-dense aggregation decomposition survive a per-step
random edge-dropout mask (ops/fused_sage.py ``drop_hash``): the masked
count matrices are ``cnt * (hash >= p)`` instead of a per-edge fallback.

Uses a 32-bit finalizer-style integer mix; quality is ample for
augmentation purposes.
"""

from __future__ import annotations

import jax.numpy as jnp


def pair_hash_uniform(seed, a, b):
    """Uniform in [0, 1) per (seed, unordered {a, b}) — broadcasts."""
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
