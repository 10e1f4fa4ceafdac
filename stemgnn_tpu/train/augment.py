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


from stemgnn_tpu.ops.pairhash import pair_hash_uniform as _pair_hash_uniform


def dropout_edge_seed(key):
    """The int32 seed feeding the per-pair hash — shared between the
    materialized-mask path below and the fused kernels' dense-mask
    ``drop_hash`` path (ops/fused_sage.py) so both produce IDENTICAL
    per-pair decisions for the same rng key."""
    return jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max)


def dropout_edges_undirected_seeded(seed, senders, receivers, edge_mask,
                                    p: float):
    """Materialized keep mask from an explicit seed (see dropout_edge_seed)."""
    u = _pair_hash_uniform(seed, senders, receivers)
    return jnp.logical_and(edge_mask, u >= p)


def dropout_edges_undirected(key, senders, receivers, edge_mask, p: float):
    """Drop undirected edge pairs with probability p; returns a new edge mask.

    Matches dropout_adj(force_undirected=True): one coin per undirected pair.
    """
    return dropout_edges_undirected_seeded(dropout_edge_seed(key), senders,
                                           receivers, edge_mask, p)
