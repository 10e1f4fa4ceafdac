"""SDDMM-style per-edge scores.

The reference's ``InnerProductDecoder.forward`` computes
``sigma((z[u] * z[v]).sum(-1))`` per edge (STEM-GNN/model/encoder.py:353-366).
That sampled-dense-dense product is the only other sparse op in the model; the
same primitive drives the topology-reconstruction loss
(STEM-GNN/model/pt_model.py:62-63).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def edge_inner_product(z, senders, receivers, edge_mask=None,
                       sigmoid: bool = True):
    """Per-edge inner product ``z[u] . z[v]`` with optional sigmoid.

    Padded edges (mask False) return exactly 0.5 under sigmoid / 0.0 raw, and
    callers mask them out of any loss.
    """
    score = jnp.sum(jnp.take(z, senders, axis=0) *
                    jnp.take(z, receivers, axis=0), axis=-1)
    if sigmoid:
        score = jax.nn.sigmoid(score)
    if edge_mask is not None:
        score = jnp.where(edge_mask, score, 0.5 if sigmoid else 0.0)
    return score
