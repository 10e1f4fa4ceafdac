"""Self-supervised / ranking losses (reference
STEM-GNN/dataset/gp/nn/loss.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def info_nce_loss(mi_mat):
    """InfoNCE over an [N, N] mutual-information matrix: diagonal entries are
    positives, off-diagonal the negatives (gp/nn/loss.py:7-20)."""
    n = mi_mat.shape[0]
    pos = jnp.diagonal(mi_mat)
    mask = ~jnp.eye(n, dtype=bool)
    neg_logsum = jax.nn.logsumexp(jnp.where(mask, mi_mat, -jnp.inf), axis=-1)
    return -jnp.mean(pos - neg_logsum)


def cca_loss(h1, h2, lam: float = 1e-3):
    """CCA-SSG-style loss: invariance term + decorrelation penalty.

    The reference's ``CCALoss`` (gp/nn/loss.py:23-87) computes classic deep
    CCA via eigendecomposition; the widely-used CCA-SSG formulation below is
    the numerically-stable equivalent objective for SSL embeddings.
    """
    n = h1.shape[0]
    z1 = (h1 - h1.mean(0)) / (h1.std(0) + 1e-6)
    z2 = (h2 - h2.mean(0)) / (h2.std(0) + 1e-6)
    c1 = (z1.T @ z1) / n
    c2 = (z2.T @ z2) / n
    inv = jnp.mean((z1 - z2) ** 2)
    eye = jnp.eye(h1.shape[1])
    dec = jnp.sum((c1 - eye) ** 2) + jnp.sum((c2 - eye) ** 2)
    return inv + lam * dec


def mrr(scores, target_index):
    """Mean reciprocal rank: ``scores`` [B, C], ``target_index`` [B]."""
    target = jnp.take_along_axis(scores, target_index[:, None], axis=1)
    rank = 1.0 + jnp.sum(scores > target, axis=1)
    return jnp.mean(1.0 / rank)
