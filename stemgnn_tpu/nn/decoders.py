"""Decoders: inner-product edge decoder + linear reconstruction heads.

Re-designs of ``InnerProductDecoder`` (STEM-GNN/model/encoder.py:336-380) and
the pretrain decoders (feat: Linear(hidden, input), topo_sem:
Linear(2*hidden, hidden) — STEM-GNN/pretrain.py:121-123).
"""

from __future__ import annotations

import jax

from stemgnn_tpu.nn.layers import linear_apply, linear_init
from stemgnn_tpu.ops.sddmm import edge_inner_product


def inner_product_decoder_init(key, hidden_dim=None, output_dim=None):
    """Optional projection before the inner product (encoder.py:346-351)."""
    if hidden_dim is None:
        return {}
    return {"lin": linear_init(key, hidden_dim, output_dim, bias=True,
                               weight_init="torch")}


def inner_product_decode(params, z, senders, receivers, edge_mask=None,
                         sigmoid: bool = True):
    """sigma(z_u . z_v) per queried node pair (encoder.py:353-366)."""
    if "lin" in params:
        z = linear_apply(params["lin"], z)
    return edge_inner_product(z, senders, receivers, edge_mask=edge_mask,
                              sigmoid=sigmoid)


def inner_product_decode_all(params, z, sigmoid: bool = True):
    """Dense N x N decode (encoder.py:368-380)."""
    if "lin" in params:
        z = linear_apply(params["lin"], z)
    adj = z @ z.T
    return jax.nn.sigmoid(adj) if sigmoid else adj
