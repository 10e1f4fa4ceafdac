"""Graph convolution layers (functional).

Re-designs of the reference's conv zoo (STEM-GNN/model/encoder.py):

  * ``sage``    — MySAGEConv (encoder.py:17-106): fused-message SAGE with
                  ``relu(x_j + xe)`` messages, mean aggregation, root weight.
  * ``moe_sage``— MixtureSageLayer (encoder.py:109-129): K-expert SAGE whose
                  neighbor aggregation follows the reference exactly —
                  ``scatter_mean(x[col], row)`` aggregates *receiver* features
                  at the *sender* (out-edge aggregation), no edge features, no
                  message relu.
  * ``gcn``/``gin``/``gat`` — parity backbones (encoder.py:191-200).  Note the
                  reference passes 768-dim ``edge_attr`` positionally into
                  PyG convs whose third argument is ``edge_weight``/``size``,
                  which would fail at runtime; here the non-sage backbones
                  accept and ignore ``edge_feat``, making them actually usable.

All layers operate on padded COO edge lists with validity masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stemgnn_tpu.nn import init as inits
from stemgnn_tpu.nn.layers import linear_init, linear_apply
from stemgnn_tpu.ops import segment
from stemgnn_tpu.ops.spmm import sage_aggregate, gather_scatter_aggregate


# ---------------------------------------------------------------- SAGE

def sage_init(key, in_dim: int, out_dim: int):
    k1, k2 = jax.random.split(key)
    return {
        # PyG Linear default initializer is glorot (reference encoder.py:58-60).
        "lin_l": linear_init(k1, in_dim, out_dim, bias=True, weight_init="glorot"),
        "lin_r": linear_init(k2, in_dim, out_dim, bias=False, weight_init="glorot"),
    }


def sage_apply(params, x, senders, receivers, edge_feat=None, edge_mask=None,
               layout=None, edge_table=None, shard_axis=None,
               bf16_messages: bool = True, dynamic_edge_mask: bool = False,
               drop_hash=None):
    """out = lin_l(mean_j relu(x_j + xe)) + lin_r(x)  (encoder.py:82-87)."""
    agg = sage_aggregate(x, senders, receivers, edge_feat=edge_feat,
                         edge_mask=edge_mask, num_nodes=x.shape[0],
                         reduce="mean", relu=True, layout=layout,
                         edge_table=edge_table, shard_axis=shard_axis,
                         bf16_messages=bf16_messages,
                         dynamic_edge_mask=dynamic_edge_mask,
                         drop_hash=drop_hash)
    return linear_apply(params["lin_l"], agg) + linear_apply(params["lin_r"], x)


# ---------------------------------------------------------------- MoE SAGE

def moe_sage_init(key, in_dim: int, out_dim: int, num_experts: int):
    w = inits.xavier_uniform(key, (num_experts, in_dim * 2, out_dim))
    return {"weights": w}


def moe_sage_apply(params, x, senders, receivers, edge_mask=None,
                   residual: bool = True):
    """Expert outputs [N, K, out] (encoder.py:122-129).

    Faithful to the reference's (reversed) aggregation direction:
    ``scatter_mean(x[col], row)`` — receiver features averaged at the sender.
    """
    agg = gather_scatter_aggregate(
        x, senders=receivers, receivers=senders, edge_feat=None,
        edge_mask=edge_mask, num_nodes=x.shape[0], reduce="mean", relu=False)
    combined = jnp.concatenate([agg, x], axis=-1)          # [N, 2*in]
    out = jnp.einsum("nd,kdo->nko", combined,
                     params["weights"].astype(combined.dtype))
    if residual and x.shape[-1] == out.shape[-1]:
        out = out + x[:, None, :]
    return out


# ---------------------------------------------------------------- GCN

def gcn_init(key, in_dim: int, out_dim: int):
    k1, k2 = jax.random.split(key)
    return {"lin": linear_init(k1, in_dim, out_dim, bias=False, weight_init="glorot"),
            "bias": jnp.zeros((out_dim,))}


def gcn_apply(params, x, senders, receivers, edge_mask=None, node_mask=None):
    """Symmetric-normalized GCN with implicit self-loops on valid nodes."""
    n = x.shape[0]
    h = linear_apply(params["lin"], x)
    ones = edge_mask.astype(h.dtype) if edge_mask is not None else jnp.ones_like(senders, h.dtype)
    deg = jax.ops.segment_sum(ones, receivers, num_segments=n) + 1.0  # +1 self-loop
    inv_sqrt = jax.lax.rsqrt(deg)
    w = inv_sqrt[senders] * inv_sqrt[receivers]
    if edge_mask is not None:
        w = jnp.where(edge_mask, w, 0.0)
    msg = jnp.take(h, senders, axis=0) * w[:, None]
    out = jax.ops.segment_sum(msg, receivers, num_segments=n)
    out = out + h * (inv_sqrt ** 2)[:, None]               # self-loop term
    return out + params["bias"]


# ---------------------------------------------------------------- GIN

def gin_init(key, in_dim: int, out_dim: int):
    # Reference uses GINConv(nn.Linear(in, out)) (encoder.py:199).
    return {"lin": linear_init(key, in_dim, out_dim, bias=True, weight_init="torch"),
            "eps": jnp.zeros(())}


def gin_apply(params, x, senders, receivers, edge_mask=None):
    agg = segment.segment_sum(jnp.take(x, senders, axis=0), receivers,
                              x.shape[0], mask=edge_mask)
    return linear_apply(params["lin"], (1.0 + params["eps"]) * x + agg)


# ---------------------------------------------------------------- GAT (1 head)

def gat_init(key, in_dim: int, out_dim: int):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "lin": linear_init(k1, in_dim, out_dim, bias=False, weight_init="glorot"),
        "att_src": inits.glorot_uniform(k2, (out_dim, 1)).reshape(out_dim),
        "att_dst": inits.glorot_uniform(k3, (out_dim, 1)).reshape(out_dim),
        "bias": jnp.zeros((out_dim,)),
    }


def gat_apply(params, x, senders, receivers, edge_mask=None,
              negative_slope: float = 0.2):
    n = x.shape[0]
    h = linear_apply(params["lin"], x)
    alpha_src = h @ params["att_src"]
    alpha_dst = h @ params["att_dst"]
    e = alpha_src[senders] + alpha_dst[receivers]
    e = jax.nn.leaky_relu(e, negative_slope)
    att = segment.segment_softmax(e, receivers, n, mask=edge_mask)
    msg = jnp.take(h, senders, axis=0) * att[:, None]
    out = segment.segment_sum(msg, receivers, n, mask=edge_mask)
    return out + params["bias"]
