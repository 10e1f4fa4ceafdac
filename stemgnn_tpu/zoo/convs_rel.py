"""Relational graph convolutions (RGCN / RGAT with edge features).

Re-designs of ``RGCNEdgeConv`` / ``RGATEdgeConv``
(reference STEM-GNN/dataset/gp/nn/layer/pyg.py:16-159) — the OFA heritage
convs used by ``PyGRGCNEdge``:

  * RGCN: per-relation mean-aggregation of ``relu(x_j + xe)`` messages, then
    the relation weight applied to the aggregate, plus a root weight + bias.
  * RGAT: multi-head attention per relation — attention logits
    ``<leaky_relu(x_j + xe), att_r>`` softmax-normalized over each
    destination's incoming edges *within the relation*, messages
    ``(x_j + xe) * alpha``.

TPU-first: instead of the reference's per-relation Python loop over masked
edge subsets, relations are handled with one pass using segment softmax keyed
by (relation, destination) and a per-edge relation gather of weights — no
dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stemgnn_tpu.nn import init as inits
from stemgnn_tpu.nn.layers import linear_apply, linear_init
from stemgnn_tpu.ops import segment


def rgcn_edge_init(key, in_dim: int, out_dim: int, num_relations: int):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "weight": inits.glorot_uniform(k1, (num_relations, in_dim, out_dim)),
        "root": inits.glorot_uniform(k2, (in_dim, out_dim)),
        "bias": jnp.zeros((out_dim,)),
    }


def rgcn_edge_apply(params, x, xe, senders, receivers, edge_type,
                    edge_mask=None, aggr: str = "mean"):
    """out = sum_r mean_{(j,i) in E_r} relu(x_j + xe) @ W_r + x @ root + b."""
    n = x.shape[0]
    num_rel = params["weight"].shape[0]
    msg = jax.nn.relu(jnp.take(x, senders, axis=0) + xe)
    # segment key (relation, receiver) keeps per-relation aggregation separate
    seg = edge_type * n + receivers
    fn = segment.segment_mean if aggr == "mean" else segment.segment_sum
    per_rel = fn(msg, seg, num_rel * n, mask=edge_mask)     # [R*N, in]
    per_rel = per_rel.reshape(num_rel, n, -1)
    out = jnp.einsum("rni,rio->no", per_rel, params["weight"])
    return out + x @ params["root"] + params["bias"]


def rgat_edge_init(key, in_dim: int, out_dim: int, num_relations: int,
                   heads: int = 8, share_att: bool = False):
    assert in_dim % heads == 0
    k1, k2, k3, k4 = jax.random.split(key, 4)
    d_model = in_dim // heads
    return {
        "weight": inits.glorot_uniform(k1, (num_relations, in_dim, out_dim)),
        "root": inits.glorot_uniform(k2, (in_dim, out_dim)),
        "bias": jnp.zeros((out_dim,)),
        "lin_edge": linear_init(k3, in_dim, in_dim),
        "att": inits.glorot_uniform(
            k4, (1 if share_att else num_relations, heads * d_model)
        ).reshape(1 if share_att else num_relations, heads, d_model),
    }


def rgat_edge_apply(params, x, xe, senders, receivers, edge_type,
                    edge_mask=None, negative_slope: float = 0.2):
    n, in_dim = x.shape
    num_rel = params["weight"].shape[0]
    heads, d_model = params["att"].shape[1:]
    x_h = jnp.take(x, senders, axis=0).reshape(-1, heads, d_model)
    xe_h = linear_apply(params["lin_edge"], xe).reshape(-1, heads, d_model)
    pre = x_h + xe_h                                         # [E, H, dm]
    att = params["att"]
    att_e = att[0] if att.shape[0] == 1 else att[edge_type]  # [E, H, dm]
    alpha = jnp.sum(jax.nn.leaky_relu(pre, negative_slope) * att_e, axis=-1)
    seg = edge_type * n + receivers
    alpha = segment.segment_softmax(alpha, seg, num_rel * n, mask=edge_mask)
    msg = (pre * alpha[..., None]).reshape(-1, in_dim)
    per_rel = segment.segment_sum(msg, seg, num_rel * n, mask=edge_mask)
    per_rel = per_rel.reshape(num_rel, n, in_dim)
    out = jnp.einsum("rni,rio->no", per_rel, params["weight"])
    return out + x @ params["root"] + params["bias"]
