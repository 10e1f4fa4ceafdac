"""Multi-layer GNN stack with jumping knowledge + virtual node.

Re-design of ``MultiLayerMessagePassing`` / ``...VN``
(reference STEM-GNN/dataset/gp/nn/models/GNN.py:16-198): per layer conv ->
BatchNorm -> relu (except last) -> dropout; JK modes last / sum / mean / none
(list of layers); the virtual-node variant maintains a per-graph global node
whose embedding is mean-pooled back into every node between layers.

Conv choice: 'rgcn' / 'rgat' (zoo.convs_rel) or 'gine' (GIN with edge
features: sum_j relu(x_j + xe) through an MLP — PyGGINE semantics,
gp/nn/models/pyg.py:51).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from stemgnn_tpu.nn.layers import batchnorm_apply, batchnorm_init, dropout
from stemgnn_tpu.ops import segment
from stemgnn_tpu.zoo import convs_rel
from stemgnn_tpu.zoo.mlp import mlp_apply, mlp_init


def _conv_init(key, kind, in_dim, out_dim, num_relations, heads):
    if kind == "rgcn":
        return convs_rel.rgcn_edge_init(key, in_dim, out_dim, num_relations)
    if kind == "rgat":
        return convs_rel.rgat_edge_init(key, in_dim, out_dim, num_relations,
                                        heads=heads)
    if kind == "gine":
        # inner MLP without BatchNorm (the stack applies its own norm layer;
        # also keeps the conv params a pure-float tree for jax.grad)
        p, _ = mlp_init(key, [in_dim, 2 * in_dim, out_dim], batch_norm=False)
        return {"mlp": p, "eps": jnp.zeros(())}
    raise ValueError(kind)


def gnn_stack_init(key, kind: str, num_layers: int, dim: int,
                   num_relations: int = 1, heads: int = 8,
                   batch_norm: bool = True, virtual_node: bool = False):
    keys = jax.random.split(key, num_layers + 2)
    convs = [_conv_init(keys[i], kind, dim, dim, num_relations, heads)
             for i in range(num_layers)]
    norms_p, norms_s = [], []
    if batch_norm:
        for _ in range(num_layers):
            p, s = batchnorm_init(dim)
            norms_p.append(p)
            norms_s.append(s)
    params = {"convs": convs, "norms": norms_p}
    state = {"norms": norms_s}
    if virtual_node:
        vp, vs = mlp_init(keys[-1], [dim, 2 * dim, dim])
        params["vn_mlp"] = vp
        params["vn_embed"] = jnp.zeros((1, dim))
        state["vn_mlp"] = vs
    return params, state


def gnn_stack_apply(params, state, kind: str, x, xe, senders, receivers,
                    edge_type=None, edge_mask=None, node_mask=None,
                    node_graph_id=None, n_graphs: Optional[int] = None, *,
                    JK: str = "last", training: bool = False, rng=None,
                    drop: float = 0.0):
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if edge_type is None:
        edge_type = jnp.zeros_like(senders)
    num_layers = len(params["convs"])
    virtual = "vn_embed" in params
    if virtual:
        assert node_graph_id is not None and n_graphs is not None
        vn = jnp.tile(params["vn_embed"], (n_graphs, 1))
    h_list = []
    h = x
    new_norms = []
    for i in range(num_layers):
        rng, k_drop = jax.random.split(rng)
        if virtual:
            h = h + vn[node_graph_id]
        conv = params["convs"][i]
        if kind == "rgcn":
            h = convs_rel.rgcn_edge_apply(conv, h, xe, senders, receivers,
                                          edge_type, edge_mask=edge_mask)
        elif kind == "rgat":
            h = convs_rel.rgat_edge_apply(conv, h, xe, senders, receivers,
                                          edge_type, edge_mask=edge_mask)
        elif kind == "gine":
            msg = jax.nn.relu(jnp.take(h, senders, axis=0) + xe)
            agg = segment.segment_sum(msg, receivers, h.shape[0],
                                      mask=edge_mask)
            h, _ = mlp_apply(conv["mlp"], {"norms": []},
                             (1 + conv["eps"]) * h + agg, training=training)
        if params["norms"]:
            h, ns = batchnorm_apply(params["norms"][i], state["norms"][i], h,
                                    training=training, mask=node_mask)
            new_norms.append(ns)
        if i != num_layers - 1:
            h = jax.nn.relu(h)
        if drop > 0:
            h = dropout(k_drop, h, drop, training=training)
        if virtual and i != num_layers - 1:
            pooled = segment.segment_sum(h, node_graph_id, n_graphs,
                                         mask=node_mask)
            vn_in = vn + pooled
            vn, _ = mlp_apply(params["vn_mlp"], state["vn_mlp"], vn_in,
                              training=training)
        h_list.append(h)

    new_state = dict(state, norms=new_norms)
    if JK == "last":
        out = h_list[-1]
    elif JK == "sum":
        out = sum(h_list)
    elif JK == "mean":
        out = sum(h_list) / num_layers
    else:
        out = h_list
    return out, new_state
