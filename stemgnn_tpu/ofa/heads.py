"""OFA prompted-graph prediction heads.

Re-designs of ``BinGraphModel`` / ``BinGraphAttModel``
(STEM-GNN/dataset/models/model.py:72-163) and ``SingleHeadAtt`` (:55-70):
shared input projection for node and edge text features, a relational GNN
stack over the prompted graph, and a binary MLP scoring every class node —
optionally pooling the per-layer embeddings with single-head attention whose
query is the projected input feature (the "Att" variant).

Optional random-walk positional encodings (``AddRandomWalkPE`` + frozen
edge prior, model.py:79-87,104-110) are concatenated after a BatchNorm that
the reference runs under ``no_grad``; here PE normalization uses the running
stats carried in state (equivalent under jit: no gradient flows into the
statistics either way).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stemgnn_tpu.nn import init as inits
from stemgnn_tpu.nn.layers import (batchnorm_apply, batchnorm_init,
                                   linear_apply, linear_init)
from stemgnn_tpu.zoo.mlp import mlp_apply, mlp_init
from stemgnn_tpu.zoo.stack import gnn_stack_apply, gnn_stack_init


def random_walk_pe(senders, receivers, num_nodes: int, walk_length: int,
                   edge_mask=None) -> np.ndarray:
    """Landing-probability diagonals of the random walk, host-side numpy
    (the analog of ``scipy_rwpe``, STEM-GNN/dataset/data_utils.py:243-261):
    pe[v, k] = P^k[v, v] for k = 1..walk_length, with P the row-normalized
    adjacency.  Dense [N, N] propagation — prompted subgraphs are small
    (hop-capped at 100/hop, SURVEY.md §5)."""
    s = np.asarray(senders, np.int64)
    r = np.asarray(receivers, np.int64)
    if edge_mask is not None:
        keep = np.asarray(edge_mask, bool)
        s, r = s[keep], r[keep]
    a = np.zeros((num_nodes, num_nodes), np.float64)
    np.add.at(a, (s, r), 1.0)
    deg = a.sum(1, keepdims=True)
    p = np.divide(a, deg, out=np.zeros_like(a), where=deg > 0)
    out = np.zeros((num_nodes, walk_length), np.float32)
    m = p
    for k in range(walk_length):
        out[:, k] = np.diag(m)
        if k + 1 < walk_length:
            m = m @ p
    return out


def single_head_att_init(key, dim: int):
    k1, k2 = jax.random.split(key)
    return {"Wk": inits.xavier_uniform(k1, (dim, dim)),
            "Wq": inits.xavier_uniform(k2, (dim, dim))}


def single_head_att(params, key, query, value):
    """softmax(q kᵀ / sqrt(d)) v over the middle axis (model.py:55-70).
    key/value [N, L, D], query [N, 1, D] -> context [N, 1, D]."""
    d = key.shape[-1]
    score = jnp.einsum("nqd,nld->nql", query @ params["Wq"],
                       key @ params["Wk"]) / jnp.sqrt(jnp.asarray(d, key.dtype))
    attn = jax.nn.softmax(score, axis=-1)
    return jnp.einsum("nql,nld->nqd", attn, value)


def bin_graph_init(key, kind: str, num_layers: int, in_dim: int, out_dim: int,
                   task_dim: int = 1, num_relations: int = 1,
                   att_pool: bool = False, walk_length: Optional[int] = None,
                   dropout: float = 0.0):
    """Params/state for the bin-graph head.  ``att_pool=True`` is the
    BinGraphAttModel variant; ``walk_length`` enables RWPE concat."""
    keys = jax.random.split(key, 5)
    d_stack = out_dim + (walk_length or 0)
    enc_p, enc_s = gnn_stack_init(keys[0], kind, num_layers, d_stack,
                                  num_relations=num_relations)
    params = {
        "in_proj": linear_init(keys[1], in_dim, out_dim),
        "enc": enc_p,
        "mlp": mlp_init(keys[2], [d_stack, 2 * out_dim, out_dim, task_dim],
                        batch_norm=False)[0],
    }
    state = {"enc": enc_s, "mlp": {"norms": []}}
    if att_pool:
        params["att"] = single_head_att_init(keys[3], d_stack)
    if walk_length:
        params["edge_rwpe_prior"] = inits.xavier_uniform(
            keys[4], (1, walk_length))
        bp, bs = batchnorm_init(walk_length)
        params["rwpe_norm"] = bp
        state["rwpe_norm"] = bs
    return params, state


def bin_graph_apply(params, state, kind: str, g, aux, *,
                    training: bool = False, rng=None, dropout: float = 0.0,
                    rwpe=None):
    """Score class nodes of a collated prompted batch.

    ``g``: padded Graph; ``aux``: collate dict with ``true_nodes_mask``.
    Returns (scores [N] with -inf off class nodes, new_state).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    x = linear_apply(params["in_proj"], g.node_feat)
    xe = linear_apply(params["in_proj"], g.edge_feat)
    new_state = dict(state)
    if rwpe is not None:
        pe, ns = batchnorm_apply(params["rwpe_norm"], state["rwpe_norm"],
                                 jax.lax.stop_gradient(rwpe),
                                 training=training, mask=g.node_mask)
        new_state["rwpe_norm"] = ns
        x = jnp.concatenate([x, jax.lax.stop_gradient(pe)], axis=-1)
        xe = jnp.concatenate(
            [xe, jnp.tile(params["edge_rwpe_prior"], (xe.shape[0], 1))],
            axis=-1)
    h, enc_s = gnn_stack_apply(
        params["enc"], state["enc"], kind, x, xe, g.senders, g.receivers,
        edge_mask=g.edge_mask, node_mask=g.node_mask, JK="list",
        training=training, rng=rng, drop=dropout)
    new_state["enc"] = enc_s
    if "att" in params:
        emb = jnp.stack(h, axis=1)                        # [N, L, D]
        pooled = single_head_att(params["att"], emb, x[:, None, :], emb)
        z = pooled[:, 0]
    else:
        z = h[-1]
    logit, _ = mlp_apply(params["mlp"], {"norms": []}, z, training=training,
                         rng=rng)
    true_mask = jnp.asarray(aux["true_nodes_mask"])
    return jnp.where(true_mask, logit[:, 0], -jnp.inf), new_state
