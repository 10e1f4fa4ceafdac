"""Task predictor wrappers (reference
STEM-GNN/dataset/gp/nn/models/task_predictor.py:32-140): encoder + readout
heads for graph / link / node prediction over zoo GNN stacks."""

from __future__ import annotations

import jax

from stemgnn_tpu.ops import segment
from stemgnn_tpu.zoo.mlp import mlp_apply, mlp_init
from stemgnn_tpu.zoo.stack import gnn_stack_apply, gnn_stack_init


def graph_predictor_init(key, kind: str, num_layers: int, dim: int,
                         out_dim: int, num_relations: int = 1,
                         virtual_node: bool = False):
    k1, k2 = jax.random.split(key)
    enc_p, enc_s = gnn_stack_init(k1, kind, num_layers, dim,
                                  num_relations=num_relations,
                                  virtual_node=virtual_node)
    head_p, head_s = mlp_init(k2, [dim, 2 * dim, out_dim])
    return {"encoder": enc_p, "head": head_p}, \
        {"encoder": enc_s, "head": head_s}


def graph_predictor_apply(params, state, kind, x, xe, senders, receivers,
                          node_graph_id, n_graphs: int, edge_type=None,
                          edge_mask=None, node_mask=None, pool: str = "mean",
                          training: bool = False, rng=None):
    z, enc_s = gnn_stack_apply(params["encoder"], state["encoder"], kind, x,
                               xe, senders, receivers, edge_type=edge_type,
                               edge_mask=edge_mask, node_mask=node_mask,
                               node_graph_id=node_graph_id,
                               n_graphs=n_graphs, training=training, rng=rng)
    fn = {"mean": segment.segment_mean, "sum": segment.segment_sum,
          "max": segment.segment_max}[pool]
    pooled = fn(z, node_graph_id, n_graphs, mask=node_mask)
    out, head_s = mlp_apply(params["head"], state["head"], pooled,
                            training=training, rng=rng)
    return out, {"encoder": enc_s, "head": head_s}


def link_predictor_apply(params, state, kind, x, xe, senders, receivers,
                         query_src, query_dst, edge_type=None,
                         edge_mask=None, training: bool = False, rng=None):
    """Scores node pairs by elementwise product of endpoint embeddings
    through the head MLP (task_predictor.py link path)."""
    z, enc_s = gnn_stack_apply(params["encoder"], state["encoder"], kind, x,
                               xe, senders, receivers, edge_type=edge_type,
                               edge_mask=edge_mask, training=training,
                               rng=rng)
    pair = z[query_src] * z[query_dst]
    out, head_s = mlp_apply(params["head"], state["head"], pair,
                            training=training, rng=rng)
    return out, {"encoder": enc_s, "head": head_s}


def node_predictor_apply(params, state, kind, x, xe, senders, receivers,
                         edge_type=None, edge_mask=None, node_mask=None,
                         training: bool = False, rng=None):
    z, enc_s = gnn_stack_apply(params["encoder"], state["encoder"], kind, x,
                               xe, senders, receivers, edge_type=edge_type,
                               edge_mask=edge_mask, node_mask=node_mask,
                               training=training, rng=rng)
    out, head_s = mlp_apply(params["head"], state["head"], z,
                            training=training, rng=rng)
    return out, {"encoder": enc_s, "head": head_s}
