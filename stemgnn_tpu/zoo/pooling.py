"""Graph pooling / readout modules.

Re-design of the reference pooling surface: PyG global_{mean,add,max}_pool
(STEM-GNN/model/ft_model.py:61-69) plus the gp pooling transforms
(gp/nn/pooling.py) — here as masked segment reductions over padded disjoint
batches, with an attention readout as the learnable variant.
"""

from __future__ import annotations

import jax

from stemgnn_tpu.nn.layers import linear_apply, linear_init
from stemgnn_tpu.ops import segment


def global_pool(z, node_graph_id, n_graphs: int, mode: str = "mean",
                node_mask=None):
    fn = {"mean": segment.segment_mean, "sum": segment.segment_sum,
          "add": segment.segment_sum, "max": segment.segment_max}[mode]
    return fn(z, node_graph_id, n_graphs, mask=node_mask)


def attention_pool_init(key, dim: int):
    k1, k2 = jax.random.split(key)
    return {"gate": linear_init(k1, dim, 1),
            "proj": linear_init(k2, dim, dim)}


def attention_pool_apply(params, z, node_graph_id, n_graphs: int,
                         node_mask=None):
    """Gated attention readout: softmax(gate(z)) within each graph, weighted
    sum of proj(z)."""
    gate = linear_apply(params["gate"], z)[:, 0]
    att = segment.segment_softmax(gate, node_graph_id, n_graphs,
                                  mask=node_mask)
    h = linear_apply(params["proj"], z) * att[:, None]
    return segment.segment_sum(h, node_graph_id, n_graphs, mask=node_mask)
