"""Full-batch graph construction with the fused-aggregation layout.

On TPU with the sage backbone, full-batch training/eval graphs carry a
precomputed EdgeLayout (+ the small per-edge-type feature table) so the
encoder runs the fused Pallas scatter / hub-dense aggregation
(ops/edge_layout.py) — per-edge [E_pad, D] features are never materialized
(at arxiv scale that alone is ~7 GB of HBM).  Elsewhere the plain padded
graph with materialized edge features is returned.
"""

from __future__ import annotations

import jax
import numpy as np

from stemgnn_tpu.core.config import FinetuneConfig
from stemgnn_tpu.core.graph import round_up


def fused_full_graph(ds, cfg: FinetuneConfig):
    """Padded full graph for ``ds``, with layout attached when the fused
    path applies (cfg.use_fused_layout, TPU backend, sage backbone)."""
    use_layout = (cfg.use_fused_layout
                  and jax.default_backend() == "tpu"
                  and cfg.encoder.backbone == "sage")
    if not use_layout:
        return ds.to_graph()
    import jax.numpy as jnp
    from stemgnn_tpu.ops.edge_layout import build_edge_layout
    graph = ds.to_graph(node_pad_to=round_up(ds.num_nodes, 128),
                        with_edge_feat=False)
    # build from HOST arrays (mirroring make_graph's edge padding) — a
    # np.asarray on the device graph would be a blocking D2H sync point
    e, e_pad = ds.num_edges, graph.num_edges_padded
    s = np.zeros(e_pad, np.int32)
    r = np.zeros(e_pad, np.int32)
    s[:e] = np.asarray(ds.edge_index[0], np.int32)
    r[:e] = np.asarray(ds.edge_index[1], np.int32)
    mask = np.arange(e_pad) < e
    xe = None
    if ds.xe is not None:
        xe = np.zeros(e_pad, np.int32)
        xe[:e] = np.asarray(ds.xe, np.int32)[:e]
    table = None if ds.edge_text_feat is None \
        else np.asarray(ds.edge_text_feat)
    hub_size = cfg.hub_size if (table is None or table.shape[0] <= 1) else 0
    lay = build_edge_layout(s, r, graph.num_nodes_padded, xe_ids=xe,
                            edge_mask=mask, hub_size=hub_size)
    return graph.replace(layout=jax.device_put(lay),
                         edge_table=None if table is None
                         else jnp.asarray(table))
