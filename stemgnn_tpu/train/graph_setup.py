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
    from stemgnn_tpu.ops.edge_layout import attach_layout
    graph = ds.to_graph(node_pad_to=round_up(ds.num_nodes, 128),
                        with_edge_feat=False)
    return attach_layout(
        graph, xe_ids=None if ds.xe is None else np.asarray(ds.xe),
        edge_table=None if ds.edge_text_feat is None
        else np.asarray(ds.edge_text_feat),
        hub_size=cfg.hub_size)
