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


def reorder_dataset(ds, method: str = "rcm", task: str = "node"):
    """Relabel the dataset's nodes for gather locality (ops/reorder.py RCM /
    degree ordering).  A pure permutation: ``x`` (text-row ids), edge
    endpoints, node labels and node split masks permute together, so every
    downstream metric is unchanged while the fused kernels' gather windows
    tighten on community-structured graphs.  Link-task labels/splits are
    per-EDGE and keep their slots.  The permutation is recorded in
    ``extras['node_perm']`` (new->old); cached host structures (underscore
    extras: CSC graphs, device tables, pad buckets) are dropped."""
    import dataclasses

    from stemgnn_tpu.ops.reorder import (community_order, degree_order,
                                         rcm_order, relabel)

    ei = np.asarray(ds.edge_index)
    if method == "rcm":
        perm = rcm_order(ei[0], ei[1], ds.num_nodes)
    elif method == "community":
        perm = community_order(ei[0], ei[1], ds.num_nodes)
    elif method == "degree":
        perm = degree_order(ei[0], ei[1], ds.num_nodes)
    else:
        raise ValueError(f"unknown reorder method {method!r}")
    s2, r2, (x2,) = relabel(perm, ei[0], ei[1], node_arrays=(ds.x,))
    kw = dict(x=x2, edge_index=np.stack([s2, r2]),
              extras={k: v for k, v in ds.extras.items()
                      if not k.startswith("_")})
    kw["extras"]["node_perm"] = perm
    if task == "node":
        if ds.labels is not None and len(ds.labels) == ds.num_nodes:
            kw["labels"] = np.asarray(ds.labels)[perm]
        if ds.splits is not None:
            kw["splits"] = [{k: np.asarray(v)[perm] for k, v in sp.items()}
                            for sp in ds.splits]
    return dataclasses.replace(ds, **kw)


def maybe_reorder_dataset(ds, cfg: FinetuneConfig, task: str):
    """Auto-locality: relabel via RCM when the windowed-gather break-even
    gate (ops.edge_layout._gwin_decide, per-chip profile) predicts the
    reordered graph unlocks the gather-free kernels — i.e. only when it
    will actually change the executed path (round-2 VERDICT item 2).
    Forced methods ("rcm"/"degree") skip the check."""
    mode = getattr(cfg, "reorder", "off")
    use_layout = (cfg.use_fused_layout
                  and jax.default_backend() == "tpu"
                  and cfg.encoder.backbone == "sage")
    if mode == "off" or not use_layout or task not in ("node", "link"):
        return ds
    if mode in ("rcm", "degree", "community"):
        return reorder_dataset(ds, mode, task)
    from stemgnn_tpu.ops.edge_layout import build_edge_layout
    d = int(ds.node_text_feat.shape[1])
    n_pad = round_up(ds.num_nodes, 128)
    for method in ("community", "rcm"):
        cand = reorder_dataset(ds, method, task)
        probe = build_edge_layout(
            np.asarray(cand.edge_index[0], np.int32),
            np.asarray(cand.edge_index[1], np.int32), n_pad,
            to_device=False, feat_dim_hint=d, loc_split="auto")
        if (probe.use_gwin_r or probe.use_gwin_s
                or probe.split_r is not None or probe.split_s is not None):
            why = ("whole-direction windows"
                   if probe.use_gwin_r or probe.use_gwin_s
                   else "local/stray split")
            print(f"[reorder] {method} relabel enables {why} on {ds.name} "
                  f"(gwin_w={probe.gwin_w})")
            return cand
    return ds


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
    t_rows = 1 if table is None else int(table.shape[0])
    # typed virtual hubs cover T <= 32 (ops.edge_layout HubDense.hub_xe)
    hub_size = cfg.hub_size if t_rows <= 32 else 0
    lay = build_edge_layout(s, r, graph.num_nodes_padded, xe_ids=xe,
                            edge_mask=mask, hub_size=hub_size,
                            sc_hub_size=getattr(cfg, "sc_hub_size", 0)
                            if (hub_size and t_rows <= 1) else 0,
                            loc_split="off" if getattr(cfg, "reorder", "off")
                            == "off" else "auto",
                            num_edge_types=t_rows,
                            feat_dim_hint=int(ds.node_text_feat.shape[1]))
    return graph.replace(layout=jax.device_put(lay),
                         edge_table=None if table is None
                         else jnp.asarray(table))
