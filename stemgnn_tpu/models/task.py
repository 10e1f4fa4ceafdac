"""Finetune task head.

Functional re-design of ``TaskModel`` (STEM-GNN/model/ft_model.py:23-107):
frozen(ish) encoder + VQ backbone with a small linear decoder —

  * ``separate_decoder_for_each_head``: Linear(code_dim*H -> C*H) over the
    pre-project_out codes, reshaped to [N, H, C] (ft_model.py:40-43,93-94),
  * otherwise Linear(code_dim -> C)... note the reference actually decodes the
    *post-project_out* ``quantize`` in that branch (ft_model.py:96), so the
    decoder input dim is the model dim; mirrored here,
  * ``use_vq=0`` bypass decodes ``vq.project_in(z)`` (ft_model.py:98-103),
  * decoder Jacobian penalty = coeff * ||W||_F^2 (ft_model.py:45-50),
  * multitask masked BCE for chem labels (ft_model.py:7-20) with y in
    {-1, 0(NaN), +1} encoding,
  * graph-level pooling mean/sum/max (ft_model.py:61-69).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from stemgnn_tpu.core.config import FinetuneConfig
from stemgnn_tpu.core.graph import Graph
from stemgnn_tpu.nn.encoder import encoder_apply, encoder_init
from stemgnn_tpu.nn.layers import linear_apply, linear_init
from stemgnn_tpu.ops import segment
from stemgnn_tpu.vq import vq_apply, vq_init, vq_kmeans_init


def task_model_init(key, cfg: FinetuneConfig, encoder_params=None,
                    vq_params=None, encoder_state=None, vq_state=None):
    """Build task-model params, optionally wrapping pretrained encoder/VQ
    (finetune.py:200-205 deep-copies them per split)."""
    k_enc, k_vq, k_dec = jax.random.split(key, 3)
    if encoder_params is None:
        encoder_params, encoder_state = encoder_init(k_enc, cfg.encoder)
    if vq_params is None:
        vq_params, vq_state = vq_init(k_vq, cfg.vq)
    h = cfg.vq.num_codebooks
    if cfg.separate_decoder_for_each_head:
        dec = linear_init(k_dec, cfg.vq.codebook_dim * h,
                          cfg.num_classes * h)
    else:
        dec = linear_init(k_dec, cfg.vq.dim, cfg.num_classes)
    params = {"encoder": encoder_params, "vq": vq_params, "decoder": dec}
    state = {"encoder": encoder_state, "vq": vq_state}
    return params, state


def encode(params, state, cfg: FinetuneConfig, g: Graph, *, training: bool,
           rng=None, layout=None, edge_table=None,
                  axis_name: Optional[str] = None):
    """Encoder forward on a padded graph; returns (z, new_state, aux).
    A layout/edge_table attached to the graph (core.graph.Graph) is picked
    up automatically unless overridden."""
    z, enc_state, aux = encoder_apply(
        params["encoder"], state["encoder"], cfg.encoder,
        g.node_feat, g.senders, g.receivers, edge_feat=g.edge_feat,
        edge_mask=g.edge_mask, node_mask=g.node_mask, training=training,
        rng=rng, layout=layout if layout is not None else g.layout,
        edge_table=edge_table if edge_table is not None else g.edge_table,
        axis_name=axis_name)
    return z, dict(state, encoder=enc_state), aux


def maybe_kmeans_init_vq(params, state, cfg: FinetuneConfig, g: Graph,
                         rng=None):
    """k-means-init the VQ codebook from the first batch when configured and
    not yet initted — the analog of the reference's lazy init-on-first-forward
    (vq.py:646, triggered via utils/others.py:168-170's dummy forward).
    Host-side gate: call once before training."""
    if not cfg.use_vq or bool(state["vq"]["initted"]):
        return params, state
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    z, _, _ = encoder_apply(
        params["encoder"], state["encoder"], cfg.encoder,
        g.node_feat, g.senders, g.receivers, edge_feat=g.edge_feat,
        edge_mask=g.edge_mask, node_mask=g.node_mask, training=False,
        layout=g.layout, edge_table=g.edge_table)
    vq_params, vq_state = vq_kmeans_init(rng, params["vq"], state["vq"],
                                         cfg.vq, z, mask=g.node_mask)
    return dict(params, vq=vq_params), dict(state, vq=vq_state)


def pool_graph(z, g: Graph, pool: str = "mean",
               num_segments: Optional[int] = None):
    """Graph-level readout over the disjoint batch (ft_model.py:61-69).
    Returns [num_segments, D]; padding nodes carry an out-of-range graph id
    and are additionally excluded by the node mask."""
    assert g.node_graph_id is not None, "graph pooling needs node_graph_id"
    if num_segments is None:
        # Safe static upper bound: one graph per node.
        num_segments = int(g.node_graph_id.shape[0])
    fn = {"mean": segment.segment_mean, "sum": segment.segment_sum,
          "max": segment.segment_max}[pool]
    return fn(z, g.node_graph_id, num_segments, mask=g.node_mask)


def task_logits(params, state, cfg: FinetuneConfig, z, *, training: bool,
                rng=None, mask=None, axis_name=None):
    """get_lin_logits (ft_model.py:90-103) -> ([N, H or 1, C], commit_loss,
    new_state).

    ``axis_name``: mesh axis/axes the node dimension is sharded over —
    VQ EMA stats psum across it and the commitment loss becomes a global
    masked mean (the reference's codebook all_reduce, vq.py:666-682);
    required for unfrozen-VQ training under a node-sharded (halo) layout.
    """
    h = cfg.vq.num_codebooks
    n = z.shape[0]
    if cfg.use_vq:
        res = vq_apply(params["vq"], state["vq"], cfg.vq, z,
                       training=training, rng=rng, mask=mask,
                       freeze_codebook=cfg.freeze_vq,
                       axis_name=axis_name, commit_psum_axis=axis_name)
        if cfg.separate_decoder_for_each_head:
            pred = linear_apply(params["decoder"], res["codes"])
            pred = pred.reshape(n, h, cfg.num_classes)
        else:
            pred = linear_apply(params["decoder"], res["quantize"])
            pred = pred.reshape(n, 1, cfg.num_classes)
        return pred, res["loss"], dict(state, vq=res["state"])
    if cfg.separate_decoder_for_each_head:
        codes = linear_apply(params["vq"]["project_in"], z) \
            if cfg.vq.requires_projection else z
        pred = linear_apply(params["decoder"], codes).reshape(
            n, h, cfg.num_classes)
    else:
        pred = linear_apply(params["decoder"], z).reshape(
            n, 1, cfg.num_classes)
    return pred, jnp.zeros(()), state


def decoder_jacobian_penalty(params, cfg: FinetuneConfig):
    """coeff * ||W||_F^2 (ft_model.py:45-50)."""
    if cfg.decoder_jac_coeff <= 0:
        return jnp.zeros(())
    return cfg.decoder_jac_coeff * jnp.sum(params["decoder"]["w"] ** 2)


def multitask_bce(pred, y, valid):
    """Masked multitask BCE (ft_model.py:7-20).

    ``y`` in {-1, +1} on valid entries; ``valid`` marks present labels (the
    reference encodes NaN labels as 0 and remaps 0 -> -1 before validity).
    Sum of per-element BCE over valid entries / count of valid entries.
    """
    target = (y + 1.0) / 2.0
    per = jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    per = jnp.where(valid, per, 0.0)
    return jnp.sum(per) / jnp.maximum(jnp.sum(valid), 1.0)


def activation_loss(logits, y, task: str = "single", mask=None, valid=None):
    """compute_activation_loss (ft_model.py:82-88): head-mean logits -> CE or
    multitask BCE.  ``mask`` [N] selects contributing rows (padded/unsplit
    rows excluded)."""
    mean_logits = jnp.mean(logits, axis=1)
    if task == "single":
        logp = jax.nn.log_softmax(mean_logits, axis=-1)
        nll = -jnp.take_along_axis(logp, y[:, None].astype(jnp.int32),
                                   axis=-1)[:, 0]
        if mask is not None:
            return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return jnp.mean(nll)
    if task == "multi":
        if valid is None:
            valid = jnp.ones_like(mean_logits, bool)
        if mask is not None:
            valid = jnp.logical_and(valid, mask[:, None])
        return multitask_bce(mean_logits, y, valid)
    raise ValueError('task must be "single" or "multi"')
