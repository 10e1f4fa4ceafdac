"""Pretraining objective assembly.

Functional re-design of ``PretrainModel`` (STEM-GNN/model/pt_model.py:11-142):
encoder -> VQ -> four reconstruction losses + EMA teacher:

  * feat_recon  — MSE of a linear decode of the quantized codes vs the
                  original features on the first ``bs`` seed nodes (42-43),
  * topo_recon  — pos/neg log-loss of an inner-product edge decoder with
                  negative sampling and an edge-subsample ratio (46-65),
  * topo_sem    — MSE of edge-feature reconstruction from cat[z_u, z_v]
                  (68-83),
  * sem_recon   — cosine alignment of a projection of the quantized codes to a
                  *detached EMA-teacher* encoding of the clean graph (86-102),
  * plus the VQ commitment/orthogonal loss and MoE env regularizer.

Teacher params are held outside the optimizer and advanced by
:func:`ema_update_teacher` (decay 0.99, pt_model.py:104-106); the reference's
teacher receives no gradients either (sem_recon detaches the teacher output).

Seed-node convention: padded batches are ordered seed-nodes-first, so the
reference's ``[:bs]`` loss slicing (pt_model.py:43,96) carries over with a
static slice.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from stemgnn_tpu.core.config import PretrainConfig
from stemgnn_tpu.core.graph import Graph
from stemgnn_tpu.nn.decoders import inner_product_decode, inner_product_decoder_init
from stemgnn_tpu.nn.encoder import encoder_apply, encoder_init
from stemgnn_tpu.nn.layers import linear_apply, linear_init
from stemgnn_tpu.vq import vq_apply, vq_init

EPS = 1e-15


def pretrain_init(key, cfg: PretrainConfig):
    """Returns (params, teacher_params, state)."""
    ks = jax.random.split(key, 6)
    enc_params, enc_state = encoder_init(ks[0], cfg.encoder)
    vq_params, vq_state = vq_init(ks[1], cfg.vq)
    h, d_in = cfg.encoder.hidden_dim, cfg.encoder.input_dim
    params = {
        "encoder": enc_params,
        "vq": vq_params,
        "feat_dec": linear_init(ks[2], h, d_in),
        "topo_dec": inner_product_decoder_init(ks[3], h, h),
        "topo_sem_dec": linear_init(ks[4], 2 * h, h),
        "sem_projector": linear_init(ks[5], h, h),
    }
    # Teacher starts as an exact copy (deepcopy, pt_model.py:22).  Real
    # buffer copies (jnp.copy) so donation of params/teacher never aliases.
    teacher_params = jax.tree_util.tree_map(jnp.copy, enc_params)
    state = {"encoder": enc_state, "vq": vq_state,
             "sem_encoder": jax.tree_util.tree_map(jnp.copy, enc_state)}
    return params, teacher_params, state


def ema_update_teacher(teacher_params, student_params, decay: float = 0.99):
    """param_k = decay * param_k + (1-decay) * param_q (pt_model.py:104-106)."""
    return jax.tree_util.tree_map(
        lambda k, q: decay * k + (1.0 - decay) * q, teacher_params,
        student_params)


def _sample_edge_slots(key, edge_mask, num: int):
    """Sample ``num`` edge slots uniformly (with replacement) and return
    their validity weights — the fixed-shape analog of the reference's
    randperm edge subsampling (pt_model.py:53-57).

    Uniform-slot + mask-weighted averaging is an unbiased estimator of the
    mean over *valid* edges (every valid slot is equally likely), and runs in
    O(num) — a masked ``random.categorical`` here would broadcast to an
    O(num * E_pad) gumbel argmax (seconds per step at arxiv scale).
    """
    slots = jax.random.randint(key, (num,), 0, edge_mask.shape[0])
    return slots, edge_mask[slots].astype(jnp.float32)


def _negative_edges(key, num: int, n_node, n_pad: int):
    """Uniform random node pairs as negatives — the fixed-shape analog of PyG
    ``negative_sampling`` (pt_model.py:59-60).  Collisions with true edges are
    rare on sparse graphs and tolerated, as in most large-scale GNN systems.
    """
    ks, kr = jax.random.split(key)
    # randint over the *valid* node range [0, n_node)
    s = jax.random.randint(ks, (num,), 0, jnp.maximum(n_node, 1))
    r = jax.random.randint(kr, (num,), 0, jnp.maximum(n_node, 1))
    return s.astype(jnp.int32), r.astype(jnp.int32)


def pretrain_forward(params, teacher_params, state, cfg: PretrainConfig,
                     aug_g: Graph, orig_g: Graph, *, bs: int,
                     rng: jax.Array, training: bool = True,
                     no_codebook: bool = False,
                     axis_name: Optional[str] = None,
                     layout=None, edge_table=None, drop_seed=None):
    """Full pretrain forward (pt_model.py:116-142).

    ``aug_g`` / ``orig_g`` share node/edge layout; augmentation only altered
    features and the edge mask.  Returns (total_loss, (losses, new_state)).
    Loss weighting (feat_lambda etc.) is applied here, matching
    pretrain.py:51-58.

    ``drop_seed``: the pair-hash seed behind ``aug_g``'s edge-dropout mask
    (train/augment.dropout_edge_seed).  When given with a fused ``layout``,
    the encoder receives the dropout as ``drop_hash`` — the hub-preserving
    closed form — instead of a per-edge runtime mask, which costs ~110
    ms/step at bench scale (scripts/pretrain_step_probe.py, r5).
    """
    k_enc, k_vq, k_topo, k_topo_neg, k_sem, k_teacher = jax.random.split(rng, 6)

    use_hash = (layout is not None and cfg.edge_p > 0
                and drop_seed is not None and training)
    z, enc_state, enc_aux = encoder_apply(
        params["encoder"], state["encoder"], cfg.encoder,
        aug_g.node_feat, aug_g.senders, aug_g.receivers,
        edge_feat=aug_g.edge_feat, edge_mask=aug_g.edge_mask,
        node_mask=aug_g.node_mask, training=training, rng=k_enc,
        layout=layout, edge_table=edge_table, axis_name=axis_name,
        # the augmented view's edge-dropout mask is random per step — the
        # fused path must fold it into messages and the mean's degree
        # (needless when dropout is disabled: static layout masks suffice)
        dynamic_edge_mask=(layout is not None and cfg.edge_p > 0
                           and not use_hash),
        drop_hash=(drop_seed, cfg.edge_p) if use_hash else None)
    # z keeps the encoder's compute dtype into the VQ (project_in runs in
    # bf16 under mixed precision); the VQ returns f32, and the losses below
    # are f32.
    vq_res = vq_apply(params["vq"], state["vq"], cfg.vq, z,
                      training=training, rng=k_vq, mask=aug_g.node_mask,
                      axis_name=axis_name)
    commit_loss = vq_res["loss"]
    query = z.astype(jnp.float32) if no_codebook else vq_res["quantize"]
    if no_codebook:
        commit_loss = jnp.zeros(())

    node_mask = orig_g.node_mask
    seed_mask = node_mask[:bs]

    # loss_bf16 (cfg docstring): decoder matmuls read a bf16 copy of the
    # query; targets, reductions and log/cosine arithmetic stay f32
    query_l = query.astype(jnp.bfloat16) if cfg.loss_bf16 else query

    # ---- feat recon (pt_model.py:42-43): MSE over first bs seed nodes.
    recon = linear_apply(params["feat_dec"],
                         query_l[:bs]).astype(jnp.float32)
    se = (recon - orig_g.node_feat[:bs].astype(jnp.float32)) ** 2
    denom = jnp.maximum(jnp.sum(seed_mask) * se.shape[-1], 1.0)
    feat_recon_loss = jnp.sum(se * seed_mask[:, None]) / denom

    # ---- topo recon (pt_model.py:46-65): subsampled pos edges + random negs.
    ratio = cfg.topo_recon_ratio
    if ratio > 0.0:
        e_pad = orig_g.num_edges_padded
        num = max(int(e_pad * ratio), 1)
        slots, w = _sample_edge_slots(k_topo, orig_g.edge_mask, num)
        w_sum = jnp.maximum(jnp.sum(w), 1.0)
        pos_s = orig_g.senders[slots]
        pos_r = orig_g.receivers[slots]
        pos_p = inner_product_decode(params["topo_dec"], query_l, pos_s,
                                     pos_r, sigmoid=True).astype(jnp.float32)
        neg_s, neg_r = _negative_edges(k_topo_neg, num, orig_g.n_node,
                                       orig_g.num_nodes_padded)
        neg_p = inner_product_decode(params["topo_dec"], query_l, neg_s,
                                     neg_r, sigmoid=True).astype(jnp.float32)
        pos_loss = -jnp.sum(w * jnp.log(pos_p + EPS)) / w_sum
        neg_loss = -jnp.mean(jnp.log(1.0 - neg_p + EPS))
        topo_recon_loss = pos_loss + neg_loss

        # ---- topo-sem recon (pt_model.py:68-83): edge-feature MSE.
        if orig_g.edge_feat is not None:
            zz = jnp.concatenate([query_l[pos_s], query_l[pos_r]], axis=-1)
            pred_e = linear_apply(params["topo_sem_dec"],
                                  zz).astype(jnp.float32)
            se_e = jnp.mean(
                (pred_e - orig_g.edge_feat[slots].astype(jnp.float32)) ** 2,
                axis=-1)
            topo_sem_recon_loss = jnp.sum(w * se_e) / w_sum
        else:
            topo_sem_recon_loss = jnp.zeros(())
    else:
        topo_recon_loss = jnp.zeros(())
        topo_sem_recon_loss = jnp.zeros(())

    # ---- sem recon (pt_model.py:86-102): cosine alignment to EMA teacher on
    # the clean graph; teacher output detached; eval-mode teacher would change
    # BatchNorm semantics so the teacher runs in the same mode as the student
    # but its state updates are discarded (the reference's teacher *is* in
    # train mode and its BN running stats do update — we keep them).
    teacher_cfg = cfg.encoder
    if cfg.teacher_bf16 and cfg.encoder.compute_dtype != "bfloat16":
        import dataclasses
        teacher_cfg = dataclasses.replace(cfg.encoder,
                                          compute_dtype="bfloat16")
    tz, teacher_state, _ = encoder_apply(
        teacher_params, state["sem_encoder"], teacher_cfg,
        orig_g.node_feat, orig_g.senders, orig_g.receivers,
        edge_feat=orig_g.edge_feat, edge_mask=orig_g.edge_mask,
        node_mask=orig_g.node_mask, training=training, rng=k_teacher,
        layout=layout, edge_table=edge_table, axis_name=axis_name)
    tz = jax.lax.stop_gradient(tz).astype(jnp.float32)
    hproj = linear_apply(params["sem_projector"],
                         query_l).astype(jnp.float32)

    def _l2n(t):
        return t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True),
                               1e-12)

    zn = _l2n(tz[:bs])
    hn = _l2n(hproj[:bs])
    cos_term = 1.0 - jnp.sum(zn * hn, axis=-1)
    sem_recon_loss = jnp.sum(cos_term * seed_mask) / jnp.maximum(
        jnp.sum(seed_mask), 1.0)

    env_reg_loss = enc_aux["env_reg"]

    losses = {
        "feat_recon_loss": feat_recon_loss,
        "topo_recon_loss": topo_recon_loss,
        "topo_sem_recon_loss": topo_sem_recon_loss,
        "sem_recon_loss": sem_recon_loss,
        "commit_loss": commit_loss,
        "env_reg_loss": env_reg_loss,
    }
    total = (cfg.feat_lambda * feat_recon_loss
             + cfg.topo_lambda * topo_recon_loss
             + cfg.topo_sem_lambda * topo_sem_recon_loss
             + cfg.sem_lambda * sem_recon_loss
             + commit_loss
             + cfg.lamda_env * env_reg_loss)

    new_state = {"encoder": enc_state, "vq": vq_res["state"],
                 "sem_encoder": teacher_state}
    aux = {"losses": losses, "indices": vq_res["indices"],
           "moe_stats": enc_aux["moe_stats"]}
    return total, (aux, new_state)
