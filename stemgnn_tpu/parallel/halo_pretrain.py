"""Full-graph pretraining on the 2-axis ``('data', 'edge')`` mesh.

The SURVEY.md §7.1 end state: the merged pretrain graph is node-sharded over
the ``edge`` mesh axis (halo layout, fused Pallas kernels), while the
``data`` axis runs independent stochastic views — each data replica draws
its own augmentation (feature-column mask + undirected edge dropout,
STEM-GNN/pretrain.py:41-45) and owns a disjoint slice of the epoch's seed
nodes.  Every loss is a *global* masked mean (psum of sums / psum of
counts over BOTH axes), so the step optimizes the pooled objective over all
(replica, node) pairs; the VQ codebook EMA/affine statistics psum over both
axes too — the direct analog of the reference's only hot-loop collective
(STEM-GNN/model/vq.py:666-674) — and the commitment loss uses the global
psum mean (unequal valid-node counts per shard).

Reference semantics per loss: pt_model.py:42-43 (feat recon on seeds),
46-65 (topo recon, subsampled pos edges + uniform negatives), 68-83
(topo-sem edge-feature MSE), 86-102 (sem recon vs detached EMA teacher).
Deviations forced by sharding, both documented below: (a) topo positives
are sampled per shard from the shard's own edges (an unbiased ratio
estimator of the global mean — every valid edge is equally likely); (b)
negative pairs take ``u`` from the local shard and ``v`` from the next
shard over (``ppermute`` shift 1), giving cross-shard pairs without an
all_gather of the embedding table.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from stemgnn_tpu.core.config import PretrainConfig
from stemgnn_tpu.models.pretrain import EPS, ema_update_teacher
from stemgnn_tpu.nn.layers import linear_apply
from stemgnn_tpu.parallel.halo import (_local, _shard_layout,
                                       build_halo_layouts,
                                       build_halo_partition, halo_exchange,
                                       halo_encoder_apply)
from stemgnn_tpu.train.augment import _pair_hash_uniform, mask_feature
from stemgnn_tpu.vq import vq_apply


def prepare_halo_pretrain_graph(node_feat: np.ndarray, edge_index: np.ndarray,
                                num_shards: int, xe_ids=None, edge_table=None,
                                *, pad_multiple: int = 128,
                                node_block: int = 128, edge_chunk: int = 512,
                                hub_size: int = 0,
                                sc_hub_size: Optional[int] = None):
    """Host prep for halo pretraining.

    Beyond :func:`prepare_halo_graph`'s entries, the partition carries the
    concatenated per-shard edge view used by the loss estimators:

      * ``cs``/``cr`` [S, el+er] — sender/receiver ids into the combined
        embedding table ``concat([z_local, z_halo])`` (remote senders offset
        by Nb), receiver ids local;
      * ``cm`` — combined validity mask; ``cxe`` — combined edge-type ids;
      * ``cgs``/``cgr`` — ORIGINAL global endpoint ids, for the
        deterministic per-undirected-pair dropout hash (both directions of a
        pair live on different shards, so the keep decision must be a pure
        function of the global pair, not of shard-local state).

    Returns ``(sg, nb, layouts, edge_table_dev)``.
    """
    ei = np.asarray(edge_index)
    senders = ei[0].astype(np.int64)
    receivers = ei[1].astype(np.int64)
    n = node_feat.shape[0]
    S = num_shards
    part, nb, R = build_halo_partition(
        senders, receivers, n, S, pad_multiple=max(pad_multiple, node_block),
        xe_ids=xe_ids if xe_ids is not None else np.zeros(len(senders),
                                                          np.int32))
    num_types = 1 if edge_table is None else int(np.shape(edge_table)[0])
    lay_loc, lay_rem = build_halo_layouts(
        part, nb, R, S, node_block=node_block, edge_chunk=edge_chunk,
        hub_size=hub_size if num_types <= 32 else 0,
        sc_hub_size=(hub_size if sc_hub_size is None else sc_hub_size)
        if num_types <= 1 else 0,
        num_edge_types=num_types,
        feat_dim_hint=int(node_feat.shape[1]))

    # Combined edge view (local first, remote offset into the halo slice).
    el = part["s_loc"].shape[1]
    cs = np.concatenate([part["s_loc"], part["s_rem"] + nb], axis=1)
    cr = np.concatenate([part["r_loc"], part["r_rem"]], axis=1)
    cm = np.concatenate([part["m_loc"], part["m_rem"]], axis=1)
    cxe = np.concatenate([part["xe_loc"], part["xe_rem"]], axis=1)
    # Original global endpoints per combined slot (receiver-owner split is
    # deterministic, so recompute the same split order host-side).
    owner = receivers // nb
    src_owner = senders // nb
    cgs = np.zeros_like(cs)
    cgr = np.zeros_like(cr)
    for i in range(S):
        sel = owner == i
        is_loc = src_owner[sel] == i
        s_i, r_i = senders[sel], receivers[sel]
        kl, kr = int(is_loc.sum()), int((~is_loc).sum())
        cgs[i, :kl] = s_i[is_loc]
        cgr[i, :kl] = r_i[is_loc]
        cgs[i, el: el + kr] = s_i[~is_loc]
        cgr[i, el: el + kr] = r_i[~is_loc]

    d = node_feat.shape[1]
    feats = np.zeros((S * nb, d), np.float32)
    feats[:n] = node_feat
    node_mask = np.zeros(S * nb, bool)
    node_mask[:n] = True
    from stemgnn_tpu.parallel.halo import build_halo_drop_gids
    # stacked pytree: num_nodes_padded reads the SHARD axis; take the
    # per-shard node-space size from the trailing in_degree dim instead
    gid_loc, gid_rem_src, gid_rem_dst = build_halo_drop_gids(
        part, nb, R, S, int(np.asarray(lay_rem.in_degree).shape[-1]))
    sg = {k: jnp.asarray(v) for k, v in part.items()
          if k not in ("xe_loc", "xe_rem", "ef_loc", "ef_rem")}
    sg["gid_loc"] = jnp.asarray(gid_loc)
    sg["gid_rem_src"] = jnp.asarray(gid_rem_src)
    sg["gid_rem_dst"] = jnp.asarray(gid_rem_dst)
    sg["cs"] = jnp.asarray(cs)
    sg["cr"] = jnp.asarray(cr)
    sg["cm"] = jnp.asarray(cm)
    sg["cxe"] = jnp.asarray(cxe)
    sg["cgs"] = jnp.asarray(cgs.astype(np.int32))
    sg["cgr"] = jnp.asarray(cgr.astype(np.int32))
    sg["node_feat"] = jnp.asarray(feats.reshape(S, nb, d))
    sg["node_mask"] = jnp.asarray(node_mask.reshape(S, nb))
    layouts = (jax.device_put(jax.tree.map(jnp.asarray, lay_loc)),
               jax.device_put(jax.tree.map(jnp.asarray, lay_rem)))
    et = None if edge_table is None else jnp.asarray(edge_table, jnp.float32)
    return sg, nb, layouts, et


def halo_pretrain_forward(params, teacher_params, state, cfg: PretrainConfig,
                          part, x_loc, node_mask_loc, seed_mask_loc, *,
                          rng, lay_loc, lay_rem, edge_table,
                          node_axis: str, axes, training: bool = True,
                          interpret: bool = False):
    """Pretrain forward on one (data-replica, node-shard) device.

    ``part`` per-device partition slice (``_local``-stripped) including the
    combined edge view; ``seed_mask_loc`` [Nb] marks this replica's seed
    nodes among the owned block; ``axes`` the psum axes tuple
    (``('data', node_axis)`` or ``(node_axis,)``).  Returns
    ``(total_loss, (aux, new_state))`` with every loss a global psum mean.
    """
    (k_aug_f, k_aug_e, k_enc, k_vq, k_topo, k_topo_neg,
     k_teacher) = jax.random.split(rng, 7)

    def gsum(v):
        return jax.lax.psum(v, axes)

    # ---- augmentation (pretrain.py:41-45).  The column mask must be the
    # SAME on every node shard (one global view per data replica): the rng
    # here is per-data-replica and is NOT folded by the node-shard index.
    x_aug = mask_feature(k_aug_f, x_loc, cfg.feat_p) if cfg.feat_p > 0 \
        else x_loc
    keep_loc = keep_rem = drop_hash = gids = None
    aug_lay_loc, aug_lay_rem = lay_loc, lay_rem
    if cfg.edge_p > 0:
        seed = jax.random.randint(k_aug_e, (), 0, jnp.iinfo(jnp.int32).max)
        # hub-preserving pair-hash dropout on the fused path (r5): same
        # global-pair hash as the materialized path below, so the masks —
        # and therefore the S-shard vs single-device parity — are identical
        use_hash = (lay_loc is not None and "gid_loc" in part
                    and (edge_table is None or edge_table.shape[0] == 1))
        if use_hash:
            # HOIST (r5): bake the dropout into the layouts once per step
            # — both encoder layers then run the plain static path with
            # kept degrees, instead of recomputing dense masks/keeps in
            # every fused call (~84 ms/step at 169K/2.37M).  Falls back
            # to the in-kernel drop_hash on windowed/split layouts.
            from stemgnn_tpu.ops.fused_sage import (can_bake_drop,
                                                    drop_mask_layout)
            if can_bake_drop(lay_loc) and can_bake_drop(lay_rem):
                # NOTE: new names — the teacher pass below must read the
                # CLEAN lay_loc/lay_rem.  The loc layout's ownership is a
                # contiguous global range, so its id map is the AFFINE
                # offset me*nb (= gid_loc[0]) — no per-edge table gathers
                # (drop_mask_layout's scalar-dom fast path); the rem
                # senders keep the halo-slot table.
                off = part["gid_loc"][0]
                aug_lay_loc = drop_mask_layout(
                    lay_loc, seed, cfg.edge_p, ids=(off, off))
                aug_lay_rem = drop_mask_layout(
                    lay_rem, seed, cfg.edge_p,
                    ids=(part["gid_rem_src"], off))
            else:
                # LocSplit layouts: fall back to the in-kernel drop_hash
                # (a genuine tracing error must surface, not degrade)
                drop_hash = (seed, cfg.edge_p)
                gids = ((part["gid_loc"], part["gid_loc"]),
                        (part["gid_rem_src"], part["gid_rem_dst"]))
        else:
            el = part["s_loc"].shape[0]
            u = _pair_hash_uniform(seed, part["cgs"], part["cgr"])
            keepc = u >= cfg.edge_p
            keep_loc, keep_rem = keepc[:el], keepc[el:]

    z, enc_state, enc_aux = halo_encoder_apply(
        params["encoder"], state["encoder"], cfg.encoder, x_aug, part,
        axis=node_axis, training=training, rng=k_enc,
        node_mask=node_mask_loc, lay_loc=aug_lay_loc, lay_rem=aug_lay_rem,
        edge_table=edge_table, interpret=interpret, stat_axes=axes,
        keep_loc=keep_loc, keep_rem=keep_rem, drop_hash=drop_hash,
        gids=gids)

    # decorrelate per-shard gumbel/expiry draws
    k_vq = jax.random.fold_in(k_vq, jax.lax.axis_index(node_axis))
    vq_res = vq_apply(params["vq"], state["vq"], cfg.vq, z,
                      training=training, rng=k_vq, mask=node_mask_loc,
                      axis_name=axes, commit_psum_axis=axes)
    commit_loss = vq_res["loss"]
    query = vq_res["quantize"]
    seed_f = seed_mask_loc.astype(jnp.float32)
    # loss_bf16 (PretrainConfig docstring): decoder matmuls read a bf16
    # copy of the query; targets/reductions stay f32
    query_l = query.astype(jnp.bfloat16) if cfg.loss_bf16 else query

    # ---- feat recon (pt_model.py:42-43) over this replica's seed nodes.
    recon = linear_apply(params["feat_dec"], query_l).astype(jnp.float32)
    se = jnp.sum((recon - x_loc.astype(jnp.float32)) ** 2, axis=-1)
    feat_recon_loss = gsum(jnp.sum(se * seed_f)) / jnp.maximum(
        gsum(jnp.sum(seed_f)) * recon.shape[-1], 1.0)

    # ---- topo / topo-sem recon over subsampled local edges.
    ratio = cfg.topo_recon_ratio
    if ratio > 0.0:
        e_comb = part["cs"].shape[0]
        num = max(int(e_comb * ratio), 1)
        k_slots = jax.random.fold_in(k_topo, jax.lax.axis_index(node_axis))
        slots = jax.random.randint(k_slots, (num,), 0, e_comb)
        w = part["cm"][slots].astype(jnp.float32)
        q_halo = halo_exchange(query_l, part["send_idx"], node_axis)
        q_full = jnp.concatenate([query_l, q_halo], axis=0)
        pos_s, pos_r = part["cs"][slots], part["cr"][slots]
        from stemgnn_tpu.nn.decoders import inner_product_decode
        pos_p = inner_product_decode(params["topo_dec"], q_full, pos_s,
                                     pos_r, sigmoid=True).astype(jnp.float32)
        w_sum = jnp.maximum(gsum(jnp.sum(w)), 1.0)
        pos_loss = gsum(-jnp.sum(w * jnp.log(pos_p + EPS))) / w_sum

        # Negatives: u local; v from the NEXT node shard over (ppermute) so
        # pairs cross shard boundaries without gathering the whole table.
        nb = query.shape[0]
        k_u, k_v = jax.random.split(
            jax.random.fold_in(k_topo_neg, jax.lax.axis_index(node_axis)))
        neg_u = jax.random.randint(k_u, (num,), 0, nb)
        neg_v = jax.random.randint(k_v, (num,), 0, nb)
        proj = params["topo_dec"]
        q_proj = (linear_apply(proj["lin"], query_l).astype(jnp.float32)
                  if "lin" in proj else query)
        pu, mu = q_proj[neg_u], node_mask_loc[neg_u].astype(jnp.float32)
        pv, mv = q_proj[neg_v], node_mask_loc[neg_v].astype(jnp.float32)
        n_shards = jax.lax.axis_size(node_axis)
        if n_shards > 1:
            perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
            pv = jax.lax.ppermute(pv, node_axis, perm)
            mv = jax.lax.ppermute(mv, node_axis, perm)
        neg_p = jax.nn.sigmoid(jnp.sum(pu * pv, axis=-1))
        wn = mu * mv
        neg_loss = gsum(-jnp.sum(wn * jnp.log(1.0 - neg_p + EPS))) / \
            jnp.maximum(gsum(jnp.sum(wn)), 1.0)
        topo_recon_loss = pos_loss + neg_loss

        if edge_table is not None:
            zz = jnp.concatenate([q_full[pos_s], q_full[pos_r]], axis=-1)
            pred_e = linear_apply(params["topo_sem_dec"],
                                  zz).astype(jnp.float32)
            target = jnp.take(edge_table, part["cxe"][slots], axis=0)
            se_e = jnp.mean((pred_e - target.astype(jnp.float32)) ** 2,
                            axis=-1)
            topo_sem_recon_loss = gsum(jnp.sum(w * se_e)) / w_sum
        else:
            topo_sem_recon_loss = jnp.zeros(())
    else:
        topo_recon_loss = jnp.zeros(())
        topo_sem_recon_loss = jnp.zeros(())

    # ---- sem recon vs the detached EMA teacher on the CLEAN graph.
    teacher_cfg = cfg.encoder
    if cfg.teacher_bf16 and cfg.encoder.compute_dtype != "bfloat16":
        import dataclasses
        teacher_cfg = dataclasses.replace(cfg.encoder,
                                          compute_dtype="bfloat16")
    tz, teacher_state, _ = halo_encoder_apply(
        teacher_params, state["sem_encoder"], teacher_cfg, x_loc, part,
        axis=node_axis, training=training, rng=k_teacher,
        node_mask=node_mask_loc, lay_loc=lay_loc, lay_rem=lay_rem,
        edge_table=edge_table, interpret=interpret, stat_axes=axes)
    tz = jax.lax.stop_gradient(tz).astype(jnp.float32)
    hproj = linear_apply(params["sem_projector"],
                         query_l).astype(jnp.float32)

    def _l2n(t):
        return t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True),
                               1e-12)

    cos_term = 1.0 - jnp.sum(_l2n(tz) * _l2n(hproj), axis=-1)
    sem_recon_loss = gsum(jnp.sum(cos_term * seed_f)) / jnp.maximum(
        gsum(jnp.sum(seed_f)), 1.0)

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
    aux = {"losses": losses, "indices": vq_res["indices"]}
    return total, (aux, new_state)


def make_halo_pretrain_step(cfg: PretrainConfig, tx, mesh, layouts,
                            edge_table, *, data_axis: Optional[str] = "data",
                            node_axis: str = "edge",
                            interpret: bool = False):
    """Jitted 2-axis pretrain step.

    Inputs: replicated (params, teacher, opt_state, state); ``rngs``
    [n_data, 2] per-data-replica keys; ``seed_masks`` [n_data, S, Nb]
    per-replica seed-node masks (disjoint slices of the epoch's weighted
    resample); ``sg`` the stacked partition; the two stacked layouts.
    Grads/states psum/pmean over both axes; the loss value is already
    global, so the returned metrics are identical on every device.
    """
    axes = (data_axis, node_axis) if data_axis else (node_axis,)

    def per_device(params, teacher, opt_state, state, rngs, seed_masks, sg,
                   lay_loc_s, lay_rem_s):
        lay_loc = _shard_layout(lay_loc_s)
        lay_rem = _shard_layout(lay_rem_s)
        part = _local({k: v for k, v in sg.items()
                       if k not in ("node_feat", "node_mask")})
        x_loc = sg["node_feat"][0]
        nm_loc = sg["node_mask"][0]
        rng = rngs[0]
        seed_loc = seed_masks[0, 0]

        def loss_fn(params):
            return halo_pretrain_forward(
                params, teacher, state, cfg, part, x_loc, nm_loc, seed_loc,
                rng=rng, lay_loc=lay_loc, lay_rem=lay_rem,
                edge_table=edge_table, node_axis=node_axis, axes=axes,
                training=True, interpret=interpret)

        (loss, (aux, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        # All loss terms are global psum-mean values and psum's transpose is
        # psum, so per-device grads already carry the total-device factor on
        # those terms; pmean (not psum) yields the exact single-device
        # gradient (see full_graph.make_halo_steps, r4 parity fix).
        grads = jax.lax.pmean(grads, axes)
        # replicated-state consistency: per-device dead-code expiry reseeds
        # and BN updates can differ; average them (stats inside were already
        # psum-ed, so this is a near-no-op safeguard, as in data_parallel)
        new_state = jax.lax.pmean(new_state, axes)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if cfg.vq.ema_update:
            from stemgnn_tpu.vq import adopt_ema_embed
            params = dict(params, vq=adopt_ema_embed(params["vq"],
                                                     new_state["vq"]))
        teacher = ema_update_teacher(teacher, params["encoder"],
                                     cfg.sem_encoder_decay)
        metrics = dict(aux["losses"], loss=loss)   # already global values
        return params, teacher, opt_state, new_state, metrics

    rep = P()
    sg_spec = {k: P(node_axis) for k in
               ("s_loc", "r_loc", "m_loc", "s_rem", "r_rem", "m_rem",
                "send_idx", "cs", "cr", "cm", "cxe", "cgs", "cgr",
                "gid_loc", "gid_rem_src", "gid_rem_dst",
                "node_feat", "node_mask")}
    lay_specs = tuple(jax.tree.map(lambda _: P(node_axis), lay)
                      for lay in layouts)
    rng_spec = P(data_axis) if data_axis else rep
    seed_spec = P(data_axis, node_axis) if data_axis else P(None, node_axis)
    step = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rng_spec, seed_spec, sg_spec)
        + lay_specs,
        out_specs=(rep, rep, rep, rep, rep), check_vma=False)
    return jax.jit(step)


def run_pretrain_halo(merged, cfg: PretrainConfig, mesh, *, weights,
                      save_root=None, verbose: bool = True,
                      data_axis="data", node_axis="edge",
                      interpret: bool = False, hub_size: int = 0,
                      log_fn=None):
    """Full-graph halo pretraining driver over the 2-axis mesh.

    The full-graph analog of :func:`train.pretrain_loop.run_pretrain` for
    the ``all``-mix at arxiv scale (SURVEY.md §7.1 end state): the merged
    graph is node-sharded over ``node_axis``; the per-epoch WEIGHTED node
    resample (process_datasets.py:186-198) becomes per-node float seed
    WEIGHTS — repetition counts — split round-robin across the ``data``
    replicas; one optimizer step per epoch covers every seed exactly as the
    reference's epoch covers its resampled seed list.

    ``merged``: the dict from :func:`data.merge.merge_datasets`.  Returns
    (params, teacher, state, history).
    """
    from stemgnn_tpu.data.sampler import get_train_node_idx
    from stemgnn_tpu.models.pretrain import pretrain_init
    from stemgnn_tpu.train.optim import make_optimizer
    from stemgnn_tpu.train.pretrain_loop import (flush_checkpoint_writes,
                                                 save_checkpoint)

    n_data = int(mesh.shape[data_axis]) if data_axis else 1
    n_edge = int(mesh.shape[node_axis])
    rng_np = np.random.default_rng(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)
    key, k_init = jax.random.split(key)
    params, teacher, state = pretrain_init(k_init, cfg)
    # k-means codebook seeding from one sampled batch when configured
    # (the reference's lazy init-on-first-forward, vq.py:646) — shared
    # with the minibatch driver; runs single-device before sharding.
    from stemgnn_tpu.train.pretrain_loop import maybe_kmeans_seed_vq
    params, state = maybe_kmeans_seed_vq(params, state, cfg, merged,
                                         weights, k_init)

    node_feat = np.asarray(merged["node_text_feat"],
                           np.float32)[np.asarray(merged["x"])]
    xe = merged.get("xe")
    sg, nb, layouts, edge_table = prepare_halo_pretrain_graph(
        node_feat, np.asarray(merged["edge_index"]), n_edge,
        xe_ids=None if xe is None else np.asarray(xe, np.int32),
        edge_table=merged.get("edge_text_feat"), hub_size=hub_size)
    n, n_pad = node_feat.shape[0], n_edge * nb

    tx = make_optimizer(cfg.lr, cfg.weight_decay, grad_clip=cfg.grad_clip,
                        use_scheduler=cfg.use_scheduler, epochs=cfg.epochs,
                        steps_per_epoch=1)
    opt_state = tx.init(params)
    step = make_halo_pretrain_step(cfg, tx, mesh, layouts, edge_table,
                                   data_axis=data_axis, node_axis=node_axis,
                                   interpret=interpret)
    import time

    history = []
    t_seed = t_disp = t_read = t_save = 0.0
    for epoch in range(cfg.epochs):
        t0 = time.perf_counter()
        seeds = get_train_node_idx(np.asarray(merged["ptr"]), weights,
                                   rng_np)
        # seed multiset -> per-replica float weight vectors (repetition =
        # weight; round-robin split keeps replicas balanced)
        w = np.zeros((n_data, n_pad), np.float32)
        for i in range(n_data):
            np.add.at(w[i], seeds[i::n_data], 1.0)
        seed_w = jnp.asarray(w.reshape(n_data, n_edge, nb))
        key, k = jax.random.split(key)
        rngs = jax.random.split(k, n_data)
        t1 = time.perf_counter()
        params, teacher, opt_state, state, metrics = step(
            params, teacher, opt_state, state, rngs, seed_w, sg, *layouts)
        t2 = time.perf_counter()
        metrics = {k2: float(v) for k2, v in metrics.items()}
        # the float() readbacks above force completion (scalar D2H), so
        # this wall time covers the full dispatched step
        t3 = time.perf_counter()
        metrics["epoch_s"] = t3 - t0
        t_seed += t1 - t0
        t_disp += t2 - t1
        t_read += t3 - t2
        history.append(metrics)
        if verbose:
            print(f"[halo-pretrain] epoch {epoch + 1}/{cfg.epochs} "
                  f"({metrics['epoch_s']:.2f}s) "
                  + " ".join(f"{k2}={v:.4f}"
                             for k2, v in sorted(metrics.items())
                             if k2 != "epoch_s"))
        if log_fn is not None:
            log_fn(epoch, metrics)
        if save_root is not None and (
                (epoch + 1) % max(cfg.save_every, 1) == 0
                or epoch + 1 == cfg.epochs):
            t4 = time.perf_counter()
            # async: the halo driver never donates buffers, so the D2H
            # copies can stream from a writer thread while the next epoch
            # dispatches (the synchronous save measured ~1.7 s at 169K —
            # 2.4x the rest of the epoch)
            save_checkpoint(save_root, epoch + 1, params, teacher, state,
                            opt_state=None, rng_key=None, async_save=True)
            t_save += time.perf_counter() - t4
    if verbose and cfg.epochs:
        print(f"[halo-pretrain] per-epoch phase means: seed-build "
              f"{t_seed / cfg.epochs * 1e3:.0f} ms, dispatch "
              f"{t_disp / cfg.epochs * 1e3:.0f} ms, metric readback "
              f"{t_read / cfg.epochs * 1e3:.0f} ms, checkpoint "
              f"{t_save / cfg.epochs * 1e3:.0f} ms")
    flush_checkpoint_writes()
    return params, teacher, state, history
