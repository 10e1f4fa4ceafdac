"""Edge-partitioned full-graph training (the scale-out workload).

The BASELINE.json north star: one large graph trained full-batch with its
edge list sharded across the mesh's ``edge`` axis — the GNN analog of
sequence/context parallelism (SURVEY.md §2.7/§7.1).  Node features and
parameters are replicated; each device aggregates its edge shard and the
partial per-node sums combine with one psum per layer over ICI.

:func:`run_finetune_edge_parallel` is a full node-classification trainer on
this layout (the ogbn-arxiv-class config).  Per-step math matches the
single-device full-batch path exactly (tests/test_parallel.py asserts the
aggregation equivalence; the loss here is also pmean-checked).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from stemgnn_tpu.core.config import FinetuneConfig
from stemgnn_tpu.core.graph import round_up
from stemgnn_tpu.data.dataset import TAGDataset
from stemgnn_tpu.models import task as task_model
from stemgnn_tpu.nn.encoder import encoder_apply
from stemgnn_tpu.parallel.edge_partition import partition_edges_by_destination
from stemgnn_tpu.train.finetune_loop import _copy, _merge, _split_params
from stemgnn_tpu.utils import EarlyStopping, Logger
from stemgnn_tpu.utils.metrics import evaluate, task2metric


def prepare_sharded_graph(ds: TAGDataset, num_shards: int):
    """Host prep: replicated padded node features + per-shard edge arrays
    (destination-contiguous) with per-shard edge-type features."""
    n_pad = round_up(ds.num_nodes, 128)
    feats = np.zeros((n_pad, ds.node_text_feat.shape[1]), np.float32)
    feats[: ds.num_nodes] = ds.node_features()
    node_mask = np.zeros(n_pad, bool)
    node_mask[: ds.num_nodes] = True

    ei = np.asarray(ds.edge_index)
    shards = partition_edges_by_destination(
        ei[0].astype(np.int32), ei[1].astype(np.int32), num_shards,
        edge_feat=ds.edge_features().astype(np.float32))
    return {
        "node_feat": jnp.asarray(feats),
        "node_mask": jnp.asarray(node_mask),
        "senders": jnp.asarray(shards["senders"]),
        "receivers": jnp.asarray(shards["receivers"]),
        "edge_mask": jnp.asarray(shards["edge_mask"]),
        "edge_feat": jnp.asarray(shards["edge_feat"]),
        "n_pad": n_pad,
    }


def _encode_sharded(params, state, cfg: FinetuneConfig, sg, *, training,
                    rng, axis: str):
    return encoder_apply(
        params["encoder"], state["encoder"], cfg.encoder,
        sg["node_feat"], sg["senders"], sg["receivers"],
        edge_feat=sg["edge_feat"], edge_mask=sg["edge_mask"],
        node_mask=sg["node_mask"], training=training, rng=rng,
        edge_shard_axis=axis)


def make_edge_parallel_steps(cfg: FinetuneConfig, tx, mesh, y,
                             axis: str = "edge"):
    """Jitted (train_step, eval_step) over the edge-sharded layout."""

    def per_device_train(trainable, frozen, opt_state, state, rng,
                         train_mask, sg):
        sg = dict(sg, senders=sg["senders"][0], receivers=sg["receivers"][0],
                  edge_mask=sg["edge_mask"][0], edge_feat=sg["edge_feat"][0])

        def loss_fn(trainable):
            params = _merge(trainable, frozen)
            z, enc_state, aux = _encode_sharded(params, state, cfg, sg,
                                                training=True, rng=rng,
                                                axis=axis)
            logits, _, st = task_model.task_logits(
                params, dict(state, encoder=enc_state), cfg, z,
                training=True, rng=rng, mask=sg["node_mask"])
            act = task_model.activation_loss(
                logits, y, task="single", mask=train_mask.astype(jnp.float32))
            jac = task_model.decoder_jacobian_penalty(params, cfg)
            return act + jac, st
        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        grads = jax.lax.pmean(grads, axis)
        new_state = jax.lax.pmean(new_state, axis)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, new_state, jax.lax.pmean(loss, axis)

    def per_device_eval(trainable, frozen, state, sg):
        sg = dict(sg, senders=sg["senders"][0], receivers=sg["receivers"][0],
                  edge_mask=sg["edge_mask"][0], edge_feat=sg["edge_feat"][0])
        params = _merge(trainable, frozen)
        z, enc_state, _ = _encode_sharded(params, state, cfg, sg,
                                          training=False,
                                          rng=jax.random.PRNGKey(0),
                                          axis=axis)
        logits, _, _ = task_model.task_logits(
            params, dict(state, encoder=enc_state), cfg, z, training=False,
            mask=sg["node_mask"])
        return jax.nn.softmax(jnp.mean(logits, axis=1), axis=-1)

    rep = P()
    sg_spec = {"node_feat": rep, "node_mask": rep, "senders": P(axis),
               "receivers": P(axis), "edge_mask": P(axis),
               "edge_feat": P(axis), "n_pad": rep}
    train = jax.jit(jax.shard_map(
        per_device_train, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, rep, sg_spec),
        out_specs=(rep, rep, rep, rep), check_vma=False))
    evals = jax.jit(jax.shard_map(
        per_device_eval, mesh=mesh,
        in_specs=(rep, rep, rep, sg_spec), out_specs=rep, check_vma=False))
    return train, evals


def prepare_halo_graph(ds: TAGDataset, num_shards: int,
                       pad_multiple: int = 128, with_reversed: bool = False,
                       fused: bool = False, hub_size: int = 0,
                       node_block: int = 128, edge_chunk: int = 512):
    """Host prep for the halo layout: node features/labels/masks sharded by
    1-D destination-range ownership + the static halo-exchange plan.
    ``with_reversed`` additionally builds the reversed-edge partition (MoE
    out-edge aggregation).

    ``fused=True`` additionally builds stacked per-shard EdgeLayouts (local
    + remote) so the SAGE aggregation runs the Pallas scatter (+ hub-dense
    when ``hub_size > 0`` and the dataset has a single edge type) with edge
    features sourced from the [T, D] type table instead of a materialized
    [E, D] array; returns ``(sg, nb, sg_rev, layouts, edge_table)`` then.
    """
    from stemgnn_tpu.parallel.halo import (build_halo_layouts,
                                           build_halo_partition)

    ei = np.asarray(ds.edge_index)
    S = num_shards
    if fused:
        part, nb, R = build_halo_partition(
            ei[0].astype(np.int64), ei[1].astype(np.int64), ds.num_nodes,
            S, pad_multiple=max(pad_multiple, node_block),
            xe_ids=np.asarray(ds.xe, np.int32))
        num_types = int(ds.edge_text_feat.shape[0])
        lay_loc, lay_rem = build_halo_layouts(
            part, nb, R, S, node_block=node_block, edge_chunk=edge_chunk,
            hub_size=hub_size if num_types <= 32 else 0,
            num_edge_types=num_types,
            feat_dim_hint=int(ds.node_text_feat.shape[1]))
        layouts = (jax.device_put(jax.tree.map(jnp.asarray, lay_loc)),
                   jax.device_put(jax.tree.map(jnp.asarray, lay_rem)))
        edge_table = jnp.asarray(ds.edge_text_feat, jnp.float32)
    else:
        part, nb, _ = build_halo_partition(
            ei[0].astype(np.int64), ei[1].astype(np.int64), ds.num_nodes,
            S, edge_feat=ds.edge_features().astype(np.float32),
            pad_multiple=pad_multiple)
        layouts, edge_table = None, None
    d = ds.node_text_feat.shape[1]
    feats = np.zeros((S * nb, d), np.float32)
    feats[: ds.num_nodes] = ds.node_features()
    node_mask = np.zeros(S * nb, bool)
    node_mask[: ds.num_nodes] = True
    sg = {k: jnp.asarray(v) for k, v in part.items()
          if k not in ("xe_loc", "xe_rem")}
    sg["node_feat"] = jnp.asarray(feats.reshape(S, nb, d))
    sg["node_mask"] = jnp.asarray(node_mask.reshape(S, nb))
    sg_rev = None
    if with_reversed:
        part_rev, nb2, _ = build_halo_partition(
            ei[1].astype(np.int64), ei[0].astype(np.int64), ds.num_nodes,
            num_shards, pad_multiple=max(pad_multiple, node_block)
            if fused else pad_multiple)
        assert nb2 == nb
        sg_rev = {k: jnp.asarray(v) for k, v in part_rev.items()}
    if fused:
        return sg, nb, sg_rev, layouts, edge_table
    return sg, nb, sg_rev


def make_halo_steps(cfg: FinetuneConfig, tx, mesh, y, axis: str = "edge",
                    with_reversed: bool = False, layouts=None,
                    edge_table=None, interpret: bool = False):
    """Jitted (train_step, eval_step) over the halo (node-sharded) layout.

    ``y`` [S, Nb] owner-sharded labels.  Loss = global masked mean via psum
    of per-shard sums; grads psum-ed (each device's backward covers only its
    contribution paths, including cotangents arriving through the all_to_all
    transpose of the halo exchange).

    ``layouts`` = stacked ``(lay_loc, lay_rem)`` from
    :func:`prepare_halo_graph(fused=True)`: aggregation then runs the fused
    Pallas scatter + hub-dense kernels per shard with per-edge type features
    from ``edge_table`` (VERDICT r1 item 1 — the scale-out path must run on
    the fast kernels, not XLA segment_sum).
    """
    from stemgnn_tpu.parallel.halo import (_local, _shard_layout,
                                           halo_encoder_apply)

    def per_device_train(trainable, frozen, opt_state, state, rng,
                         train_mask, y_loc, sg, *rest):
        rest = list(rest)
        sg_rev = rest.pop(0) if with_reversed else None
        lays = ((_shard_layout(rest[0]), _shard_layout(rest[1]))
                if layouts is not None else (None, None))
        part = _local({k: v for k, v in sg.items()
                       if k not in ("node_feat", "node_mask")})
        part_rev = None if sg_rev is None else _local(sg_rev)
        x_loc, nm_loc = sg["node_feat"][0], sg["node_mask"][0]
        y_l, tm = y_loc[0], train_mask[0]

        def loss_fn(trainable):
            params = _merge(trainable, frozen)
            z, enc_state, aux = halo_encoder_apply(
                params["encoder"], state["encoder"], cfg.encoder, x_loc,
                part, axis=axis, training=True, rng=rng, node_mask=nm_loc,
                part_rev=part_rev, lay_loc=lays[0], lay_rem=lays[1],
                edge_table=edge_table, interpret=interpret)
            # axis_name: unfrozen VQ under the node shard psums the EMA
            # bins/embed_sum stats across shards (the analog of
            # halo_pretrain's vq_apply call; reference codebook all_reduce
            # vq.py:666-682) and makes the commit loss a global mean.
            k_vq = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            logits, _, st = task_model.task_logits(
                params, dict(state, encoder=enc_state), cfg, z,
                training=True, rng=k_vq, mask=nm_loc, axis_name=axis)
            logp = jax.nn.log_softmax(jnp.mean(logits, axis=1), axis=-1)
            nll = -jnp.take_along_axis(
                logp, y_l[:, None].astype(jnp.int32), axis=-1)[:, 0]
            w = tm.astype(logp.dtype)
            num = jax.lax.psum(jnp.sum(nll * w), axis)
            den = jax.lax.psum(jnp.sum(w), axis)
            act = num / jnp.maximum(den, 1.0)
            env = cfg.lamda_env * aux["env_reg"]
            return act + env + \
                task_model.decoder_jacobian_penalty(params, cfg), st
        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        # Every loss term above is a GLOBAL replicated value (psum-of-sums /
        # psum-of-counts), and the transpose of psum is psum: each shard's
        # grad therefore already carries an axis_size factor on the psum-ed
        # terms.  pmean (not psum) recovers the exact single-device gradient
        # — psum here double-counts by axis_size (caught by the
        # dryrun_multichip parity check, r4).
        grads = jax.lax.pmean(grads, axis)
        # replicated-state consistency (as in halo_pretrain): the per-shard
        # folded VQ rng makes dead-code expiry reseeds shard-local, so the
        # state must be averaged back to a replicated value before it is
        # adopted into trainable params (r4 self-review)
        new_state = jax.lax.pmean(new_state, axis)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        if cfg.use_vq and not cfg.freeze_vq and cfg.vq.ema_update:
            from stemgnn_tpu.vq import adopt_ema_embed
            trainable = dict(trainable, vq=adopt_ema_embed(
                trainable["vq"], new_state["vq"]))
        return trainable, opt_state, new_state, loss

    def _eval_probs_local(trainable, frozen, state, sg, sg_rev, lays):
        part = _local({k: v for k, v in sg.items()
                       if k not in ("node_feat", "node_mask")})
        params = _merge(trainable, frozen)
        z, enc_state, _ = halo_encoder_apply(
            params["encoder"], state["encoder"], cfg.encoder,
            sg["node_feat"][0], part, axis=axis, training=False,
            node_mask=sg["node_mask"][0],
            part_rev=None if sg_rev is None else _local(sg_rev),
            lay_loc=lays[0], lay_rem=lays[1], edge_table=edge_table,
            interpret=interpret)
        logits, _, _ = task_model.task_logits(
            params, dict(state, encoder=enc_state), cfg, z, training=False,
            mask=sg["node_mask"][0])
        return jax.nn.softmax(jnp.mean(logits, axis=1), axis=-1)

    def per_device_eval(trainable, frozen, state, sg, *rest):
        rest = list(rest)
        sg_rev = rest.pop(0) if with_reversed else None
        lays = ((_shard_layout(rest[0]), _shard_layout(rest[1]))
                if layouts is not None else (None, None))
        probs = _eval_probs_local(trainable, frozen, state, sg, sg_rev, lays)
        return jax.lax.all_gather(probs, axis, tiled=True)

    def per_device_metrics(trainable, frozen, state, y_loc, split_masks,
                           sg, *rest):
        """On-device accuracies [3] for (train, valid, test) — psum of
        masked correct counts over the shard axis; no [N, C] prediction
        readback, no all_gather (r4 VERDICT item 7: the halo runner's
        per-epoch host transfer was the overhead)."""
        rest = list(rest)
        sg_rev = rest.pop(0) if with_reversed else None
        lays = ((_shard_layout(rest[0]), _shard_layout(rest[1]))
                if layouts is not None else (None, None))
        probs = _eval_probs_local(trainable, frozen, state, sg, sg_rev, lays)
        pred = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        hit = (pred == y_loc[0]).astype(jnp.float32)
        m = split_masks[:, 0].astype(jnp.float32)       # [3, nb]
        num = jax.lax.psum(jnp.sum(m * hit[None, :], axis=1), axis)
        den = jax.lax.psum(jnp.sum(m, axis=1), axis)
        return 100.0 * num / jnp.maximum(den, 1.0)

    rep = P()
    sg_keys = ["s_loc", "r_loc", "m_loc", "s_rem", "r_rem", "m_rem",
               "send_idx", "node_feat", "node_mask"]
    if layouts is None:
        sg_keys += ["ef_loc", "ef_rem"]
    sg_spec = {k: P(axis) for k in sg_keys}
    rev_spec = () if not with_reversed else (
        {k: P(axis) for k in ("s_loc", "r_loc", "m_loc", "s_rem", "r_rem",
                              "m_rem", "send_idx")},)
    lay_spec = () if layouts is None else tuple(
        jax.tree.map(lambda _: P(axis), lay) for lay in layouts)
    train = jax.jit(jax.shard_map(
        per_device_train, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, P(axis), P(axis), sg_spec)
        + rev_spec + lay_spec,
        out_specs=(rep, rep, rep, rep), check_vma=False))
    evals = jax.jit(jax.shard_map(
        per_device_eval, mesh=mesh,
        in_specs=(rep, rep, rep, sg_spec) + rev_spec + lay_spec,
        out_specs=rep, check_vma=False))
    metrics = jax.jit(jax.shard_map(
        per_device_metrics, mesh=mesh,
        in_specs=(rep, rep, rep, P(axis), P(None, axis), sg_spec)
        + rev_spec + lay_spec,
        out_specs=rep, check_vma=False))
    return train, evals, metrics


def run_finetune_halo_parallel(ds: TAGDataset, cfg: FinetuneConfig, mesh,
                               pretrained=None, verbose: bool = False,
                               axis: str = "edge", pad_multiple: int = 128,
                               fused=None, hub_size: int = 2048,
                               interpret: bool = False,
                               edge_chunk: int = 512,
                               balance: bool = False,
                               order: str = "none"):
    """Full-graph node finetune on the halo layout (communication =
    boundary-feature all_to_all per layer instead of v1's [N, D] psum).

    ``fused`` switches the per-shard aggregation to the Pallas scatter +
    hub-dense kernels (default: on when running on TPU and
    ``cfg.use_fused_layout``; pass ``fused=True, interpret=True`` to
    exercise the fused path on CPU)."""
    # Unfrozen VQ is supported: make_halo_steps psums the EMA stats across
    # the node-shard axis (task_logits axis_name), so codebook updates
    # match single-device training — the r3 VERDICT item-3 lift.
    if fused is None:
        fused = (jax.default_backend() == "tpu"
                 and getattr(cfg, "use_fused_layout", False))
    if cfg.encoder.backbone != "sage":
        # the fused Pallas layouts encode SAGE message semantics; gcn/gin/
        # gat run their XLA halo formulations (parallel/halo.py)
        fused = False
    n_shards = int(mesh.shape[axis])
    if balance or order == "balance":
        # degree-balanced relabeling equalizes per-shard edge load
        # (SURVEY §7.3: power-law graphs skew range partitions) — but its
        # snake-deal by degree DESTROYS locality (BASELINE.md quantifies
        # the tradeoff vs RCM ownership)
        from stemgnn_tpu.parallel.halo import relabel_dataset_balanced
        ds, _ = relabel_dataset_balanced(ds, n_shards,
                                         pad_multiple=pad_multiple)
    elif order in ("rcm", "community"):
        # contiguous-community ownership: 1-D range partitions then own
        # contiguous communities (rcm for meshes/banded structure,
        # community = label-prop for modular graphs) — fewer boundary
        # edges AND in-shard locality for the windowed kernels; load
        # balance is whatever the community structure gives
        from stemgnn_tpu.train.graph_setup import reorder_dataset
        ds = reorder_dataset(ds, order, task=cfg.task)
    import time as _time

    moe = any(cfg.encoder.moe_layer_flags())
    layouts = edge_table = None
    t_build0 = _time.perf_counter()
    if fused:
        node_block = min(128, pad_multiple)
        sg, nb, sg_rev, layouts, edge_table = prepare_halo_graph(
            ds, n_shards, pad_multiple=pad_multiple, with_reversed=moe,
            fused=True, hub_size=hub_size, node_block=node_block,
            edge_chunk=edge_chunk)
    else:
        sg, nb, sg_rev = prepare_halo_graph(ds, n_shards,
                                            pad_multiple=pad_multiple,
                                            with_reversed=moe)
    t_build = _time.perf_counter() - t_build0
    n, n_pad = ds.num_nodes, n_shards * nb
    y_np = np.zeros(n_pad, np.int32)
    y_np[:n] = np.asarray(ds.labels)[:n]
    y = jnp.asarray(y_np.reshape(n_shards, nb))

    tx = optax.adamw(cfg.lr, weight_decay=0.01)
    train_step, eval_step, metrics_step = make_halo_steps(
        cfg, tx, mesh, y, axis=axis, with_reversed=moe, layouts=layouts,
        edge_table=edge_table, interpret=interpret)
    logger = Logger()
    rev_args = (sg_rev,) if moe else ()
    if layouts is not None:
        rev_args = rev_args + layouts

    for idx, split in enumerate(ds.splits[: cfg.repeat]):
        key = jax.random.PRNGKey(idx)
        key, k_init = jax.random.split(key)
        params, state = task_model.task_model_init(
            k_init, cfg,
            encoder_params=None if pretrained is None else _copy(pretrained["encoder_params"]),
            vq_params=None if pretrained is None else _copy(pretrained["vq_params"]),
            encoder_state=None if pretrained is None else _copy(pretrained["encoder_state"]),
            vq_state=None if pretrained is None else _copy(pretrained["vq_state"]))
        if cfg.use_vq and not bool(state["vq"]["initted"]):
            # the fused/layout graph for the one init forward — a raw
            # to_graph() materializes [E, D] edge features, which OOMs at
            # arxiv scale (the r1 XLA-path failure mode)
            from stemgnn_tpu.train.graph_setup import fused_full_graph
            params, state = task_model.maybe_kmeans_init_vq(
                params, state, cfg, fused_full_graph(ds, cfg), rng=k_init)
        trainable, frozen = _split_params(params, cfg)
        opt_state = tx.init(trainable)
        stopper = EarlyStopping(patience=cfg.early_stop)

        masks = {}
        for k in ("train", "valid", "test"):
            m = np.zeros(n_pad, bool)
            m[:n] = np.asarray(split[k])[:n]
            masks[k] = m
        train_mask = jnp.asarray(masks["train"].reshape(n_shards, nb))
        # all three split masks stacked for the on-device metrics step
        masks3 = jnp.asarray(np.stack(
            [masks[k].reshape(n_shards, nb)
             for k in ("train", "valid", "test")]))

        # Per-epoch dispatch stays (scan over shard_map wedges the
        # tunneled chip — docs/wedge.md), but the loop never reads
        # [N, C] predictions back: metrics come from the on-device
        # psum-of-correct-counts step (3 scalars per eval), train-step
        # dispatches pipeline asynchronously between evals, and
        # cfg.eval_every thins the eval dispatches like the graph task's
        # (r4 item 12).  The loss scalar is read only at eval epochs.
        eval_every = max(int(getattr(cfg, "eval_every", 1) or 1), 1)
        epoch_walls = []
        for epoch in range(cfg.epochs):
            t_ep = _time.perf_counter()
            key, k_step = jax.random.split(key)
            trainable, opt_state, state, loss = train_step(
                trainable, frozen, opt_state, state, k_step, train_mask, y,
                sg, *rev_args)
            if (epoch + 1) % eval_every and epoch + 1 < cfg.epochs:
                # no readback: train dispatches pipeline asynchronously
                epoch_walls.append(_time.perf_counter() - t_ep)
                continue
            accs = np.asarray(metrics_step(trainable, frozen, state, y,
                                           masks3, sg, *rev_args))
            result = {"train": float(accs[0]), "val": float(accs[1]),
                      "test": float(accs[2]),
                      "metric": task2metric[cfg.task]}
            logger.log(idx, epoch, {"loss": float(loss)}, result)
            epoch_walls.append(_time.perf_counter() - t_ep)
            if stopper(result):
                break
        if verbose and epoch_walls:
            b = logger.get_single_best(idx)
            timing = f"first epoch {epoch_walls[0]:.2f}s (incl. compile)"
            if len(epoch_walls) > 4:
                timing += (f", steady median "
                           f"{np.median(epoch_walls[2:]) * 1e3:.0f} "
                           f"ms/epoch")
            print(f"[halo split {idx}] best val={b['val']:.2f} "
                  f"test={b['test']:.2f} | build {t_build:.2f}s, "
                  f"{timing} ({len(epoch_walls)} epochs)")
    return logger


def run_finetune_edge_parallel(ds: TAGDataset, cfg: FinetuneConfig, mesh,
                               pretrained=None, verbose: bool = False,
                               axis: str = "edge"):
    """Full-graph node finetune with edges sharded over ``mesh[axis]``."""
    n_shards = int(mesh.shape[axis])
    sg = prepare_sharded_graph(ds, n_shards)
    n, n_pad = ds.num_nodes, sg["n_pad"]
    y_np = np.zeros(n_pad, np.int32)
    y_np[:n] = np.asarray(ds.labels)[:n]
    y = jnp.asarray(y_np)

    tx = optax.adamw(cfg.lr, weight_decay=0.01)
    train_step, eval_step = make_edge_parallel_steps(cfg, tx, mesh, y,
                                                     axis=axis)
    logger = Logger()
    splits = ds.splits[: cfg.repeat]
    # sg["n_pad"] is host metadata, not a device array
    sg_dev = {k: v for k, v in sg.items() if k != "n_pad"}
    sg_dev["n_pad"] = jnp.asarray(n_pad)

    for idx, split in enumerate(splits):
        key = jax.random.PRNGKey(idx)
        key, k_init = jax.random.split(key)
        params, state = task_model.task_model_init(
            k_init, cfg,
            encoder_params=None if pretrained is None else _copy(pretrained["encoder_params"]),
            vq_params=None if pretrained is None else _copy(pretrained["vq_params"]),
            encoder_state=None if pretrained is None else _copy(pretrained["encoder_state"]),
            vq_state=None if pretrained is None else _copy(pretrained["vq_state"]))
        if cfg.use_vq and not bool(state["vq"]["initted"]):
            from stemgnn_tpu.train.graph_setup import fused_full_graph
            params, state = task_model.maybe_kmeans_init_vq(
                params, state, cfg, fused_full_graph(ds, cfg), rng=k_init)
        trainable, frozen = _split_params(params, cfg)
        opt_state = tx.init(trainable)
        stopper = EarlyStopping(patience=cfg.early_stop)

        masks = {}
        for k in ("train", "valid", "test"):
            m = np.zeros(n_pad, bool)
            m[:n] = np.asarray(split[k])[:n]
            masks[k] = m
        train_mask = jnp.asarray(masks["train"])

        for epoch in range(cfg.epochs):
            key, k_step = jax.random.split(key)
            trainable, opt_state, state, loss = train_step(
                trainable, frozen, opt_state, state, k_step, train_mask,
                sg_dev)
            pred = np.asarray(eval_step(trainable, frozen, state, sg_dev))
            result = {k2: evaluate(pred, y_np, masks[k1], cfg.task)
                      for k1, k2 in [("train", "train"), ("valid", "val"),
                                     ("test", "test")]}
            result["metric"] = task2metric[cfg.task]
            logger.log(idx, epoch, {"loss": float(loss)}, result)
            if stopper(result):
                break
        if verbose:
            b = logger.get_single_best(idx)
            print(f"[edge-parallel split {idx}] best val={b['val']:.2f} "
                  f"test={b['test']:.2f}")
    return logger
