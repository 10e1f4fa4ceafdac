"""Pretraining driver.

Re-design of STEM-GNN/pretrain.py:25-167: per epoch, weighted seed-node
resampling over the merged multi-dataset graph, neighbor-sampled padded
batches, one jitted train step per batch (augment -> 4 recon losses + VQ
losses -> AdamW + clip 1.0 + cosine schedule -> EMA teacher update), encoder
and VQ checkpoints per epoch.

TPU-native structure: the augmentation (column feature mask + undirected edge
dropout, pretrain.py:41-45) runs *inside* the jitted step from an RNG key;
the EMA teacher update is a pure tree lerp fused into the same step (the
reference calls it per batch, pretrain.py:66).  Under a device mesh the same
step runs data-parallel with psum-ed gradients + codebook statistics
(see stemgnn_tpu/parallel).
"""

from __future__ import annotations

import os
import time
from typing import Optional, Sequence

import jax
import numpy as np
import optax

from stemgnn_tpu.core.config import PretrainConfig
from stemgnn_tpu.data.sampler import (CSCGraph, NeighborBatchIterator,
                                      get_train_node_idx)
from stemgnn_tpu.models.pretrain import (ema_update_teacher, pretrain_forward,
                                         pretrain_init)
from stemgnn_tpu.train import augment
from stemgnn_tpu.train.optim import make_optimizer
from stemgnn_tpu.utils import checkpoint as ckpt


def make_pretrain_step(cfg: PretrainConfig, tx, *, bs: int,
                       axis_name: Optional[str] = None,
                       donate: bool = False, indexed: bool = False):
    # Donation is off by default: freshly-initialized trees can alias
    # identical constant buffers (zeros/ones, teacher copies), which XLA
    # rejects when donated twice.  Enable for long TPU runs after the first
    # step's buffers are unique.
    """Build the jitted pretrain step.

    Step signature: (params, teacher, opt_state, state, graph, rng) ->
    (params, teacher, opt_state, state, metrics).  With ``indexed=True`` the
    signature gains trailing ``(node_table, edge_table)`` arguments and the
    graph is an :class:`~stemgnn_tpu.core.graph.IndexedGraph`; features are
    gathered on device (the tables stay resident — per-step transfer is ids
    only).
    """

    def step(params, teacher, opt_state, state, g, rng, node_table=None,
             edge_table=None, layout=None):
        if indexed:
            from stemgnn_tpu.core.graph import materialize_graph
            g = materialize_graph(g, node_table, edge_table)
        k_aug_feat, k_aug_edge, k_fwd = jax.random.split(rng, 3)
        aug_feat = augment.mask_feature(k_aug_feat, g.node_feat, cfg.feat_p)
        drop_seed = augment.dropout_edge_seed(k_aug_edge)
        aug_mask = augment.dropout_edges_undirected_seeded(
            drop_seed, g.senders, g.receivers, g.edge_mask, cfg.edge_p)
        aug_g = g.replace(node_feat=aug_feat, edge_mask=aug_mask)

        def loss_fn(params):
            return pretrain_forward(params, teacher, state, cfg, aug_g, g,
                                    bs=bs, rng=k_fwd, training=True,
                                    axis_name=axis_name, layout=layout,
                                    edge_table=edge_table,
                                    drop_seed=drop_seed)

        (loss, (aux, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if cfg.vq.ema_update:
            from stemgnn_tpu.vq import adopt_ema_embed
            params = dict(params, vq=adopt_ema_embed(params["vq"],
                                                     new_state["vq"]))
        teacher = ema_update_teacher(teacher, params["encoder"],
                                     cfg.sem_encoder_decay)
        metrics = dict(aux["losses"], loss=loss)
        return params, teacher, opt_state, new_state, metrics

    return jax.jit(step, donate_argnums=(0, 1, 2, 3) if donate else ())


def make_pretrain_loop_step(cfg: PretrainConfig, tx, *, bs: int,
                            donate: bool = False, indexed: bool = False):
    """The steady-state loop step: same computation as
    :func:`make_pretrain_step` but carrying the RNG key and a running metric
    sum *inside* the jitted program.

    Over a remote-dispatch transport every host->device call costs a round
    trip, so the per-step ``jax.random.split`` and the per-metric
    accumulation adds must ride the one step dispatch.  Signature:
    (params, teacher, opt_state, state, g, key, metrics_sum[, tables]) ->
    (params, teacher, opt_state, state, new_key, new_metrics_sum).
    """
    import jax.numpy as jnp

    def loop_step(params, teacher, opt_state, state, g, key, metrics_sum,
                  node_table=None, edge_table=None, layout=None):
        key, k_step = jax.random.split(key)
        if indexed:
            from stemgnn_tpu.core.graph import materialize_graph
            g = materialize_graph(g, node_table, edge_table)
        k_aug_feat, k_aug_edge, k_fwd = jax.random.split(k_step, 3)
        aug_feat = augment.mask_feature(k_aug_feat, g.node_feat, cfg.feat_p)
        drop_seed = augment.dropout_edge_seed(k_aug_edge)
        aug_mask = augment.dropout_edges_undirected_seeded(
            drop_seed, g.senders, g.receivers, g.edge_mask, cfg.edge_p)
        aug_g = g.replace(node_feat=aug_feat, edge_mask=aug_mask)

        def loss_fn(params):
            return pretrain_forward(params, teacher, state, cfg, aug_g, g,
                                    bs=bs, rng=k_fwd, training=True,
                                    layout=layout, edge_table=edge_table,
                                    drop_seed=drop_seed)

        (loss, (aux, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if cfg.vq.ema_update:
            from stemgnn_tpu.vq import adopt_ema_embed
            params = dict(params, vq=adopt_ema_embed(params["vq"],
                                                     new_state["vq"]))
        teacher = ema_update_teacher(teacher, params["encoder"],
                                     cfg.sem_encoder_decay)
        metrics = dict(aux["losses"], loss=loss)
        metrics_sum = jax.tree_util.tree_map(jnp.add, metrics_sum, metrics)
        return params, teacher, opt_state, new_state, key, metrics_sum

    return jax.jit(loop_step,
                   donate_argnums=(0, 1, 2, 3, 5, 6) if donate else ())


def maybe_kmeans_seed_vq(params, state, cfg: PretrainConfig, merged,
                         weights, k_init, csc=None):
    """Seed the VQ codebook by k-means over one sampled batch's encoder
    embeddings when ``cfg.vq.kmeans_init`` and the codebook is not yet
    initted.

    The reference's VQ lazily k-means-inits from the first forward when
    kmeans_init is set (vq.py:646, triggered via the dummy forward in
    utils/others.py:168-170); this is the functional analog for BOTH
    pretrain drivers (run_pretrain and parallel.halo_pretrain) — without
    it, training runs (and silently NaNs under a cosine codebook) from an
    all-zero codebook.  The reference pretrain entry uses
    kmeans_init=False (pretrain.py:117) so default recipes are unaffected.
    """
    if not cfg.vq.kmeans_init or bool(np.asarray(state["vq"]["initted"])):
        return params, state
    import jax.numpy as jnp

    from stemgnn_tpu.core.graph import materialize_graph
    from stemgnn_tpu.nn.encoder import encoder_apply
    from stemgnn_tpu.vq import vq_kmeans_init
    if csc is None:
        csc = CSCGraph.from_edge_index(np.asarray(merged["edge_index"]),
                                       merged["x"].shape[0])
    seeds0 = get_train_node_idx(np.asarray(merged["ptr"]), weights,
                                np.random.default_rng(cfg.seed))
    it0 = NeighborBatchIterator(
        csc, merged["node_text_feat"], merged.get("edge_text_feat"),
        merged["x"], merged.get("xe"), seeds0,
        min(cfg.batch_size, len(seeds0)),
        [cfg.fanout] * cfg.encoder.num_layers,
        np.random.default_rng(cfg.seed), drop_last=False, indexed=True)
    g0 = next(iter(it0))[0]
    gm = materialize_graph(
        g0, jnp.asarray(np.asarray(merged["node_text_feat"], np.float32)),
        None if merged.get("edge_text_feat") is None else
        jnp.asarray(np.asarray(merged["edge_text_feat"], np.float32)))
    z0, _, _ = encoder_apply(
        params["encoder"], state["encoder"], cfg.encoder, gm.node_feat,
        gm.senders, gm.receivers, edge_feat=gm.edge_feat,
        edge_mask=gm.edge_mask, node_mask=gm.node_mask, training=False)
    vq_p, vq_s = vq_kmeans_init(k_init, params["vq"], state["vq"], cfg.vq,
                                z0, mask=gm.node_mask)
    return dict(params, vq=vq_p), dict(state, vq=vq_s)


def run_pretrain(merged, cfg: PretrainConfig, *, weights: Sequence[float],
                 save_root: Optional[str] = None, log_fn=None,
                 max_steps: Optional[int] = None, verbose: bool = True,
                 mesh=None, resume: bool = False, donate: bool = False):
    """Pretrain over a merged multi-dataset payload.

    ``merged``: dict with node_text_feat, edge_text_feat, x, xe,
    edge_index [2, E], ptr (dataset node offsets) — the analog of the
    ``Batch.from_data_list`` pretrain graph (process_datasets.py:170-182).

    ``mesh``: a jax.sharding.Mesh with a 'data' axis enables data-parallel
    training — each device consumes its own seed batch per step; gradients +
    VQ codebook statistics + BatchNorm stats psum over the axis
    (parallel.data_parallel).

    Returns (params, teacher, state, history).
    """
    rng_np = np.random.default_rng(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)
    key, k_init = jax.random.split(key)

    params, teacher, state = pretrain_init(k_init, cfg)

    num_nodes = merged["x"].shape[0]
    csc = CSCGraph.from_edge_index(np.asarray(merged["edge_index"]), num_nodes)

    tx = make_optimizer(cfg.lr, cfg.weight_decay, grad_clip=cfg.grad_clip,
                        use_scheduler=cfg.use_scheduler, epochs=cfg.epochs,
                        steps_per_epoch=1)
    opt_state = tx.init(params)

    start_epoch = 0
    if resume and save_root is not None:
        bundle, saved_epoch = load_resume_bundle(save_root)
        if bundle is not None:
            params = ckpt.restore_like(params, bundle["params"])
            teacher = ckpt.restore_like(teacher, bundle["teacher"])
            state = ckpt.restore_like(state, bundle["state"])
            if "opt_state" in bundle:
                opt_state = ckpt.restore_like(opt_state, bundle["opt_state"])
            if "rng_key" in bundle:
                import jax.numpy as jnp
                key = jnp.asarray(bundle["rng_key"])
            start_epoch = saved_epoch
            if verbose:
                print(f"[pretrain] resumed from epoch {saved_epoch}")
    # Device-resident feature tables; batches carry indices only
    # (IndexedGraph) so per-step host->device traffic is ~D x smaller.
    import jax.numpy as jnp
    # bf16 training also stores the feature tables in bf16 (halves the
    # per-step feature-gather traffic; the encoder computes in bf16 anyway)
    tdt = jnp.bfloat16 if cfg.encoder.compute_dtype == "bfloat16" \
        else jnp.float32
    node_table = jnp.asarray(
        np.asarray(merged["node_text_feat"], np.float32)).astype(tdt)
    etf = merged.get("edge_text_feat")
    edge_table = None if etf is None else jnp.asarray(
        np.asarray(etf, np.float32)).astype(tdt)

    params, state = maybe_kmeans_seed_vq(params, state, cfg, merged,
                                         weights, k_init, csc=csc)

    n_dev = 1
    dp_loop_step = None
    if mesh is not None:
        from stemgnn_tpu.parallel.data_parallel import (
            device_put_replicated, make_dp_pretrain_loop_step,
            make_dp_pretrain_step, stack_graphs)
        n_dev = int(mesh.shape["data"])
        dp_step = make_dp_pretrain_step(cfg, tx, mesh, bs=cfg.batch_size,
                                        indexed=True)
        dp_loop = make_dp_pretrain_loop_step(cfg, tx, mesh,
                                             bs=cfg.batch_size, indexed=True)

        def dp_loop_step(params, teacher, opt_state, state, graphs, key,
                         metrics_sum):
            return dp_loop(params, teacher, opt_state, state,
                           stack_graphs(graphs), key, metrics_sum,
                           node_table, edge_table)
        node_table = device_put_replicated(node_table, mesh)
        edge_table = None if edge_table is None else \
            device_put_replicated(edge_table, mesh)

        def step_fn(params, teacher, opt_state, state, graphs_and_key):
            graphs, k = graphs_and_key
            rngs = jax.random.split(k, n_dev)
            return dp_step(params, teacher, opt_state, state,
                           stack_graphs(graphs), rngs, node_table,
                           edge_table)
    else:
        # First step of each epoch runs the plain step (freshly-initialized
        # trees can alias identical constant buffers — zeros, teacher
        # deepcopies — which XLA rejects when donated twice); steady-state
        # steps run the loop step, which advances the RNG key and
        # accumulates the metric sums INSIDE the jitted program (over a
        # remote-dispatch transport every extra host call is a round trip)
        # and donates from the second call on when requested.
        single_step = make_pretrain_step(cfg, tx, bs=cfg.batch_size,
                                         indexed=True)
        loop_step = make_pretrain_loop_step(cfg, tx, bs=cfg.batch_size,
                                            donate=donate, indexed=True)

    def batch_layout(g):
        """Per-batch edge layout for the fused minibatch path (host numpy —
        IndexedGraph leaves are numpy; transfers ride the step dispatch)."""
        from stemgnn_tpu.ops.edge_layout import build_edge_layout
        return build_edge_layout(g.senders, g.receivers, g.num_nodes_padded,
                                 xe_ids=g.xe_ids, edge_mask=g.edge_mask,
                                 to_device=False)

    # "auto" resolves to off for now: measured net-neutral-to-slower on
    # v5e (PretrainConfig.fused_minibatch docstring)
    use_batch_layouts = (mesh is None
                         and jax.default_backend() == "tpu"
                         and cfg.encoder.backbone == "sage"
                         and cfg.fused_minibatch == "on")

    from stemgnn_tpu.utils.observability import (PreemptionHandler,
                                                 ThroughputMeter)
    preempt = PreemptionHandler()
    meter = ThroughputMeter()

    history = []
    total_steps = 0
    try:
        for epoch in range(start_epoch + 1, cfg.epochs + 1):
            seeds = get_train_node_idx(np.asarray(merged["ptr"]), weights,
                                       rng_np)
            it = NeighborBatchIterator(
                csc, merged["node_text_feat"], merged.get("edge_text_feat"),
                merged["x"], merged.get("xe"), seeds, cfg.batch_size,
                [cfg.fanout] * cfg.encoder.num_layers, rng_np,
                drop_last=True, indexed=True)
            t0 = time.time()
            # Metrics accumulate ON DEVICE; a float()/device_get per step
            # would serialize the async dispatch pipeline with one blocking
            # readback per scalar (hundreds of tunnel round-trips per epoch).
            metrics_sum = None
            steps_epoch = 0
            pending = []
            for g, n_seeds, _ in it:
                pending.append(g)
                if len(pending) < n_dev:
                    continue
                if log_fn is not None or metrics_sum is None:
                    # plain step: returns this step's metrics (first step of
                    # an epoch, or per-step logging — which opts into one
                    # blocking readback per step)
                    key, k_step = jax.random.split(key)
                    if mesh is not None:
                        params, teacher, opt_state, state, metrics = step_fn(
                            params, teacher, opt_state, state,
                            (pending, k_step))
                    else:
                        params, teacher, opt_state, state, metrics = \
                            single_step(params, teacher, opt_state, state,
                                        pending[0], k_step, node_table,
                                        edge_table,
                                        batch_layout(pending[0])
                                        if use_batch_layouts else None)
                    metrics_sum = metrics if metrics_sum is None else \
                        jax.tree_util.tree_map(jax.numpy.add, metrics_sum,
                                               metrics)
                    if log_fn is not None:
                        log_fn({f"losses/{k}": float(v)
                                for k, v in metrics.items()})
                elif mesh is not None:
                    params, teacher, opt_state, state, key, metrics_sum = \
                        dp_loop_step(params, teacher, opt_state, state,
                                     pending, key, metrics_sum)
                else:
                    # steady state: RNG advance + metric accumulation ride
                    # the one jitted dispatch (and donate buffers if asked)
                    params, teacher, opt_state, state, key, metrics_sum = \
                        loop_step(params, teacher, opt_state, state,
                                  pending[0], key, metrics_sum, node_table,
                                  edge_table,
                                  batch_layout(pending[0])
                                  if use_batch_layouts else None)
                steps_epoch += 1
                meter.update(sum(int(p.num_edges_padded) for p in pending),
                             sum(int(p.num_nodes_padded) for p in pending))
                pending = []
                total_steps += 1
                if (max_steps is not None and total_steps >= max_steps) \
                        or preempt.should_stop:
                    break
            if steps_epoch == 0 and n_dev > 1:
                print(f"[pretrain] WARNING: epoch produced 0 steps — fewer "
                      f"than {n_dev} seed batches per epoch (leftover "
                      f"batches are dropped in data-parallel mode); reduce "
                      f"batch_size or raise dataset weights")
            mean_metrics = {
                k: float(v) / steps_epoch for k, v in
                jax.device_get(metrics_sum).items()} if steps_epoch else {}
            mean_metrics.update(meter.rates())
            history.append(mean_metrics)
            if verbose:
                msg = " ".join(f"{k}={v:.4f}" for k, v in mean_metrics.items()
                               if not k.startswith("throughput"))
                print(f"[pretrain] epoch {epoch}/{cfg.epochs} "
                      f"({time.time()-t0:.1f}s, {steps_epoch} steps) "
                      f"{msg}")
            if save_root is not None and (
                    epoch % max(cfg.save_every, 1) == 0
                    or epoch == cfg.epochs):
                # per-epoch checkpoint (crash/preemption recovery,
                # reference pretrain.py:160-165; cfg.save_every thins it).
                # Async when buffers are not donated: the D2H readback
                # (~seconds over tunneled transports) streams in a writer
                # thread while the next epoch dispatches.
                save_checkpoint(save_root, epoch, params, teacher,
                                state, opt_state=opt_state,
                                rng_key=key, async_save=not donate)
            if (max_steps is not None and total_steps >= max_steps):
                break
            if preempt.should_stop:
                if verbose:
                    print("[pretrain] preemption signal received — "
                          "checkpointed and stopping")
                break
    finally:
        preempt.restore()
        flush_checkpoint_writes()
    return params, teacher, state, history


_SAVE_EXECUTOR = None
_SAVE_FUTURES = []


def flush_checkpoint_writes():
    """Block until all async checkpoint writes land.  Waits on every
    pending write, always clears the queue, then re-raises the first
    error (a stale queue would poison a later run in the same process)."""
    global _SAVE_FUTURES
    pending, _SAVE_FUTURES = _SAVE_FUTURES, []
    first_err = None
    for f in pending:
        try:
            f.result()
        except Exception as exc:   # noqa: BLE001 — surfaced below
            first_err = first_err or exc
    if first_err is not None:
        raise first_err


def save_checkpoint(save_root: str, epoch: int, params, teacher, state,
                    opt_state=None, rng_key=None, async_save: bool = False):
    """Separable encoder/VQ checkpoints (pretrain.py:160-165 analog) plus the
    full train-state bundle (params + opt + EMA buffers + RNG) for exact
    resume (SURVEY.md §5 checkpoint/resume).

    ``async_save``: schedule the device->host copies without blocking and
    write the files from a single ordered writer thread.  Callers that
    donate train-state buffers must save synchronously (a donated array's
    buffer is invalidated by the next step before the copy could run)."""
    global _SAVE_EXECUTOR
    trees = {"params": params, "teacher": teacher, "state": state,
             "opt_state": opt_state, "rng_key": rng_key}

    def write(trees):
        params, teacher, state = (trees["params"], trees["teacher"],
                                  trees["state"])
        os.makedirs(save_root, exist_ok=True)
        ckpt.save_pytree(os.path.join(save_root, f"encoder_{epoch}.npz"),
                         {"params": params["encoder"],
                          "state": state["encoder"]})
        ckpt.save_pytree(os.path.join(save_root, f"vq_{epoch}.npz"),
                         {"params": params["vq"], "state": state["vq"]})
        bundle = {"params": params, "teacher": teacher, "state": state,
                  "epoch": np.asarray(epoch)}
        if trees["opt_state"] is not None:
            bundle["opt_state"] = jax.tree_util.tree_map(
                np.asarray, trees["opt_state"])
        if trees["rng_key"] is not None:
            bundle["rng_key"] = np.asarray(trees["rng_key"])
        ckpt.save_pytree(os.path.join(save_root, f"full_{epoch}.npz"), bundle)

    if not async_save:
        write(trees)
        return
    for leaf in jax.tree_util.tree_leaves(trees):
        if isinstance(leaf, jax.Array):
            try:
                leaf.copy_to_host_async()
            except Exception:
                pass
    if _SAVE_EXECUTOR is None:
        from concurrent.futures import ThreadPoolExecutor
        _SAVE_EXECUTOR = ThreadPoolExecutor(max_workers=1)  # ordered writes
    # backpressure: at most 2 queued snapshots (each pins a full train
    # state's buffers until written); also surfaces write errors promptly
    while len(_SAVE_FUTURES) >= 2:
        _SAVE_FUTURES.pop(0).result()
    _SAVE_FUTURES.append(_SAVE_EXECUTOR.submit(write, trees))


def load_resume_bundle(save_root: str):
    """Latest full_<epoch>.npz -> (bundle dict, epoch) or (None, 0)."""
    path = ckpt.latest_checkpoint(save_root, "full")
    if path is None:
        return None, 0
    bundle = ckpt.load_pytree(path)
    return bundle, int(bundle.get("epoch", 0))


def load_pretrained_for_finetune(path_encoder: str, path_vq: str):
    """Load the separable checkpoints into the finetune bundle format
    (finetune.py:174-177)."""
    enc = ckpt.load_pytree(path_encoder)
    vq = ckpt.load_pytree(path_vq)
    return {"encoder_params": enc["params"], "encoder_state": enc["state"],
            "vq_params": vq["params"], "vq_state": vq["state"]}
