"""Finetune driver + task loops (node / link / graph).

Re-design of STEM-GNN/finetune.py:82-293 and STEM-GNN/task/{node,link,graph}.py
as jitted fixed-shape step functions:

  * full-batch node (task/node.py:45-66): encode full graph, CE over the
    train mask.  The reference slices ``z[train_mask]`` before the decoder;
    here the decoder runs over all padded rows and the loss is mask-weighted —
    identical gradients (per-row ops), static shapes.
  * full-batch link (task/link.py:19-48): midpoint edge embeddings
    ``(z_u + z_v)/2`` over labeled edges, CE over the edge train mask.
  * graph (task/graph.py:7-53): padded disjoint batches, mean pooling,
    multitask masked BCE, per-task AUC eval.

Per split: fresh TaskModel from (pretrained) encoder/VQ copies + new decoder
(finetune.py:196-205), AdamW (torch default weight decay 0.01), early stopping
on val, best-epoch selection via Logger (STEM-GNN/utils/logger.py).
VQ params are excluded from the optimizer when frozen (finetune.py:179-181).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stemgnn_tpu.core.config import FinetuneConfig
from stemgnn_tpu.core.graph import batch_graphs, round_up
from stemgnn_tpu.data.dataset import TAGDataset
from stemgnn_tpu.models import task as task_model
from stemgnn_tpu.utils import EarlyStopping, Logger
from stemgnn_tpu.utils.metrics import evaluate, task2metric


def _split_params(params, cfg: FinetuneConfig):
    """Partition into (trainable, frozen) — frozen VQ stays out of the
    optimizer so it receives neither updates nor weight decay."""
    if cfg.freeze_vq:
        trainable = {k: v for k, v in params.items() if k != "vq"}
        frozen = {"vq": params["vq"]}
    else:
        trainable, frozen = dict(params), {}
    return trainable, frozen


def _merge(trainable, frozen):
    return {**trainable, **frozen}


def _copy(tree):
    return jax.tree_util.tree_map(lambda x: x, tree)


def _make_model_saver(save_model_to: str, cfg: FinetuneConfig,
                      verbose: bool = False):
    """Shared best-val model snapshot + final save (finetune.py
    --save_model), used by every task family so the saved-meta schema
    cannot drift between them.  Returns (maybe_snap, save_final)."""
    best_model = {"val": -1.0}

    def maybe_snap(trainable, frozen, state, val):
        if save_model_to and val > best_model["val"]:
            best_model.update(val=val, params=_merge(
                jax.device_get(trainable), jax.device_get(frozen)),
                state=jax.device_get(state))

    def save_final():
        if not (save_model_to and "params" in best_model):
            return
        import dataclasses

        from stemgnn_tpu.utils import checkpoint as _ckpt
        _ckpt.save_pytree(
            save_model_to,
            {"params": best_model["params"], "state": best_model["state"]},
            meta={"config": dataclasses.asdict(cfg),
                  "best_val": best_model["val"], "task": cfg.task,
                  "dataset": cfg.dataset})
        if verbose:
            print(f"[save_model] best-val model (val="
                  f"{best_model['val']:.2f}) -> {save_model_to}")

    return maybe_snap, save_final


# ------------------------------------------------------------------ node/link

def _make_node_steps(cfg: FinetuneConfig, task_kind: str):
    """Build jitted (train_step, eval_step) functions for full-batch
    node/link.  The graph and labels are step ARGUMENTS, not closures —
    closing over them would bake the full feature matrices into the
    executable as constants (hundreds of MB at WN18RR/arxiv scale, which
    also overflows remote-compile payload limits on tunneled TPUs).

    For links, ``y`` is per-edge and the mask arrays index edges; edge
    embeddings are midpoints of the graph's labeled edge endpoints.
    """

    def forward(params, state, graph, rng, training):
        z, state, aux = task_model.encode(params, state, cfg, graph,
                                          training=training, rng=rng)
        if task_kind == "link":
            z = (z[graph.senders] + z[graph.receivers]) / 2.0
            row_mask = graph.edge_mask
        else:
            row_mask = graph.node_mask
        logits, commit, state = task_model.task_logits(
            params, state, cfg, z, training=training, rng=rng, mask=row_mask)
        return logits, state, aux

    def train_step(trainable, frozen, opt_state, state, rng, train_mask,
                   graph, y, tx):
        def loss_fn(trainable):
            params = _merge(trainable, frozen)
            logits, new_state, aux = forward(params, state, graph, rng, True)
            act = task_model.activation_loss(logits, y, task="single",
                                             mask=train_mask.astype(jnp.float32))
            jac = task_model.decoder_jacobian_penalty(params, cfg)
            env = cfg.lamda_env * aux["env_reg"]
            return act + jac + env, (new_state, act, jac, env,
                                     aux["moe_stats"])
        (loss, (new_state, act, jac, env, moe_stats)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        if cfg.use_vq and not cfg.freeze_vq and cfg.vq.ema_update:
            from stemgnn_tpu.vq import adopt_ema_embed
            trainable = dict(trainable, vq=adopt_ema_embed(
                trainable["vq"], new_state["vq"]))
        losses = {"loss": loss, "act_loss": act, "jac_loss": jac,
                  "env_loss": env}
        return trainable, opt_state, new_state, losses, moe_stats

    def eval_step(trainable, frozen, state, graph):
        params = _merge(trainable, frozen)
        logits, _, _ = forward(params, state, graph, jax.random.PRNGKey(0),
                               False)
        return jax.nn.softmax(jnp.mean(logits, axis=1), axis=-1)

    return train_step, eval_step


_LOSS_KEYS = ("loss", "act_loss", "jac_loss", "env_loss")


def _make_epoch_chunk_step(cfg: FinetuneConfig, task_kind: str, tx,
                           chunk: int, donate: bool = False):
    """K full-batch training epochs + per-epoch eval in ONE dispatch.

    A lax.scan over (train step -> eval -> masked accuracy): predictions
    never leave the device; the host reads back one [K, 4] loss array and
    one [K, 3] train/val/test accuracy array per K epochs.  Per-epoch
    logging and early-stopping decisions are unchanged (the host replays
    the K per-epoch results in order) — the reference's per-epoch eval
    cadence (finetune.py:217-247) at 2 readbacks per K epochs.
    """
    train_step_fn, eval_step_fn = _make_node_steps(cfg, task_kind)

    def run_chunk(trainable, frozen, opt_state, state, key, train_mask,
                  graph, y, eval_masks):
        def body(carry, _):
            trainable, opt_state, state, key = carry
            key, k = jax.random.split(key)
            trainable, opt_state, state, losses, _ = train_step_fn(
                trainable, frozen, opt_state, state, k, train_mask, graph,
                y, tx)
            probs = eval_step_fn(trainable, frozen, state, graph)
            correct = (jnp.argmax(probs, axis=-1) == y).astype(jnp.float32)
            accs = jnp.stack([
                100.0 * jnp.sum(correct * m) / jnp.maximum(jnp.sum(m), 1.0)
                for m in eval_masks])
            lvec = jnp.stack([losses[k2] for k2 in _LOSS_KEYS])
            return (trainable, opt_state, state, key), (lvec, accs)

        (trainable, opt_state, state, key), (lvecs, accs) = jax.lax.scan(
            body, (trainable, opt_state, state, key), None, length=chunk)
        return trainable, opt_state, state, key, lvecs, accs

    return jax.jit(run_chunk, donate_argnums=(0, 2, 3, 4) if donate else ())


def _repad_indexed(ig, n_pad: int, e_pad: int):
    """Re-pad a numpy-leaf IndexedGraph to larger buckets (bucket
    escalation mid-chunk: every batch in a stacked scan must share one
    shape)."""
    def pad1(a, w, fill=0):
        out = np.full(w, fill, np.asarray(a).dtype)
        out[: len(a)] = a
        return out
    return ig.replace(
        node_ids=pad1(ig.node_ids, n_pad),
        senders=pad1(ig.senders, e_pad),
        receivers=pad1(ig.receivers, e_pad),
        node_mask=pad1(ig.node_mask, n_pad, False),
        edge_mask=pad1(ig.edge_mask, e_pad, False),
        xe_ids=None if ig.xe_ids is None else pad1(ig.xe_ids, e_pad))


def _make_link_mb_chunk_step(cfg: FinetuneConfig, tx):
    """K minibatch-link training EPOCHS + one full-batch eval per epoch in
    ONE dispatch (round-2 VERDICT item 4: the reference FB15K237 preset is
    3000 epochs of LinkNeighborLoader minibatches — per-epoch host
    dispatch/readback over the tunnel dominates otherwise).

    Batches are pre-sampled on host into a stacked pytree with leading
    [K, B] axes (numpy leaves — one transfer at dispatch); a nested
    lax.scan trains over them, and each epoch ends with the full-graph
    link eval and masked accuracies (predictions never leave the device).
    Reference semantics per batch: task/link.py:55-81."""
    from stemgnn_tpu.core.graph import materialize_graph
    _, eval_step_fn = _make_node_steps(cfg, "link")

    @jax.jit
    def run_chunk(trainable, frozen, opt_state, state, key, batches,
                  node_table, edge_table, graph, y_full, eval_masks):
        def batch_body(carry, b):
            trainable, opt_state, state, key = carry
            ig, li, ri, yb, lmask = b
            key, k = jax.random.split(key)
            g = materialize_graph(ig, node_table, edge_table)

            def loss_fn(trainable):
                params = _merge(trainable, frozen)
                z, state2, aux = task_model.encode(params, state, cfg, g,
                                                   training=True, rng=k)
                edge_z = (z[li] + z[ri]) / 2.0
                logits, _, state3 = task_model.task_logits(
                    params, state2, cfg, edge_z, training=True, rng=k,
                    mask=lmask)
                act = task_model.activation_loss(
                    logits, yb, task="single",
                    mask=lmask.astype(jnp.float32))
                jac = task_model.decoder_jacobian_penalty(params, cfg)
                env = cfg.lamda_env * aux["env_reg"]
                return act + jac + env, (state3, act, jac, env)
            (loss, (new_state, act, jac, env)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(trainable)
            updates, opt_state = tx.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            lvec = jnp.stack([loss, act, jac, env])
            return (trainable, opt_state, new_state, key), lvec

        def epoch_body(carry, eb):
            carry, lvecs = jax.lax.scan(batch_body, carry, eb)
            trainable, opt_state, state, key = carry
            probs = eval_step_fn(trainable, frozen, state, graph)
            correct = (jnp.argmax(probs, axis=-1) == y_full).astype(
                jnp.float32)
            accs = jnp.stack([
                100.0 * jnp.sum(correct * m) / jnp.maximum(jnp.sum(m), 1.0)
                for m in eval_masks])
            return carry, (jnp.mean(lvecs, axis=0), accs)

        (trainable, opt_state, state, key), (lvecs, accs) = jax.lax.scan(
            epoch_body, (trainable, opt_state, state, key), batches)
        return trainable, opt_state, state, key, lvecs, accs

    return run_chunk


def _sample_link_epoch_batches(ds, cfg, it, edge_ids, rng_np, n_batches,
                               labels):
    """One epoch of link batches (shuffled; fixed count ``n_batches`` with
    the last batch partial via label_mask).  Returns a list of
    (IndexedGraph, li, ri, y, mask) numpy tuples."""
    bs = cfg.batch_size
    order = rng_np.permutation(len(edge_ids))
    out = []
    for i in range(n_batches):
        chunk = edge_ids[order[i * bs: (i + 1) * bs]]
        u = ds.edge_index[0][chunk]
        v = ds.edge_index[1][chunk]
        uniq, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
        g, _, _ = it.make_batch(uniq)
        li = np.zeros(bs, np.int32)
        ri = np.zeros(bs, np.int32)
        li[: len(chunk)] = inv[: len(chunk)]
        ri[: len(chunk)] = inv[len(chunk):]
        y_batch = np.zeros(bs, np.int32)
        y_batch[: len(chunk)] = labels[chunk]
        mask = np.arange(bs) < len(chunk)
        out.append((g, li, ri, y_batch, mask))
    return out


def _stack_link_batches(epochs_of_batches, n_floor: int = 0,
                        e_floor: int = 0):
    """[K][B] (ig, li, ri, y, mask) -> one pytree with [K, B] leading axes;
    graphs re-padded to max(buckets seen, floors).  Passing the iterator's
    CURRENT buckets as floors keeps stacked shapes identical across chunks
    once escalation settles (one compile)."""
    n_pad = max([b[0].num_nodes_padded for ep in epochs_of_batches
                 for b in ep] + [n_floor])
    e_pad = max([b[0].num_edges_padded for ep in epochs_of_batches
                 for b in ep] + [e_floor])
    fixed = [[(_repad_indexed(g, n_pad, e_pad), li, ri, y, m)
              for (g, li, ri, y, m) in ep] for ep in epochs_of_batches]
    rows = [jax.tree_util.tree_map(lambda *xs: np.stack(xs), *ep)
            for ep in fixed]
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *rows)


def _donation_safe(cfg: FinetuneConfig) -> bool:
    """Donating (trainable, opt_state, state) is unsafe when the EMA-adopt
    path re-aliases state leaves into trainable between steps (train_step's
    adopt_ema_embed) — XLA would see the same buffer donated twice."""
    return not (cfg.use_vq and not cfg.freeze_vq and cfg.vq.ema_update)


def _make_minibatch_train_step(cfg: FinetuneConfig, tx, task_kind: str,
                               donate: bool = False):
    """Jitted minibatch step for node/link (reference task/node.py:73-99,
    task/link.py:55-81).  Node: loss on the first ``bs`` seed rows.  Link:
    midpoint embeddings of the batch's labeled edge endpoints.

    Batches arrive as IndexedGraphs + device-resident feature tables
    (core.graph.materialize_graph) so per-step host->device traffic is ids
    only.  ``donate=True`` donates (trainable, opt_state, state) so long
    runs keep a single copy of the optimizer state in HBM."""
    from stemgnn_tpu.core.graph import materialize_graph

    donate_args = (0, 2, 3) if donate else ()

    @functools.partial(jax.jit, donate_argnums=donate_args)
    def node_step(trainable, frozen, opt_state, state, rng, g, y_batch,
                  seed_mask, node_table, edge_table):
        g = materialize_graph(g, node_table, edge_table)
        def loss_fn(trainable):
            params = _merge(trainable, frozen)
            z, state2, aux = task_model.encode(params, state, cfg, g,
                                               training=True, rng=rng)
            bs = y_batch.shape[0]
            logits, _, state3 = task_model.task_logits(
                params, state2, cfg, z[:bs], training=True, rng=rng,
                mask=seed_mask)
            act = task_model.activation_loss(
                logits, y_batch, task="single",
                mask=seed_mask.astype(jnp.float32))
            jac = task_model.decoder_jacobian_penalty(params, cfg)
            env = cfg.lamda_env * aux["env_reg"]
            return act + jac + env, (state3, act, jac, env)
        (loss, (new_state, act, jac, env)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, new_state, {
            "loss": loss, "act_loss": act, "jac_loss": jac, "env_loss": env}

    @functools.partial(jax.jit, donate_argnums=donate_args)
    def link_step(trainable, frozen, opt_state, state, rng, g, li, ri,
                  y_batch, label_mask, node_table, edge_table):
        g = materialize_graph(g, node_table, edge_table)
        def loss_fn(trainable):
            params = _merge(trainable, frozen)
            z, state2, aux = task_model.encode(params, state, cfg, g,
                                               training=True, rng=rng)
            edge_z = (z[li] + z[ri]) / 2.0
            logits, _, state3 = task_model.task_logits(
                params, state2, cfg, edge_z, training=True, rng=rng,
                mask=label_mask)
            act = task_model.activation_loss(
                logits, y_batch, task="single",
                mask=label_mask.astype(jnp.float32))
            jac = task_model.decoder_jacobian_penalty(params, cfg)
            env = cfg.lamda_env * aux["env_reg"]
            return act + jac + env, (state3, act, jac, env)
        (loss, (new_state, act, jac, env)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, new_state, {
            "loss": loss, "act_loss": act, "jac_loss": jac, "env_loss": env}

    return node_step if task_kind == "node" else link_step


def _minibatch_epoch(ds: TAGDataset, cfg: FinetuneConfig, task_kind: str,
                     split, rng_np, step, trainable, frozen, opt_state,
                     state, key):
    """One minibatch training epoch (NeighborLoader [fanout]*L semantics,
    utils/loader.py:10-45)."""
    from stemgnn_tpu.data.sampler import CSCGraph, NeighborBatchIterator
    import jax.numpy as _jnp
    csc = ds.extras.get("_csc")
    if csc is None:
        csc = CSCGraph.from_edge_index(np.asarray(ds.edge_index),
                                       ds.num_nodes)
        ds.extras["_csc"] = csc
    tables = ds.extras.get("_dev_tables")
    if tables is None:
        tables = (jnp.asarray(np.asarray(ds.node_text_feat, np.float32)),
                  None if ds.edge_text_feat is None else
                  jnp.asarray(np.asarray(ds.edge_text_feat, np.float32)))
        ds.extras["_dev_tables"] = tables
    node_table, edge_table = tables
    labels = np.asarray(ds.labels)
    losses = []           # device-side running SUM (one readback per epoch)
    n_batches = 0
    if task_kind == "node":
        seeds = np.nonzero(np.asarray(split["train"]))[0]
        it = NeighborBatchIterator(
            csc, ds.node_text_feat, ds.edge_text_feat, ds.x, ds.xe, seeds,
            cfg.batch_size, [cfg.fanout] * cfg.encoder.num_layers, rng_np,
            drop_last=False, indexed=True)
        for g, n_seeds, nodes in it:
            key, k = jax.random.split(key)
            bs = cfg.batch_size
            y_batch = np.zeros(bs, np.int32)
            y_batch[:n_seeds] = labels[nodes[:n_seeds]]
            seed_mask = np.arange(bs) < n_seeds
            trainable, opt_state, state, loss = step(
                trainable, frozen, opt_state, state, k, g,
                jnp.asarray(y_batch), jnp.asarray(seed_mask), node_table,
                edge_table)
            losses = [loss] if not losses else [jax.tree_util.tree_map(
                _jnp.add, losses[0], loss)]
            n_batches += 1
    else:
        edge_ids = np.nonzero(np.asarray(split["train"]))[0]
        rng_np.shuffle(edge_ids)
        bs = cfg.batch_size
        fanouts = [cfg.link_fanout] * cfg.encoder.num_layers
        # One iterator sized for 2*bs seeds -> stable padded shapes; seed
        # chunks are the VARIABLE-length unique endpoint sets (padding them
        # with repeats of a real node id made the sampler re-expand that
        # node once per duplicate slot: duplicated in-edges on its local
        # row + inflated closures that truncated real edges — round-2
        # VERDICT defect).  Device shapes depend only on the pad buckets,
        # not the seed count.  Padding probes must see the REAL seed
        # distribution (edge endpoints are degree-biased: larger closures
        # than uniform nodes).
        def _endpoint_chunk(ids):
            u = np.asarray(ds.edge_index[0])[ids]
            v = np.asarray(ds.edge_index[1])[ids]
            return np.unique(np.concatenate([u, v]))
        probe = [_endpoint_chunk(edge_ids[i * bs:(i + 1) * bs])
                 for i in range(min(12, max(len(edge_ids) // max(bs, 1), 1)))]
        it = NeighborBatchIterator(
            csc, ds.node_text_feat, ds.edge_text_feat, ds.x, ds.xe,
            np.arange(ds.num_nodes), 2 * bs, fanouts, rng_np, shuffle=False,
            indexed=True, probe_chunks=probe)
        for i in range(0, len(edge_ids), bs):
            chunk = edge_ids[i: i + bs]
            u = ds.edge_index[0][chunk]
            v = ds.edge_index[1][chunk]
            uniq, inv = np.unique(np.concatenate([u, v]),
                                  return_inverse=True)
            g, _, nodes = it.make_batch(uniq)
            li = np.zeros(bs, np.int32)
            ri = np.zeros(bs, np.int32)
            li[:len(chunk)] = inv[:len(chunk)]
            ri[:len(chunk)] = inv[len(chunk):]
            y_batch = np.zeros(bs, np.int32)
            y_batch[:len(chunk)] = labels[chunk]
            label_mask = np.arange(bs) < len(chunk)
            key, k = jax.random.split(key)
            trainable, opt_state, state, loss = step(
                trainable, frozen, opt_state, state, k, g,
                jnp.asarray(li), jnp.asarray(ri), jnp.asarray(y_batch),
                jnp.asarray(label_mask), node_table, edge_table)
            losses = [loss] if not losses else [jax.tree_util.tree_map(
                _jnp.add, losses[0], loss)]
            n_batches += 1
    return trainable, opt_state, state, key, losses, n_batches


def _select_step(nondonating, donating, first_flag):
    """First call per split runs non-donating (freshly-initialized trees can
    alias pretrained/constant buffers, which XLA rejects when donated);
    later calls donate — all buffers are then unique step outputs."""
    if donating is None:
        return nondonating

    def step(*args):
        if not first_flag[0]:
            return donating(*args)
        first_flag[0] = False
        return nondonating(*args)
    return step


def _run_node_like(ds: TAGDataset, cfg: FinetuneConfig,
                   pretrained=None, task_kind: str = "node",
                   verbose: bool = False, donate: bool = False,
                   save_model_to: str = ""):
    minibatch = cfg.batch_size != 0
    donate = donate and _donation_safe(cfg)
    # r5: layer-wise inference covers all four backbones (train/infer.py)
    chunked_eval = cfg.eval_chunked
    if not minibatch:
        # locality relabel for the fused full-batch path (pure node
        # permutation; labels/splits/features move together — graph_setup)
        from stemgnn_tpu.train.graph_setup import maybe_reorder_dataset
        ds = maybe_reorder_dataset(ds, cfg, task_kind)
    n_items = ds.num_nodes if task_kind == "node" else ds.num_edges
    if chunked_eval and minibatch:
        # Never materialize the full padded graph (the point of streaming
        # eval for huge datasets); pad_items mirrors make_graph defaults.
        graph = None
        pad_items = round_up(max(n_items, 1), 8 if task_kind == "node"
                             else 128)
    else:
        # fused-aggregation layout when on TPU (train/graph_setup.py);
        # under minibatch training this graph still drives full-batch eval
        from stemgnn_tpu.train.graph_setup import fused_full_graph
        graph = fused_full_graph(ds, cfg)
        pad_items = graph.num_nodes_padded if task_kind == "node" \
            else graph.num_edges_padded

    y_np = np.zeros(pad_items, dtype=np.int32)
    y_np[:n_items] = np.asarray(ds.labels)[:n_items]
    y = jnp.asarray(y_np)

    splits = ds.splits
    if len(splits) == 1 and cfg.repeat > 1:
        splits = splits * cfg.repeat
    splits = splits[: cfg.repeat]

    logger = Logger()
    # serving export (finetune.py --save_model): keep the best-val model
    # across splits; snapshot granularity matches each path's stop check
    # (per epoch, or per epoch-chunk on the scanned paths)
    maybe_snap, save_final = _make_model_saver(save_model_to, cfg, verbose)
    tx = optax.adamw(cfg.lr, weight_decay=0.01)
    train_step_fn, eval_step_fn = _make_node_steps(cfg, task_kind)
    train_step = jax.jit(lambda t, f, o, s, r, m, g, yy: train_step_fn(
        t, f, o, s, r, m, g, yy, tx))
    train_step_d = jax.jit(
        lambda t, f, o, s, r, m, g, yy: train_step_fn(t, f, o, s, r, m, g,
                                                      yy, tx),
        donate_argnums=(0, 2, 3)) if (donate and not minibatch) else None
    eval_step = jax.jit(eval_step_fn)
    mb_step = _make_minibatch_train_step(cfg, tx, task_kind) if minibatch \
        else None
    mb_step_d = _make_minibatch_train_step(cfg, tx, task_kind, donate=True) \
        if (donate and minibatch) else None
    # Epoch-chunked scan path: full-batch, whole-graph eval, no MoE usage
    # printing to honor (stats stay per-epoch in the fallback path).
    use_chunked_epochs = (not minibatch and not chunked_eval
                          and cfg.epoch_chunk > 0
                          and not any(cfg.encoder.moe_layer_flags()))
    # Early stopping acts at chunk granularity: a dispatched chunk trains
    # all K epochs before the stop check, so the kept params can include up
    # to K-1 post-stop updates (logger best-val selection is unaffected).
    # Cap K at the early-stop patience so a small patience bounds the
    # overshoot by itself (ADVICE r3).
    eff_chunk = (max(1, min(cfg.epoch_chunk, cfg.early_stop))
                 if cfg.early_stop and cfg.early_stop > 0
                 else cfg.epoch_chunk)
    chunk_step = chunk_step_d = None
    if use_chunked_epochs:
        chunk_step = _make_epoch_chunk_step(cfg, task_kind, tx, eff_chunk)
        chunk_step_d = _make_epoch_chunk_step(cfg, task_kind, tx,
                                              eff_chunk, donate=True) \
            if donate else None
    # Minibatch-link epoch chunking (r2 VERDICT item 4): K epochs of
    # pre-sampled batches + per-epoch full-batch eval per dispatch.
    use_chunked_mb_link = (minibatch and task_kind == "link"
                           and not chunked_eval and graph is not None
                           and cfg.epoch_chunk > 0
                           and not any(cfg.encoder.moe_layer_flags()))
    mb_chunk_step = _make_link_mb_chunk_step(cfg, tx) \
        if use_chunked_mb_link else None
    moe_print_interval = max(1, cfg.epochs // 20)
    rng_np = np.random.default_rng(cfg.seed if hasattr(cfg, "seed") else 0)

    for idx, split in enumerate(splits):
        first_flag = [True]
        split_train_step = _select_step(train_step, train_step_d, first_flag)
        split_mb_step = _select_step(mb_step, mb_step_d, first_flag) \
            if minibatch else None
        key = jax.random.PRNGKey(idx)
        key, k_init = jax.random.split(key)
        params, state = task_model.task_model_init(
            k_init, cfg,
            encoder_params=None if pretrained is None else _copy(pretrained["encoder_params"]),
            vq_params=None if pretrained is None else _copy(pretrained["vq_params"]),
            encoder_state=None if pretrained is None else _copy(pretrained["encoder_state"]),
            vq_state=None if pretrained is None else _copy(pretrained["vq_state"]))
        if graph is not None:
            params, state = task_model.maybe_kmeans_init_vq(
                params, state, cfg, graph, rng=k_init)
        elif cfg.use_vq and not bool(state["vq"]["initted"]):
            # Graph-free k-means init: eval-mode embeddings via layer-wise
            # streaming (same math as maybe_kmeans_init_vq's full encode).
            from stemgnn_tpu.train.infer import layerwise_encode
            from stemgnn_tpu.vq import vq_kmeans_init
            z0, nm0 = layerwise_encode(
                params["encoder"], state["encoder"], cfg.encoder,
                ds.node_features(), np.asarray(ds.edge_index[0]),
                np.asarray(ds.edge_index[1]),
                xe=None if ds.xe is None else np.asarray(ds.xe),
                edge_table=None if ds.edge_text_feat is None
                else np.asarray(ds.edge_text_feat),
                num_nodes=ds.num_nodes, edge_block=cfg.eval_edge_block)
            vq_p, vq_s = vq_kmeans_init(k_init, params["vq"], state["vq"],
                                        cfg.vq, z0, mask=nm0)
            params, state = dict(params, vq=vq_p), dict(state, vq=vq_s)
        trainable, frozen = _split_params(params, cfg)
        opt_state = tx.init(trainable)
        stopper = EarlyStopping(patience=cfg.early_stop)

        def masks_for(split):
            out = {}
            for k in ["train", "valid", "test"]:
                m = np.zeros(pad_items, dtype=bool)
                m[:n_items] = np.asarray(split[k])[:n_items]
                out[k] = m
            return out

        masks = masks_for(split)
        train_mask = jnp.asarray(masks["train"])

        if use_chunked_epochs:
            split_chunk_step = _select_step(chunk_step, chunk_step_d,
                                            first_flag)
            eval_masks = tuple(jnp.asarray(masks[k], jnp.float32)
                               for k in ("train", "valid", "test"))
            epoch = 0
            stopped = False
            while epoch < cfg.epochs and not stopped:
                trainable, opt_state, state, key, lvecs, accs = \
                    split_chunk_step(trainable, frozen, opt_state, state,
                                     key, train_mask, graph, y, eval_masks)
                lvecs = np.asarray(lvecs)
                accs = np.asarray(accs)
                for j in range(min(eff_chunk, cfg.epochs - epoch)):
                    loss = dict(zip(_LOSS_KEYS, (float(v)
                                                 for v in lvecs[j])))
                    result = {"train": float(accs[j, 0]),
                              "val": float(accs[j, 1]),
                              "test": float(accs[j, 2]),
                              "metric": task2metric[cfg.task]}
                    logger.log(idx, epoch + j, loss, result)
                    if stopper(result):
                        if verbose:
                            print(f"[split {idx}] early stop at epoch "
                                  f"{epoch + j}")
                        stopped = True
                        break
                maybe_snap(trainable, frozen, state,
                           max(float(a[1]) for a in accs))
                epoch += eff_chunk
            if verbose:
                b = logger.get_single_best(idx)
                print(f"[split {idx}] best val={b['val']:.2f} "
                      f"test={b['test']:.2f}")
            continue

        if use_chunked_mb_link:
            from stemgnn_tpu.data.sampler import (CSCGraph,
                                                  NeighborBatchIterator)
            csc = ds.extras.get("_csc")
            if csc is None:
                csc = CSCGraph.from_edge_index(np.asarray(ds.edge_index),
                                               ds.num_nodes)
                ds.extras["_csc"] = csc
            tables = ds.extras.get("_dev_tables")
            if tables is None:
                tables = (jnp.asarray(np.asarray(ds.node_text_feat,
                                                 np.float32)),
                          None if ds.edge_text_feat is None else
                          jnp.asarray(np.asarray(ds.edge_text_feat,
                                                 np.float32)))
                ds.extras["_dev_tables"] = tables
            node_table, edge_table = tables
            labels_np = np.asarray(ds.labels)
            bs = cfg.batch_size
            edge_ids = np.nonzero(masks["train"][:n_items])[0]
            n_batches = max((len(edge_ids) + bs - 1) // bs, 1)
            fanouts = [cfg.link_fanout] * cfg.encoder.num_layers

            def _endpoint_chunk(ids):
                u = np.asarray(ds.edge_index[0])[ids]
                v = np.asarray(ds.edge_index[1])[ids]
                return np.unique(np.concatenate([u, v]))
            probe = [_endpoint_chunk(edge_ids[i * bs:(i + 1) * bs])
                     for i in range(min(12, n_batches))]
            it = NeighborBatchIterator(
                csc, ds.node_text_feat, ds.edge_text_feat, ds.x, ds.xe,
                np.arange(ds.num_nodes), 2 * bs, fanouts, rng_np,
                shuffle=False, indexed=True, probe_chunks=probe)
            eval_masks = tuple(jnp.asarray(masks[k], jnp.float32)
                               for k in ("train", "valid", "test"))
            epoch = 0
            stopped = False
            while epoch < cfg.epochs and not stopped:
                T = min(eff_chunk, cfg.epochs - epoch)
                eps = [_sample_link_epoch_batches(ds, cfg, it, edge_ids,
                                                  rng_np, n_batches,
                                                  labels_np)
                       for _ in range(T)]
                batches = _stack_link_batches(eps, n_floor=it.node_pad,
                                              e_floor=it.edge_pad)
                trainable, opt_state, state, key, lvecs, accs = \
                    mb_chunk_step(trainable, frozen, opt_state, state, key,
                                  batches, node_table, edge_table, graph,
                                  y, eval_masks)
                lvecs = np.asarray(lvecs)
                accs = np.asarray(accs)
                for j in range(T):
                    loss = dict(zip(_LOSS_KEYS,
                                    (float(v) for v in lvecs[j])))
                    result = {"train": float(accs[j, 0]),
                              "val": float(accs[j, 1]),
                              "test": float(accs[j, 2]),
                              "metric": task2metric[cfg.task]}
                    logger.log(idx, epoch + j, loss, result)
                    if stopper(result):
                        if verbose:
                            print(f"[split {idx}] early stop at epoch "
                                  f"{epoch + j}")
                        stopped = True
                        break
                maybe_snap(trainable, frozen, state,
                           max(float(a[1]) for a in accs))
                epoch += T
            if verbose:
                b = logger.get_single_best(idx)
                print(f"[split {idx}] best val={b['val']:.2f} "
                      f"test={b['test']:.2f}")
            continue

        for epoch in range(cfg.epochs):
            if minibatch:
                trainable, opt_state, state, key, mb_losses, n_mb = \
                    _minibatch_epoch(ds, cfg, task_kind, masks, rng_np,
                                     split_mb_step, trainable, frozen,
                                     opt_state, state, key)
                loss = {k: float(v) / max(n_mb, 1) for k, v in
                        jax.device_get(mb_losses[0]).items()} \
                    if mb_losses else {"loss": 0.0, "act_loss": 0.0,
                                       "jac_loss": 0.0, "env_loss": 0.0}
            else:
                key, k_step = jax.random.split(key)
                trainable, opt_state, state, loss, moe_stats = \
                    split_train_step(trainable, frozen, opt_state, state,
                                     k_step, train_mask, graph, y)
                if moe_stats and (epoch % moe_print_interval == 0):
                    # reference finetune.py:239-254 MoE usage printing
                    for st in moe_stats:
                        cnt = max(float(st["count"]), 1.0)
                        avg = ", ".join(f"{float(v)/cnt:.3f}"
                                        for v in np.asarray(st["sum_prob"]))
                        top1 = ", ".join(f"{float(v)/cnt:.3f}"
                                         for v in np.asarray(st["sum_top1"]))
                        print(f"[MoE] Layer {st['layer']} avg_prob=[{avg}] "
                              f"top1_frac=[{top1}]")
            if chunked_eval:
                from stemgnn_tpu.train.infer import layerwise_eval_predict
                pred = layerwise_eval_predict(
                    _merge(trainable, frozen), state, cfg, ds, task_kind,
                    pad_items, edge_block=cfg.eval_edge_block)
            else:
                pred = np.asarray(eval_step(trainable, frozen, state, graph))
            result = {
                "train": evaluate(pred, y_np, masks["train"], cfg.task),
                "val": evaluate(pred, y_np, masks["valid"], cfg.task),
                "test": evaluate(pred, y_np, masks["test"], cfg.task),
                "metric": task2metric[cfg.task],
            }
            logger.log(idx, epoch, {k: float(v) for k, v in loss.items()},
                       result)
            maybe_snap(trainable, frozen, state, float(result["val"]))
            if stopper(result):
                if verbose:
                    print(f"[split {idx}] early stop at epoch {epoch}")
                break
        if verbose:
            b = logger.get_single_best(idx)
            print(f"[split {idx}] best val={b['val']:.2f} test={b['test']:.2f}")

    save_final()
    return logger


# ------------------------------------------------------------------ graph

def _batch_graph_list(graphs, labels, idxs, batch_size: int,
                      node_bucket: int = 512, edge_bucket: int = 2048):
    """Host-side batching of molecule graphs into padded disjoint batches.

    Labels are padded to ``batch_size`` rows so device shapes stay fixed;
    ``n_real`` marks the valid prefix.  A GENERATOR: padded batches are
    built lazily so huge datasets (chempcba: 437k molecules) never
    materialize all batches in host memory at once (the reference streams
    through DataLoaders the same way, utils/loader.py:48-72).

    When ``graphs`` is an :class:`~stemgnn_tpu.core.graph.IndexedGraphList`
    the batches stay INDEXED (int ids into the shared dedup tables): host
    work and H2D payload drop ~D x, and features gather on device inside
    the jitted step — the chempcba-scale path (BASELINE.md graph-eval
    measurement).
    """
    from stemgnn_tpu.core.graph import batch_indexed_graphs
    indexed = getattr(graphs, "node_table", None) is not None
    num_tasks = labels.shape[1]
    for i in range(0, len(idxs), batch_size):
        chunk = idxs[i: i + batch_size]
        gs = [graphs[j] for j in chunk]
        if indexed:
            tot_n = sum(len(g["x"]) for g in gs)
            tot_e = sum(len(g["senders"]) for g in gs)
            g = batch_indexed_graphs(
                gs, node_pad_to=round_up(tot_n + 1, node_bucket),
                edge_pad_to=round_up(max(tot_e, 1), edge_bucket))
        else:
            tot_n = sum(g["node_feat"].shape[0] for g in gs)
            tot_e = sum(len(g["senders"]) for g in gs)
            g = batch_graphs(gs,
                             node_pad_to=round_up(tot_n + 1, node_bucket),
                             edge_pad_to=round_up(max(tot_e, 1), edge_bucket))
        lab = np.full((batch_size, num_tasks), np.nan)
        lab[: len(chunk)] = np.stack([labels[j] for j in chunk])
        yield g, lab, len(chunk)


def _stream_scanned(fn, params, state, batches, stack: int = 64):
    """Dispatch a stream of ``(g, n_real)`` batches through ``fn(params,
    state, g) -> pytree`` as scanned SAME-SHAPE stacks of up to ``stack``
    — one device dispatch per stack instead of one per batch (each
    dispatch costs a 3-15 ms round trip on tunneled transports; same
    pattern as the training loop's predict_many eval) — yielding
    per-batch host outputs ``(out_pytree, n_real)`` in order."""
    fn_one = jax.jit(fn)

    @jax.jit
    def fn_many(params, state, gs):
        def body(c, g):
            return c, fn(params, state, g)
        _, out = jax.lax.scan(body, 0, gs)
        return out

    def shape_of(g):
        return tuple(np.asarray(x).shape
                     for x in jax.tree_util.tree_leaves(g))

    pend, ns = [], []

    def flush():
        if not pend:
            return
        k = len(pend)
        if k == 1:
            yield jax.device_get(fn_one(params, state, pend[0])), ns[0]
        else:
            # Pad to the next length in a small power-of-4 ladder, not
            # always to ``stack``: a flush of k=2 padded to 64 would run 62
            # wasted forward passes, and streams whose padding buckets
            # change often flush small stacks repeatedly (ADVICE r4).  The
            # ladder keeps the compile count bounded (<= 3 scan lengths).
            ladder = [s for s in (4, 16) if s < stack] + [stack]
            padded = next(s for s in ladder if s >= k)
            pend.extend([pend[-1]] * (padded - k))
            gs = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *pend)
            out = jax.device_get(fn_many(params, state, gs))
            for i in range(k):
                yield jax.tree_util.tree_map(lambda a: a[i], out), ns[i]
        pend.clear()
        ns.clear()

    for g, n in batches:
        if pend and (len(pend) >= stack
                     or shape_of(g) != shape_of(pend[0])):
            yield from flush()
        pend.append(g)
        ns.append(n)
    yield from flush()


def graph_task_predict(graphs, num_tasks: int, cfg: FinetuneConfig, params,
                       state, batch_size: int = 0):
    """Pooled per-molecule prediction export (infer.py --mode predict).

    Streams every graph through the trained task model in dataset order
    (same `_batch_graph_list` padding buckets as training, scanned stacked
    dispatch) and returns head-mean logits [G, num_tasks].  Serving
    probabilities are ``sigmoid(logits)`` — the multitask-BCE score the
    reference computes for AUC (task/graph.py:60-97) but never exports.
    Works for both materialized graph lists and IndexedGraphList bundles.
    """
    from stemgnn_tpu.core.graph import materialize_graph
    bs = batch_size or cfg.batch_size or 64
    indexed = getattr(graphs, "node_table", None) is not None
    if indexed:
        node_tab = jnp.asarray(np.asarray(graphs.node_table))
        edge_tab = None if graphs.edge_table is None else \
            jnp.asarray(np.asarray(graphs.edge_table))

    def predict(params, state, g):
        if indexed:
            g = materialize_graph(g, node_tab, edge_tab)
        z, state2, _ = task_model.encode(params, state, cfg, g,
                                         training=False)
        pooled = task_model.pool_graph(z, g, "mean", num_segments=bs)
        logits, _, _ = task_model.task_logits(params, state2, cfg, pooled,
                                              training=False)
        return jnp.mean(logits, axis=1)

    dummy = np.zeros((len(graphs), num_tasks))
    batches = ((g, n) for g, _, n in _batch_graph_list(
        graphs, dummy, np.arange(len(graphs)), bs))
    out = np.zeros((len(graphs), num_tasks), np.float32)
    i = 0
    for o, n in _stream_scanned(predict, params, state, batches):
        out[i: i + n] = o[:n]
        i += n
    return out


def graph_task_encode(graphs, cfg: FinetuneConfig, params, state,
                      batch_size: int = 0):
    """Per-molecule artifacts from a PRETRAINED encoder+VQ (infer.py
    --mode encode, graph task): encoder -> mean pool per graph ->
    eval-mode VQ.  Returns (pooled [G, D], quantized [G, D],
    codes [G, heads]) — the molecule-level analog of the node-task
    embedding/code export (the VQ codes are the pretrained graph
    "tokens")."""
    from stemgnn_tpu.core.graph import materialize_graph
    from stemgnn_tpu.vq import vq_apply
    bs = batch_size or cfg.batch_size or 64
    indexed = getattr(graphs, "node_table", None) is not None
    if indexed:
        node_tab = jnp.asarray(np.asarray(graphs.node_table))
        edge_tab = None if graphs.edge_table is None else \
            jnp.asarray(np.asarray(graphs.edge_table))

    def enc(params, state, g):
        if indexed:
            g = materialize_graph(g, node_tab, edge_tab)
        z, state2, _ = task_model.encode(params, state, cfg, g,
                                         training=False)
        pooled = task_model.pool_graph(z, g, "mean", num_segments=bs)
        res = vq_apply(params["vq"], state2["vq"], cfg.vq, pooled,
                       training=False)
        return pooled, res["quantize"], res["indices"]

    dummy = np.zeros((len(graphs), 1))
    batches = ((g, n) for g, _, n in _batch_graph_list(
        graphs, dummy, np.arange(len(graphs)), bs))
    outs = {"pooled": [], "quant": [], "codes": []}
    for (pooled, quant, codes), n in _stream_scanned(enc, params, state,
                                                     batches):
        outs["pooled"].append(pooled[:n])
        outs["quant"].append(quant[:n])
        outs["codes"].append(codes[:n])
    return (np.concatenate(outs["pooled"]), np.concatenate(outs["quant"]),
            np.concatenate(outs["codes"]))


def _run_graph_task(graphs, labels, split, cfg: FinetuneConfig,
                    pretrained=None, verbose: bool = False,
                    seed_base: int = 0, donate: bool = False,
                    save_model_to: str = ""):
    from stemgnn_tpu.core.graph import materialize_graph
    num_tasks = labels.shape[1]
    logger = Logger()
    # serving export (finetune.py --save_model): best-val model across
    # repeats, loadable by infer.py --mode predict
    maybe_snap, save_final = _make_model_saver(save_model_to, cfg, verbose)
    tx = optax.adamw(cfg.lr, weight_decay=0.01)
    donate = donate and _donation_safe(cfg)
    indexed = getattr(graphs, "node_table", None) is not None
    if indexed:
        node_tab = jnp.asarray(np.asarray(graphs.node_table))
        edge_tab = None if graphs.edge_table is None else \
            jnp.asarray(np.asarray(graphs.edge_table))

    def _prep(g):
        return materialize_graph(g, node_tab, edge_tab) if indexed else g

    def make_batches(mask, bs, shuffle_rng=None):
        idxs = np.where(mask)[0]
        if shuffle_rng is not None:
            shuffle_rng.shuffle(idxs)
        return _batch_graph_list(graphs, labels, idxs, bs)

    # Small splits: cache the padded eval batches across epochs.  Large
    # splits: re-stream them each eval (bounded host memory).
    cache_eval = len(graphs) <= 50_000

    batch_size = cfg.batch_size or 64

    def _train_impl(trainable, frozen, opt_state, state, rng, g, y, valid,
                    gmask):
        g = _prep(g)

        def loss_fn(trainable):
            params = _merge(trainable, frozen)
            z, state2, aux = task_model.encode(params, state, cfg, g,
                                               training=True, rng=rng)
            pooled = task_model.pool_graph(z, g, "mean",
                                           num_segments=batch_size)
            logits, commit, state3 = task_model.task_logits(
                params, state2, cfg, pooled, training=True, rng=rng,
                mask=gmask)
            act = task_model.activation_loss(logits, y, task="multi",
                                             mask=gmask, valid=valid)
            jac = task_model.decoder_jacobian_penalty(params, cfg)
            env = cfg.lamda_env * aux["env_reg"]
            return act + jac + env, (state3, act, jac, env)
        (loss, (new_state, act, jac, env)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, new_state, {
            "loss": loss, "act_loss": act, "jac_loss": jac, "env_loss": env}

    train_step = jax.jit(_train_impl)
    train_step_d = jax.jit(_train_impl, donate_argnums=(0, 2, 3)) \
        if donate else None

    # eval_bf16 (cfg docstring): the eval forward runs with bf16 encoder
    # activations (training stays f32) — the graph task's per-epoch
    # 3-split eval is compute-bound at chempcba scale
    if cfg.eval_bf16 and cfg.encoder.backbone == "sage" \
            and cfg.encoder.compute_dtype != "bfloat16":
        import dataclasses as _dc
        eval_cfg = _dc.replace(
            cfg, encoder=_dc.replace(cfg.encoder,
                                     compute_dtype="bfloat16"))
    else:
        eval_cfg = cfg

    # Eval batches may be LARGER than train batches (cfg.eval_batch_size;
    # the eval fwd has no optimizer state and is the compute-bound stage
    # at chempcba scale — bigger batches cut per-batch fixed costs and
    # padding waste).  0 = same as batch_size (reference protocol shape).
    eval_bs = int(getattr(cfg, "eval_batch_size", 0) or 0) or batch_size

    def _make_predict(n_seg):
        def _predict_impl(trainable, frozen, state, g):
            g = _prep(g)
            params = _merge(trainable, frozen)
            z, state2, _ = task_model.encode(params, state, eval_cfg, g,
                                             training=False)
            pooled = task_model.pool_graph(z, g, "mean",
                                           num_segments=n_seg)
            logits, _, _ = task_model.task_logits(params, state2, eval_cfg,
                                                  pooled, training=False)
            return jnp.mean(logits, axis=1).astype(jnp.float32)

        predict_one = jax.jit(_predict_impl)

        @jax.jit
        def predict_stack(trainable, frozen, state, gs):
            """lax.scan over a stack of same-shape eval batches — ONE
            dispatch per stack instead of one per batch (each dispatch
            costs a 3-15 ms round trip on tunneled transports; a
            chempcba-scale AUC pass is ~780 batches x 3 splits/epoch)."""
            def body(c, g):
                return c, _predict_impl(trainable, frozen, state, g)
            _, out = jax.lax.scan(body, 0, gs)
            return out

        return predict_one, predict_stack

    predict, predict_many = _make_predict(eval_bs)

    STACK = 64

    def _shape_of(g):
        return tuple(np.asarray(x).shape for x in
                     jax.tree_util.tree_leaves(g))

    def build_device_eval(mask):
        """Device-RESIDENT eval: stack same-shape batches and ship them
        once (indexed batches are ids — ~0.2 MB each — so a whole
        chempcba-scale split fits in a few hundred MB of HBM), plus the
        split's labels/valid for ON-DEVICE AUC
        (utils.metrics.device_multitask_auc).  Per-epoch eval then costs
        zero H2D batch traffic and one scalar readback per split, instead
        of re-shipping every batch and reading [G, T] predictions back
        (~200 MB/epoch over the ~34 MB/s tunnel).  Returns None over the
        HBM budget (falls back to streaming)."""
        idxs = np.where(mask)[0]
        stacks, ks, pend = [], [], []
        total = 0

        def close():
            if not pend:
                return
            ks.append(len(pend))
            # pad to the fixed STACK length (repeat the last batch) so
            # predict_many compiles once per BATCH shape, not once per
            # (length, shape) pair — remote compiles cost minutes each
            pend.extend([pend[-1]] * (STACK - len(pend)))
            stacks.append(jax.tree_util.tree_map(
                lambda *xs: np.stack(xs), *pend))
            pend.clear()

        for g, lab, n in _batch_graph_list(graphs, labels, idxs,
                                           eval_bs):
            if pend and (len(pend) >= STACK
                         or _shape_of(g) != _shape_of(pend[0])):
                close()
            pend.append(g)
            total += sum(np.asarray(x).nbytes for x in
                         jax.tree_util.tree_leaves(g))
            if total > 2e9:
                return None
        close()
        stacks = [jax.device_put(s) for s in stacks]
        y_split = np.asarray(labels)[idxs]
        y_dev = jnp.asarray(np.nan_to_num(y_split).astype(np.float32))
        valid_dev = jnp.asarray(~np.isnan(y_split))
        return stacks, ks, y_dev, valid_dev, len(idxs)

    from stemgnn_tpu.utils.metrics import device_multitask_auc
    auc_scalar = jax.jit(device_multitask_auc)

    # the device-resident eval stacks depend only on the fixed split —
    # build them ONCE, outside the repeat loop (re-shipping a few hundred
    # MB per repeat over the tunnel is exactly the traffic they remove)
    dev_eval = None
    if indexed:
        ev_splits = (("train", "valid", "test")
                     if getattr(cfg, "eval_train_auc", True)
                     else ("valid", "test"))
        dev_eval = {k: build_device_eval(split[k]) for k in ev_splits}
        if any(v is None for v in dev_eval.values()):
            dev_eval = None

    for idx in range(cfg.repeat):
        first_flag = [True]
        split_train_step = _select_step(train_step, train_step_d, first_flag)
        rng_np = np.random.default_rng(seed_base + idx)
        key = jax.random.PRNGKey(seed_base + idx)
        key, k_init = jax.random.split(key)
        params, state = task_model.task_model_init(
            k_init, cfg,
            encoder_params=None if pretrained is None else _copy(pretrained["encoder_params"]),
            vq_params=None if pretrained is None else _copy(pretrained["vq_params"]),
            encoder_state=None if pretrained is None else _copy(pretrained["encoder_state"]),
            vq_state=None if pretrained is None else _copy(pretrained["vq_state"]))
        if dev_eval is not None:
            eval_batches = {k: (lambda k=k: make_batches(split[k], eval_bs))
                for k in ["train", "valid", "test"]}
        elif cache_eval:
            cached = {k: list(make_batches(split[k], eval_bs))
                      for k in ["train", "valid", "test"]}
            eval_batches = {k: (lambda k=k: cached[k]) for k in cached}
        else:
            eval_batches = {k: (lambda k=k: make_batches(split[k], eval_bs))
                for k in ["train", "valid", "test"]}
        # kmeans-init from the first TRAIN-SIZED batch — independent of
        # eval_batch_size, so the training trajectory is invariant to the
        # eval partition (caught at 400K scale: an eval-sized init batch
        # changed the VQ seeding and with it the whole run)
        first_train = next(
            iter(make_batches(split["train"], batch_size)), None)
        if first_train is not None:
            params, state = task_model.maybe_kmeans_init_vq(
                params, state, cfg, _prep(first_train[0]), rng=k_init)
        trainable, frozen = _split_params(params, cfg)
        opt_state = tx.init(trainable)
        stopper = EarlyStopping(patience=cfg.early_stop)

        for epoch in range(cfg.epochs):
            t_ep = time.time()
            for g, lab, n_real in make_batches(split["train"],
                                               cfg.batch_size or 64, rng_np):
                key, k_step = jax.random.split(key)
                y = jnp.asarray(np.nan_to_num(lab * 2.0 - 1.0))
                valid = jnp.asarray(~np.isnan(lab))
                gmask = jnp.arange(batch_size) < n_real
                trainable, opt_state, state, loss = split_train_step(
                    trainable, frozen, opt_state, state, k_step, g, y, valid,
                    gmask)
            t_train = time.time() - t_ep

            def auc_of(batch_source):
                # consecutive same-shape batches pad to the fixed STACK
                # length and run as one scanned dispatch (predict_many,
                # one executable per batch shape); predictions read back
                # in chunks — one D2H round trip per chunk; host memory
                # bounded for streamed batch sources
                preds, ys, dev, ns, pend = [], [], [], [], []

                def dispatch():
                    if not pend:
                        return
                    k = len(pend)
                    if k == 1:
                        dev.append(predict(trainable, frozen, state,
                                           pend[0]))
                    else:
                        pend.extend([pend[-1]] * (STACK - k))
                        gs = jax.tree_util.tree_map(
                            lambda *xs: np.stack(xs), *pend)
                        out = predict_many(trainable, frozen, state, gs)
                        dev.append(out.reshape(-1, out.shape[-1])
                                   [:k * eval_bs])
                    pend.clear()

                def flush():
                    dispatch()
                    if not dev:
                        return
                    flat = np.asarray(jnp.concatenate(dev, axis=0))
                    bs = eval_bs
                    preds.extend(flat[i * bs: i * bs + n]
                                 for i, n in enumerate(ns))
                    dev.clear()
                    ns.clear()

                for g, lab, n in batch_source():
                    if pend and (len(pend) >= STACK
                                 or _shape_of(g) != _shape_of(pend[0])):
                        dispatch()
                    pend.append(g)
                    ns.append(n)
                    ys.append(lab[:n])
                    if len(ns) >= 512:
                        flush()
                flush()
                if not preds:
                    return float("nan")
                return evaluate(np.concatenate(preds), np.concatenate(ys),
                                None, "graph")

            def auc_of_device(entry):
                stacks, ks, y_dev, valid_dev, g_total = entry
                outs = [predict_many(trainable, frozen, state, gs)
                        for gs in stacks]
                preds = jnp.concatenate(
                    [o.reshape(-1, o.shape[-1])[:k * eval_bs]
                     for o, k in zip(outs, ks)])[:g_total]
                return float(auc_scalar(preds, y_dev, valid_dev)) * 100

            # eval_every K: the 3-split AUC forward pass dominates epoch
            # wall time at chempcba scale (BASELINE r4) — skip it on
            # non-multiple epochs when cfg.eval_every > 1 (default 1 keeps
            # the reference's eval-every-epoch protocol, task/graph.py:80).
            # Early stop then counts EVAL points; the last epoch always
            # evaluates so the run never ends without a fresh metric.
            k_ev = max(1, cfg.eval_every)
            if (epoch + 1) % k_ev and epoch != cfg.epochs - 1:
                if verbose:
                    print(f"[split {idx}] epoch {epoch}: train "
                          f"{t_train:.1f} s (eval skipped, every {k_ev})",
                          flush=True)
                continue
            # eval_train_auc=False skips the TRAIN-split AUC pass — at an
            # 80/10/10 split that's 80% of the eval forward compute for a
            # diagnostic no selection decision reads (early stop + best
            # snapshot use val only); the reference evaluates all three
            # (task/graph.py:80), so the default keeps that protocol
            want_train = getattr(cfg, "eval_train_auc", True)
            if dev_eval is not None:
                result = {"train": (auc_of_device(dev_eval["train"])
                                    if want_train else float("nan")),
                          "val": auc_of_device(dev_eval["valid"]),
                          "test": auc_of_device(dev_eval["test"]),
                          "metric": "auc"}
            else:
                result = {"train": (auc_of(eval_batches["train"])
                                    if want_train else float("nan")),
                          "val": auc_of(eval_batches["valid"]),
                          "test": auc_of(eval_batches["test"]),
                          "metric": "auc"}
            logger.log(idx, epoch, {k: float(v) for k, v in loss.items()},
                       result)
            maybe_snap(trainable, frozen, state, float(result["val"]))
            if verbose:
                print(f"[split {idx}] epoch {epoch}: train {t_train:.1f} s "
                      f"+ eval {time.time() - t_ep - t_train:.1f} s  "
                      f"val={result['val']:.2f}", flush=True)
            if stopper(result):
                break
        if verbose:
            b = logger.get_single_best(idx)
            print(f"[split {idx}] best val={b['val']:.2f} test={b['test']:.2f}")

    save_final()
    return logger


# ------------------------------------------------------------------ front-end

def run_finetune(ds, cfg: FinetuneConfig, pretrained=None,
                 verbose: bool = False, donate: bool = False,
                 save_model_to: str = ""):
    """Returns the Logger after all repeats (mean±std via get_best()).

    ``ds``: TAGDataset for node/link; (graphs, labels, split) tuple for graph.
    ``pretrained``: optional dict with encoder_params/encoder_state/vq_params/
    vq_state from a pretrain checkpoint (finetune.py:174-177).
    ``donate``: donate (trainable, opt_state, state) buffers from the second
    step of each split on — halves train-state HBM residency for long runs
    (skipped automatically when the EMA-adopt path would alias buffers).
    """
    if cfg.task in ("node", "link"):
        return _run_node_like(ds, cfg, pretrained, cfg.task, verbose,
                              donate=donate, save_model_to=save_model_to)
    if cfg.task == "graph":
        graphs, labels, split = ds
        return _run_graph_task(graphs, labels, split, cfg, pretrained,
                               verbose, donate=donate,
                               save_model_to=save_model_to)
    raise ValueError(f"Invalid task {cfg.task}")
