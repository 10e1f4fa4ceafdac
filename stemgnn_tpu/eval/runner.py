"""Shared OOD-evaluation training scaffold.

All five reference eval scripts share one shape (SURVEY.md §3.4): stratified
split inside the ID bucket -> full-batch node finetune -> per-epoch
per-bucket accuracy -> best-val snapshot -> (optionally) re-evaluate the best
snapshot on a perturbed graph -> nan-aware mean±std over runs
(scripts/degree_shift_ood.py:158-431 etc.).

This module is that scaffold once, as jitted fixed-shape steps; the
scripts/*.py drivers supply bucketing/perturbation and loop over runs.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stemgnn_tpu.core.config import FinetuneConfig
from stemgnn_tpu.data.dataset import TAGDataset
from stemgnn_tpu.models import task as task_model
from stemgnn_tpu.train.finetune_loop import _copy, _merge, _split_params
from stemgnn_tpu.utils.metrics import eval_acc


def _pad_mask(idx_or_mask, n: int, pad: int) -> np.ndarray:
    m = np.zeros(pad, bool)
    a = np.asarray(idx_or_mask)
    if a.dtype == bool:
        m[:n] = a[:n]
    else:
        m[a] = True
    return m


def train_node_with_buckets(ds: TAGDataset, cfg: FinetuneConfig,
                            split_masks: Dict[str, np.ndarray],
                            bucket_indices: Dict[str, np.ndarray],
                            pretrained=None, seed: int = 0,
                            eval_every: int = 1, verbose: bool = False):
    """Full-batch node training with per-bucket tracking.

    Returns dict with best snapshot (params/state), per-bucket accuracy at the
    best-val epoch, and the final accuracy curves.
    """
    from stemgnn_tpu.train.graph_setup import fused_full_graph
    graph = fused_full_graph(ds, cfg)
    n, pad = ds.num_nodes, graph.num_nodes_padded
    y_np = np.zeros(pad, np.int32)
    y_np[:n] = np.asarray(ds.labels)[:n]
    y = jnp.asarray(y_np)

    masks = {k: _pad_mask(v, n, pad) for k, v in split_masks.items()}
    bucket_masks = {k: _pad_mask(v, n, pad) for k, v in bucket_indices.items()}

    tx = optax.adamw(cfg.lr, weight_decay=0.01)

    # The graph is a step ARGUMENT (closing over it would bake the feature
    # matrices into the executable as constants — finetune_loop note).
    def forward(params, state, g, rng, training):
        z, state, aux = task_model.encode(params, state, cfg, g,
                                          training=training, rng=rng)
        logits, _, state = task_model.task_logits(
            params, state, cfg, z, training=training, rng=rng,
            mask=g.node_mask)
        return logits, state, aux

    @jax.jit
    def train_step(trainable, frozen, opt_state, state, rng, train_mask, g,
                   y):
        def loss_fn(trainable):
            params = _merge(trainable, frozen)
            logits, new_state, aux = forward(params, state, g, rng, True)
            act = task_model.activation_loss(
                logits, y, task="single", mask=train_mask.astype(jnp.float32))
            jac = task_model.decoder_jacobian_penalty(params, cfg)
            env = cfg.lamda_env * aux["env_reg"]
            return act + jac + env, new_state
        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, new_state, loss

    @jax.jit
    def predict(trainable, frozen, state, g):
        params = _merge(trainable, frozen)
        logits, _, _ = forward(params, state, g, jax.random.PRNGKey(0),
                               False)
        return jax.nn.softmax(jnp.mean(logits, axis=1), axis=-1)

    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    params, state = task_model.task_model_init(
        k_init, cfg,
        encoder_params=None if pretrained is None else _copy(pretrained["encoder_params"]),
        vq_params=None if pretrained is None else _copy(pretrained["vq_params"]),
        encoder_state=None if pretrained is None else _copy(pretrained["encoder_state"]),
        vq_state=None if pretrained is None else _copy(pretrained["vq_state"]))
    params, state = task_model.maybe_kmeans_init_vq(params, state, cfg, graph,
                                                    rng=k_init)
    trainable, frozen = _split_params(params, cfg)
    opt_state = tx.init(trainable)
    train_mask = jnp.asarray(masks["train"])

    best = {"val": -np.inf, "epoch": -1, "trainable": None, "state": None,
            "bucket_acc": None, "split_acc": None}
    patience = cfg.early_stop

    chunk = max(int(getattr(cfg, "epoch_chunk", 0)), 0)
    if chunk:
        # Epoch-chunked scan: best-val snapshot, per-bucket accuracies, and
        # the patience counter all live ON DEVICE inside one dispatch per
        # ``chunk`` epochs (per-epoch eval cadence preserved exactly; after
        # the patience trips, remaining in-chunk epochs are frozen
        # pass-throughs).  Over the remote-dispatch transport this replaces
        # ~3 host round-trips per epoch with 3 per chunk.
        split_names = list(masks)
        bucket_names = list(bucket_masks)
        all_names = split_names + bucket_names
        val_idx = split_names.index("valid")
        masks_f = jnp.asarray(np.stack(
            [masks[k] for k in split_names]
            + [bucket_masks[k] for k in bucket_names]).astype(np.float32))
        mask_counts = jnp.maximum(jnp.sum(masks_f, axis=1), 1.0)

        def chunk_fn(carry, g, yy, masks_f):
            def body(c, _):
                (trainable, opt_state, state, key, best_val, best_epoch,
                 best_t, best_s, best_accs, bad, stopped, epoch) = c
                key, k = jax.random.split(key)
                t2, o2, s2, loss = train_step(trainable, frozen, opt_state,
                                              state, k, train_mask, g, yy)
                frz = lambda new, old: jax.tree_util.tree_map(
                    lambda a, b: jnp.where(stopped, b, a), new, old)
                trainable, opt_state, state = (frz(t2, trainable),
                                               frz(o2, opt_state),
                                               frz(s2, state))
                probs = predict(trainable, frozen, state, g)
                correct = (jnp.argmax(probs, axis=-1) == yy
                           ).astype(jnp.float32)
                accs = 100.0 * (masks_f @ correct) / mask_counts
                improved = jnp.logical_and(~stopped,
                                           accs[val_idx] > best_val)
                upd = lambda new, old: jax.tree_util.tree_map(
                    lambda a, b: jnp.where(improved, a, b), new, old)
                best_t, best_s = upd(trainable, best_t), upd(state, best_s)
                best_val = jnp.where(improved, accs[val_idx], best_val)
                best_epoch = jnp.where(improved, epoch, best_epoch)
                best_accs = jnp.where(improved, accs, best_accs)
                bad = jnp.where(stopped, bad,
                                jnp.where(improved, 0, bad + 1))
                stopped = jnp.logical_or(stopped, bad >= patience)
                return (trainable, opt_state, state, key, best_val,
                        best_epoch, best_t, best_s, best_accs, bad, stopped,
                        epoch + 1), (accs[val_idx], loss, stopped)
            return jax.lax.scan(body, carry, None, length=chunk)

        chunk_step = jax.jit(chunk_fn)
        carry = (trainable, opt_state, state, key,
                 jnp.float32(-np.inf), jnp.int32(-1), _copy(trainable),
                 _copy(state), jnp.zeros(len(all_names), jnp.float32),
                 jnp.int32(0), jnp.bool_(False), jnp.int32(0))
        epoch = 0
        while epoch < cfg.epochs:
            carry, (vals, losses, stops) = chunk_step(carry, graph, y,
                                                      masks_f)
            stops = np.asarray(stops)
            if verbose:
                vals_np, losses_np = np.asarray(vals), np.asarray(losses)
                for j in range(chunk):
                    if (epoch + j) % 50 == 0 and not stops[j]:
                        print(f"  epoch {epoch + j}: "
                              f"loss={losses_np[j]:.4f} "
                              f"val={vals_np[j]:.2f}")
            epoch += chunk
            if bool(stops[-1]):
                break
        (trainable, opt_state, state, key, best_val, best_epoch, best_t,
         best_s, best_accs, bad, stopped, _) = carry
        best_accs = np.asarray(best_accs)
        acc_by_name = dict(zip(all_names, (float(a) for a in best_accs)))
        best.update(
            val=float(best_val), epoch=int(best_epoch), trainable=best_t,
            state=best_s,
            split_acc={k: acc_by_name[k] for k in split_names},
            bucket_acc={k: acc_by_name[k] for k in bucket_names})
    else:
        bad = 0
        for epoch in range(cfg.epochs):
            key, k_step = jax.random.split(key)
            trainable, opt_state, state, loss = train_step(
                trainable, frozen, opt_state, state, k_step, train_mask,
                graph, y)
            if epoch % eval_every:
                continue
            pred = np.asarray(predict(trainable, frozen, state, graph))
            split_acc = {k: eval_acc(pred, y_np, m) * 100
                         for k, m in masks.items()}
            if split_acc["valid"] > best["val"]:
                bucket_acc = {k: eval_acc(pred, y_np, m) * 100
                              for k, m in bucket_masks.items()}
                best.update(val=split_acc["valid"], epoch=epoch,
                            trainable=_copy(trainable), state=_copy(state),
                            bucket_acc=bucket_acc, split_acc=split_acc)
                bad = 0
            else:
                bad += eval_every
                if bad >= patience:
                    break
            if verbose and epoch % 50 == 0:
                print(f"  epoch {epoch}: loss={float(loss):.4f} "
                      f"val={split_acc['valid']:.2f}")

    best["frozen"] = frozen
    best["masks"] = masks
    best["bucket_masks"] = bucket_masks
    best["y"] = y_np
    return best


def evaluate_snapshot_on(ds: TAGDataset, cfg: FinetuneConfig, best: dict,
                         bucket_indices: Optional[Dict[str, np.ndarray]] = None):
    """Re-evaluate a best-val snapshot on a (possibly perturbed) graph
    (missing_feature.py:656-713, random_edge_drop.py:648-724)."""
    from stemgnn_tpu.train.graph_setup import fused_full_graph
    graph = fused_full_graph(ds, cfg)
    n, pad = ds.num_nodes, graph.num_nodes_padded

    @jax.jit
    def predict(trainable, frozen, state, graph):
        params = _merge(trainable, frozen)
        z, state2, _ = task_model.encode(params, state, cfg, graph,
                                         training=False)
        logits, _, _ = task_model.task_logits(params, state2, cfg, z,
                                              training=False,
                                              mask=graph.node_mask)
        return jax.nn.softmax(jnp.mean(logits, axis=1), axis=-1)

    pred = np.asarray(predict(best["trainable"], best["frozen"],
                              best["state"], graph))
    y = best["y"]
    out = {k: eval_acc(pred[:pad], y, m) * 100 for k, m in best["masks"].items()}
    buckets = best["bucket_masks"] if bucket_indices is None else {
        k: _pad_mask(v, n, pad) for k, v in bucket_indices.items()}
    out.update({k: eval_acc(pred[:pad], y, m) * 100 for k, m in buckets.items()})
    return out


def nanmean_std(values):
    """nan-aware mean±std (homophily_shift_ood.py:73-92)."""
    arr = np.asarray(values, dtype=np.float64)
    if np.all(np.isnan(arr)):
        return float("nan"), float("nan")
    return float(np.nanmean(arr)), float(np.nanstd(arr))
