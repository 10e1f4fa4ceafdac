"""OFA in-context training: classify by scoring class nodes of prompted
graphs.

The reference's OFA-heritage prediction head (``BinGraphModel``,
STEM-GNN/dataset/models/model.py:72-115 over gp lightning): run a GNN over
the prompted graph, score every *class node* with a binary MLP, BCE against
``bin_labels`` on ``true_nodes_mask``; a sample's prediction is the argmax
over its own class nodes.

TPU-first: prompted samples are collated into padded disjoint batches
(fixed node/edge buckets) and the whole step is one jitted function; the
per-sample argmax uses segment ops over the batch's graph ids.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stemgnn_tpu.core.graph import round_up
from stemgnn_tpu.ofa.prompt import collate_prompted
from stemgnn_tpu.zoo.mlp import mlp_apply, mlp_init
from stemgnn_tpu.zoo.stack import gnn_stack_apply, gnn_stack_init


def _make_batches(dataset, idxs, batch_size: int, node_bucket: int = 1024,
                  edge_bucket: int = 4096):
    batches = []
    for i in range(0, len(idxs), batch_size):
        chunk = [dataset[int(j)] for j in idxs[i: i + batch_size]]
        tot_n = sum(len(s["node_feat"]) for s in chunk)
        tot_e = sum(len(s["senders"]) for s in chunk)
        g, aux = collate_prompted(
            chunk, node_pad_to=round_up(tot_n + 1, node_bucket),
            edge_pad_to=round_up(max(tot_e, 1), edge_bucket))
        ys = np.asarray([s["y"] for s in chunk])
        batches.append((g, aux, ys, len(chunk)))
    return batches


def ofa_train_eval(dataset, train_idx: Sequence[int],
                   eval_idx: Sequence[int], *, dim: int, kind: str = "gine",
                   num_layers: int = 2, epochs: int = 10, lr: float = 1e-3,
                   weight_decay: float = 0.0,
                   batch_size: int = 16, seed: int = 0,
                   task: str = "single", verbose: bool = False):
    """Train the class-node scoring model on prompted graphs; returns
    (final train loss, eval metric).

    ``task="single"``: prediction = per-sample argmax over class nodes, eval
    metric = accuracy.  ``task="multi"`` (chem multitask): every class node
    is an independent binary task — BCE restricted to ``bin_valid`` (NaN
    labels excluded, ft_model.py:7-20 semantics) and eval = nan-tolerant
    mean per-task AUC (data_utils.py:183-240 analog)."""
    rng_np = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    enc_p, enc_s = gnn_stack_init(k1, kind, num_layers, dim)
    # no BatchNorm in the head: padded rows would pollute batch statistics
    head_p, head_s = mlp_init(k2, [dim, 2 * dim, 1], batch_norm=False)
    params = {"enc": enc_p, "head": head_p}
    state = {"enc": enc_s, "head": head_s}
    tx = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = tx.init(params)

    def scores(params, state, g, true_mask, training, rng):
        z, enc_s2 = gnn_stack_apply(
            params["enc"], state["enc"], kind, g.node_feat, g.edge_feat,
            g.senders, g.receivers, edge_mask=g.edge_mask,
            node_mask=g.node_mask, training=training, rng=rng)
        logit, head_s2 = mlp_apply(params["head"], state["head"], z,
                                   training=training, rng=rng)
        return logit[:, 0], {"enc": enc_s2, "head": head_s2}

    @jax.jit
    def train_step(params, opt_state, state, g, valid_mask, bin_labels, rng):
        def loss_fn(params):
            s, state2 = scores(params, state, g, valid_mask, True, rng)
            per = jnp.maximum(s, 0) - s * bin_labels + jnp.log1p(
                jnp.exp(-jnp.abs(s)))
            per = jnp.where(valid_mask, per, 0.0)
            return jnp.sum(per) / jnp.maximum(jnp.sum(valid_mask), 1.0), state2
        (loss, state2), grads = jax.value_and_grad(loss_fn,
                                                   has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, state2, loss

    @jax.jit
    def predict(params, state, g, true_mask):
        s, _ = scores(params, state, g, true_mask, False,
                      jax.random.PRNGKey(0))
        return jnp.where(true_mask, s, -jnp.inf)

    loss = np.nan
    train_batches = _make_batches(dataset, np.asarray(train_idx), batch_size)
    for epoch in range(epochs):
        order = rng_np.permutation(len(train_batches))
        for bi in order:
            g, aux, ys, n_real = train_batches[bi]
            key, k = jax.random.split(key)
            valid = aux.get("bin_valid", aux["true_nodes_mask"])
            params, opt_state, state, loss = train_step(
                params, opt_state, state, g, jnp.asarray(valid),
                jnp.asarray(aux["bin_labels"]), k)
        if verbose:
            print(f"  ofa epoch {epoch}: loss={float(loss):.4f}")

    if task == "multi":
        # Per-task score/label/valid collection across samples.
        per_task_scores, per_task_labels = {}, {}
        for g, aux, ys, n_real in _make_batches(dataset,
                                                np.asarray(eval_idx),
                                                batch_size):
            s = np.asarray(predict(params, state, g,
                                   jnp.asarray(aux["true_nodes_mask"])))
            tm = aux["true_nodes_mask"]
            valid = aux.get("bin_valid", tm)
            gid_np = np.asarray(g.node_graph_id)
            for i in range(n_real):
                rows = np.nonzero((gid_np == i) & tm)[0]
                for k2, row in enumerate(rows):
                    if not valid[row]:
                        continue
                    per_task_scores.setdefault(k2, []).append(float(s[row]))
                    per_task_labels.setdefault(k2, []).append(
                        float(aux["bin_labels"][row]))
        from stemgnn_tpu.utils.metrics import _binary_auc
        aucs = []
        for k2 in sorted(per_task_scores):
            y = np.asarray(per_task_labels[k2])
            if len(np.unique(y)) < 2:
                continue                       # nan-tolerant: skip 1-class
            aucs.append(_binary_auc(y, np.asarray(per_task_scores[k2])))
        metric = float(np.mean(aucs)) if aucs else float("nan")
        return float(loss), metric

    correct = total = 0
    for g, aux, ys, n_real in _make_batches(dataset, np.asarray(eval_idx),
                                            batch_size):
        s = np.asarray(predict(params, state, g,
                               jnp.asarray(aux["true_nodes_mask"])))
        # class nodes of sample i are its trailing segment rows; prediction =
        # argmax of class-node scores within the sample
        tm = aux["true_nodes_mask"]
        gid_np = np.asarray(g.node_graph_id)
        for i in range(n_real):
            rows = np.nonzero((gid_np == i) & tm)[0]
            if rows.size == 0:
                continue
            pred = int(np.argmax(s[rows]))
            correct += int(pred == int(ys[i]))
            total += 1
    acc = correct / max(total, 1)
    return float(loss), acc


def fewshot_train_eval(base_dataset, labels, class_split, *, dim: int,
                       fs_edge_feats=None, n_way: int = 3, k_shot: int = 2,
                       train_episodes: int = 64, eval_episodes: int = 32,
                       kind: str = "gine", num_layers: int = 2,
                       epochs: int = 5, lr: float = 1e-3,
                       batch_size: int = 8, seed: int = 0,
                       verbose: bool = False):
    """End-to-end few-shot episode training + evaluation.

    The episode loop the reference drives through ``FewShotDataset`` +
    ``ConstructFSTask`` (ofa_datasets.py:457-549, task_constructor.py:231-271):
    meta-train on episodes drawn from the train-class pool, then evaluate
    episode accuracy on episodes drawn from the (disjoint) eval-class pool.

    ``base_dataset`` is any prompted NOI dataset (e.g.
    :class:`~stemgnn_tpu.ofa.datasets.SubgraphNodeDataset`);
    ``class_split`` maps {"train": [...], "valid"/"test": [...]} class ids.
    Returns {"train_loss", "valid_acc"/"test_acc" per eval split}.
    """
    from stemgnn_tpu.ofa.fewshot import FewShotDataset, SimpleFSManager
    from stemgnn_tpu.ofa.tasks import fewshot_class_pools

    if fs_edge_feats is None:
        fs_edge_feats = np.stack([np.zeros(dim, np.float32),
                                  np.ones(dim, np.float32)])
    pools = fewshot_class_pools(labels, class_split)

    def make_episodes(split, size, seed_off):
        cls, data_ind = pools[split]
        fs = SimpleFSManager(cls, data_ind, k_shot=k_shot, q_query=1,
                             n_way=min(n_way, len(cls)),
                             seed=seed + seed_off)
        return FewShotDataset(fs, base_dataset, base_dataset,
                              fs_edge_feats=fs_edge_feats, sample_size=size,
                              seed=seed + seed_off)

    train_ds = make_episodes("train", train_episodes, 0)
    out = {}
    # Meta-train once; evaluate on each held-out class split by running the
    # shared-parameter path of ofa_train_eval per split.
    for i, split in enumerate(s for s in class_split if s != "train"):
        eval_ds = make_episodes(split, eval_episodes, 100 + i)

        class _Concat:
            def __init__(self, a, b):
                self.a, self.b = a, b

            def __len__(self):
                return len(self.a) + len(self.b)

            def __getitem__(self, j):
                return self.a[j] if j < len(self.a) else self.b[j - len(self.a)]

        cat = _Concat(train_ds, eval_ds)
        loss, acc = ofa_train_eval(
            cat, np.arange(len(train_ds)),
            np.arange(len(train_ds), len(cat)), dim=dim, kind=kind,
            num_layers=num_layers, epochs=epochs, lr=lr,
            batch_size=batch_size, seed=seed, verbose=verbose)
        out["train_loss"] = loss
        out[f"{split}_acc"] = acc
    return out
