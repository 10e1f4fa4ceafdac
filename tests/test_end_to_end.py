"""End-to-end slices: finetune node/link/graph on synthetic data, pretrain
loop + checkpoint round-trip, pretrain->finetune handoff (SURVEY.md §4 #5)."""

import jax
import numpy as np
import pytest

from stemgnn_tpu.core.config import (EncoderConfig, FinetuneConfig,
                                     PretrainConfig, VQConfig)
from stemgnn_tpu.data.merge import merge_datasets
from stemgnn_tpu.data.synthetic import (synthetic_graph_dataset,
                                        synthetic_link_dataset,
                                        synthetic_node_dataset)
from stemgnn_tpu.train.finetune_loop import run_finetune
from stemgnn_tpu.train.pretrain_loop import (load_pretrained_for_finetune,
                                             run_pretrain)

D = 32


def small_enc(normalize="none"):
    return EncoderConfig(input_dim=D, hidden_dim=D, num_layers=2,
                         normalize=normalize, dropout=0.1)


def small_vq(**kw):
    kw.setdefault("commitment_weight", 0.25)
    return VQConfig(dim=D, codebook_size=16, codebook_dim=16, heads=4, **kw)


def test_finetune_node_accuracy():
    ds = synthetic_node_dataset(num_nodes=300, num_classes=4, feat_dim=D,
                                train_per_split=40, val_per_split=80,
                                num_splits=2, seed=0)
    cfg = FinetuneConfig(encoder=small_enc(), vq=small_vq(), task="node",
                         epochs=50, early_stop=25, lr=5e-3, repeat=2,
                         num_classes=4)
    best = run_finetune(ds, cfg).get_best()
    assert best["test"]["mean"] > 80, best


def test_finetune_link_accuracy():
    ds = synthetic_link_dataset(num_entities=200, num_relations=4,
                                num_edges=1500, feat_dim=D, seed=0)
    cfg = FinetuneConfig(encoder=small_enc("batch"), vq=small_vq(),
                         task="link", epochs=50, early_stop=25, lr=5e-3,
                         repeat=1, num_classes=4)
    best = run_finetune(ds, cfg).get_best()
    assert best["test"]["mean"] > 60, best


def test_finetune_graph_auc():
    bundle = synthetic_graph_dataset(num_graphs=100, num_tasks=2, feat_dim=D,
                                     seed=0)
    cfg = FinetuneConfig(encoder=small_enc("batch"), vq=small_vq(),
                         task="graph", epochs=20, early_stop=10, lr=1e-2,
                         repeat=1, batch_size=32, num_classes=2,
                         freeze_vq=False)
    best = run_finetune(bundle, cfg).get_best()
    assert best["test"]["mean"] > 55, best


def test_graph_save_model_predict_and_eval_every(tmp_path):
    """Serving export for the graph task: --save_model writes the best-val
    model, graph_task_predict (infer.py --mode predict) reproduces the
    pooled multitask scores, and eval_every=K skips (K-1)/K of the 3-split
    AUC evals (the compute-bound stage at chempcba scale, BASELINE r4)."""
    from stemgnn_tpu.core.config import from_dict
    from stemgnn_tpu.train.finetune_loop import graph_task_predict
    from stemgnn_tpu.utils.checkpoint import load_meta, load_pytree
    from stemgnn_tpu.utils.metrics import evaluate

    bundle = synthetic_graph_dataset(num_graphs=80, num_tasks=2, feat_dim=D,
                                     seed=1)
    graphs, labels, split = bundle
    cfg = FinetuneConfig(encoder=small_enc("batch"), vq=small_vq(),
                         task="graph", epochs=6, early_stop=10, lr=1e-2,
                         repeat=1, batch_size=32, num_classes=2,
                         freeze_vq=False, eval_every=3)
    path = str(tmp_path / "graph_model.npz")
    logger = run_finetune(bundle, cfg, save_model_to=path)
    # epochs 0..5 with eval_every=3 -> evals at epochs 2 and 5 only
    assert len(logger.data[0]["val"]) == 2, logger.data[0]["val"]

    payload = load_pytree(path)
    meta = load_meta(path)
    assert meta["task"] == "graph" and meta["best_val"] > 0
    cfg2 = from_dict(FinetuneConfig(), meta["config"])
    logits = graph_task_predict(graphs, labels.shape[1], cfg2,
                                payload["params"], payload["state"])
    assert logits.shape == (len(graphs), labels.shape[1])
    assert np.isfinite(logits).all()
    val_idx = np.where(split["valid"])[0]
    auc = evaluate(logits[val_idx], labels[val_idx], None, "graph")
    # the exported scores must reproduce the saved best-val quality
    assert auc == pytest.approx(meta["best_val"], abs=1.0), (
        auc, meta["best_val"])

    # per-molecule embedding/code export (infer.py --mode encode)
    from stemgnn_tpu.train.finetune_loop import graph_task_encode
    pooled, quant, codes = graph_task_encode(graphs, cfg2,
                                             payload["params"],
                                             payload["state"])
    assert pooled.shape == (len(graphs), D) and quant.shape == pooled.shape
    assert codes.shape[0] == len(graphs)
    assert (codes >= 0).all() and (codes < cfg2.vq.codebook_size).all()


def test_pretrain_then_finetune(tmp_path):
    ds = synthetic_node_dataset(num_nodes=250, num_classes=4, feat_dim=D,
                                train_per_split=40, val_per_split=60,
                                num_splits=1, seed=3)
    merged = merge_datasets([ds])
    pt_cfg = PretrainConfig(
        encoder=small_enc("batch"),
        vq=small_vq(commitment_weight=10.0, orthogonal_reg_weight=1.0,
                    orthogonal_reg_max_codes=8),
        epochs=2, batch_size=32, fanout=4, lr=1e-3)
    _, _, _, hist = run_pretrain(merged, pt_cfg, weights=[1.0],
                                 save_root=str(tmp_path), verbose=False)
    assert np.isfinite(hist[-1]["loss"])

    bundle = load_pretrained_for_finetune(str(tmp_path / "encoder_2.npz"),
                                          str(tmp_path / "vq_2.npz"))
    ft_cfg = FinetuneConfig(
        encoder=small_enc("batch"),
        vq=small_vq(kmeans_init=True), task="node", epochs=30, early_stop=15,
        lr=5e-3, repeat=1, num_classes=4)
    best = run_finetune(ds, ft_cfg, pretrained=bundle).get_best()
    assert best["test"]["mean"] > 50, best


def test_stream_scanned_order_shapes_and_singletons():
    """The serving exports' scanned-dispatch helper preserves batch order
    and n_real across stack flushes, shape changes, and singleton tails."""
    from stemgnn_tpu.train.finetune_loop import _stream_scanned

    def fn(params, state, g):
        return g["a"] * params

    batches = [({"a": np.full((4,), i, np.float32)}, 4) for i in range(10)]
    batches += [({"a": np.full((6,), 100 + i, np.float32)}, 6)
                for i in range(3)]
    batches += [({"a": np.full((8,), 7.0, np.float32)}, 8)]  # k == 1 path
    outs = list(_stream_scanned(fn, 2.0, None, iter(batches), stack=4))
    assert len(outs) == len(batches)
    for (o, n), (g, n0) in zip(outs, batches):
        np.testing.assert_allclose(o, g["a"] * 2.0)
        assert n == n0

    # power-of-4 pad ladder (ADVICE r4): small flushes under a big stack cap
    # pad to 4/16, not 64 — outputs must be identical either way
    outs = list(_stream_scanned(fn, 2.0, None, iter(batches), stack=64))
    assert len(outs) == len(batches)
    for (o, n), (g, n0) in zip(outs, batches):
        np.testing.assert_allclose(o, g["a"] * 2.0)
        assert n == n0


def test_pretrain_mixed_precision_parity():
    """teacher_bf16 + loss_bf16 (r5 mixed-precision pretrain extensions)
    change the loss by at most bf16 rounding noise — the parity gate for
    the bench-scale speedup (scripts/pretrain_step_probe.py)."""
    import dataclasses

    from stemgnn_tpu.core.config import PretrainConfig
    from stemgnn_tpu.core.graph import make_graph
    from stemgnn_tpu.models.pretrain import pretrain_forward, pretrain_init

    rng = np.random.default_rng(0)
    n, e = 200, 800
    g = make_graph(rng.standard_normal((n, D)).astype(np.float32),
                   rng.integers(0, n, e), rng.integers(0, n, e),
                   edge_feat=rng.standard_normal((e, D)).astype(np.float32))
    cfg = PretrainConfig(encoder=small_enc("batch"), vq=small_vq(),
                        batch_size=64)
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, dropout=0.0))
    params, teacher, state = pretrain_init(jax.random.PRNGKey(0), cfg)

    def run(cfg_v):
        loss, (aux, _) = pretrain_forward(
            params, teacher, state, cfg_v, g, g, bs=64,
            rng=jax.random.PRNGKey(1), training=True)
        return float(loss), {k: float(v) for k, v in aux["losses"].items()}

    l0, a0 = run(cfg)
    l1, a1 = run(dataclasses.replace(cfg, teacher_bf16=True, loss_bf16=True))
    assert abs(l1 - l0) / max(abs(l0), 1e-9) < 0.02, (l0, l1)
    for k in a0:
        assert abs(a1[k] - a0[k]) <= 0.02 * max(abs(a0[k]), 0.1), (k, a0, a1)


def test_pretrain_kmeans_init_finite(tmp_path):
    """Pretrain with cfg.vq.kmeans_init must seed the codebook from the
    first batch (the reference's lazy init-on-first-forward, vq.py:646) —
    it used to train from an all-zero codebook and NaN immediately."""
    ds = synthetic_node_dataset(num_nodes=300, num_classes=3, feat_dim=D,
                                train_per_split=40, val_per_split=60,
                                num_splits=1, seed=5)
    cfg = PretrainConfig(
        encoder=small_enc("batch"),
        vq=small_vq(kmeans_init=True),
        epochs=1, batch_size=32, fanout=4, lr=1e-3)
    _, _, state, hist = run_pretrain(merge_datasets([ds]), cfg,
                                     weights=[1.0],
                                     save_root=str(tmp_path), verbose=False)
    assert np.isfinite(hist[-1]["loss"]), hist[-1]
    assert bool(np.asarray(state["vq"]["initted"]))


def test_checkpoint_roundtrip(tmp_path):
    from stemgnn_tpu.utils.checkpoint import load_pytree, save_pytree
    tree = {"a": np.arange(5.0), "b": [{"w": np.ones((2, 3))}, None],
            "c": {"deep": {"x": np.asarray(3)}}}
    save_pytree(str(tmp_path / "t.npz"), tree)
    back = load_pytree(str(tmp_path / "t.npz"))
    np.testing.assert_array_equal(back["a"], tree["a"])
    np.testing.assert_array_equal(back["b"][0]["w"], tree["b"][0]["w"])
    assert back["b"][1] is None
    assert back["c"]["deep"]["x"] == 3


def test_pretrain_donation_matches_nondonating():
    """donate=True (buffer donation from step 2 on) is numerically identical
    to the default path."""
    ds = synthetic_node_dataset(num_nodes=200, num_classes=4, feat_dim=D,
                                train_per_split=40, val_per_split=60,
                                num_splits=1, seed=5)
    merged = merge_datasets([ds])
    cfg = PretrainConfig(
        encoder=small_enc("batch"),
        vq=small_vq(commitment_weight=10.0, orthogonal_reg_weight=1.0,
                    orthogonal_reg_max_codes=8),
        epochs=1, batch_size=32, fanout=4, lr=1e-3)
    p1, _, _, h1 = run_pretrain(merged, cfg, weights=[1.0], verbose=False,
                                max_steps=4)
    p2, _, _, h2 = run_pretrain(merged, cfg, weights=[1.0], verbose=False,
                                max_steps=4, donate=True)
    np.testing.assert_allclose(h1[-1]["loss"], h2[-1]["loss"], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_orbax_checkpoint_backend(tmp_path):
    """Orbax manager: step-indexed save/restore with retention + template
    structure restoration."""
    import jax.numpy as jnp
    from stemgnn_tpu.utils.orbax_ckpt import (OrbaxCheckpointManager,
                                              load_pytree as oload,
                                              save_pytree as osave)
    tree = {"a": jnp.arange(6.0).reshape(2, 3),
            "b": [jnp.ones(4), jnp.zeros((2, 2), jnp.int32)],
            "c": {"d": jnp.asarray(3.5, jnp.bfloat16)}}
    p = str(tmp_path / "one")
    osave(p, tree)
    back = oload(p, template=tree)
    np.testing.assert_allclose(np.asarray(back["a"]), np.asarray(tree["a"]))
    assert back["c"]["d"].dtype == jnp.bfloat16
    with OrbaxCheckpointManager(str(tmp_path / "mgr"), max_to_keep=2) as m:
        for s in (1, 2, 3):
            m.save(s, jax.tree_util.tree_map(
                lambda x: x if x.dtype == jnp.int32 else x * s, tree))
        m.wait()
        assert m.latest_step() == 3
        assert m.all_steps() == [2, 3]
        r = m.restore(3, template=tree)
        np.testing.assert_allclose(np.asarray(r["a"]),
                                   np.asarray(tree["a"]) * 3)


def test_initialize_multihost_single_process():
    from stemgnn_tpu.parallel.mesh import host_shard, initialize_multihost
    info = initialize_multihost()
    assert info["process_count"] == 1 and info["process_index"] == 0
    assert host_shard(None, 8, process_index=0, process_count=1) == (0, 8)
    assert host_shard(None, 8, process_index=1, process_count=4) == (2, 4)
