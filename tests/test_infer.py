"""Layer-wise streaming inference (train/infer.py) vs one-shot full-graph
eval: identical math, blocked execution (SURVEY.md §5 long-context analog —
the reference's full-neighborhood eval loaders, utils/loader.py:10-45)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stemgnn_tpu.core.config import EncoderConfig, FinetuneConfig, VQConfig
from stemgnn_tpu.core.graph import make_graph
from stemgnn_tpu.data.synthetic import (synthetic_link_dataset,
                                        synthetic_node_dataset)
from stemgnn_tpu.models import task as task_model
from stemgnn_tpu.nn.encoder import encoder_apply, encoder_init
from stemgnn_tpu.train.finetune_loop import run_finetune
from stemgnn_tpu.train.infer import (chunked_head_probs, layerwise_encode,
                                     layerwise_eval_predict)

D = 24


def _graph_with_types(rng, n=90, e=400, d=D, t=5):
    senders = rng.integers(0, n, size=e).astype(np.int32)
    receivers = rng.integers(0, n, size=e).astype(np.int32)
    x = rng.standard_normal((n, d)).astype(np.float32)
    xe = rng.integers(0, t, size=e).astype(np.int32)
    table = rng.standard_normal((t, d)).astype(np.float32)
    return x, senders, receivers, xe, table


@pytest.mark.parametrize("normalize", ["none", "batch"])
def test_layerwise_matches_full_encode(rng, normalize):
    x, s, r, xe, table = _graph_with_types(rng)
    cfg = EncoderConfig(input_dim=D, hidden_dim=D, num_layers=3,
                        normalize=normalize, dropout=0.2)
    params, state = encoder_init(jax.random.PRNGKey(1), cfg)

    g = make_graph(x, s, r, edge_feat=table[xe])
    z_full, _, _ = encoder_apply(params, state, cfg, g.node_feat, g.senders,
                                 g.receivers, edge_feat=g.edge_feat,
                                 edge_mask=g.edge_mask, node_mask=g.node_mask,
                                 training=False)
    # edge_block=128 forces several blocks; node padding differs (128 vs 8).
    z_lw, nm = layerwise_encode(params, state, cfg, x, s, r, xe=xe,
                                edge_table=table, edge_block=128)
    n = x.shape[0]
    np.testing.assert_allclose(np.asarray(z_lw)[:n], np.asarray(z_full)[:n],
                               rtol=1e-4, atol=1e-4)
    assert int(np.asarray(nm).sum()) == n


@pytest.mark.parametrize("backbone", ["gcn", "gin", "gat"])
def test_layerwise_matches_full_encode_backbones(rng, backbone):
    """r4 VERDICT item 4: the sage-only layer-wise-inference guard is
    lifted — gcn/gin/gat streamed layers == encoder_apply eval mode
    (reference backbone list STEM-GNN/model/encoder.py:191-200)."""
    x, s, r, _, _ = _graph_with_types(rng)
    cfg = EncoderConfig(input_dim=D, hidden_dim=D, num_layers=3,
                        backbone=backbone, normalize="batch", dropout=0.2)
    params, state = encoder_init(jax.random.PRNGKey(7), cfg)
    g = make_graph(x, s, r)
    z_full, _, _ = encoder_apply(params, state, cfg, g.node_feat, g.senders,
                                 g.receivers, edge_mask=g.edge_mask,
                                 node_mask=g.node_mask, training=False)
    z_lw, nm = layerwise_encode(params, state, cfg, x, s, r, edge_block=128)
    n = x.shape[0]
    np.testing.assert_allclose(np.asarray(z_lw)[:n], np.asarray(z_full)[:n],
                               rtol=1e-4, atol=1e-4)
    assert int(np.asarray(nm).sum()) == n


def test_layerwise_matches_full_encode_moe(rng):
    x, s, r, _, _ = _graph_with_types(rng)
    cfg = EncoderConfig(input_dim=D, hidden_dim=D, num_layers=2,
                        normalize="batch", moe=True, num_experts=3,
                        moe_layers="last")
    params, state = encoder_init(jax.random.PRNGKey(2), cfg)
    g = make_graph(x, s, r)
    z_full, _, _ = encoder_apply(params, state, cfg, g.node_feat, g.senders,
                                 g.receivers, edge_mask=g.edge_mask,
                                 node_mask=g.node_mask, training=False)
    z_lw, _ = layerwise_encode(params, state, cfg, x, s, r, edge_block=100)
    n = x.shape[0]
    np.testing.assert_allclose(np.asarray(z_lw)[:n], np.asarray(z_full)[:n],
                               rtol=1e-4, atol=1e-4)


def test_chunked_head_matches_full(rng):
    n = 70
    enc = EncoderConfig(input_dim=D, hidden_dim=D, num_layers=1,
                        normalize="none")
    vq = VQConfig(dim=D, codebook_size=8, codebook_dim=8, heads=2,
                  commitment_weight=0.25)
    cfg = FinetuneConfig(encoder=enc, vq=vq, num_classes=3)
    params, state = task_model.task_model_init(jax.random.PRNGKey(3), cfg)
    z = jnp.asarray(rng.standard_normal((n, D)).astype(np.float32))
    mask = jnp.ones(n, bool)
    logits, _, _ = task_model.task_logits(params, state, cfg, z,
                                          training=False, mask=mask)
    full = np.asarray(jax.nn.softmax(jnp.mean(logits, axis=1), axis=-1))
    # chunk of 32 forces a ragged tail (70 = 2*32 + 6)
    chunked = chunked_head_probs(params, state, cfg, z, mask, node_chunk=32)
    np.testing.assert_allclose(chunked, full, rtol=1e-5, atol=1e-5)


def test_finetune_chunked_eval_node():
    ds = synthetic_node_dataset(num_nodes=300, num_classes=4, feat_dim=D,
                                train_per_split=40, val_per_split=80,
                                num_splits=1, seed=0)
    enc = EncoderConfig(input_dim=D, hidden_dim=D, num_layers=2,
                        normalize="batch", dropout=0.1)
    vq = VQConfig(dim=D, codebook_size=16, codebook_dim=16, heads=4,
                  commitment_weight=0.25)
    cfg = FinetuneConfig(encoder=enc, vq=vq, task="node", epochs=25,
                         early_stop=25, lr=5e-3, repeat=1, num_classes=4,
                         batch_size=64, eval_chunked=True,
                         eval_edge_block=256)
    best = run_finetune(ds, cfg).get_best()
    assert best["test"]["mean"] > 60, best


def test_finetune_chunked_eval_link():
    ds = synthetic_link_dataset(num_entities=200, num_relations=4,
                                num_edges=1200, feat_dim=D, seed=0)
    enc = EncoderConfig(input_dim=D, hidden_dim=D, num_layers=2,
                        normalize="batch", dropout=0.1)
    vq = VQConfig(dim=D, codebook_size=16, codebook_dim=16, heads=4,
                  commitment_weight=0.25)
    cfg = FinetuneConfig(encoder=enc, vq=vq, task="link", epochs=8,
                         early_stop=8, lr=5e-3, repeat=1, num_classes=4,
                         batch_size=64, eval_chunked=True,
                         eval_edge_block=256)
    best = run_finetune(ds, cfg).get_best()
    assert best["test"]["mean"] > 40, best


def test_layerwise_eval_predict_matches_full_eval(rng):
    """Fixed params: chunked predictor == one-shot eval_step probabilities."""
    ds = synthetic_node_dataset(num_nodes=150, num_classes=3, feat_dim=D,
                                train_per_split=30, val_per_split=40,
                                num_splits=1, seed=1)
    enc = EncoderConfig(input_dim=D, hidden_dim=D, num_layers=2,
                        normalize="batch")
    vq = VQConfig(dim=D, codebook_size=8, codebook_dim=8, heads=2,
                  commitment_weight=0.25)
    cfg = FinetuneConfig(encoder=enc, vq=vq, task="node", num_classes=3)
    params, state = task_model.task_model_init(jax.random.PRNGKey(5), cfg)
    g = ds.to_graph()
    params, state = task_model.maybe_kmeans_init_vq(params, state, cfg, g,
                                                    rng=jax.random.PRNGKey(6))

    z, st2, _ = task_model.encode(params, state, cfg, g, training=False)
    logits, _, _ = task_model.task_logits(params, st2, cfg, z,
                                          training=False, mask=g.node_mask)
    full = np.asarray(jax.nn.softmax(jnp.mean(logits, axis=1), axis=-1))

    pred = layerwise_eval_predict(params, state, cfg, ds, "node",
                                  g.num_nodes_padded, edge_block=128,
                                  node_chunk=64)
    np.testing.assert_allclose(pred[: ds.num_nodes],
                               full[: ds.num_nodes], rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("backbone", ["sage", "gcn", "gin", "gat"])
def test_save_model_predict_roundtrip_backbones(rng, backbone, tmp_path):
    """--save_model -> infer.py-style predict round-trip for all four
    backbones (r4 VERDICT item 4): the exported payload reproduces the
    in-process eval probabilities."""
    from stemgnn_tpu.core.config import from_dict
    from stemgnn_tpu.train.graph_setup import fused_full_graph
    from stemgnn_tpu.utils.checkpoint import load_meta, load_pytree

    ds = synthetic_node_dataset(num_nodes=120, num_classes=3, feat_dim=D,
                                train_per_split=30, val_per_split=30,
                                num_splits=1, seed=4)
    enc = EncoderConfig(input_dim=D, hidden_dim=D, num_layers=2,
                        backbone=backbone, normalize="batch", dropout=0.0)
    vq = VQConfig(dim=D, codebook_size=8, codebook_dim=8, heads=2,
                  commitment_weight=0.25)
    cfg = FinetuneConfig(encoder=enc, vq=vq, task="node", epochs=3,
                         early_stop=5, lr=5e-3, repeat=1, num_classes=3)
    path = str(tmp_path / f"{backbone}.npz")
    run_finetune(ds, cfg, save_model_to=path)

    payload, meta = load_pytree(path), load_meta(path)
    cfg2 = from_dict(FinetuneConfig(), meta["config"])
    assert cfg2.encoder.backbone == backbone
    params, state = payload["params"], payload["state"]
    graph = fused_full_graph(ds, cfg2)
    z, st2, _ = task_model.encode(params, state, cfg2, graph, training=False)
    logits, _, _ = task_model.task_logits(params, st2, cfg2, z,
                                          training=False,
                                          mask=graph.node_mask)
    probs = np.asarray(jax.nn.softmax(jnp.mean(logits, axis=1),
                                      axis=-1))[: ds.num_nodes]
    assert probs.shape == (ds.num_nodes, 3)
    assert np.isfinite(probs).all()
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)


def test_finetune_donation_matches_nondonating():
    """donate=True must not change results (and must not trip XLA's
    double-donation check across splits/kmeans-init aliasing)."""
    ds = synthetic_node_dataset(num_nodes=200, num_classes=3, feat_dim=D,
                                train_per_split=30, val_per_split=50,
                                num_splits=2, seed=2)
    enc = EncoderConfig(input_dim=D, hidden_dim=D, num_layers=2,
                        normalize="batch", dropout=0.0)
    vq = VQConfig(dim=D, codebook_size=8, codebook_dim=8, heads=2,
                  commitment_weight=0.25)
    cfg = FinetuneConfig(encoder=enc, vq=vq, task="node", epochs=6,
                         early_stop=6, lr=5e-3, repeat=2, num_classes=3)
    a = run_finetune(ds, cfg, donate=False).get_best()
    b = run_finetune(ds, cfg, donate=True).get_best()
    assert a == b, (a, b)

    cfg_mb = FinetuneConfig(encoder=enc, vq=vq, task="node", epochs=4,
                            early_stop=4, lr=5e-3, repeat=1, num_classes=3,
                            batch_size=32)
    a = run_finetune(ds, cfg_mb, donate=False).get_best()
    b = run_finetune(ds, cfg_mb, donate=True).get_best()
    assert a == b, (a, b)
