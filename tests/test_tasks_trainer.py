"""TaskConstructor splitters + trainer template + predictors."""

import jax
import jax.numpy as jnp
import numpy as np

from conftest import random_graph
from stemgnn_tpu.ofa.tasks import (TaskConstructor, arxiv_splitter,
                                   cite_link_splitter, fewshot_class_pools,
                                   kg_splitter)
from stemgnn_tpu.data.synthetic import synthetic_link_dataset, \
    synthetic_node_dataset
from stemgnn_tpu.train.trainer import EvalKit, fit
from stemgnn_tpu.zoo.predictors import (graph_predictor_apply,
                                        graph_predictor_init)


def test_arxiv_splitter_partitions():
    ds = synthetic_node_dataset(num_nodes=200, num_classes=4, feat_dim=8,
                                seed=0)
    s = arxiv_splitter(ds)
    all_idx = np.sort(np.concatenate([s["train"], s["valid"], s["test"]]))
    np.testing.assert_array_equal(all_idx, np.arange(200))


def test_cite_link_splitter_ratios():
    ds = synthetic_link_dataset(num_entities=100, num_edges=1000, feat_dim=8,
                                seed=0)
    s = cite_link_splitter(ds)
    assert len(s["train"]) == 850 and len(s["valid"]) == 50
    assert len(s["test"]) == 100


def test_kg_splitter_file_order():
    ds = synthetic_link_dataset(num_entities=100, num_edges=500, feat_dim=8,
                                seed=0)
    ds.extras["split_counts"] = [400, 50, 50]
    s = kg_splitter(ds)
    assert s["train"][0] == 0 and s["train"][-1] == 399
    assert s["valid"][0] == 400 and s["test"][-1] == 499


def test_task_constructor_builds_runtime_dataset():
    tc = TaskConstructor(feat_dim=16)
    dset = tc.make_subgraph_dataset("cora_synthetic", "train")
    s = dset[0]
    assert "bin_labels" in s and s["node_feat"].shape[1] == 16


def test_fewshot_class_pools():
    labels = np.asarray([0, 0, 1, 1, 2, 2, 2])
    pools = fewshot_class_pools(labels, {"train": [0, 2], "test": [1]})
    cls, idx = pools["train"]
    np.testing.assert_array_equal(cls, [0, 2])
    np.testing.assert_array_equal(idx[1], [4, 5, 6])


def test_low_resource_fs_splitters():
    from stemgnn_tpu.ofa.tasks import (fs_splitter, kg_fs_splitter,
                                       low_resource_class_split)
    split = low_resource_class_split("arxiv")
    assert len(split["train"]) == 20 and len(split["valid"]) == 10 \
        and len(split["test"]) == 10
    assert not set(split["train"]) & set(split["test"])

    class _DS:
        labels = np.asarray([0, 0, 1, 1, 2, 2, 2])
        extras = {"split_counts": [3, 2, 2]}
    pools = fs_splitter(_DS())              # CiteFSSplitter: all classes
    cls, idx = pools["train"]
    np.testing.assert_array_equal(cls, [0, 1, 2])
    np.testing.assert_array_equal(idx[2], [4, 5, 6])
    kg = kg_fs_splitter(_DS())              # per-split restriction
    cls, idx = kg["valid"]                  # triples 3..4 -> labels 1, 2
    np.testing.assert_array_equal(idx[1], [3])
    np.testing.assert_array_equal(idx[2], [4])
    assert len(kg["train"][1][0]) == 2      # class 0 only in train range


def test_fit_loop_selects_best_and_early_stops():
    history = []

    def train_epoch(state, epoch):
        return state + 1, {"loss": 1.0 / (epoch + 1)}

    vals = [10, 30, 20, 19, 18, 17, 16, 15]

    def evaluate(state):
        v = vals[min(state, len(vals) - 1)]
        history.append(v)
        return {"train": v, "val": v, "test": v + 1}

    kit = EvalKit(metrics={"acc": lambda p, t: 0.0}, select="acc")
    state, best, logger = fit(train_epoch, evaluate, 0, epochs=20,
                              evalkit=kit, patience=3)
    # eval after epoch e sees vals[e+1]: best 30 at epoch 0, then plateau
    assert best["val"] == 30 and best["epoch"] == 0
    assert state <= 5  # early-stopped after patience=3 bad epochs


def test_graph_predictor(rng):
    d = 16
    x, s, r, ef = random_graph(rng, n=20, e=50, d=d)
    gid = jnp.asarray((np.arange(20) // 10).astype(np.int32))
    params, state = graph_predictor_init(jax.random.PRNGKey(0), "gine", 2, d,
                                         3)
    out, _ = graph_predictor_apply(params, state, "gine", jnp.asarray(x),
                                   jnp.asarray(ef), jnp.asarray(s),
                                   jnp.asarray(r), gid, 2)
    assert out.shape == (2, 3)


def test_link_minibatch_epoch_chunked_matches_per_epoch():
    """Minibatch-link epoch chunking (K epochs of pre-sampled batches + per
    epoch full-batch eval in one dispatch, r2 VERDICT item 4) trains to the
    same quality as the per-epoch driver."""
    import numpy as np

    from stemgnn_tpu.core import config as cfglib
    from stemgnn_tpu.data.registry import load_dataset
    from stemgnn_tpu.train.finetune_loop import run_finetune

    ds = load_dataset("kg_synthetic", feat_dim=32)
    enc = cfglib.EncoderConfig(input_dim=32, hidden_dim=32, num_layers=2)
    vq = cfglib.VQConfig(dim=32, codebook_size=16, codebook_dim=32, heads=2,
                         kmeans_init=True)
    base = dict(encoder=enc, vq=vq, dataset="kg_synthetic", task="link",
                epochs=6, early_stop=10, batch_size=64, lr=1e-3, repeat=1,
                num_classes=ds.num_classes, use_fused_layout=False)
    b1 = run_finetune(ds, cfglib.FinetuneConfig(**base, epoch_chunk=3)
                      ).get_best()
    b0 = run_finetune(ds, cfglib.FinetuneConfig(**base, epoch_chunk=0)
                      ).get_best()
    assert b1["test"]["mean"] > 25
    assert abs(b1["test"]["mean"] - b0["test"]["mean"]) < 15
