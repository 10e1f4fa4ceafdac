"""OFA subsystem tests: hop sampling, prompted-graph construction (hier +
flat), link negatives, KG inverse edges, few-shot assembly, multi-dataset
adaptive mixing."""

import numpy as np
import pytest

from stemgnn_tpu.data.synthetic import (synthetic_graph_dataset,
                                        synthetic_link_dataset,
                                        synthetic_node_dataset)
from stemgnn_tpu.ofa import (FewShotDataset, GraphListHierDataset,
                             MultiDataset, SimpleFSManager,
                             SubgraphKGHierDataset, SubgraphLinkHierDataset,
                             SubgraphNodeDataset, collate_prompted)
from stemgnn_tpu.ofa.subgraph import (CSRAdjacency, induced_edges,
                                      sample_fixed_hop_neighbors)

D = 16


@pytest.fixture
def node_ds():
    return synthetic_node_dataset(num_nodes=120, num_classes=4, feat_dim=D,
                                  train_per_split=20, val_per_split=30,
                                  num_splits=1, seed=0)


def test_hop_sampler_cap(rng):
    # star: node 0 connects to 1..60
    ei = np.stack([np.zeros(60, np.int64), np.arange(1, 61)])
    adj = CSRAdjacency(ei, 61)
    nbrs = sample_fixed_hop_neighbors(adj, [0], 1, max_nodes_per_hop=10,
                                      rng=np.random.default_rng(0))
    assert len(nbrs) == 10
    assert set(nbrs.tolist()) <= set(range(1, 61))
    # induced edges relabel locally
    nodes = np.r_[0, nbrs]
    src, dst, _ = induced_edges(adj, nodes)
    assert (src == 0).all() and (dst > 0).all()


def test_subgraph_node_dataset_prompted(node_ds):
    class_emb = np.eye(4, D, dtype=np.float32)
    pe = np.ones((5, D), np.float32)
    dset = SubgraphNodeDataset(node_ds, class_emb, pe,
                               data_idx=np.arange(10), hier=True)
    s = dset[0]
    n = len(s["node_feat"])
    # trailing 4 class nodes, NOI right before them
    assert s["true_nodes_mask"][-4:].all() and not s["true_nodes_mask"][:-4].any()
    assert s["noi_node_mask"][n - 5] and s["noi_node_mask"].sum() == 1
    assert s["bin_labels"].sum() == 1.0
    assert s["bin_labels"][-4:][s["y"]] == 1.0
    # prompt edge types present: f2n=1 n2f=3 n2c=2 c2n=4
    assert set(np.unique(s["edge_type"])) >= {0, 1, 2, 3, 4}
    # f2n edge: target(0) -> NOI
    f2n = s["edge_type"] == 1
    assert (s["senders"][f2n] == 0).all() and (s["receivers"][f2n] == n - 5).all()

    g, aux = collate_prompted([dset[0], dset[1]])
    assert g.node_feat.shape[0] >= len(s["node_feat"])
    assert aux["bin_labels"].shape[0] == g.num_nodes_padded


def test_subgraph_node_flat_variant(node_ds):
    class_emb = np.eye(4, D, dtype=np.float32)
    pe = np.ones((5, D), np.float32)
    dset = SubgraphNodeDataset(node_ds, class_emb, pe,
                               data_idx=np.arange(5), hier=False)
    s = dset[0]
    # no NOI: f2n connects target to every class node directly
    f2n = s["edge_type"] == 1
    n = len(s["node_feat"])
    assert (s["senders"][f2n] == 0).all()
    assert set(s["receivers"][f2n].tolist()) == set(range(n - 4, n))
    assert 2 not in s["edge_type"] and 4 not in s["edge_type"]


def test_link_dataset_negatives(node_ds):
    class_emb = np.eye(2, D, dtype=np.float32)
    pe = np.ones((5, D), np.float32)
    pos = np.asarray(node_ds.edge_index).T[:20]
    dset = SubgraphLinkHierDataset(node_ds, class_emb, pe, pos,
                                   remove_edge=True)
    assert len(dset) == 40
    existing = set(map(tuple, np.asarray(node_ds.edge_index).T.tolist()))
    for u, v in dset.neg_edges:
        assert (u, v) not in existing and u != v
    s_pos, s_neg = dset[0], dset[25]
    assert s_pos["y"] == 1 and s_neg["y"] == 0
    # remove_edge: the 0<->1 feature edge must be gone from positives
    feat_edges = s_pos["edge_type"] == 0
    pairs = set(zip(s_pos["senders"][feat_edges].tolist(),
                    s_pos["receivers"][feat_edges].tolist()))
    assert (0, 1) not in pairs and (1, 0) not in pairs


def test_kg_dataset_inverse_edges():
    ds = synthetic_link_dataset(num_entities=80, num_relations=3,
                                num_edges=400, feat_dim=D, seed=0)
    class_emb = np.eye(3, D, dtype=np.float32)
    pe = np.ones((5, D), np.float32)
    pairs = np.asarray(ds.edge_index).T[:10]
    dset = SubgraphKGHierDataset(ds, class_emb, pe, pairs,
                                 np.asarray(ds.labels)[:10])
    s = dset[0]
    feat_edges = s["edge_type"] == 0
    e = int(feat_edges.sum())
    assert e % 2 == 0  # doubled with inverses
    src = s["senders"][feat_edges][: e // 2]
    dst = s["receivers"][feat_edges][: e // 2]
    src2 = s["senders"][feat_edges][e // 2:]
    dst2 = s["receivers"][feat_edges][e // 2:]
    np.testing.assert_array_equal(src, dst2)
    np.testing.assert_array_equal(dst, src2)


def test_graph_list_dataset():
    graphs, labels, split = synthetic_graph_dataset(num_graphs=10,
                                                    num_tasks=3, feat_dim=D,
                                                    seed=0)
    class_emb = np.eye(3, D, dtype=np.float32)
    pe = np.ones((5, D), np.float32)
    dset = GraphListHierDataset(graphs, labels, class_emb, pe,
                                np.arange(10))
    s = dset[0]
    n_feat = len(graphs[0]["node_feat"])
    f2n = s["edge_type"] == 1
    # every feature node links to the NOI
    assert set(s["senders"][f2n].tolist()) == set(range(n_feat))
    assert (s["receivers"][f2n] == n_feat).all()


def test_fewshot_assembly(node_ds):
    class_emb = np.eye(4, D, dtype=np.float32)
    pe = np.ones((5, D), np.float32)
    base = SubgraphNodeDataset(node_ds, class_emb, pe,
                               data_idx=np.arange(120), hier=True)
    labels = np.asarray(node_ds.labels)
    class_ind = np.arange(4)
    data_ind = [np.where(labels == c)[0] for c in range(4)]
    fs = SimpleFSManager(class_ind, data_ind, k_shot=2, q_query=1, n_way=3,
                         seed=0)
    fsd = FewShotDataset(fs, base, base, fs_edge_feats=np.ones((2, D)),
                         sample_size=4)
    s = fsd[0]
    n_way = s["num_classes"]
    assert n_way == 3
    # 1 query + n_way*k_shot supports => n_way*k_shot + 1 NOI nodes
    assert s["noi_node_mask"].sum() == 3 * 2 + 1
    # query edges (type 2): NOI of query -> all class nodes
    q = s["edge_type"] == 2
    assert q.sum() == n_way
    # support edges (type 4): one per support graph
    assert (s["edge_type"] == 4).sum() == 3 * 2
    assert s["bin_labels"].sum() == 1.0


def test_multidataset_adaptive_halving():
    class Fake:
        def __init__(self, n):
            self.n = n
        def __len__(self):
            return self.n
        def __getitem__(self, i):
            return i
    md = MultiDataset([Fake(100), Fake(50)], dataset_multiple=2.0,
                      window_size=2, patience=1, min_ratio=0.25, seed=0)
    assert len(md) == 300
    # dataset 0 plateaus, dataset 1 improves
    for epoch in range(6):
        md.update([1.0, 1.0 + epoch * 0.5])
    assert md.dataset_multiple[0] < 2.0     # halved at least once
    assert md.dataset_multiple[1] == 2.0    # untouched
    assert md.dataset_multiple[0] >= 0.25   # floored


def test_ofa_in_context_trainer_mechanics(node_ds):
    """Trainer wiring: loss decreases markedly when overfitting one batch
    (convergence tuning of the in-context objective is tracked in
    ROADMAP.md)."""
    from stemgnn_tpu.ofa.datasets import SubgraphNodeDataset
    from stemgnn_tpu.ofa.train import ofa_train_eval

    class_emb = np.eye(4, D, dtype=np.float32)
    pe = np.ones((5, D), np.float32)
    dset = SubgraphNodeDataset(node_ds, class_emb, pe,
                               data_idx=np.arange(16), hier=True)
    idx = np.arange(16)
    loss0, _ = ofa_train_eval(dset, idx, idx, dim=D, lr=1e-2, epochs=1,
                              batch_size=16)
    loss1, acc = ofa_train_eval(dset, idx, idx, dim=D, lr=1e-2, epochs=120,
                                batch_size=16)
    assert loss1 < loss0 * 0.8, (loss0, loss1)
    assert acc >= 0.25  # above 4-class chance on the overfit set


def test_fewshot_end_to_end(node_ds):
    """Meta-train on train-class episodes, evaluate on held-out-class
    episodes — must beat 1/n_way chance on the separable synthetic task.

    Multi-seed with a tolerance band (VERDICT r1 item 8): convergence on
    the synthetic stand-in is seed-sensitive (calibrated accs over seeds
    0-4: 0.73/0.65/0.48/0.77/0.81), so instead of pinning one lucky seed
    the test requires >= 4/5 seeds above 0.55 and a mean above 0.6
    (2-way chance is 0.5)."""
    from stemgnn_tpu.ofa.train import fewshot_train_eval

    class_emb = np.eye(4, D, dtype=np.float32)
    pe = np.ones((5, D), np.float32)
    base = SubgraphNodeDataset(node_ds, class_emb, pe,
                               data_idx=np.arange(120), hier=True)
    labels = np.asarray(node_ds.labels)
    accs = []
    for seed in range(5):
        out = fewshot_train_eval(
            base, labels, {"train": [0, 1, 2], "test": [1, 2, 3]}, dim=D,
            n_way=2, k_shot=2, train_episodes=96, eval_episodes=48,
            epochs=12, num_layers=3, lr=3e-3, batch_size=8, seed=seed)
        assert np.isfinite(out["train_loss"])
        accs.append(out["test_acc"])
    above = sum(a > 0.55 for a in accs)
    assert above >= 4, accs
    assert np.mean(accs) > 0.6, accs


def test_bin_graph_att_head_learns(node_ds):
    """BinGraphAttModel re-design: attention-pooled per-layer embeddings +
    class-node MLP learns the prompted node task; RWPE path shapes check."""
    import jax
    import jax.numpy as jnp
    import optax
    from stemgnn_tpu.core.graph import round_up
    from stemgnn_tpu.ofa.heads import (bin_graph_apply, bin_graph_init,
                                       random_walk_pe)

    class_emb = np.eye(4, D, dtype=np.float32)
    pe = np.ones((5, D), np.float32)
    base = SubgraphNodeDataset(node_ds, class_emb, pe,
                               data_idx=np.arange(120), hier=True)

    def batch(idxs):
        chunk = [base[int(j)] for j in idxs]
        tot_n = sum(len(s["node_feat"]) for s in chunk)
        tot_e = sum(len(s["senders"]) for s in chunk)
        g, aux = collate_prompted(chunk, node_pad_to=round_up(tot_n + 1, 256),
                                  edge_pad_to=round_up(tot_e, 512))
        return g, aux, np.asarray([s["y"] for s in chunk])

    params, state = bin_graph_init(jax.random.PRNGKey(0), "gine", 2, D, D,
                                   att_pool=True)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, state, g, tm, bl, rng):
        def loss_fn(params):
            s, st = bin_graph_apply(params, state, "gine", g,
                                    {"true_nodes_mask": tm}, training=True,
                                    rng=rng)
            s = jnp.where(tm, s, 0.0)
            per = jnp.maximum(s, 0) - s * bl + jnp.log1p(jnp.exp(-jnp.abs(s)))
            per = jnp.where(tm, per, 0.0)
            return jnp.sum(per) / jnp.maximum(jnp.sum(tm), 1.0), st
        (l, st), gr = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt2 = tx.update(gr, opt, params)
        return optax.apply_updates(params, up), opt2, st, l

    rng_np = np.random.default_rng(0)
    for epoch in range(240):
        g, aux, ys = batch(rng_np.permutation(100)[:16])
        params, opt, state, loss = step(
            params, opt, state, g, jnp.asarray(aux["true_nodes_mask"]),
            jnp.asarray(aux["bin_labels"]), jax.random.PRNGKey(epoch))
    assert np.isfinite(float(loss))

    # eval on held-out indices
    g, aux, ys = batch(np.arange(100, 120))
    s, _ = bin_graph_apply(params, state, "gine", g,
                           {"true_nodes_mask": aux["true_nodes_mask"]},
                           training=False)
    s = np.asarray(s)
    gid = np.asarray(g.node_graph_id)
    correct = total = 0
    for i in range(20):
        rows = np.nonzero((gid == i) & aux["true_nodes_mask"])[0]
        if rows.size:
            correct += int(np.argmax(s[rows]) == int(ys[i]))
            total += 1
    assert total == 20 and correct / total > 0.5, (correct, total)

    # RWPE utilities: shapes + a known value (self-loop node returns 1.0)
    pe_arr = random_walk_pe(np.asarray([0, 1]), np.asarray([0, 2]), 3, 4)
    assert pe_arr.shape == (3, 4)
    np.testing.assert_allclose(pe_arr[0], 1.0)   # node 0 self-loops forever
    params2, state2 = bin_graph_init(jax.random.PRNGKey(1), "gine", 2, D, D,
                                     att_pool=True, walk_length=4)
    n_pad = g.node_feat.shape[0]
    rw = jnp.asarray(np.zeros((n_pad, 4), np.float32))
    s2, _ = bin_graph_apply(params2, state2, "gine", g,
                            {"true_nodes_mask": aux["true_nodes_mask"]},
                            training=True, rwpe=rw)
    assert np.isfinite(np.asarray(s2)[aux["true_nodes_mask"]]).all()


def test_chem_multitask_class_node_training():
    """Chem multitask in-context training: one binary class node per task,
    NaN labels excluded via bin_valid, per-task AUC above chance."""
    from stemgnn_tpu.ofa.train import ofa_train_eval

    graphs, labels, split = synthetic_graph_dataset(
        num_graphs=120, num_tasks=3, feat_dim=D, nan_frac=0.3, seed=0)
    class_emb = np.eye(3, D, dtype=np.float32)
    pe = np.ones((5, D), np.float32)
    dset = GraphListHierDataset(graphs, labels, class_emb, pe,
                                np.arange(120))
    # bin_valid excludes NaN tasks while bin_labels zeroes them
    for idx in range(5):
        s = dset[idx]
        lab = labels[idx]
        np.testing.assert_array_equal(s["bin_valid"][-3:], ~np.isnan(lab))
        assert not s["bin_valid"][:-3].any()
    loss, auc = ofa_train_eval(dset, np.arange(90), np.arange(90, 120),
                               dim=D, epochs=20, lr=3e-3, batch_size=16,
                               task="multi", seed=0)
    assert np.isfinite(loss)
    assert auc > 0.6, auc
