"""SAGE aggregation vs dense reference; padding invariance; autodiff."""

import jax
import jax.numpy as jnp
import numpy as np

from conftest import random_graph
from stemgnn_tpu.ops.spmm import gather_scatter_aggregate, sage_aggregate


def dense_sage_agg(x, senders, receivers, ef, reduce="mean"):
    n, d = x.shape
    out = np.zeros((n, d))
    cnt = np.zeros(n)
    for k in range(len(senders)):
        m = x[senders[k]] + (ef[k] if ef is not None else 0)
        out[receivers[k]] += np.maximum(m, 0)
        cnt[receivers[k]] += 1
    if reduce == "mean":
        out /= np.maximum(cnt, 1)[:, None]
    return out


def test_sage_aggregate_matches_dense(rng):
    x, s, r, ef = random_graph(rng)
    for reduce in ["mean", "sum"]:
        got = gather_scatter_aggregate(jnp.asarray(x), jnp.asarray(s),
                                       jnp.asarray(r), jnp.asarray(ef),
                                       reduce=reduce)
        want = dense_sage_agg(x, s, r, ef, reduce)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_padding_invariance(rng):
    """Padded edges (mask False) must not change valid-node outputs."""
    x, s, r, ef = random_graph(rng, n=20, e=60, d=8)
    want = dense_sage_agg(x, s, r, ef)
    # pad edges pointing at node 0 with garbage features
    pad = 37
    s_p = np.concatenate([s, np.zeros(pad, np.int32)])
    r_p = np.concatenate([r, np.zeros(pad, np.int32)])
    ef_p = np.concatenate([ef, np.full((pad, 8), 1e6, np.float32)])
    mask = np.concatenate([np.ones(60, bool), np.zeros(pad, bool)])
    got = gather_scatter_aggregate(jnp.asarray(x), jnp.asarray(s_p),
                                   jnp.asarray(r_p), jnp.asarray(ef_p),
                                   edge_mask=jnp.asarray(mask))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_autodiff_grads_flow(rng):
    x, s, r, ef = random_graph(rng, n=12, e=30, d=4)

    def loss(x, ef):
        out = sage_aggregate(jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                             ef)
        return jnp.sum(out ** 2)

    gx, gef = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(ef))
    assert np.isfinite(np.asarray(gx)).all()
    assert np.isfinite(np.asarray(gef)).all()
    # numeric check on one coordinate
    eps = 1e-3
    xp = x.copy()
    xp[3, 2] += eps
    num = (loss(xp, jnp.asarray(ef)) - loss(x, jnp.asarray(ef))) / eps
    np.testing.assert_allclose(gx[3, 2], num, rtol=2e-2, atol=1e-2)


def test_node_reordering_preserves_aggregation(rng):
    """degree/RCM relabeling is a pure permutation: aggregate(relabel(g))
    == relabel(aggregate(g))."""
    import jax.numpy as jnp
    from stemgnn_tpu.ops.reorder import degree_order, rcm_order, relabel
    from stemgnn_tpu.ops.spmm import gather_scatter_aggregate

    n, e, d = 80, 400, 16
    s = rng.integers(0, n, e).astype(np.int64)
    r = rng.integers(0, n, e).astype(np.int64)
    x = rng.standard_normal((n, d)).astype(np.float32)
    base = np.asarray(gather_scatter_aggregate(
        jnp.asarray(x), jnp.asarray(s), jnp.asarray(r), None, reduce="mean"))
    for order_fn in (degree_order, rcm_order):
        perm = order_fn(s, r, n)
        assert sorted(perm.tolist()) == list(range(n))
        s2, r2, (x2,) = relabel(perm, s, r, node_arrays=(x,))
        out2 = np.asarray(gather_scatter_aggregate(
            jnp.asarray(x2), jnp.asarray(s2), jnp.asarray(r2), None,
            reduce="mean"))
        # out2 in new ids: out2[new] == base[perm[new]]
        np.testing.assert_allclose(out2, base[perm], rtol=1e-5, atol=1e-5)


def test_rcm_handles_isolated_and_components(rng):
    from stemgnn_tpu.ops.reorder import rcm_order
    # two components + 3 isolated nodes
    s = np.asarray([0, 1, 5, 6], np.int64)
    r = np.asarray([1, 2, 6, 7], np.int64)
    perm = rcm_order(s, r, 11)
    assert sorted(perm.tolist()) == list(range(11))


def test_layout_fallback_honors_dynamic_edge_mask(rng):
    """The non-fused layout path (CPU debugging route) must fold a runtime
    edge mask into messages AND the mean's degree (ADVICE r1 item 1)."""
    from stemgnn_tpu.ops.edge_layout import build_edge_layout
    from stemgnn_tpu.ops.spmm import sage_aggregate

    n, e, t, d = 40, 200, 3, 8
    s = rng.integers(0, n, e).astype(np.int64)
    r = rng.integers(0, n, e).astype(np.int64)
    xe = rng.integers(0, t, e).astype(np.int32)
    x = rng.standard_normal((n, d)).astype(np.float32)
    table = rng.standard_normal((t, d)).astype(np.float32)
    n_pad = 128
    x_pad = np.zeros((n_pad, d), np.float32)
    x_pad[:n] = x
    keep = rng.random(e) < 0.6
    lay = build_edge_layout(s, r, n_pad, xe_ids=xe, to_device=False)
    keep_pad = np.zeros(lay.num_edges_padded, np.float32)
    keep_pad[:e] = keep
    # CPU: layout present but backend != tpu -> the fallback branch runs
    got = np.asarray(sage_aggregate(
        jnp.asarray(x_pad), None, None, edge_table=jnp.asarray(table),
        num_nodes=n_pad, reduce="mean", relu=True,
        layout=jax.tree.map(jnp.asarray, lay),
        edge_mask=jnp.asarray(keep_pad), dynamic_edge_mask=True))
    want = np.asarray(gather_scatter_aggregate(
        jnp.asarray(x_pad), jnp.asarray(s[keep]), jnp.asarray(r[keep]),
        jnp.asarray(table[xe[keep]]), num_nodes=n_pad, reduce="mean",
        relu=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_community_order_recovers_blocks(rng):
    """Label-prop community ordering recovers shuffled community structure
    that RCM cannot (10% random shortcut edges defeat its BFS) — measured
    as the fraction of edges within +-512 rows after relabeling."""
    from stemgnn_tpu.data.synthetic import community_power_law_graph
    from stemgnn_tpu.ops.reorder import community_order, relabel
    n, e = 20000, 140000
    _, s, r, _ = community_power_law_graph(n, e, 8, seed=0,
                                           num_communities=64, p_intra=0.9)
    perm = community_order(s, r, n)
    assert sorted(perm.tolist()) == list(range(n))   # a true permutation
    s2, r2, _ = relabel(perm, s, r)
    frac = float(np.mean(np.abs(s2.astype(np.int64) - r2) < 512))
    assert frac > 0.8, frac


def test_reorder_dataset_permutes_consistently(rng):
    """reorder_dataset: node labels/splits/x permute with the edges, so a
    forward pass over the relabeled graph equals the permuted forward of
    the original (eval mode, CPU gather path)."""
    import jax.numpy as jnp

    from stemgnn_tpu.data.synthetic import synthetic_node_dataset
    from stemgnn_tpu.ops.spmm import gather_scatter_aggregate
    from stemgnn_tpu.train.graph_setup import reorder_dataset
    ds = synthetic_node_dataset(num_nodes=400, feat_dim=16, seed=3)
    ds2 = reorder_dataset(ds, "community", task="node")
    perm = ds2.extras["node_perm"]
    np.testing.assert_array_equal(np.asarray(ds2.labels),
                                  np.asarray(ds.labels)[perm])
    np.testing.assert_array_equal(ds2.splits[0]["train"],
                                  np.asarray(ds.splits[0]["train"])[perm])
    out1 = gather_scatter_aggregate(
        jnp.asarray(ds.node_features()), jnp.asarray(ds.edge_index[0]),
        jnp.asarray(ds.edge_index[1]), num_nodes=ds.num_nodes,
        reduce="mean", relu=True)
    out2 = gather_scatter_aggregate(
        jnp.asarray(ds2.node_features()), jnp.asarray(ds2.edge_index[0]),
        jnp.asarray(ds2.edge_index[1]), num_nodes=ds.num_nodes,
        reduce="mean", relu=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1)[perm],
                               rtol=1e-5, atol=1e-5)


def test_maybe_reorder_auto_gating(rng, monkeypatch):
    """auto mode adopts a locality ordering only when probe layouts say the
    windowed kernels unlock (community graph: yes; random graph: no)."""
    import dataclasses

    import jax

    from stemgnn_tpu.core.config import EncoderConfig, FinetuneConfig
    from stemgnn_tpu.data.synthetic import (community_power_law_graph,
                                            synthetic_node_dataset)
    from stemgnn_tpu.train import graph_setup

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cfg = FinetuneConfig(encoder=EncoderConfig(input_dim=16, hidden_dim=16),
                         reorder="auto")

    ds = synthetic_node_dataset(num_nodes=400, feat_dim=16, seed=0)
    _, s, r, _ = community_power_law_graph(20000, 140000, 8, seed=0,
                                           num_communities=64)
    ds_comm = dataclasses.replace(
        ds, x=np.arange(20000), edge_index=np.stack([s, r]),
        labels=np.zeros(20000, np.int64),
        node_text_feat=rng.standard_normal((20000, 16)).astype(np.float32),
        splits=None)
    out = graph_setup.maybe_reorder_dataset(ds_comm, cfg, "node")
    assert "node_perm" in out.extras            # adopted an ordering

    s2 = rng.integers(0, 20000, 140000)
    r2 = rng.integers(0, 20000, 140000)
    ds_rand = dataclasses.replace(ds_comm, edge_index=np.stack([s2, r2]))
    out2 = graph_setup.maybe_reorder_dataset(ds_rand, cfg, "node")
    assert "node_perm" not in out2.extras       # kept original order
