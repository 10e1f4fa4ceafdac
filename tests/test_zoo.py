"""Heritage-zoo tests: relational convs, GNN stack JK/virtual-node, MLP,
losses, resolver, k-fold splits."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import random_graph
from stemgnn_tpu.utils.splits import k_fold2_split, k_fold_ind
from stemgnn_tpu.zoo import (cca_loss, gnn_stack_apply, gnn_stack_init,
                             info_nce_loss, mlp_apply, mlp_init, mrr,
                             rgat_edge_apply, rgat_edge_init, rgcn_edge_apply,
                             rgcn_edge_init, resolve_activation)

D = 16


def test_rgcn_matches_dense(rng):
    n, e, R = 20, 60, 3
    x, s, r, ef = random_graph(rng, n=n, e=e, d=D)
    et = rng.integers(0, R, e).astype(np.int32)
    params = rgcn_edge_init(jax.random.PRNGKey(0), D, D, R)
    out = np.asarray(rgcn_edge_apply(params, jnp.asarray(x), jnp.asarray(ef),
                                     jnp.asarray(s), jnp.asarray(r),
                                     jnp.asarray(et)))
    # dense reference: per relation mean of relu(x_j + xe), @ W_r
    want = x @ np.asarray(params["root"]) + np.asarray(params["bias"])
    for rel in range(R):
        agg = np.zeros((n, D))
        cnt = np.zeros(n)
        for k in range(e):
            if et[k] == rel:
                agg[r[k]] += np.maximum(x[s[k]] + ef[k], 0)
                cnt[r[k]] += 1
        agg /= np.maximum(cnt, 1)[:, None]
        want = want + agg @ np.asarray(params["weight"][rel])
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_rgat_runs_and_attends(rng):
    n, e, R = 20, 60, 3
    x, s, r, ef = random_graph(rng, n=n, e=e, d=D)
    et = rng.integers(0, R, e).astype(np.int32)
    params = rgat_edge_init(jax.random.PRNGKey(0), D, D, R, heads=4)
    out = rgat_edge_apply(params, jnp.asarray(x), jnp.asarray(ef),
                          jnp.asarray(s), jnp.asarray(r), jnp.asarray(et))
    assert out.shape == (n, D)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("kind", ["rgcn", "rgat", "gine"])
@pytest.mark.parametrize("jk", ["last", "sum", "mean"])
def test_gnn_stack(rng, kind, jk):
    n, e = 24, 70
    x, s, r, ef = random_graph(rng, n=n, e=e, d=D)
    et = rng.integers(0, 2, e).astype(np.int32)
    params, state = gnn_stack_init(jax.random.PRNGKey(0), kind, 2, D,
                                   num_relations=2, heads=4)
    out, _ = gnn_stack_apply(params, state, kind, jnp.asarray(x),
                             jnp.asarray(ef), jnp.asarray(s), jnp.asarray(r),
                             edge_type=jnp.asarray(et), JK=jk, training=False)
    assert out.shape == (n, D)
    assert np.isfinite(np.asarray(out)).all()


def test_gnn_stack_virtual_node(rng):
    n, e = 24, 70
    x, s, r, ef = random_graph(rng, n=n, e=e, d=D)
    gid = jnp.asarray((np.arange(n) // 12).astype(np.int32))
    params, state = gnn_stack_init(jax.random.PRNGKey(0), "gine", 2, D,
                                   virtual_node=True)
    out, _ = gnn_stack_apply(params, state, "gine", jnp.asarray(x),
                             jnp.asarray(ef), jnp.asarray(s), jnp.asarray(r),
                             node_graph_id=gid, n_graphs=2, training=False)
    assert out.shape == (n, D)


def test_mlp(rng):
    params, state = mlp_init(jax.random.PRNGKey(0), [8, 16, 4])
    x = jnp.asarray(rng.standard_normal((10, 8)).astype(np.float32))
    y, _ = mlp_apply(params, state, x, training=True)
    assert y.shape == (10, 4)


def test_losses(rng):
    z = jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32))
    mi = z @ z.T
    l = float(info_nce_loss(mi))
    assert np.isfinite(l)
    # perfect alignment has lower loss than random
    aligned = jnp.eye(8) * 10.0
    assert float(info_nce_loss(aligned)) < l

    h1 = jnp.asarray(rng.standard_normal((32, 8)).astype(np.float32))
    assert float(cca_loss(h1, h1)) < float(
        cca_loss(h1, h1 + jnp.asarray(
            rng.standard_normal((32, 8)).astype(np.float32))))

    scores = jnp.asarray([[0.1, 0.9, 0.2], [0.8, 0.1, 0.0]])
    assert float(mrr(scores, jnp.asarray([1, 0]))) == 1.0
    # row0: rank 3 -> 1/3; row1: rank 1 -> 1; mean = 2/3
    assert float(mrr(scores, jnp.asarray([0, 0]))) == pytest.approx(2 / 3)


def test_resolver():
    assert resolve_activation("relu")(jnp.asarray(-1.0)) == 0.0
    with pytest.raises(ValueError):
        resolve_activation("nope")


def test_k_fold(rng):
    labels = rng.integers(0, 3, 60)
    folds = k_fold_ind(labels, 5)
    assert len(folds) == 5
    all_idx = np.sort(np.concatenate(folds))
    np.testing.assert_array_equal(all_idx, np.arange(60))
    splits = k_fold2_split(folds, 60)
    tr, te, va = splits[0]
    assert len(set(tr) & set(te)) == 0 and len(set(te) & set(va)) == 0
    assert len(tr) + len(te) + len(va) == 60


def test_pooling_modes(rng):
    from stemgnn_tpu.zoo.pooling import (attention_pool_apply,
                                         attention_pool_init, global_pool)
    z = jnp.asarray(rng.standard_normal((10, 8)).astype(np.float32))
    gid = jnp.asarray((np.arange(10) // 5).astype(np.int32))
    for mode in ["mean", "sum", "max"]:
        out = global_pool(z, gid, 2, mode=mode)
        assert out.shape == (2, 8)
    params = attention_pool_init(jax.random.PRNGKey(0), 8)
    out = attention_pool_apply(params, z, gid, 2)
    assert out.shape == (2, 8) and np.isfinite(np.asarray(out)).all()


def test_grid_and_merge_mod():
    from stemgnn_tpu.utils.grid import combine_dict, grid_search, merge_mod
    combos = list(grid_search({"lr": [1, 2], "wd": ["a"]}))
    assert combos == [{"lr": 1, "wd": "a"}, {"lr": 2, "wd": "a"}]
    assert combine_dict({"a": 1}, {"a": 2, "b": 3}) == {"a": 2, "b": 3}
    out = merge_mod({"x": 1}, ["x=5", "name=abc", "flag=True"])
    assert out == {"x": 5, "name": "abc", "flag": True}
