"""Hub-dense decomposition (ops.edge_layout.HubDense + the fused SAGE
factored path): layout invariants and equality with the plain gather path
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stemgnn_tpu.ops.edge_layout import build_edge_layout
from stemgnn_tpu.ops.fused_sage import fused_sage_aggregate


def _skewed_graph(rng, n=300, e=900):
    hot = rng.integers(0, 8, e // 2).astype(np.int32)
    cold = rng.integers(0, n, e - e // 2).astype(np.int32)
    s = rng.permutation(np.concatenate([hot, cold])).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    return s, r


def test_hub_dense_layout_invariants(rng):
    n_pad = 512
    s, r = _skewed_graph(rng)
    lay = build_edge_layout(s, r, n_pad, edge_chunk=128, hub_size=64)
    assert lay.hub_r is not None and lay.hub_s is not None
    hub = lay.hub_r
    assert hub.coverage > 0.3
    cnt = np.asarray(hub.cnt, np.float32)
    hub_ids = np.asarray(hub.hub_ids)[:hub.hub_size]
    rank = {int(v): i for i, v in enumerate(hub_ids)}
    want = np.zeros_like(cnt)
    n_hub_edges = 0
    for si, ri in zip(s, r):
        if int(si) in rank:
            want[ri, rank[int(si)]] += 1
            n_hub_edges += 1
    np.testing.assert_array_equal(cnt, want)
    assert cnt.sum() == n_hub_edges
    # tail sub-layout holds exactly the remaining edges
    tmask = np.asarray(hub.tail.mask_r)
    assert tmask.sum() == len(s) - n_hub_edges
    # partition: every tail sender is non-hub
    tsend = np.asarray(hub.tail.senders_r)[tmask]
    assert not np.isin(tsend, hub_ids).any()


@pytest.mark.parametrize("skew,hub_size", [(True, 64), (False, 64),
                                           (True, 512)])
def test_fused_sage_hub_matches_plain(rng, skew, hub_size):
    """Values and gradients of the factored bf16 path are identical through
    the hub-dense decomposition (hub_size=512 >= n: empty tail)."""
    n_pad = 512
    if skew:
        s, r = _skewed_graph(rng)
    else:
        s = rng.integers(0, 300, 900).astype(np.int32)
        r = rng.integers(0, 300, 900).astype(np.int32)
    lay_hub = build_edge_layout(s, r, n_pad, edge_chunk=128,
                                hub_size=hub_size, hub_min_coverage=0.0)
    lay_plain = build_edge_layout(s, r, n_pad, edge_chunk=128)
    assert lay_hub.hub_r is not None
    x = jnp.asarray(rng.standard_normal((n_pad, 96)).astype(np.float32))

    def loss(x, lay):
        out = fused_sage_aggregate(x, lay, None, reduce="mean", relu=True,
                                   bf16_messages=True, interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2), out

    (_, out_hub), g_hub = jax.value_and_grad(loss, has_aux=True)(x, lay_hub)
    (_, out_plain), g_plain = jax.value_and_grad(loss, has_aux=True)(
        x, lay_plain)
    np.testing.assert_allclose(np.asarray(out_hub), np.asarray(out_plain),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(g_hub), np.asarray(g_plain),
                               rtol=2e-2, atol=2e-2)


def test_hub_dense_matches_numpy(rng):
    """End-to-end vs a dense numpy reference (bf16-rounded inputs)."""
    n_pad = 512
    s, r = _skewed_graph(rng)
    lay = build_edge_layout(s, r, n_pad, edge_chunk=128, hub_size=64)
    x = rng.standard_normal((n_pad, 64)).astype(np.float32)
    out = fused_sage_aggregate(jnp.asarray(x), lay, None, reduce="mean",
                               relu=True, bf16_messages=True, interpret=True)
    xb = np.asarray(jnp.asarray(x).astype(jnp.bfloat16), np.float32)
    want = np.zeros((n_pad, 64), np.float32)
    np.add.at(want, r, np.maximum(xb[s], 0.0))
    deg = np.zeros(n_pad, np.float32)
    np.add.at(deg, r, 1.0)
    want = want / np.maximum(deg, 1.0)[:, None]
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-2, atol=2e-2)


def test_hub_min_coverage_gate(rng):
    """Uniform low-degree graphs skip the hub build entirely."""
    s = rng.permutation(np.arange(500)).astype(np.int32)
    r = rng.permutation(np.arange(500)).astype(np.int32)
    lay = build_edge_layout(s, r, 512, edge_chunk=128, hub_size=16,
                            hub_min_coverage=0.2)
    assert lay.hub_r is None and lay.hub_s is None


@pytest.mark.parametrize("with_hub", [False, True])
def test_single_type_table_factored(rng, with_hub):
    """A one-row edge-type table keeps messages per-source: the factored
    (and hub-dense) path must match the generic XLA reference."""
    from stemgnn_tpu.ops.spmm import gather_scatter_aggregate

    n_pad = 512
    s, r = _skewed_graph(rng)
    lay = build_edge_layout(s, r, n_pad, edge_chunk=128,
                            hub_size=64 if with_hub else 0,
                            hub_min_coverage=0.0)
    if with_hub:
        assert lay.hub_r is not None
    d = 96
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    table = jnp.asarray(rng.standard_normal((1, d)).astype(np.float32))
    xb = x.astype(jnp.bfloat16).astype(jnp.float32)
    tb = table.astype(jnp.bfloat16).astype(jnp.float32)

    def loss_fused(x):
        out = fused_sage_aggregate(x, lay, table, reduce="mean", relu=True,
                                   bf16_messages=True, interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2), out

    def loss_ref(x):
        ef = jnp.broadcast_to(tb[0], (len(s), tb.shape[1]))
        out = gather_scatter_aggregate(x, jnp.asarray(s), jnp.asarray(r),
                                       edge_feat=ef, num_nodes=n_pad,
                                       reduce="mean", relu=True)
        return jnp.sum(out ** 2), out

    (_, o1), g1 = jax.value_and_grad(loss_fused, has_aux=True)(x)
    (_, o2), g2 = jax.value_and_grad(loss_ref, has_aux=True)(xb)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=3e-2, atol=3e-2)


def test_small_table_onehot_lookup(rng):
    """T<=32 type tables go through the one-hot matmul lookup — results
    must match the generic gather path (T=11, the WN18RR relation count)."""
    from stemgnn_tpu.ops.spmm import gather_scatter_aggregate

    n_pad = 512
    s, r = _skewed_graph(rng)
    xe = rng.integers(0, 11, len(s)).astype(np.int32)
    lay = build_edge_layout(s, r, n_pad, edge_chunk=128, xe_ids=xe)
    d = 96
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    table = jnp.asarray(rng.standard_normal((11, d)).astype(np.float32))
    xb = x.astype(jnp.bfloat16).astype(jnp.float32)
    tb = table.astype(jnp.bfloat16).astype(jnp.float32)

    out = fused_sage_aggregate(x, lay, table, reduce="mean", relu=True,
                               bf16_messages=True, interpret=True)
    ref = gather_scatter_aggregate(xb, jnp.asarray(s), jnp.asarray(r),
                                   edge_feat=jnp.take(tb, jnp.asarray(xe),
                                                      axis=0),
                                   num_nodes=n_pad, reduce="mean", relu=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("with_table,relu", [(False, True), (True, True),
                                             (True, False)])
def test_edge_keep_runtime_mask(rng, with_table, relu):
    """A runtime per-edge keep mask (the pretrain edge-dropout) through the
    fused path == the XLA reference with the same mask (values + grads),
    including the dynamic mean degree."""
    from stemgnn_tpu.ops.spmm import gather_scatter_aggregate

    n_pad = 512
    s, r = _skewed_graph(rng)
    e = len(s)
    xe = rng.integers(0, 7, e).astype(np.int32)
    lay = build_edge_layout(s, r, n_pad, edge_chunk=128,
                            xe_ids=xe if with_table else None)
    d = 96
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    table = jnp.asarray(rng.standard_normal((7, d)).astype(np.float32)) \
        if with_table else None
    keep = jnp.asarray(rng.random(e) < 0.8)
    xb = x.astype(jnp.bfloat16).astype(jnp.float32)

    def loss_fused(x):
        out = fused_sage_aggregate(x, lay, table, reduce="mean", relu=relu,
                                   bf16_messages=True, interpret=True,
                                   edge_keep=keep)
        return jnp.sum(out.astype(jnp.float32) ** 2), out

    def loss_ref(x):
        ef = None
        if with_table:
            tb = table.astype(jnp.bfloat16).astype(jnp.float32)
            ef = jnp.take(tb, jnp.asarray(xe), axis=0)
        out = gather_scatter_aggregate(x, jnp.asarray(s), jnp.asarray(r),
                                       edge_feat=ef, edge_mask=keep,
                                       num_nodes=n_pad, reduce="mean",
                                       relu=relu)
        return jnp.sum(out ** 2), out

    (_, o1), g1 = jax.value_and_grad(loss_fused, has_aux=True)(x)
    (_, o2), g2 = jax.value_and_grad(loss_ref, has_aux=True)(xb)
    # atol covers one bf16 ULP at |pre| ~ 8 (the paths round x + t_row at
    # different points)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=3e-2, atol=8e-2)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=3e-2, atol=8e-2)


def test_edge_keep_hub_layout_falls_back(rng):
    """Hub-dense cannot honor runtime masks — a hub layout with edge_keep
    must still produce correct (non-hub) results."""
    from stemgnn_tpu.ops.spmm import gather_scatter_aggregate

    n_pad = 512
    s, r = _skewed_graph(rng)
    lay = build_edge_layout(s, r, n_pad, edge_chunk=128, hub_size=64,
                            hub_min_coverage=0.0)
    assert lay.hub_r is not None
    d = 64
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    keep = jnp.asarray(rng.random(len(s)) < 0.7)
    out = fused_sage_aggregate(x, lay, None, reduce="mean", relu=True,
                               bf16_messages=True, interpret=True,
                               edge_keep=keep)
    xb = x.astype(jnp.bfloat16).astype(jnp.float32)
    ref = gather_scatter_aggregate(xb, jnp.asarray(s), jnp.asarray(r),
                                   edge_mask=keep, num_nodes=n_pad,
                                   reduce="mean", relu=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)
