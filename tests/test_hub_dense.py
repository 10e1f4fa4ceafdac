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


def _two_sided_skew(rng, n=600, e=4000):
    def skew():
        hot = rng.integers(0, 8, e // 2).astype(np.int32)
        cold = rng.integers(0, n, e - e // 2).astype(np.int32)
        return rng.permutation(np.concatenate([hot, cold])).astype(np.int32)
    return skew(), skew()


@pytest.mark.parametrize("with_table", [False, True])
def test_scatter_side_hub_matches_plain(rng, with_table):
    """Scatter-side hub block (HubDense.sc_*): edges into hub receivers
    (fwd) / out of hub senders (bwd) collapse into a transposed dense
    sc_cnt @ f(x) matmul — values AND gradients must match both the
    gather-hub-only and the plain paths (round-2 VERDICT item 1)."""
    n, e, d, n_pad = 600, 4000, 64, 640
    s, r = _two_sided_skew(rng, n, e)
    xe = np.zeros(e, np.int32) if with_table else None
    table = (jnp.asarray(rng.standard_normal((1, d)).astype(np.float32))
             if with_table else None)
    kw = dict(edge_chunk=128, xe_ids=xe, feat_dim_hint=d)
    lay_plain = build_edge_layout(s, r, n_pad, hub_size=0, **kw)
    lay_hub = build_edge_layout(s, r, n_pad, hub_size=8,
                                hub_min_coverage=-1.0, **kw)
    lay_sc = build_edge_layout(s, r, n_pad, hub_size=8,
                               hub_min_coverage=-1.0, sc_hub_size=8, **kw)
    assert lay_sc.hub_r.sc_size > 0 and lay_sc.hub_s.sc_size > 0
    assert lay_sc.hub_r.sc_coverage > 0.15
    # partition invariant: gather-hub + scatter-hub + tail == all edges
    tmask = np.asarray(lay_sc.hub_r.tail.mask_r)
    cnt_sum = float(np.asarray(lay_sc.hub_r.cnt, np.float32).sum())
    sc_sum = float(np.asarray(lay_sc.hub_r.sc_cnt, np.float32).sum())
    assert cnt_sum + sc_sum + tmask.sum() == e
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))

    def loss(x, lay):
        out = fused_sage_aggregate(x, lay, table, reduce="mean", relu=True,
                                   bf16_messages=True, interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2), out

    (_, o0), g0 = jax.value_and_grad(loss, has_aux=True)(x, lay_plain)
    (_, o1), g1 = jax.value_and_grad(loss, has_aux=True)(x, lay_hub)
    (_, o2), g2 = jax.value_and_grad(loss, has_aux=True)(x, lay_sc)
    for a, b, name in [(o1, o2, "out"), (o0, o2, "out_plain"),
                       (g1, g2, "grad"), (g0, g2, "grad_plain")]:
        np.testing.assert_allclose(np.asarray(a, np.float32)[:n],
                                   np.asarray(b, np.float32)[:n],
                                   rtol=2e-2, atol=2e-2, err_msg=name)


def test_scatter_side_hub_with_windowed_tail(rng):
    """sc-hub + windowed in-kernel gather on the (shrunken) tail: the
    init-fused epilogue of gathered_scatter_rows_sorted must reproduce the
    plain path."""
    n, e, d, n_pad = 600, 4000, 64, 640
    s, r = _two_sided_skew(rng, n, e)
    lay_plain = build_edge_layout(s, r, n_pad, edge_chunk=128,
                                  feat_dim_hint=d)
    lay = build_edge_layout(s, r, n_pad, edge_chunk=128, hub_size=8,
                            hub_min_coverage=-1.0, sc_hub_size=8,
                            feat_dim_hint=d, gwin="on")
    assert lay.hub_r.sc_size > 0
    assert lay.hub_r.tail.use_gwin_r and lay.hub_s.tail.use_gwin_s
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))

    def loss(x, lay):
        out = fused_sage_aggregate(x, lay, None, reduce="mean", relu=True,
                                   bf16_messages=True, interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2), out

    (_, o0), g0 = jax.value_and_grad(loss, has_aux=True)(x, lay_plain)
    (_, o1), g1 = jax.value_and_grad(loss, has_aux=True)(x, lay)
    np.testing.assert_allclose(np.asarray(o1, np.float32)[:n],
                               np.asarray(o0, np.float32)[:n],
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(g1, np.float32)[:n],
                               np.asarray(g0, np.float32)[:n],
                               rtol=2e-2, atol=2e-2)


def _community_graph(rng, n=3000, e=18000, d=64):
    from stemgnn_tpu.data.synthetic import community_power_law_graph
    from stemgnn_tpu.ops.reorder import community_order, relabel
    _, s, r, _ = community_power_law_graph(n, e, d, seed=1,
                                           num_communities=30, p_intra=0.9)
    perm = community_order(s, r, n)
    s, r, _ = relabel(perm, s, r)
    return s.astype(np.int32), r.astype(np.int32)


def test_loc_split_matches_plain(rng):
    """LocSplit (local/stray edge split, stray sums chained as the windowed
    kernel's init): values and gradients must match the plain path on a
    community-ordered graph."""
    n, e, d = 3000, 18000, 64
    n_pad = ((n + 127) // 128) * 128
    s, r = _community_graph(rng, n, e, d)
    lay_plain = build_edge_layout(s, r, n_pad, feat_dim_hint=d)
    lay_split = build_edge_layout(s, r, n_pad, feat_dim_hint=d,
                                  loc_split="on")
    assert lay_split.split_r is not None and lay_split.split_s is not None
    assert lay_split.split_r.loc_frac > 0.5
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))

    def loss(x, lay):
        out = fused_sage_aggregate(x, lay, None, reduce="mean", relu=True,
                                   interpret=True, bf16_messages=True)
        return jnp.sum(out.astype(jnp.float32) ** 2), out

    (_, o0), g0 = jax.value_and_grad(loss, has_aux=True)(x, lay_plain)
    (_, o1), g1 = jax.value_and_grad(loss, has_aux=True)(x, lay_split)
    np.testing.assert_allclose(np.asarray(o1, np.float32)[:n],
                               np.asarray(o0, np.float32)[:n],
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(g1, np.float32)[:n],
                               np.asarray(g0, np.float32)[:n],
                               rtol=2e-2, atol=2e-2)


def test_loc_split_composes_with_hub(rng):
    """hub-dense + tail LocSplit chain (hub init -> stray kernel -> windowed
    kernel) must match the plain path."""
    n, e, d = 3000, 18000, 64
    n_pad = ((n + 127) // 128) * 128
    s, r = _community_graph(rng, n, e, d)
    lay_plain = build_edge_layout(s, r, n_pad, feat_dim_hint=d)
    lay = build_edge_layout(s, r, n_pad, feat_dim_hint=d, hub_size=8,
                            hub_min_coverage=-1.0, loc_split="on")
    assert lay.hub_r is not None and lay.hub_r.tail.split_r is not None
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))

    def loss(x, lay):
        out = fused_sage_aggregate(x, lay, None, reduce="mean", relu=True,
                                   interpret=True, bf16_messages=True)
        return jnp.sum(out.astype(jnp.float32) ** 2), out

    (_, o0), g0 = jax.value_and_grad(loss, has_aux=True)(x, lay_plain)
    (_, o1), g1 = jax.value_and_grad(loss, has_aux=True)(x, lay)
    np.testing.assert_allclose(np.asarray(o1, np.float32)[:n],
                               np.asarray(o0, np.float32)[:n],
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(g1, np.float32)[:n],
                               np.asarray(g0, np.float32)[:n],
                               rtol=2e-2, atol=2e-2)


def test_loc_split_auto_gating(rng):
    """auto: the split triggers on community-ordered graphs at realistic
    width and stays off on shuffled ones."""
    from stemgnn_tpu.data.synthetic import community_power_law_graph
    from stemgnn_tpu.ops.reorder import community_order, relabel
    n, e, d = 20000, 140000, 768
    n_pad = ((n + 127) // 128) * 128
    _, s, r, _ = community_power_law_graph(n, e, 8, seed=0,
                                           num_communities=64)
    lay0 = build_edge_layout(np.asarray(s, np.int32), np.asarray(r, np.int32),
                             n_pad, feat_dim_hint=d, loc_split="auto")
    assert lay0.split_r is None and lay0.split_s is None
    perm = community_order(s, r, n)
    s2, r2, _ = relabel(perm, s, r)
    lay1 = build_edge_layout(np.asarray(s2, np.int32),
                             np.asarray(r2, np.int32), n_pad,
                             feat_dim_hint=d, loc_split="auto")
    assert lay1.split_r is not None and lay1.split_s is not None
    assert lay1.split_r.loc_frac > 0.7


def test_typed_virtual_hubs_match_plain(rng):
    """T<=32 typed hubs (HubDense.hub_xe: (node, type) pair hubs, forward-
    only dense block) must match the plain multi-type path — values AND
    gradients (round-2 VERDICT item 7)."""
    n, e, d, n_pad, T = 600, 4000, 64, 640, 5
    s, r = _two_sided_skew(rng, n, e)
    xe = rng.integers(0, T, e).astype(np.int32)
    table = jnp.asarray(rng.standard_normal((T, d)).astype(np.float32))
    lay_plain = build_edge_layout(s, r, n_pad, xe_ids=xe, edge_chunk=128)
    lay_hub = build_edge_layout(s, r, n_pad, xe_ids=xe, edge_chunk=128,
                                hub_size=40, hub_min_coverage=-1.0,
                                num_edge_types=T, feat_dim_hint=d)
    assert lay_hub.hub_r is not None and lay_hub.hub_r.hub_xe is not None
    assert lay_hub.hub_s is None       # typed relu mask is per-edge
    # partition invariant: cnt covers exactly the hub-pair edges
    cnt_sum = float(np.asarray(lay_hub.hub_r.cnt, np.float32).sum())
    tmask = np.asarray(lay_hub.hub_r.tail.mask_r)
    assert cnt_sum + tmask.sum() == e
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))

    def loss(x, lay):
        out = fused_sage_aggregate(x, lay, table, reduce="mean", relu=True,
                                   bf16_messages=True, interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2), out

    (_, o0), g0 = jax.value_and_grad(loss, has_aux=True)(x, lay_plain)
    (_, o1), g1 = jax.value_and_grad(loss, has_aux=True)(x, lay_hub)
    np.testing.assert_allclose(np.asarray(o1, np.float32)[:n],
                               np.asarray(o0, np.float32)[:n],
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(g1, np.float32)[:n],
                               np.asarray(g0, np.float32)[:n],
                               rtol=2e-2, atol=2e-2)


def test_loc_split_merged_single_kernel(rng):
    """Single-kernel LocSplit (r3 VERDICT item 4): the merged (block,
    stray-class, gather) layout + in-kernel compact stray pull must match
    BOTH the two-launch chain and the plain path, values and grads."""
    n, e, d = 3000, 18000, 64
    n_pad = ((n + 127) // 128) * 128
    s, r = _community_graph(rng, n, e, d)
    lay_plain = build_edge_layout(s, r, n_pad, feat_dim_hint=d)
    lay_split = build_edge_layout(s, r, n_pad, feat_dim_hint=d,
                                  loc_split="on", loc_merge=True)
    sp = lay_split.split_r
    assert sp is not None and sp.m_keys is not None
    # stray ranks are consecutive within each chunk and counts match
    assert int(sp.m_scnt.sum()) == int((np.asarray(sp.m_sidx) >= 0).sum())
    assert sp.m_stray_keys.shape[0] >= int(sp.m_scnt.sum()) + 512
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))

    def loss(x, lay, merged):
        out = fused_sage_aggregate(x, lay, None, reduce="mean", relu=True,
                                   interpret=True, bf16_messages=True,
                                   loc_merged=merged)
        return jnp.sum(out.astype(jnp.float32) ** 2), out

    (_, o0), g0 = jax.value_and_grad(loss, has_aux=True)(x, lay_plain, False)
    (_, o1), g1 = jax.value_and_grad(loss, has_aux=True)(x, lay_split, True)
    (_, o2), g2 = jax.value_and_grad(loss, has_aux=True)(x, lay_split, False)
    for got, want in [(o1, o0), (g1, g0)]:
        np.testing.assert_allclose(np.asarray(got, np.float32)[:n],
                                   np.asarray(want, np.float32)[:n],
                                   rtol=2e-2, atol=2e-2)
    # merged == two-launch tightly (same bf16 message arithmetic)
    for got, want in [(o1, o2), (g1, g2)]:
        np.testing.assert_allclose(np.asarray(got, np.float32)[:n],
                                   np.asarray(want, np.float32)[:n],
                                   rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("hub_size,sc_hub,with_table", [
    (64, 0, False), (64, 64, False), (0, 0, False), (64, 64, True)])
def test_fused_drop_hash_matches_masked_reference(rng, hub_size, sc_hub,
                                                  with_table):
    """drop_hash (r5): the pair-hash per-step edge dropout through the
    hub-preserving fused path == the XLA gather/segment reference with the
    SAME keep decisions materialized as an edge mask — values and grads,
    fwd mean over KEPT in-edges only."""
    from stemgnn_tpu.ops.pairhash import pair_hash_uniform
    from stemgnn_tpu.ops.spmm import gather_scatter_aggregate

    n_pad, p = 512, 0.3
    s, r = _skewed_graph(rng)
    seed = jnp.asarray(12345, jnp.int32)
    keep = np.asarray(pair_hash_uniform(seed, jnp.asarray(s),
                                        jnp.asarray(r)) >= p)
    table = (jnp.asarray(rng.standard_normal((1, 96)).astype(np.float32))
             if with_table else None)
    lay = build_edge_layout(s, r, n_pad, edge_chunk=128,
                            hub_size=hub_size, sc_hub_size=sc_hub,
                            hub_min_coverage=0.0,
                            num_edge_types=1,
                            xe_ids=np.zeros(len(s), np.int32)
                            if with_table else None)
    if hub_size:
        assert lay.hub_r is not None
    x = jnp.asarray(rng.standard_normal((n_pad, 96)).astype(np.float32))

    def loss_drop(x):
        out = fused_sage_aggregate(x, lay, table, reduce="mean", relu=True,
                                   bf16_messages=True, interpret=True,
                                   drop_hash=(seed, p))
        return jnp.sum(out.astype(jnp.float32) ** 2), out

    ef = None if table is None else jnp.broadcast_to(table[0],
                                                     (len(s), 96))

    def loss_ref(x):
        out = gather_scatter_aggregate(
            x.astype(jnp.bfloat16), jnp.asarray(s), jnp.asarray(r),
            edge_feat=None if ef is None else ef.astype(jnp.bfloat16),
            edge_mask=jnp.asarray(keep), num_nodes=n_pad, reduce="mean",
            relu=True)
        return jnp.sum(out.astype(jnp.float32) ** 2), out

    (_, out_d), g_d = jax.value_and_grad(loss_drop, has_aux=True)(x)
    (_, out_r), g_r = jax.value_and_grad(loss_ref, has_aux=True)(x)
    np.testing.assert_allclose(np.asarray(out_d, np.float32),
                               np.asarray(out_r, np.float32),
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(g_d, np.float32),
                               np.asarray(g_r, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_drop_hash_matches_materialized_keep_path(rng):
    """drop_hash == the existing edge_keep path (identical decisions from
    the shared seed) through the SAME fused kernels, no-hub layout."""
    n_pad, p = 512, 0.25
    s, r = _skewed_graph(rng)
    seed = jnp.asarray(777, jnp.int32)
    from stemgnn_tpu.ops.pairhash import pair_hash_uniform
    keep = pair_hash_uniform(seed, jnp.asarray(s), jnp.asarray(r)) >= p
    lay = build_edge_layout(s, r, n_pad, edge_chunk=128)
    e_pad = lay.senders_r.shape[0]
    keep_pad = jnp.concatenate([keep, jnp.zeros(e_pad - len(s), bool)])
    x = jnp.asarray(rng.standard_normal((n_pad, 96)).astype(np.float32))

    def f_drop(x):
        out = fused_sage_aggregate(x, lay, None, reduce="mean", relu=True,
                                   bf16_messages=True, interpret=True,
                                   drop_hash=(seed, p))
        return jnp.sum(out.astype(jnp.float32) ** 2), out

    def f_keep(x):
        out = fused_sage_aggregate(x, lay, None, reduce="mean", relu=True,
                                   bf16_messages=True, interpret=True,
                                   edge_keep=keep_pad)
        return jnp.sum(out.astype(jnp.float32) ** 2), out

    (_, out_d), g_d = jax.value_and_grad(f_drop, has_aux=True)(x)
    (_, out_k), g_k = jax.value_and_grad(f_keep, has_aux=True)(x)
    np.testing.assert_allclose(np.asarray(out_d, np.float32),
                               np.asarray(out_k, np.float32),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_d, np.float32),
                               np.asarray(g_k, np.float32),
                               rtol=1e-5, atol=1e-5)


def test_drop_mask_layout_matches_drop_hash(rng):
    """drop_mask_layout (the hoisted/baked form, incl. the affine-offset
    id fast path) == the in-kernel drop_hash — values and grads."""
    from stemgnn_tpu.ops.fused_sage import drop_mask_layout

    n_pad, p = 512, 0.3
    s, r = _skewed_graph(rng)
    seed = jnp.asarray(999, jnp.int32)
    lay = build_edge_layout(s, r, n_pad, edge_chunk=128, hub_size=64,
                            sc_hub_size=64, hub_min_coverage=0.0)
    x = jnp.asarray(rng.standard_normal((n_pad, 96)).astype(np.float32))

    def f_kernel(x):
        out = fused_sage_aggregate(x, lay, None, reduce="mean", relu=True,
                                   bf16_messages=True, interpret=True,
                                   drop_hash=(seed, p))
        return jnp.sum(out.astype(jnp.float32) ** 2), out

    def f_baked(x):
        baked = drop_mask_layout(lay, seed, p)     # affine identity ids
        out = fused_sage_aggregate(x, baked, None, reduce="mean",
                                   relu=True, bf16_messages=True,
                                   interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2), out

    def f_baked_table(x):
        iota = jnp.arange(n_pad, dtype=jnp.int32)
        baked = drop_mask_layout(lay, seed, p, ids=(iota, iota))
        out = fused_sage_aggregate(x, baked, None, reduce="mean",
                                   relu=True, bf16_messages=True,
                                   interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2), out

    (_, o1), g1 = jax.value_and_grad(f_kernel, has_aux=True)(x)
    for f in (f_baked, f_baked_table):
        (_, o2), g2 = jax.value_and_grad(f, has_aux=True)(x)
        np.testing.assert_allclose(np.asarray(o2, np.float32),
                                   np.asarray(o1, np.float32),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g2, np.float32),
                                   np.asarray(g1, np.float32),
                                   rtol=1e-5, atol=1e-5)
