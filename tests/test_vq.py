"""VQ-step equivalence tests vs a NumPy re-implementation of the reference
semantics (SURVEY.md §4 pyramid #2: vq.py:650-682 / 849-1064)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stemgnn_tpu.core.config import VQConfig
from stemgnn_tpu.vq import vq_apply, vq_init, vq_kmeans_init
from stemgnn_tpu.vq.codebook import l2norm
from stemgnn_tpu.vq import quantize as q


CFG = VQConfig(dim=32, codebook_size=16, codebook_dim=16, heads=4,
               commitment_weight=10.0, orthogonal_reg_weight=1.0,
               orthogonal_reg_max_codes=None)


def numpy_vq_forward(params, z, training):
    """Reference semantics in numpy: project_in -> heads -> l2norm -> cosine
    dist -> argmax -> quantize -> ST -> project_out."""
    w_in, b_in = np.asarray(params["project_in"]["w"]), np.asarray(params["project_in"]["b"])
    w_out, b_out = np.asarray(params["project_out"]["w"]), np.asarray(params["project_out"]["b"])
    embed = np.asarray(params["embed"])          # [H, C, d]
    xp = z @ w_in + b_in                          # [N, H*d]
    n = z.shape[0]
    h, c, d = embed.shape
    xh = xp.reshape(n, h, d).transpose(1, 0, 2)   # [H, N, d]
    xh = xh / np.maximum(np.linalg.norm(xh, axis=-1, keepdims=True), 1e-12)
    dist = np.einsum("hnd,hcd->hnc", xh, embed)
    ind = dist.argmax(-1)                         # [H, N]
    quant = np.stack([embed[i][ind[i]] for i in range(h)])   # [H, N, d]
    codes = quant.transpose(1, 0, 2).reshape(n, h * d)
    out = codes @ w_out + b_out
    commit = np.mean((quant - xh) ** 2)
    return out, ind.T, codes, commit


def test_eval_forward_matches_numpy(rng):
    key = jax.random.PRNGKey(1)
    params, state = vq_init(key, CFG)
    z = rng.standard_normal((20, 32)).astype(np.float32)
    res = vq_apply(params, state, CFG, jnp.asarray(z), training=False)
    out_np, ind_np, codes_np, _ = numpy_vq_forward(params, z, False)
    np.testing.assert_array_equal(np.asarray(res["indices"]), ind_np)
    np.testing.assert_allclose(res["codes"], codes_np, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(res["quantize"], out_np, rtol=1e-4, atol=1e-5)
    assert float(res["loss"]) == 0.0


def test_train_forward_commit_loss(rng):
    cfg = VQConfig(dim=32, codebook_size=16, codebook_dim=16, heads=4,
                   commitment_weight=10.0, orthogonal_reg_weight=0.0)
    params, state = vq_init(jax.random.PRNGKey(2), cfg)
    z = rng.standard_normal((20, 32)).astype(np.float32)
    res = vq_apply(params, state, cfg, jnp.asarray(z), training=True,
                   rng=jax.random.PRNGKey(0))
    _, _, _, commit_np = numpy_vq_forward(params, z, True)
    np.testing.assert_allclose(float(res["loss"]), commit_np * 10.0,
                               rtol=1e-4)


def test_straight_through_gradients(rng):
    """d quantize / d z must equal d(project_out . heads . l2norm(project_in))
    since ST passes gradients through."""
    cfg = VQConfig(dim=16, codebook_size=8, codebook_dim=4, heads=2,
                   commitment_weight=0.0, orthogonal_reg_weight=0.0)
    params, state = vq_init(jax.random.PRNGKey(3), cfg)
    z = jnp.asarray(rng.standard_normal((6, 16)).astype(np.float32))

    def f(z):
        return jnp.sum(vq_apply(params, state, cfg, z, training=True,
                                rng=jax.random.PRNGKey(0))["quantize"])

    def f_bypass(z):
        from stemgnn_tpu.nn.layers import linear_apply
        xp = linear_apply(params["project_in"], z)
        xh = q._to_heads(cfg, xp)
        xh = l2norm(xh)
        codes = q._from_heads(cfg, xh)
        return jnp.sum(linear_apply(params["project_out"], codes))

    np.testing.assert_allclose(jax.grad(f)(z), jax.grad(f_bypass)(z),
                               rtol=1e-4, atol=1e-5)


def test_mask_excludes_padding(rng):
    params, state = vq_init(jax.random.PRNGKey(4), CFG)
    z = rng.standard_normal((10, 32)).astype(np.float32)
    z_pad = np.concatenate([z, np.full((6, 32), 7.0, np.float32)])
    mask = np.concatenate([np.ones(10, bool), np.zeros(6, bool)])
    r1 = vq_apply(params, state, CFG, jnp.asarray(z), training=True,
                  rng=jax.random.PRNGKey(0))
    r2 = vq_apply(params, state, CFG, jnp.asarray(z_pad), training=True,
                  rng=jax.random.PRNGKey(0), mask=jnp.asarray(mask))
    np.testing.assert_allclose(r1["quantize"], np.asarray(r2["quantize"])[:10],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(r1["loss"]), float(r2["loss"]), rtol=1e-5)


def test_kmeans_init(rng):
    cfg = VQConfig(dim=32, codebook_size=8, codebook_dim=8, heads=4,
                   kmeans_init=True, commitment_weight=0.25)
    params, state = vq_init(jax.random.PRNGKey(5), cfg)
    assert not bool(state["initted"])
    assert float(jnp.abs(params["embed"]).sum()) == 0.0
    z = rng.standard_normal((100, 32)).astype(np.float32)
    params, state = vq_kmeans_init(jax.random.PRNGKey(6), params, state, cfg,
                                   jnp.asarray(z))
    assert bool(state["initted"])
    norms = np.linalg.norm(np.asarray(params["embed"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)  # cosine codebook


def test_ema_update_changes_state(rng):
    cfg = VQConfig(dim=16, codebook_size=8, codebook_dim=4, heads=2,
                   ema_update=True, orthogonal_reg_weight=0.0, decay=0.8)
    params, state = vq_init(jax.random.PRNGKey(7), cfg)
    z = jnp.asarray(rng.standard_normal((30, 16)).astype(np.float32))
    res = vq_apply(params, state, cfg, z, training=True,
                   rng=jax.random.PRNGKey(0))
    ns = res["state"]
    assert not np.allclose(np.asarray(ns["cluster_size"]),
                           np.asarray(state["cluster_size"]))
    assert "embed_target" in ns
    # cluster_size EMA: 0.8*0 + 0.2*bins, bins sum to N per head
    np.testing.assert_allclose(np.asarray(ns["cluster_size"]).sum(-1),
                               0.2 * 30, rtol=1e-5)


def test_codes_from_indices_roundtrip(rng):
    from stemgnn_tpu.vq import get_codes_from_indices
    params, state = vq_init(jax.random.PRNGKey(8), CFG)
    z = jnp.asarray(rng.standard_normal((12, 32)).astype(np.float32))
    res = vq_apply(params, state, CFG, z, training=False)
    codes = get_codes_from_indices(params, CFG, res["indices"])
    np.testing.assert_allclose(codes, res["codes"], rtol=1e-6)


def test_affine_param_euclidean(rng):
    """Affine codebook re-parameterization (vq.py:361-411): first training
    forward copies batch/codebook moments; distances run against the
    codebook mapped into the batch distribution; EMA stats accumulate in the
    codebook's own distribution via the inverse map."""
    cfg = VQConfig(dim=8, codebook_size=8, codebook_dim=4, heads=2,
                   use_cosine_sim=False, affine_param=True, ema_update=True,
                   orthogonal_reg_weight=0.0, commitment_weight=1.0,
                   decay=0.8)
    params, state = vq_init(jax.random.PRNGKey(9), cfg)
    assert not bool(state["affine_initted"])
    z = jnp.asarray((3.0 + 2.0 * rng.standard_normal((40, 8))).astype(np.float32))
    res = vq_apply(params, state, cfg, z, training=True,
                   rng=jax.random.PRNGKey(0))
    ns = res["state"]
    assert bool(ns["affine_initted"])
    # first update = copy: batch mean ~= actual per-head batch mean
    xh = np.asarray(z).reshape(40, 2, 4).transpose(1, 0, 2)
    np.testing.assert_allclose(np.asarray(ns["batch_mean"])[:, 0],
                               xh.mean(1), rtol=1e-5)
    # codebook moments come from the embed itself
    emb = np.asarray(params["embed"])
    np.testing.assert_allclose(np.asarray(ns["codebook_mean"])[:, 0],
                               emb.mean(1), rtol=1e-5)
    # second step lerps with the batch decay
    z2 = jnp.asarray(rng.standard_normal((40, 8)).astype(np.float32))
    res2 = vq_apply(params, ns, cfg, z2, training=True,
                    rng=jax.random.PRNGKey(1))
    xh2 = np.asarray(z2).reshape(40, 2, 4).transpose(1, 0, 2)
    want = 0.99 * np.asarray(ns["batch_mean"])[:, 0] + 0.01 * xh2.mean(1)
    np.testing.assert_allclose(np.asarray(res2["state"]["batch_mean"])[:, 0],
                               want, rtol=1e-4)
    # selected indices match argmin distance to the affine-transformed embed
    c_std = np.sqrt(np.clip(np.asarray(ns["codebook_var"]), 1e-5, None))
    b_std = np.sqrt(np.clip(np.asarray(ns["batch_var"]), 1e-5, None))
    emb_t = (emb - np.asarray(ns["codebook_mean"])) * (b_std / c_std) \
        + np.asarray(ns["batch_mean"])
    res_eval = vq_apply(params, ns, cfg, z2, training=False)
    d = -np.linalg.norm(xh2[:, :, None, :] - emb_t[:, None, :, :], axis=-1)
    np.testing.assert_array_equal(np.asarray(res_eval["indices"]),
                                  d.argmax(-1).transpose(1, 0))


def test_affine_param_rejects_cosine():
    import pytest
    cfg = VQConfig(dim=16, codebook_size=8, codebook_dim=4, heads=2,
                   use_cosine_sim=True, affine_param=True)
    with pytest.raises(ValueError):
        vq_init(jax.random.PRNGKey(0), cfg)


def test_vq_bf16_pipeline_parity():
    """VQConfig.compute_dtype='bfloat16' (r5): the bf16 per-head pipeline
    selects (nearly) the same codes — disagreements only at near-ties —
    and reproduces the f32 commitment loss to bf16 noise."""
    import dataclasses

    cfg = VQConfig(dim=64, codebook_size=16, codebook_dim=64, heads=4,
                   commitment_weight=1.0)
    params, state = vq_init(jax.random.PRNGKey(0), cfg)
    z = jnp.asarray(np.random.default_rng(0).standard_normal(
        (300, 64)).astype(np.float32))
    r32 = vq_apply(params, state, cfg, z, training=True,
                   rng=jax.random.PRNGKey(1))
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    r16 = vq_apply(params, state, cfg16, z, training=True,
                   rng=jax.random.PRNGKey(1))
    agree = float(jnp.mean((r32["indices"] == r16["indices"])
                           .astype(jnp.float32)))
    assert agree > 0.97, agree
    l32, l16 = float(r32["loss"]), float(r16["loss"])
    assert abs(l32 - l16) < 0.05 * max(abs(l32), 1e-6), (l32, l16)
    # rows whose codes agree differ only by bf16 rounding
    m = np.asarray(r32["indices"] == r16["indices"]).all(axis=1)
    dq = np.abs(np.asarray(r32["quantize"]) - np.asarray(r16["quantize"]))
    assert dq[m].max() < 0.05, dq[m].max()
