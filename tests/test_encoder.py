"""Encoder stack tests: shapes, MoE routing, normalize quirk, backbones."""

import jax
import jax.numpy as jnp
import numpy as np

from conftest import random_graph
from stemgnn_tpu.core.config import EncoderConfig
from stemgnn_tpu.nn.encoder import encoder_apply, encoder_init


def _apply(cfg, x, s, r, ef, training=False, rng=None, node_mask=None):
    params, state = encoder_init(jax.random.PRNGKey(0), cfg)
    return encoder_apply(params, state, cfg, jnp.asarray(x), jnp.asarray(s),
                         jnp.asarray(r), edge_feat=None if ef is None else jnp.asarray(ef),
                         node_mask=node_mask, training=training,
                         rng=rng or jax.random.PRNGKey(1))


def test_shapes_all_backbones(rng):
    x, s, r, ef = random_graph(rng, n=30, e=80, d=16)
    for backbone in ["sage", "gcn", "gin", "gat"]:
        cfg = EncoderConfig(input_dim=16, hidden_dim=24, num_layers=2,
                            backbone=backbone, normalize="batch")
        z, st, aux = _apply(cfg, x, s, r, ef if backbone == "sage" and False else None)
        assert z.shape == (30, 24)
        assert np.isfinite(np.asarray(z)).all()


def test_sage_with_edge_features(rng):
    x, s, r, ef = random_graph(rng, n=30, e=80, d=16)
    cfg = EncoderConfig(input_dim=16, hidden_dim=16, num_layers=2,
                        normalize="none")
    z, _, _ = _apply(cfg, x, s, r, ef)
    assert z.shape == (30, 16)


def test_moe_routing_and_env_reg(rng):
    x, s, r, ef = random_graph(rng, n=30, e=80, d=16)
    cfg = EncoderConfig(input_dim=16, hidden_dim=16, num_layers=2, moe=True,
                        num_experts=3, moe_layers="all", normalize="none")
    params, state = encoder_init(jax.random.PRNGKey(0), cfg)
    z, st, aux = encoder_apply(params, state, cfg, jnp.asarray(x),
                               jnp.asarray(s), jnp.asarray(r),
                               training=True, rng=jax.random.PRNGKey(1))
    assert z.shape == (30, 16)
    # env reg = E[w log pi] <= 0 and averaged over 2 MoE layers
    assert float(aux["env_reg"]) <= 0.0
    assert len(aux["moe_stats"]) == 2
    stats = aux["moe_stats"][0]
    # avg_prob sums to ~count (softmax rows sum to 1)
    np.testing.assert_allclose(float(jnp.sum(stats["sum_prob"])),
                               float(stats["count"]), rtol=1e-4)
    # eval mode: no env reg
    z2, _, aux2 = encoder_apply(params, state, cfg, jnp.asarray(x),
                                jnp.asarray(s), jnp.asarray(r),
                                training=False)
    assert float(aux2["env_reg"]) == 0.0


def test_moe_layers_last_flag():
    cfg = EncoderConfig(moe=True, num_experts=3, moe_layers="last",
                        num_layers=3)
    assert cfg.moe_layer_flags() == (False, False, True)
    cfg2 = EncoderConfig(moe=False, moe_layers="all", num_layers=2)
    assert cfg2.moe_layer_flags() == (False, False)


def test_normalize_layer_uses_batchnorm_like_reference(rng):
    """Reference quirk: normalize='layer' still applies BatchNorm1d
    (encoder.py:173,313-314)."""
    x, s, r, ef = random_graph(rng, n=40, e=100, d=8)
    zb, _, _ = _apply(EncoderConfig(input_dim=8, hidden_dim=8, num_layers=1,
                                    normalize="batch"), x, s, r, None,
                      training=True)
    zl, _, _ = _apply(EncoderConfig(input_dim=8, hidden_dim=8, num_layers=1,
                                    normalize="layer"), x, s, r, None,
                      training=True)
    np.testing.assert_allclose(np.asarray(zb), np.asarray(zl), rtol=1e-6)


def test_batchnorm_state_updates_only_in_training(rng):
    x, s, r, ef = random_graph(rng, n=40, e=100, d=8)
    cfg = EncoderConfig(input_dim=8, hidden_dim=8, num_layers=1,
                        normalize="batch")
    params, state = encoder_init(jax.random.PRNGKey(0), cfg)
    _, st_train, _ = encoder_apply(params, state, cfg, jnp.asarray(x),
                                   jnp.asarray(s), jnp.asarray(r),
                                   training=True, rng=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(st_train["norms"][0]["mean"]),
                           np.asarray(state["norms"][0]["mean"]))
    _, st_eval, _ = encoder_apply(params, state, cfg, jnp.asarray(x),
                                  jnp.asarray(s), jnp.asarray(r),
                                  training=False)
    np.testing.assert_array_equal(np.asarray(st_eval["norms"][0]["mean"]),
                                  np.asarray(state["norms"][0]["mean"]))


def test_encoder_bf16_compute_dtype(rng):
    """bfloat16 activations: output dtype, finite values, f32 BN stats."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from stemgnn_tpu.core.config import EncoderConfig
    from stemgnn_tpu.nn.encoder import encoder_apply, encoder_init

    cfg = EncoderConfig(input_dim=32, hidden_dim=32, num_layers=2,
                        normalize="batch", dropout=0.0,
                        compute_dtype="bfloat16")
    params, state = encoder_init(jax.random.PRNGKey(0), cfg)
    n, e = 64, 256
    x = rng.standard_normal((n, 32)).astype(np.float32)
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    z, new_state, _ = encoder_apply(params, state, cfg, jnp.asarray(x),
                                    jnp.asarray(s), jnp.asarray(r),
                                    training=True,
                                    rng=jax.random.PRNGKey(1))
    assert z.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(z, np.float32)).all()
    assert new_state["norms"][0]["mean"].dtype == jnp.float32

    # bf16 forward tracks the f32 forward
    cfg32 = dataclasses.replace(cfg, compute_dtype="float32")
    z32, _, _ = encoder_apply(params, state, cfg32, jnp.asarray(x),
                              jnp.asarray(s), jnp.asarray(r), training=True,
                              rng=jax.random.PRNGKey(1))
    z32 = np.asarray(z32)
    err = np.abs(np.asarray(z, np.float32) - z32).max()
    assert err < 0.15 * (np.abs(z32).max() + 1e-6), err
