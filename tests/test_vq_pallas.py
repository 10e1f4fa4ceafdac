"""Fused nearest-code kernel (interpret mode) vs the XLA VQ formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stemgnn_tpu.ops.vq_pallas import fused_nearest_code
from stemgnn_tpu.vq import codebook as cb


@pytest.fixture
def problem(rng):
    n, h, c, d = 96, 4, 16, 32
    x = rng.standard_normal((n, h * d)).astype(np.float32)
    emb = rng.standard_normal((h, c, d)).astype(np.float32)
    emb = np.asarray(cb.l2norm(jnp.asarray(emb)))
    return x, emb, (n, h, c, d)


def _xla_reference(x, emb, n, h, c, d):
    xh = jnp.asarray(x).reshape(n, h, d).transpose(1, 0, 2)
    xn = cb.l2norm(xh)
    dist = cb.cosine_distances(xn, jnp.asarray(emb))
    ind = jnp.argmax(dist, axis=-1)
    q = jnp.einsum("hnc,hcd->hnd",
                   jax.nn.one_hot(ind, c, dtype=jnp.float32),
                   jnp.asarray(emb))
    return q, xn, ind


def test_fused_nearest_matches_xla(problem):
    x, emb, (n, h, c, d) = problem
    q, xn, ind = fused_nearest_code(jnp.asarray(x), jnp.asarray(emb), True)
    q_ref, xn_ref, ind_ref = _xla_reference(x, emb, n, h, c, d)
    np.testing.assert_array_equal(np.asarray(ind), np.asarray(ind_ref))
    np.testing.assert_allclose(
        np.asarray(q).reshape(n, h, d).transpose(1, 0, 2),
        np.asarray(q_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(xn).reshape(n, h, d).transpose(1, 0, 2),
        np.asarray(xn_ref), rtol=1e-5, atol=1e-5)


def test_fused_nearest_gradients_match_xla(problem):
    x, emb, (n, h, c, d) = problem
    w = np.random.default_rng(1).standard_normal((h * d,)).astype(np.float32)

    def loss_fused(x, emb):
        q, xn, _ = fused_nearest_code(x, emb, True)
        st = xn + jax.lax.stop_gradient(q - xn)     # straight-through codes
        commit = jnp.mean((q - xn) ** 2)
        return jnp.sum((st * w) ** 2) + 3.0 * commit

    def loss_xla(x, emb):
        q, xn, ind = _xla_reference(x, emb, n, h, c, d)
        qf = q.transpose(1, 0, 2).reshape(n, h * d)
        xf = xn.transpose(1, 0, 2).reshape(n, h * d)
        st = xf + jax.lax.stop_gradient(qf - xf)
        commit = jnp.mean((qf - xf) ** 2)
        return jnp.sum((st * w) ** 2) + 3.0 * commit

    gx1, ge1 = jax.grad(loss_fused, argnums=(0, 1))(jnp.asarray(x),
                                                    jnp.asarray(emb))
    gx2, ge2 = jax.grad(loss_xla, argnums=(0, 1))(jnp.asarray(x),
                                                  jnp.asarray(emb))
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ge1), np.asarray(ge2),
                               rtol=1e-4, atol=1e-4)


def test_fused_nearest_zero_rows_finite(rng):
    """Padded all-zero rows must not produce NaN (norm clamps at eps)."""
    h, c, d = 2, 8, 16
    x = np.zeros((16, h * d), np.float32)
    x[:4] = rng.standard_normal((4, h * d))
    emb = np.asarray(cb.l2norm(jnp.asarray(
        rng.standard_normal((h, c, d)).astype(np.float32))))
    q, xn, ind = fused_nearest_code(jnp.asarray(x), jnp.asarray(emb), True)
    assert np.isfinite(np.asarray(q)).all()
    assert np.isfinite(np.asarray(xn)).all()
