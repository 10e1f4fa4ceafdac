"""Segment-op unit tests vs dense numpy references (SURVEY.md §4 pyramid #1)."""

import jax.numpy as jnp
import numpy as np

from stemgnn_tpu.ops import segment


def dense_reduce(data, ids, n, op):
    out = np.zeros((n,) + data.shape[1:], dtype=np.float64)
    cnt = np.zeros(n)
    if op == "max":
        out[:] = -np.inf
    for i, s in enumerate(ids):
        if op == "sum" or op == "mean":
            out[s] += data[i]
        elif op == "max":
            out[s] = np.maximum(out[s], data[i])
        cnt[s] += 1
    if op == "mean":
        out = out / np.maximum(cnt, 1)[:, None]
    if op == "max":
        out[cnt == 0] = 0.0
    return out


def test_segment_sum_mean_max(rng):
    n, e, d = 13, 57, 5
    ids = rng.integers(0, n, e)
    data = rng.standard_normal((e, d)).astype(np.float32)
    for op, fn in [("sum", segment.segment_sum), ("mean", segment.segment_mean),
                   ("max", segment.segment_max)]:
        got = fn(jnp.asarray(data), jnp.asarray(ids), n)
        want = dense_reduce(data, ids, n, op)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_segment_masked(rng):
    n, e, d = 7, 40, 3
    ids = rng.integers(0, n, e)
    data = rng.standard_normal((e, d)).astype(np.float32)
    mask = rng.random(e) > 0.4
    got = segment.segment_mean(jnp.asarray(data), jnp.asarray(ids), n,
                               mask=jnp.asarray(mask))
    want = dense_reduce(data[mask], ids[mask], n, "mean")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_segment_softmax(rng):
    n, e = 5, 30
    ids = np.sort(rng.integers(0, n, e))
    logits = rng.standard_normal(e).astype(np.float32)
    got = np.asarray(segment.segment_softmax(jnp.asarray(logits),
                                             jnp.asarray(ids), n))
    for s in range(n):
        m = ids == s
        if m.sum():
            np.testing.assert_allclose(got[m].sum(), 1.0, rtol=1e-5)
            want = np.exp(logits[m]) / np.exp(logits[m]).sum()
            np.testing.assert_allclose(got[m], want, rtol=1e-5)


def test_empty_segments_are_zero(rng):
    n = 10
    ids = np.array([0, 0, 3])
    data = np.ones((3, 2), np.float32)
    for fn in [segment.segment_sum, segment.segment_mean, segment.segment_max]:
        got = np.asarray(fn(jnp.asarray(data), jnp.asarray(ids), n))
        assert np.all(got[[1, 2, 4, 5, 6, 7, 8, 9]] == 0)
