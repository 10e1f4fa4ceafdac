"""Functional building-block layers (Linear / BatchNorm / Dropout).

Params and running state are plain nested dicts of arrays (pytrees), threaded
explicitly through pure functions — the TPU-native replacement for torch
``nn.Module`` buffers mutated in place.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from stemgnn_tpu.nn import init as inits


# ---------------------------------------------------------------- Linear

def linear_init(key, in_dim: int, out_dim: int, bias: bool = True,
                weight_init: str = "torch", dtype=jnp.float32):
    """Weights stored as [in, out] so application is ``x @ w`` (MXU-friendly,
    no transpose)."""
    kw, kb = jax.random.split(key)
    if weight_init == "torch":
        w = inits.kaiming_uniform(kw, (in_dim, out_dim), fan_in=in_dim, dtype=dtype)
    elif weight_init == "glorot":
        w = inits.glorot_uniform(kw, (in_dim, out_dim), dtype=dtype)
    else:
        raise ValueError(weight_init)
    p = {"w": w}
    if bias:
        p["b"] = inits.uniform_bias(kb, (out_dim,), in_dim, dtype=dtype)
    return p


def linear_apply(params, x):
    # compute in the activation dtype (mixed precision: bf16 activations x
    # f32 master weights -> bf16 matmul, f32 params untouched)
    y = x @ params["w"].astype(x.dtype)
    if "b" in params:
        y = y + params["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------- BatchNorm

def batchnorm_init(dim: int, dtype=jnp.float32):
    """torch BatchNorm1d defaults: scale 1, bias 0, eps 1e-5, momentum 0.1."""
    params = {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}
    state = {"mean": jnp.zeros((dim,), dtype), "var": jnp.ones((dim,), dtype),
             "count": jnp.zeros((), jnp.int32)}
    return params, state


def batchnorm_apply(params, state, x, *, training: bool, mask=None,
                    momentum: float = 0.1, eps: float = 1e-5,
                    axis_name: Optional[str] = None):
    """BatchNorm1d over the node axis.

    * ``mask`` restricts statistics to valid (non-padding) nodes so padded
      batches match unpadded torch numerics.
    * ``axis_name``: when set under shard_map/pmap, batch statistics are
      psum-ed across the mesh axis so the edge-partitioned full-graph mode
      matches single-chip semantics (SURVEY.md §7.3 BatchNorm-across-shards).
    * training=True uses batch stats and returns updated running stats with
      torch's momentum convention (running <- (1-m)*running + m*batch, with
      the unbiased variance in the running buffer).
    """
    in_dtype = x.dtype
    x = x.astype(jnp.float32)     # statistics and normalization in f32
    if training:
        if mask is not None:
            m = mask.astype(x.dtype)[:, None]
            n_raw = jnp.sum(m)
            n = jnp.maximum(n_raw, 1.0)
            mean = jnp.sum(x * m, axis=0) / n
            var = jnp.sum(((x - mean) ** 2) * m, axis=0) / n
        else:
            n_raw = n = jnp.asarray(x.shape[0], x.dtype)
            mean = jnp.mean(x, axis=0)
            var = jnp.mean((x - mean) ** 2, axis=0)
        if axis_name is not None:
            # Cross-shard moments: psum of raw sums (mean * n_raw recovers the
            # unclamped local sum — zero for empty shards, so padding-only
            # shards contribute nothing to the global statistics).
            cnt = jnp.maximum(jax.lax.psum(n_raw, axis_name), 1.0)
            mean_sum = jax.lax.psum(mean * n_raw, axis_name)
            g_mean = mean_sum / cnt
            sq_sum = jax.lax.psum((var + mean ** 2) * n_raw, axis_name)
            var = jnp.maximum(sq_sum / cnt - g_mean ** 2, 0.0)
            mean, n = g_mean, cnt
        unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
            "count": state["count"] + 1,
        }
        y = (x - mean) * jax.lax.rsqrt(var + eps)
    else:
        new_state = state
        y = (x - state["mean"]) * jax.lax.rsqrt(state["var"] + eps)
    return (y * params["scale"] + params["bias"]).astype(in_dtype), \
        new_state


# ---------------------------------------------------------------- LayerNorm

def layernorm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layernorm_apply(params, x, eps: float = 1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * params["scale"] + params["bias"]


# ---------------------------------------------------------------- Dropout

def dropout(key, x, rate: float, *, training: bool):
    if not training or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / jnp.asarray(keep, x.dtype),
                     jnp.zeros((), x.dtype))
