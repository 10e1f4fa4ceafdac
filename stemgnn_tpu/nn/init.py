"""Initializers matching the reference's torch defaults.

Weight import from reference checkpoints gives exact parity; for from-scratch
runs these initializers reproduce the same distributions so training dynamics
are statistically comparable:

  * ``nn.Linear``: kaiming_uniform(a=sqrt(5)) on weight, uniform bias with
    bound 1/sqrt(fan_in) (torch defaults used throughout the reference model).
  * PyG ``Linear`` default ``weight_initializer='glorot'`` (used inside
    MySAGEConv's lin_l / lin_r).
  * ``xavier_uniform`` for the MoE expert tensor
    (STEM-GNN/model/encoder.py:120).
  * ``kaiming_uniform`` (fan_in, leaky 0) for codebook ``uniform_init``
    (STEM-GNN/model/vq.py:54-57).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def kaiming_uniform(key, shape, fan_in=None, a: float = math.sqrt(5),
                    dtype=jnp.float32):
    """torch.nn.init.kaiming_uniform_ (fan_in mode, leaky_relu nonlinearity)."""
    if fan_in is None:
        # torch computes fan_in over trailing dims for a [out, in] weight;
        # our weights are [in, out], so fan_in is shape[0] by convention here.
        fan_in = shape[0]
    gain = math.sqrt(2.0 / (1 + a ** 2))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def uniform_bias(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def glorot_uniform(key, shape, dtype=jnp.float32):
    """xavier/glorot uniform for [in, out] (PyG Linear 'glorot' default)."""
    fan_in, fan_out = shape[0], shape[-1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def xavier_uniform(key, shape, dtype=jnp.float32):
    """torch.nn.init.xavier_uniform_ for arbitrary-rank weights: treats the
    leading dims as batch when rank > 2 (matches MixtureSageLayer's
    [K, 2*in, out] expert tensor where torch computes fan over the last two
    dims)."""
    fan_in, fan_out = shape[-2], shape[-1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)
