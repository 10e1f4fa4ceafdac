"""Activation resolver (reference STEM-GNN/dataset/gp/nn/resolver.py)."""

from __future__ import annotations

import jax

_ACTS = {
    "relu": jax.nn.relu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.01),
    "leakyrelu": lambda x: jax.nn.leaky_relu(x, 0.01),
    "elu": jax.nn.elu,
    "gelu": jax.nn.gelu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jax.nn.tanh,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "identity": lambda x: x,
    "none": lambda x: x,
}


def resolve_activation(name):
    if callable(name):
        return name
    key = str(name).lower()
    if key not in _ACTS:
        raise ValueError(f"unknown activation {name!r}; "
                         f"one of {sorted(_ACTS)}")
    return _ACTS[key]
