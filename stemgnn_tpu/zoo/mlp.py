"""MLP (reference STEM-GNN/dataset/gp/nn/models/util_model.py:9)."""

from __future__ import annotations

import jax

from stemgnn_tpu.nn.layers import (batchnorm_apply, batchnorm_init, dropout,
                                   linear_apply, linear_init)


def mlp_init(key, dims, batch_norm: bool = True):
    """``dims`` = [in, hidden..., out]."""
    keys = jax.random.split(key, len(dims) - 1)
    layers, norms_p, norms_s = [], [], []
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        layers.append(linear_init(keys[i], a, b))
        if batch_norm and i < len(dims) - 2:
            p, s = batchnorm_init(b)
            norms_p.append(p)
            norms_s.append(s)
    return {"layers": layers, "norms": norms_p}, {"norms": norms_s}


def mlp_apply(params, state, x, *, training: bool = False, rng=None,
              drop: float = 0.0, act=jax.nn.relu):
    new_norms = []
    n_layers = len(params["layers"])
    if rng is None:
        rng = jax.random.PRNGKey(0)
    for i, lin in enumerate(params["layers"]):
        x = linear_apply(lin, x)
        if i < n_layers - 1:
            if i < len(params["norms"]):
                x, ns = batchnorm_apply(params["norms"][i],
                                        state["norms"][i], x,
                                        training=training)
                new_norms.append(ns)
            x = act(x)
            if drop > 0:
                rng, k = jax.random.split(rng)
                x = dropout(k, x, drop, training=training)
    return x, {"norms": new_norms}
