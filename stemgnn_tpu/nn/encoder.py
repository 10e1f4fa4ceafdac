"""The GNN encoder stack.

Functional re-design of ``Encoder`` (STEM-GNN/model/encoder.py:132-333):
``num_layers`` graph convs (sage / gat / gcn / gin, or a K-expert MoE-SAGE
layer when enabled), each followed by BatchNorm (for any ``normalize`` other
than 'none' — the reference instantiates BatchNorm1d regardless of the value,
encoder.py:173,313-314), with activation + dropout between layers.

Returns ``(z, new_state, aux)`` where aux carries the MoE env-regularizer
(encoder.py:202-204,319-322) and per-layer router statistics (the data behind
``get_moe_usage``, encoder.py:230-277) as arrays, so the training loop can
accumulate and log them without Python-side mutation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from stemgnn_tpu.core.config import EncoderConfig
from stemgnn_tpu.nn import convs
from stemgnn_tpu.nn.layers import (batchnorm_apply, batchnorm_init, dropout,
                                   linear_apply, linear_init)


def _activation(cfg: EncoderConfig):
    if cfg.activation == "relu":
        return jax.nn.relu
    # torch nn.LeakyReLU default negative_slope = 0.01 (pretrain.py:85)
    return lambda x: jax.nn.leaky_relu(x, 0.01)


def encoder_init(key, cfg: EncoderConfig):
    """Returns (params, state); state holds BatchNorm running stats."""
    flags = cfg.moe_layer_flags()
    dims = [cfg.input_dim] + [cfg.hidden_dim] * cfg.num_layers
    layers, norms_p, norms_s, env_encoders = [], [], [], []
    keys = jax.random.split(key, cfg.num_layers * 2)
    for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        k_layer, k_env = keys[2 * i], keys[2 * i + 1]
        if flags[i] and cfg.backbone == "sage":
            layers.append(convs.moe_sage_init(k_layer, d_in, d_out, cfg.num_experts))
            env_encoders.append(linear_init(k_env, d_in, cfg.num_experts,
                                            bias=True, weight_init="torch"))
        else:
            if cfg.backbone == "sage":
                layers.append(convs.sage_init(k_layer, d_in, d_out))
            elif cfg.backbone == "gcn":
                layers.append(convs.gcn_init(k_layer, d_in, d_out))
            elif cfg.backbone == "gin":
                layers.append(convs.gin_init(k_layer, d_in, d_out))
            elif cfg.backbone == "gat":
                layers.append(convs.gat_init(k_layer, d_in, d_out))
            else:
                raise ValueError(f"Unsupported backbone: {cfg.backbone}")
        p, s = batchnorm_init(d_out)
        norms_p.append(p)
        norms_s.append(s)
    params = {"layers": layers, "norms": norms_p, "env_encoders": env_encoders}
    state = {"norms": norms_s}
    return params, state


def _reg_loss(weights, logits):
    """E[w · log pi] MoE regularizer (encoder.py:202-204)."""
    log_pi = jax.nn.log_softmax(logits, axis=-1)
    return jnp.mean(jnp.sum(weights * log_pi, axis=-1))


def _gumbel_softmax(key, logits, tau: float):
    """F.gumbel_softmax(hard=False): softmax((logits + G)/tau)."""
    g = jax.random.gumbel(key, logits.shape, logits.dtype)
    return jax.nn.softmax((logits + g) / tau, axis=-1)


def encoder_apply(params, state, cfg: EncoderConfig, x, senders, receivers,
                  edge_feat=None, edge_mask=None, node_mask=None, *,
                  training: bool = False, rng: Optional[jax.Array] = None,
                  layout=None, edge_table=None,
                  axis_name: Optional[str] = None,
                  edge_shard_axis: Optional[str] = None,
                  dynamic_edge_mask: bool = False, drop_hash=None):
    """Forward pass (encoder.py:283-323).

    ``axis_name``: mesh axis for cross-shard BatchNorm statistics (needed
    when *nodes* are sharded).  ``edge_shard_axis``: mesh axis for the
    edge-partitioned full-graph mode — per-layer partial aggregation + psum
    (nodes replicated, so BatchNorm needs no extra sync).
    """
    flags = cfg.moe_layer_flags()
    act = _activation(cfg)
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    if dt == jnp.bfloat16 and cfg.backbone != "sage":
        raise ValueError("compute_dtype=bfloat16 supports the sage backbone")
    z = x.astype(dt)
    if edge_feat is not None:
        edge_feat = edge_feat.astype(dt)
    env_idx = 0
    env_reg_total = jnp.zeros(())
    env_layers = 0
    moe_stats = []
    new_norm_states = []
    if rng is None:
        rng = jax.random.PRNGKey(0)

    for i in range(cfg.num_layers):
        rng, k_drop, k_gumbel = jax.random.split(rng, 3)
        layer_p = params["layers"][i]
        if flags[i] and cfg.backbone == "sage":
            logits = linear_apply(params["env_encoders"][env_idx], z)
            if training:
                weights = _gumbel_softmax(k_gumbel, logits, cfg.tau)
                env_reg_total = env_reg_total + _reg_loss(weights, logits)
                env_layers += 1
            else:
                weights = jax.nn.softmax(logits, axis=-1)
            # Router usage stats (encoder.py:244-255), masked to valid nodes.
            w_stat = jax.lax.stop_gradient(weights)
            if node_mask is not None:
                w_stat = jnp.where(node_mask[:, None], w_stat, 0.0)
                count = jnp.sum(node_mask)
            else:
                count = jnp.asarray(z.shape[0])
            top1 = jax.nn.one_hot(jnp.argmax(w_stat, axis=-1), cfg.num_experts)
            if node_mask is not None:
                top1 = jnp.where(node_mask[:, None], top1, 0.0)
            moe_stats.append({"layer": i,
                              "sum_prob": jnp.sum(w_stat, axis=0),
                              "sum_top1": jnp.sum(top1, axis=0),
                              "count": count})
            expert_out = convs.moe_sage_apply(layer_p, z, senders, receivers,
                                              edge_mask=edge_mask)
            z = jnp.sum(weights[:, :, None] * expert_out, axis=1)
            env_idx += 1
        elif cfg.backbone == "sage":
            if edge_feat is not None and edge_feat.shape[-1] != z.shape[-1]:
                raise ValueError(
                    f"edge feature dim {edge_feat.shape[-1]} must equal every "
                    f"layer's input dim (layer {i} gets {z.shape[-1]}): with "
                    f"per-edge features, hidden_dim must equal input_dim "
                    f"(the reference has the same latent constraint — its "
                    f"message is x_j + xe at every layer, encoder.py:94-97)")
            z = convs.sage_apply(layer_p, z, senders, receivers,
                                 edge_feat=edge_feat, edge_mask=edge_mask,
                                 layout=layout, edge_table=edge_table,
                                 shard_axis=edge_shard_axis,
                                 bf16_messages=(cfg.fused_bf16_messages
                                                or dt == jnp.bfloat16),
                                 dynamic_edge_mask=dynamic_edge_mask,
                                 drop_hash=drop_hash)
        elif cfg.backbone == "gcn":
            z = convs.gcn_apply(layer_p, z, senders, receivers,
                                edge_mask=edge_mask, node_mask=node_mask)
        elif cfg.backbone == "gin":
            z = convs.gin_apply(layer_p, z, senders, receivers,
                                edge_mask=edge_mask)
        elif cfg.backbone == "gat":
            z = convs.gat_apply(layer_p, z, senders, receivers,
                                edge_mask=edge_mask)

        if cfg.normalize != "none":
            z, ns = batchnorm_apply(params["norms"][i], state["norms"][i], z,
                                    training=training, mask=node_mask,
                                    axis_name=axis_name)
            new_norm_states.append(ns)
        else:
            new_norm_states.append(state["norms"][i])
        if i < cfg.num_layers - 1:
            z = act(z)
            z = dropout(k_drop, z, cfg.dropout, training=training)

    env_reg = (env_reg_total / env_layers) if (training and env_layers > 0) \
        else jnp.zeros(())
    aux = {"env_reg": env_reg, "moe_stats": moe_stats}
    return z, {"norms": new_norm_states}, aux
