"""Layer-wise streaming inference for huge graphs (minibatch eval).

The reference evaluates node/link models with full-neighborhood loaders:
``NeighborLoader(num_neighbors=[-1]*L, batch_size=512)``
(STEM-GNN/utils/loader.py:10-45), i.e. each eval batch expands the complete
L-hop neighborhood of its seeds.  That per-batch expansion is exponential in
depth and ragged — the wrong shape for XLA.  The TPU-native equivalent is
**layer-wise inference**: compute layer l's embeddings for *all* nodes from
the device-resident layer-(l-1) table before moving on, streaming the edge
list through fixed-size blocks.  This is the same math as a full-graph
forward (identical ops, blocked), with device memory bounded by
O(N·D + edge_block·D) instead of the O(E·D) message materialization —
so eval scales past the point where the one-shot full-graph encode fits.

Supported encoder layers: all four reference backbones
(STEM-GNN/model/encoder.py:191-200) — ``sage`` (incl. per-edge-type
features) and the K-expert MoE-SAGE layer (encoder.py:17-129 semantics),
plus ``gcn`` (symmetric-normalized, streamed with host-precomputed degree
weights), ``gin`` (streamed sum aggregation), and ``gat`` (two streamed
sweeps: a running per-receiver attention-logit max, then the exp-sum and
weighted-message accumulation — an online segment softmax).

Every block step is a jitted fixed-shape program; the aggregation
accumulator is donated so the layer sweep runs in-place on device.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stemgnn_tpu.core.config import EncoderConfig, FinetuneConfig
from stemgnn_tpu.core.graph import round_up
from stemgnn_tpu.nn.layers import batchnorm_apply, linear_apply


def _blocks(edges: int, block: int) -> int:
    return max(1, -(-edges // block))


@functools.lru_cache(maxsize=None)
def _sage_block_step(with_table: bool):
    """acc += segment_sum(relu(h[s] + T[xe]) * mask) over one edge block.

    Messages of invalid (padding) edges are zeroed, so their receiver ids can
    point anywhere — a scatter of zeros is harmless.
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(acc, h, table, s, r, xe, mask):
        msgs = jnp.take(h, s, axis=0, mode="clip")
        if with_table:
            msgs = msgs + jnp.take(table, xe, axis=0, mode="clip")
        msgs = jax.nn.relu(msgs)
        msgs = jnp.where(mask[:, None], msgs, 0.0)
        return acc + jax.ops.segment_sum(msgs, r,
                                         num_segments=acc.shape[0])

    return step


@functools.lru_cache(maxsize=None)
def _gather_mean_block_step():
    """MoE-SAGE aggregation block: acc += segment_sum(h[r] * mask, s).

    The reference's MixtureSageLayer aggregates *receiver* features at the
    *sender* (``scatter_mean(x[col], row)``, encoder.py:122-124) — no edge
    features, no message relu.
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(acc, h, s, r, mask):
        msgs = jnp.take(h, r, axis=0, mode="clip")
        msgs = jnp.where(mask[:, None], msgs, 0.0)
        return acc + jax.ops.segment_sum(msgs, s,
                                         num_segments=acc.shape[0])

    return step


@functools.lru_cache(maxsize=None)
def _weighted_sum_block_step():
    """gcn block: acc += segment_sum(h[s] * w * mask, r) with per-edge
    symmetric-normalization weights ``w`` precomputed on host."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(acc, h, s, r, w, mask):
        msgs = jnp.take(h, s, axis=0, mode="clip") * w[:, None]
        msgs = jnp.where(mask[:, None], msgs, 0.0)
        return acc + jax.ops.segment_sum(msgs, r,
                                         num_segments=acc.shape[0])

    return step


@functools.lru_cache(maxsize=None)
def _sum_block_step():
    """gin block: acc += segment_sum(h[s] * mask, r) (plain sum)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(acc, h, s, r, mask):
        msgs = jnp.take(h, s, axis=0, mode="clip")
        msgs = jnp.where(mask[:, None], msgs, 0.0)
        return acc + jax.ops.segment_sum(msgs, r,
                                         num_segments=acc.shape[0])

    return step


@functools.lru_cache(maxsize=None)
def _gat_max_block_step():
    """gat pass A: running per-receiver max of the attention logits."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(seg_max, a_src, a_dst, s, r, mask, slope):
        e = a_src[s] + a_dst[r]
        e = jax.nn.leaky_relu(e, slope)
        e = jnp.where(mask, e, -jnp.inf)
        blk = jax.ops.segment_max(e, r, num_segments=seg_max.shape[0])
        return jnp.maximum(seg_max, blk)

    return step


@functools.lru_cache(maxsize=None)
def _gat_accum_block_step():
    """gat pass B: denom += segment_sum(exp(e - max[r])); msg +=
    segment_sum(h[s] * exp(e - max[r]))."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(denom, msg, h, a_src, a_dst, seg_max, s, r, mask, slope):
        e = a_src[s] + a_dst[r]
        e = jax.nn.leaky_relu(e, slope)
        exp_e = jnp.exp(e - seg_max[r])
        exp_e = jnp.where(mask, exp_e, 0.0)
        denom = denom + jax.ops.segment_sum(exp_e, r,
                                            num_segments=denom.shape[0])
        msgs = jnp.take(h, s, axis=0, mode="clip") * exp_e[:, None]
        msg = msg + jax.ops.segment_sum(msgs, r, num_segments=msg.shape[0])
        return denom, msg

    return step


def _pad_edges(senders, receivers, edge_valid, edge_block, extra=None):
    """Pad edge arrays to a whole number of blocks; returns (n_blk, arrays)."""
    n_blk = _blocks(senders.shape[0], edge_block)
    e_pad = n_blk * edge_block

    def pad(a, fill=0):
        out = np.full(e_pad, fill, dtype=a.dtype)
        out[: a.shape[0]] = a
        return out

    arrays = [pad(senders), pad(receivers),
              pad(edge_valid.astype(np.bool_), fill=False)]
    if extra is not None:
        arrays.append(pad(extra))
    return n_blk, arrays


def _stream_aggregate(h, senders, receivers, xe, edge_valid, table,
                      edge_block: int, *, reverse: bool = False):
    """Mean-aggregate messages over the full edge list in fixed-size blocks.

    ``reverse=True`` selects the MoE direction (receiver features at the
    sender).  Returns the SUM table [N_pad, D]; callers divide by degree.
    """
    if xe is None:
        n_blk, (s_p, r_p, v_p) = _pad_edges(senders, receivers, edge_valid,
                                            edge_block)
        xe_p = np.zeros(n_blk * edge_block, np.int32)
    else:
        n_blk, (s_p, r_p, v_p, xe_p) = _pad_edges(senders, receivers,
                                                  edge_valid, edge_block,
                                                  extra=xe)

    acc = jnp.zeros_like(h)
    if reverse:
        step = _gather_mean_block_step()
        for b in range(n_blk):
            sl = slice(b * edge_block, (b + 1) * edge_block)
            acc = step(acc, h, jnp.asarray(s_p[sl]), jnp.asarray(r_p[sl]),
                       jnp.asarray(v_p[sl]))
    else:
        step = _sage_block_step(table is not None)
        t = table if table is not None else jnp.zeros((1, h.shape[1]),
                                                      h.dtype)
        for b in range(n_blk):
            sl = slice(b * edge_block, (b + 1) * edge_block)
            acc = step(acc, h, t, jnp.asarray(s_p[sl]),
                       jnp.asarray(r_p[sl]), jnp.asarray(xe_p[sl]),
                       jnp.asarray(v_p[sl]))
    return acc


def _stream_gin_sum(h, senders, receivers, edge_valid, edge_block: int):
    """Streamed segment_sum(h[s], r) (gin aggregation)."""
    n_blk, (s_p, r_p, v_p) = _pad_edges(senders, receivers, edge_valid,
                                        edge_block)
    step = _sum_block_step()
    acc = jnp.zeros_like(h)
    for b in range(n_blk):
        sl = slice(b * edge_block, (b + 1) * edge_block)
        acc = step(acc, h, jnp.asarray(s_p[sl]), jnp.asarray(r_p[sl]),
                   jnp.asarray(v_p[sl]))
    return acc


def _stream_gcn_sum(h, senders, receivers, w_edges, edge_valid,
                    edge_block: int):
    """Streamed segment_sum(h[s] * w, r) (gcn normalized aggregation)."""
    n_blk, (s_p, r_p, v_p, w_p) = _pad_edges(senders, receivers, edge_valid,
                                             edge_block, extra=w_edges)
    step = _weighted_sum_block_step()
    acc = jnp.zeros_like(h)
    for b in range(n_blk):
        sl = slice(b * edge_block, (b + 1) * edge_block)
        acc = step(acc, h, jnp.asarray(s_p[sl]), jnp.asarray(r_p[sl]),
                   jnp.asarray(w_p[sl]), jnp.asarray(v_p[sl]))
    return acc


def _stream_gat_attention(h, a_src, a_dst, senders, receivers, edge_valid,
                          edge_block: int, negative_slope: float = 0.2):
    """Online segment softmax + weighted message sum (gat aggregation).

    Two streamed sweeps over the edge list: (A) running per-receiver max of
    the attention logits, (B) exp-sum denominator + exp-weighted message
    accumulation; exactly ``segment_softmax`` then weighted ``segment_sum``
    (ops/segment.py:56-67) up to float summation order."""
    n_blk, (s_p, r_p, v_p) = _pad_edges(senders, receivers, edge_valid,
                                        edge_block)
    slope = jnp.float32(negative_slope)
    max_step, acc_step = _gat_max_block_step(), _gat_accum_block_step()
    n_pad = h.shape[0]
    seg_max = jnp.full((n_pad,), -jnp.inf, jnp.float32)
    for b in range(n_blk):
        sl = slice(b * edge_block, (b + 1) * edge_block)
        seg_max = max_step(seg_max, a_src, a_dst, jnp.asarray(s_p[sl]),
                           jnp.asarray(r_p[sl]), jnp.asarray(v_p[sl]), slope)
    # receivers with no in-edges: shift by 0 (segment_softmax semantics)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    denom = jnp.zeros((n_pad,), jnp.float32)
    msg = jnp.zeros_like(h)
    for b in range(n_blk):
        sl = slice(b * edge_block, (b + 1) * edge_block)
        denom, msg = acc_step(denom, msg, h, a_src, a_dst, seg_max,
                              jnp.asarray(s_p[sl]), jnp.asarray(r_p[sl]),
                              jnp.asarray(v_p[sl]), slope)
    return msg / jnp.maximum(denom, 1e-16)[:, None]


def layerwise_encode(params, state, cfg: EncoderConfig, node_feat_table,
                     senders, receivers, xe=None, edge_table=None, *,
                     num_nodes: Optional[int] = None,
                     edge_block: int = 262_144):
    """Eval-mode encoder forward, one layer at a time over edge blocks.

    Arguments are host numpy arrays (real edges only; no padding needed);
    ``node_feat_table`` [N, D] node input features, ``edge_table`` [T, D]
    per-edge-type features indexed by ``xe``.  Returns (z [N_pad, D_hidden]
    on device, node_mask [N_pad]).  Exactly matches
    ``encoder_apply(training=False)`` up to float summation order.
    """
    if cfg.backbone not in ("sage", "gcn", "gin", "gat"):
        raise NotImplementedError(
            f"unknown backbone for layer-wise inference: {cfg.backbone!r}")
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    n = int(num_nodes if num_nodes is not None
            else np.asarray(node_feat_table).shape[0])
    n_pad = round_up(n, 128)
    edge_valid = np.ones(senders.shape[0], np.bool_)

    h = jnp.zeros((n_pad, node_feat_table.shape[1]), jnp.float32)
    h = h.at[:n].set(jnp.asarray(np.asarray(node_feat_table,
                                            np.float32)[:n]))
    node_mask = jnp.arange(n_pad) < n
    t_dev = None if edge_table is None else jnp.asarray(
        np.asarray(edge_table, np.float32))
    xe = None if xe is None else np.asarray(xe, np.int32)

    in_deg = np.maximum(np.bincount(receivers, minlength=n_pad), 1)
    out_deg = np.maximum(np.bincount(senders, minlength=n_pad), 1)
    in_deg = jnp.asarray(in_deg.astype(np.float32))[:, None]
    out_deg = jnp.asarray(out_deg.astype(np.float32))[:, None]

    flags = cfg.moe_layer_flags()
    act = (jax.nn.relu if cfg.activation == "relu"
           else lambda x: jax.nn.leaky_relu(x, 0.01))
    env_idx = 0

    if cfg.backbone == "gcn":
        # symmetric normalization weights, fixed across layers: the full
        # path's masked degree + implicit self-loop (convs.py:89-102)
        deg = np.bincount(receivers, minlength=n_pad).astype(np.float32) + 1.0
        inv_sqrt_np = 1.0 / np.sqrt(deg)
        w_edges = (inv_sqrt_np[senders] * inv_sqrt_np[receivers]).astype(
            np.float32)
        inv_deg = jnp.asarray((inv_sqrt_np ** 2)[:, None])

    for i in range(cfg.num_layers):
        layer_p = params["layers"][i]
        if flags[i] and cfg.backbone == "sage":
            # MoE layer: router softmax (eval path, encoder.py:307-309) +
            # K-expert combine; experts applied one at a time so the
            # [N, K, D] expert tensor is never materialized.
            sums = _stream_aggregate(h, senders, receivers, None, edge_valid,
                                     None, edge_block, reverse=True)
            agg = sums / out_deg
            combined = jnp.concatenate([agg, h], axis=-1)
            logits = linear_apply(params["env_encoders"][env_idx], h)
            weights = jax.nn.softmax(logits, axis=-1)
            w = layer_p["weights"]                  # [K, 2*in, out]
            z = jnp.zeros((n_pad, w.shape[-1]), h.dtype)
            for k in range(w.shape[0]):
                z = z + weights[:, k: k + 1] * (combined @ w[k])
            if h.shape[-1] == z.shape[-1]:          # residual (convs.py)
                z = z + h
            env_idx += 1
        elif cfg.backbone == "sage":
            # SAGE layer: mean_j relu(h_j + T[xe]) -> lin_l + lin_r(h).
            sums = _stream_aggregate(h, senders, receivers, xe, edge_valid,
                                     t_dev, edge_block)
            agg = sums / in_deg
            z = linear_apply(layer_p["lin_l"], agg) + \
                linear_apply(layer_p["lin_r"], h)
        elif cfg.backbone == "gcn":
            # convs.gcn_apply semantics: lin -> normalized stream-sum +
            # self-loop term + bias
            h_lin = linear_apply(layer_p["lin"], h)
            out = _stream_gcn_sum(h_lin, senders, receivers, w_edges,
                                  edge_valid, edge_block)
            z = out + h_lin * inv_deg + layer_p["bias"]
        elif cfg.backbone == "gin":
            # convs.gin_apply: lin((1 + eps) * h + sum_j h_j)
            agg = _stream_gin_sum(h, senders, receivers, edge_valid,
                                  edge_block)
            z = linear_apply(layer_p["lin"],
                             (1.0 + layer_p["eps"]) * h + agg)
        else:  # gat
            # convs.gat_apply: lin -> online segment softmax over in-edges
            h_lin = linear_apply(layer_p["lin"], h)
            a_src = h_lin @ layer_p["att_src"]
            a_dst = h_lin @ layer_p["att_dst"]
            z = _stream_gat_attention(h_lin, a_src, a_dst, senders,
                                      receivers, edge_valid,
                                      edge_block) + layer_p["bias"]

        if cfg.normalize != "none":
            z, _ = batchnorm_apply(params["norms"][i], state["norms"][i], z,
                                   training=False, mask=node_mask)
        if i < cfg.num_layers - 1:
            z = act(z)
        h = z
    return h, node_mask


@functools.lru_cache(maxsize=None)
def _head_fn(cfg: FinetuneConfig):
    from stemgnn_tpu.models import task as task_model

    @jax.jit
    def head(params, state, z_c, m_c):
        logits, _, _ = task_model.task_logits(params, state, cfg, z_c,
                                              training=False, mask=m_c)
        return jax.nn.softmax(jnp.mean(logits, axis=1), axis=-1)

    return head


def chunked_head_probs(params, state, cfg: FinetuneConfig, z, mask, *,
                       node_chunk: int = 65_536):
    """Softmax head-mean class probabilities, VQ+decoder applied in
    fixed-size row chunks (task/node.py:118 semantics)."""
    n = z.shape[0]
    chunk = min(node_chunk, n)
    n_chunks = _blocks(n, chunk)
    head = _head_fn(cfg)
    outs = []
    for b in range(n_chunks):
        sl = slice(b * chunk, (b + 1) * chunk)
        z_c, m_c = z[sl], mask[sl]
        if z_c.shape[0] < chunk:                     # ragged tail: pad
            pad = chunk - z_c.shape[0]
            z_c = jnp.pad(z_c, ((0, pad), (0, 0)))
            m_c = jnp.pad(m_c, (0, pad))
        outs.append(np.asarray(head(params, state, z_c, m_c)))
    return np.concatenate(outs, axis=0)[:n]


def layerwise_eval_predict(params, state, cfg: FinetuneConfig, ds,
                           task_kind: str, pad_items: int, *,
                           edge_block: int = 262_144,
                           node_chunk: int = 65_536) -> np.ndarray:
    """Full eval prediction [pad_items, C] via layer-wise inference.

    Node task: per-node probabilities.  Link task: midpoint edge embeddings
    ``(z_u + z_v)/2`` of the dataset's labeled edges (task/link.py:7-8),
    head applied in chunks.
    """
    senders, receivers = np.asarray(ds.edge_index[0]), \
        np.asarray(ds.edge_index[1])
    xe = None if ds.xe is None else np.asarray(ds.xe)
    z, node_mask = layerwise_encode(
        params["encoder"], state["encoder"], cfg.encoder, ds.node_features(),
        senders, receivers, xe=xe,
        edge_table=None if ds.edge_text_feat is None else
        np.asarray(ds.edge_text_feat),
        num_nodes=ds.num_nodes, edge_block=edge_block)

    if task_kind == "link":
        e = ds.num_edges
        u = jnp.asarray(senders[:e])
        v = jnp.asarray(receivers[:e])
        z = (jnp.take(z, u, axis=0) + jnp.take(z, v, axis=0)) / 2.0
        mask = jnp.ones(e, bool)
    else:
        mask = node_mask

    probs = chunked_head_probs(params, state, cfg, z, mask,
                               node_chunk=node_chunk)
    out = np.zeros((pad_items, probs.shape[1]), np.float32)
    out[: min(pad_items, probs.shape[0])] = probs[:pad_items]
    return out
