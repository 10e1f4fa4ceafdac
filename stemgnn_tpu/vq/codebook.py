"""Codebook primitives: distances, code assignment, k-means, EMA statistics.

Functional re-design of the reference's ``CosineSimCodebook`` /
``EuclideanCodebook`` (STEM-GNN/model/vq.py:241-688).  All state (codebook
embeddings, EMA cluster sizes / embed sums, init flag) is explicit; the
cross-replica ``all_reduce`` calls on codebook statistics (vq.py:666,672) are
``lax.psum`` over a mesh axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def l2norm(t, eps: float = 1e-12):
    """F.normalize(p=2, dim=-1) semantics (vq.py:28-29).  The norm reduce
    always accumulates in f32 (a 768-term bf16 sum would lose ~7 bits);
    the divide runs in t's dtype."""
    n = jnp.linalg.norm(t.astype(jnp.float32), axis=-1, keepdims=True)
    return t / jnp.maximum(n, eps).astype(t.dtype)


def cosine_distances(xh, embed):
    """dist[h, n, c] = <xh[h,n], embed[h,c]>  (vq.py:650).  Inputs are assumed
    l2-normalized.  One MXU einsum per head batch."""
    return jnp.einsum("hnd,hcd->hnc", xh, embed,
                      preferred_element_type=jnp.float32)


def euclidean_distances(xh, embed):
    """-cdist (vq.py:31-35,472): higher is closer."""
    x2 = jnp.sum(xh ** 2, axis=-1)[:, :, None]
    e2 = jnp.sum(embed ** 2, axis=-1)[:, None, :]
    xe = jnp.einsum("hnd,hcd->hnc", xh, embed,
                    preferred_element_type=jnp.float32)
    return -jnp.sqrt(jnp.clip(x2 + e2 - 2 * xe, 0.0, None))


def gumbel_sample(key, logits, *, temperature: float = 1.0,
                  stochastic: bool = False, straight_through: bool = False,
                  training: bool = True):
    """vq.py:63-100 (reinmax path omitted: never enabled by the reference
    entry points — stochastic_sample_codes defaults False, vq.py:715).

    Returns (ind [h, n], one_hot [h, n, c]).
    """
    if training and stochastic and temperature > 0:
        g = jax.random.gumbel(key, logits.shape, logits.dtype)
        sampling_logits = logits / temperature + g
    else:
        sampling_logits = logits
    ind = jnp.argmax(sampling_logits, axis=-1)
    one_hot = jax.nn.one_hot(ind, logits.shape[-1], dtype=logits.dtype)
    if straight_through and temperature > 0 and training:
        pi1 = jax.nn.softmax(logits / temperature, axis=-1)
        one_hot = one_hot + pi1 - jax.lax.stop_gradient(pi1)
    return ind, one_hot


def batched_sample_vectors(key, samples, num: int, mask=None):
    """Per-codebook sampling of ``num`` rows (vq.py:106-116), padded-aware:
    masked rows get sampling probability 0."""
    h, n, _ = samples.shape
    keys = jax.random.split(key, h)

    def one(k, s):
        if mask is not None:
            logits = jnp.where(mask, 0.0, -jnp.inf)
            idx = jax.random.categorical(k, logits, shape=(num,))
        else:
            idx = jax.random.randint(k, (num,), 0, n)
        return s[idx]

    return jnp.stack([one(keys[i], samples[i]) for i in range(h)])


def kmeans(key, samples, num_clusters: int, num_iters: int = 10,
           use_cosine_sim: bool = True, mask=None,
           axis_name: Optional[str] = None):
    """k-means over [h, n, d] samples (vq.py:182-222).

    With ``axis_name`` set (under shard_map/pmap), per-cluster statistics are
    psum-ed so every replica converges to the same means — the analog of the
    reference's distributed k-means (vq.py:287-288, kmeans_all_reduce_fn).
    Initial means are drawn with a shared key so replicas agree; under
    ``axis_name`` each replica contributes via the reduced statistics.
    Returns (means [h, c, d], bins [h, c]).
    """
    h, n, d = samples.shape
    means = batched_sample_vectors(key, samples, num_clusters, mask=mask)
    if axis_name is not None:
        # Replicas sampled from different local data with the same key; average
        # the candidates so all replicas start identically.
        means = jax.lax.pmean(means, axis_name)
        if use_cosine_sim:
            means = l2norm(means)

    def body(_, means):
        if use_cosine_sim:
            dists = jnp.einsum("hnd,hcd->hnc", samples, means)
        else:
            x2 = jnp.sum(samples ** 2, -1)[:, :, None]
            m2 = jnp.sum(means ** 2, -1)[:, None, :]
            dists = -(x2 + m2 - 2 * jnp.einsum("hnd,hcd->hnc", samples, means))
        if mask is not None:
            dists = jnp.where(mask[None, :, None], dists, -jnp.inf)
        buckets = jnp.argmax(dists, axis=-1)                     # [h, n]
        one_hot = jax.nn.one_hot(buckets, num_clusters, dtype=samples.dtype)
        if mask is not None:
            one_hot = one_hot * mask[None, :, None]
        bins = jnp.sum(one_hot, axis=1)                          # [h, c]
        sums = jnp.einsum("hnc,hnd->hcd", one_hot, samples)      # [h, c, d]
        if axis_name is not None:
            bins = jax.lax.psum(bins, axis_name)
            sums = jax.lax.psum(sums, axis_name)
        zero = bins == 0
        new_means = sums / jnp.maximum(bins, 1.0)[..., None]
        if use_cosine_sim:
            new_means = l2norm(new_means)
        return jnp.where(zero[..., None], means, new_means)

    means = jax.lax.fori_loop(0, num_iters, body, means)
    # Final bin counts for embed_avg/cluster_size init (vq.py:590-594).
    if use_cosine_sim:
        dists = jnp.einsum("hnd,hcd->hnc", samples, means)
    else:
        x2 = jnp.sum(samples ** 2, -1)[:, :, None]
        m2 = jnp.sum(means ** 2, -1)[:, None, :]
        dists = -(x2 + m2 - 2 * jnp.einsum("hnd,hcd->hnc", samples, means))
    if mask is not None:
        dists = jnp.where(mask[None, :, None], dists, -jnp.inf)
    one_hot = jax.nn.one_hot(jnp.argmax(dists, -1), num_clusters,
                             dtype=samples.dtype)
    if mask is not None:
        one_hot = one_hot * mask[None, :, None]
    bins = jnp.sum(one_hot, axis=1)
    if axis_name is not None:
        bins = jax.lax.psum(bins, axis_name)
    return means, bins


def laplace_smoothing(x, n_categories: int, eps: float = 1e-5):
    """vq.py:102-104."""
    denom = jnp.sum(x, axis=-1, keepdims=True)
    return (x + eps) / (denom + n_categories * eps)


def ema(old, new, decay: float):
    """old.lerp_(new, 1-decay) (vq.py:40-46)."""
    return old * decay + new * (1.0 - decay)


def ema_codebook_update(state, xh, one_hot, *, decay: float, eps: float,
                        use_cosine_sim: bool, mask=None,
                        axis_name: Optional[str] = None):
    """EMA cluster statistics + normalized embed (vq.py:661-682).

    ``bins`` and ``embed_sum`` are psum-ed over ``axis_name`` — the direct
    analog of the reference's ``all_reduce_fn`` calls (vq.py:666,672), the only
    cross-replica sync in the model hot loop.
    Returns (new_state, new_embed).
    """
    if mask is not None:
        one_hot = one_hot * mask[None, :, None]
    bins = jnp.sum(one_hot, axis=1)                       # [h, c]
    embed_sum = jnp.einsum("hnd,hnc->hcd", xh, one_hot)   # [h, c, d]
    if axis_name is not None:
        bins = jax.lax.psum(bins, axis_name)
        embed_sum = jax.lax.psum(embed_sum, axis_name)
    cluster_size = ema(state["cluster_size"], bins, decay)
    embed_avg = ema(state["embed_avg"], embed_sum, decay)
    smoothed = laplace_smoothing(cluster_size, cluster_size.shape[-1], eps) \
        * jnp.sum(cluster_size, axis=-1, keepdims=True)
    embed = embed_avg / smoothed[..., None]
    if use_cosine_sim:
        embed = l2norm(embed)
    new_state = dict(state, cluster_size=cluster_size, embed_avg=embed_avg)
    return new_state, embed


def affine_stats_update(state, xh, embed, *, batch_decay: float,
                        codebook_decay: float, mask=None,
                        axis_name: Optional[str] = None):
    """EMA-track per-head mean/variance of the batch and of the codebook
    (vq.py:361-411, ``update_with_decay``/``update_affine``).

    First call copies (the ``needs_init`` latch); later calls lerp with the
    respective decay.  With ``axis_name`` the batch moments are psum-reduced —
    the analog of ``sync_affine_param`` (vq.py:390-411).
    Returns the updated state dict (keys ``batch_mean``/``batch_var``/
    ``codebook_mean``/``codebook_var``/``affine_initted``).
    """
    c_mean = jnp.mean(embed, axis=1, keepdims=True)               # [h, 1, d]
    c_var = jnp.mean((embed - c_mean) ** 2, axis=1, keepdims=True)
    if mask is not None:
        m = mask[None, :, None].astype(xh.dtype)
        cnt = jnp.maximum(jnp.sum(mask.astype(xh.dtype)), 1.0)
        b_sum = jnp.sum(xh * m, axis=1, keepdims=True)
    else:
        cnt = jnp.asarray(xh.shape[1], xh.dtype)
        b_sum = jnp.sum(xh, axis=1, keepdims=True)
    if axis_name is not None:
        cnt = jax.lax.psum(cnt, axis_name)
        b_sum = jax.lax.psum(b_sum, axis_name)
    b_mean = b_sum / cnt
    sq = (xh - b_mean) ** 2
    if mask is not None:
        sq = sq * mask[None, :, None]
    v_sum = jnp.sum(sq, axis=1, keepdims=True)
    if axis_name is not None:
        v_sum = jax.lax.psum(v_sum, axis_name)
    b_var = v_sum / cnt

    initted = state["affine_initted"]
    new = {
        "codebook_mean": jnp.where(initted,
                                   ema(state["codebook_mean"], c_mean,
                                       codebook_decay), c_mean),
        "codebook_var": jnp.where(initted,
                                  ema(state["codebook_var"], c_var,
                                      codebook_decay), c_var),
        "batch_mean": jnp.where(initted,
                                ema(state["batch_mean"], b_mean, batch_decay),
                                b_mean),
        "batch_var": jnp.where(initted,
                               ema(state["batch_var"], b_var, batch_decay),
                               b_var),
        "affine_initted": jnp.asarray(True),
    }
    return dict(state, **new)


def affine_transform_embed(state, embed, eps: float = 1e-5):
    """Map the codebook into the batch distribution (vq.py:466-470):
    (embed - codebook_mean) * batch_std / codebook_std + batch_mean."""
    c_std = jnp.sqrt(jnp.clip(state["codebook_var"], eps, None))
    b_std = jnp.sqrt(jnp.clip(state["batch_var"], eps, None))
    return (embed - state["codebook_mean"]) * (b_std / c_std) \
        + state["batch_mean"]


def affine_inverse_transform(state, xh, eps: float = 1e-5):
    """Map batch vectors into the codebook distribution for the EMA stats
    (vq.py:487): (x - batch_mean) * codebook_std / batch_std + codebook_mean."""
    c_std = jnp.sqrt(jnp.clip(state["codebook_var"], eps, None))
    b_std = jnp.sqrt(jnp.clip(state["batch_var"], eps, None))
    return (xh - state["batch_mean"]) * (c_std / b_std) \
        + state["codebook_mean"]


def expire_dead_codes(key, state, embed, xh, *, threshold: float,
                      reset_cluster_size: float, use_cosine_sim: bool,
                      mask=None):
    """Replace codes whose EMA cluster size fell below threshold with random
    batch samples (vq.py:597-621).  No-op when threshold == 0 (the reference
    default, vq.py:707)."""
    if threshold <= 0:
        return state, embed
    expired = state["cluster_size"] < threshold            # [h, c]
    samples = l2norm(xh) if use_cosine_sim else xh
    sampled = batched_sample_vectors(key, samples, embed.shape[1], mask=mask)
    new_embed = jnp.where(expired[..., None], sampled, embed)
    new_avg = jnp.where(expired[..., None], sampled * reset_cluster_size,
                        state["embed_avg"])
    new_cs = jnp.where(expired, reset_cluster_size, state["cluster_size"])
    return dict(state, cluster_size=new_cs, embed_avg=new_avg), new_embed
