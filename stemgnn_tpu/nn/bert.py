"""First-party pure-JAX BERT encoder — the 'e5' text-encoder backend.

The reference's ``e5`` option runs HuggingFace ``intfloat/e5-large-v2`` (a
BERT-large: 24 post-LN layers, dim 1024, 16 heads, token-type embeddings)
and average-pools the last hidden state over the attention mask WITHOUT l2
normalization (STEM-GNN/dataset/data_utils.py:102-124; dim table :11).
This module is the framework-owned forward for that family: functional
params pytree, fixed-shape batches, jit-friendly; weights come from any HF
``BertModel`` state dict via :func:`import_hf_bert_state_dict`.  The
WordPiece tokenizer is shared with :mod:`stemgnn_tpu.nn.distilbert` (e5
uses the standard uncased BERT vocab.txt).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    dim: int = 1024
    n_layers: int = 24
    n_heads: int = 16
    hidden_dim: int = 4096
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12


def _ln_apply(p, x, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def _lin_apply(p, x):
    return x @ p["w"] + p["b"]


def bert_apply(params, cfg: BertConfig, input_ids, attention_mask,
               token_type_ids=None):
    """Eval-mode ``BertModel`` forward: [B, L] ids + 0/1 mask ->
    last hidden state [B, L, dim]."""
    b, length = input_ids.shape
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    x = (jnp.take(params["word_emb"], input_ids, axis=0)
         + params["pos_emb"][None, :length]
         + jnp.take(params["type_emb"], token_type_ids, axis=0))
    x = _ln_apply(params["emb_ln"], x, cfg.layer_norm_eps)
    h, dh = cfg.n_heads, cfg.dim // cfg.n_heads
    neg = jnp.finfo(jnp.float32).min
    bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)

    def heads(t):
        return t.reshape(b, length, h, dh).transpose(0, 2, 1, 3)

    for lp in params["layers"]:
        q = heads(_lin_apply(lp["q"], x))
        k = heads(_lin_apply(lp["k"], x))
        v = heads(_lin_apply(lp["v"], x))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dh)
        att = jax.nn.softmax(scores + bias, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, length, cfg.dim)
        x = _ln_apply(lp["att_ln"], x + _lin_apply(lp["o"], ctx),
                      cfg.layer_norm_eps)
        y = jax.nn.gelu(_lin_apply(lp["ffn1"], x), approximate=False)
        x = _ln_apply(lp["out_ln"], x + _lin_apply(lp["ffn2"], y),
                      cfg.layer_norm_eps)
    return x


def e5_average_pool(hidden, attention_mask):
    """The reference's e5 ``average_pool`` (data_utils.py:104-107):
    attention-masked mean, NO l2 normalization."""
    m = attention_mask[..., None].astype(hidden.dtype)
    return jnp.sum(hidden * m, axis=1) / jnp.maximum(
        jnp.sum(m, axis=1), 1e-9)


def import_hf_bert_state_dict(sd, cfg: BertConfig):
    """Map a HuggingFace ``BertModel`` state dict onto the params pytree
    (torch tensors or numpy arrays; optional leading ``bert.`` prefix
    stripped; the unused pooler head is ignored)."""
    def a(name):
        v = sd[name]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return jnp.asarray(np.asarray(v, np.float32))

    if any(k.startswith("bert.") for k in sd):
        sd = {k[len("bert."):]: v for k, v in sd.items()
              if k.startswith("bert.")}

    def lin(prefix):
        return {"w": a(prefix + ".weight").T, "b": a(prefix + ".bias")}

    def ln(prefix):
        return {"g": a(prefix + ".weight"), "b": a(prefix + ".bias")}

    params = {
        "word_emb": a("embeddings.word_embeddings.weight"),
        "pos_emb": a("embeddings.position_embeddings.weight"),
        "type_emb": a("embeddings.token_type_embeddings.weight"),
        "emb_ln": ln("embeddings.LayerNorm"),
        "layers": [],
    }
    for i in range(cfg.n_layers):
        p = f"encoder.layer.{i}"
        params["layers"].append({
            "q": lin(f"{p}.attention.self.query"),
            "k": lin(f"{p}.attention.self.key"),
            "v": lin(f"{p}.attention.self.value"),
            "o": lin(f"{p}.attention.output.dense"),
            "att_ln": ln(f"{p}.attention.output.LayerNorm"),
            "ffn1": lin(f"{p}.intermediate.dense"),
            "ffn2": lin(f"{p}.output.dense"),
            "out_ln": ln(f"{p}.output.LayerNorm"),
        })
    return params
