"""First-party pure-JAX Llama decoder — the 'llama2_*' text-encoder backend.

The reference's ``llama2_7b``/``llama2_13b`` options run HuggingFace
``LlamaForCausalLM``, take the LAST hidden state, and mean-pool over the
sequence dimension — UNMASKED, i.e. right-padding EOS positions are
included in the mean, exactly as written
(STEM-GNN/dataset/data_utils.py:80-100: ``word_embeddings.mean(dim=1)``
after ``padding="longest"`` with ``pad_token = eos``).  Dims 4096 / 5120
(data_utils.py:11).

Architecture (Llama 2): RMSNorm pre-norm blocks, rotary position
embeddings, multi-head attention (7b/13b use no GQA: n_kv_heads ==
n_heads — the importer still supports grouped KV), SwiGLU MLP, causal
mask.  Weights come from a HF ``LlamaModel``/``LlamaForCausalLM`` state
dict via :func:`import_hf_llama_state_dict`.  Tokenization is
SentencePiece and therefore weights-gated like the model itself — the
text-encoder wrapper uses the HF tokenizer from the same local snapshot.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 32
    hidden_dim: int = 11008            # SwiGLU inner width
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5


def _rms_norm(g, x, eps):
    var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)).astype(x.dtype) * g


def _rope(q, k, theta):
    """Rotary embeddings, HF 'default' convention: rotate_half over the
    concatenated halves (not interleaved pairs)."""
    b, h, length, dh = q.shape
    pos = jnp.arange(length, dtype=jnp.float32)
    inv = 1.0 / (theta ** (jnp.arange(0, dh, 2, dtype=jnp.float32) / dh))
    freqs = pos[:, None] * inv[None, :]                     # [L, dh/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)          # [L, dh]
    cos, sin = jnp.cos(emb), jnp.sin(emb)

    def rot_half(t):
        t1, t2 = t[..., : dh // 2], t[..., dh // 2:]
        return jnp.concatenate([-t2, t1], axis=-1)

    def apply(t):
        return t * cos[None, None] + rot_half(t) * sin[None, None]

    return apply(q), apply(k)


def llama_apply(params, cfg: LlamaConfig, input_ids, attention_mask=None):
    """Eval-mode decoder forward: [B, L] ids -> last hidden state
    [B, L, dim] (post final RMSNorm, matching HF ``hidden_states[-1]``).
    ``attention_mask`` masks padded KEY positions in addition to the causal
    mask (HF semantics)."""
    b, length = input_ids.shape
    x = jnp.take(params["word_emb"], input_ids, axis=0)
    h, hk = cfg.n_heads, cfg.n_kv_heads
    dh = cfg.dim // h
    neg = jnp.finfo(jnp.float32).min
    causal = jnp.tril(jnp.ones((length, length), bool))
    bias = jnp.where(causal[None, None], 0.0, neg)
    if attention_mask is not None:
        bias = bias + jnp.where(attention_mask[:, None, None, :] > 0,
                                0.0, neg)

    def heads(t, nh):
        return t.reshape(b, length, nh, dh).transpose(0, 2, 1, 3)

    for lp in params["layers"]:
        xn = _rms_norm(lp["in_norm"], x, cfg.rms_norm_eps)
        q = heads(xn @ lp["wq"], h)
        k = heads(xn @ lp["wk"], hk)
        v = heads(xn @ lp["wv"], hk)
        q, k = _rope(q, k, cfg.rope_theta)
        if hk != h:                                   # grouped KV
            rep = h // hk
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dh)
        att = jax.nn.softmax(scores + bias, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, length, cfg.dim)
        x = x + ctx @ lp["wo"]
        xn = _rms_norm(lp["post_norm"], x, cfg.rms_norm_eps)
        x = x + (jax.nn.silu(xn @ lp["w_gate"]) * (xn @ lp["w_up"])) \
            @ lp["w_down"]
    return _rms_norm(params["final_norm"], x, cfg.rms_norm_eps)


def llama_mean_pool(hidden):
    """The reference's pooling: plain mean over the sequence axis,
    INCLUDING right-padded positions (data_utils.py:93-95)."""
    return jnp.mean(hidden, axis=1)


def import_hf_llama_state_dict(sd, cfg: LlamaConfig):
    """Map a HuggingFace ``LlamaModel``/``LlamaForCausalLM`` state dict
    onto the params pytree (the LM head is ignored)."""
    def a(name):
        v = sd[name]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return jnp.asarray(np.asarray(v, np.float32))

    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()
              if k.startswith("model.")}

    params = {
        "word_emb": a("embed_tokens.weight"),
        "final_norm": a("norm.weight"),
        "layers": [],
    }
    for i in range(cfg.n_layers):
        p = f"layers.{i}"
        params["layers"].append({
            "in_norm": a(f"{p}.input_layernorm.weight"),
            "wq": a(f"{p}.self_attn.q_proj.weight").T,
            "wk": a(f"{p}.self_attn.k_proj.weight").T,
            "wv": a(f"{p}.self_attn.v_proj.weight").T,
            "wo": a(f"{p}.self_attn.o_proj.weight").T,
            "post_norm": a(f"{p}.post_attention_layernorm.weight"),
            "w_gate": a(f"{p}.mlp.gate_proj.weight").T,
            "w_up": a(f"{p}.mlp.up_proj.weight").T,
            "w_down": a(f"{p}.mlp.down_proj.weight").T,
        })
    return params
