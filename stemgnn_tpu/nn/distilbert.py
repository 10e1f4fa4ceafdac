"""First-party pure-JAX DistilBERT sentence encoder.

The reference encodes all node/edge/class texts with
``SentenceTransformer('multi-qa-distilbert-cos-v1')`` — a 6-layer DistilBERT
(dim 768, 12 heads, GELU, post-LayerNorm, no token-type embeddings) with
mean pooling and l2 normalization (STEM-GNN/dataset/data_utils.py:14-79;
dim table at :11).  This module is the framework-owned TPU forward for that
model: functional params pytree, fixed-shape [B, L] batches (length buckets,
attention-masked), jit-friendly throughout — so text featurization can run
on the same chip as training instead of shelling out to torch.

Weights: :func:`import_hf_state_dict` maps a HuggingFace
``DistilBertModel`` state dict (torch tensors or numpy arrays) onto the
pytree; offline equivalence vs a randomly-initialized
``transformers.DistilBertModel`` is asserted in tests/test_distilbert.py.
The WordPiece tokenizer (greedy longest-match with ``##`` continuations,
BERT basic-tokenizer text cleanup) is implemented here as well, so the whole
text->vector path has no external dependency once a vocab.txt + weights file
exist on disk.
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class DistilBertConfig:
    vocab_size: int = 30522
    dim: int = 768
    n_layers: int = 6
    n_heads: int = 12
    hidden_dim: int = 3072            # FFN inner width
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-12


# --------------------------------------------------------------- params

def _linear(key, d_in, d_out):
    k1, _ = jax.random.split(key)
    lim = float(np.sqrt(1.0 / d_in))
    return {"w": jax.random.uniform(k1, (d_in, d_out), jnp.float32,
                                    -lim, lim),
            "b": jnp.zeros((d_out,))}


def _ln():
    return None  # placeholder replaced per-site with {"g","b"}


def distilbert_init(key, cfg: DistilBertConfig):
    ks = jax.random.split(key, 2 + 6 * cfg.n_layers)
    params = {
        "word_emb": jax.random.normal(ks[0], (cfg.vocab_size, cfg.dim)) * 0.02,
        "pos_emb": jax.random.normal(
            ks[1], (cfg.max_position_embeddings, cfg.dim)) * 0.02,
        "emb_ln": {"g": jnp.ones((cfg.dim,)), "b": jnp.zeros((cfg.dim,))},
        "layers": [],
    }
    for i in range(cfg.n_layers):
        base = 2 + 6 * i
        params["layers"].append({
            "q": _linear(ks[base + 0], cfg.dim, cfg.dim),
            "k": _linear(ks[base + 1], cfg.dim, cfg.dim),
            "v": _linear(ks[base + 2], cfg.dim, cfg.dim),
            "o": _linear(ks[base + 3], cfg.dim, cfg.dim),
            "sa_ln": {"g": jnp.ones((cfg.dim,)), "b": jnp.zeros((cfg.dim,))},
            "ffn1": _linear(ks[base + 4], cfg.dim, cfg.hidden_dim),
            "ffn2": _linear(ks[base + 5], cfg.hidden_dim, cfg.dim),
            "out_ln": {"g": jnp.ones((cfg.dim,)), "b": jnp.zeros((cfg.dim,))},
        })
    return params


# --------------------------------------------------------------- forward

def _ln_apply(p, x, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def _lin_apply(p, x):
    return x @ p["w"] + p["b"]


def distilbert_apply(params, cfg: DistilBertConfig, input_ids,
                     attention_mask):
    """Eval-mode forward: [B, L] int32 ids + [B, L] 0/1 mask ->
    last hidden state [B, L, dim] (float32).  Matches HF
    ``DistilBertModel`` (post-LN blocks, masked softmax attention)."""
    b, length = input_ids.shape
    x = jnp.take(params["word_emb"], input_ids, axis=0) \
        + params["pos_emb"][None, :length]
    x = _ln_apply(params["emb_ln"], x, cfg.layer_norm_eps)
    h = cfg.n_heads
    dh = cfg.dim // h
    # HF masks attention scores with -inf where mask == 0 (keys only)
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
        x = _ln_apply(lp["sa_ln"], x + _lin_apply(lp["o"], ctx),
                      cfg.layer_norm_eps)
        y = jax.nn.gelu(_lin_apply(lp["ffn1"], x), approximate=False)
        x = _ln_apply(lp["out_ln"], x + _lin_apply(lp["ffn2"], y),
                      cfg.layer_norm_eps)
    return x


def mean_pool_normalize(hidden, attention_mask):
    """Sentence embedding: attention-masked mean pool + l2 norm (the
    multi-qa-distilbert-cos-v1 head, data_utils.py:69-79)."""
    m = attention_mask[..., None].astype(hidden.dtype)
    emb = jnp.sum(hidden * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1e-9)
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True),
                             1e-12)


# --------------------------------------------------------------- HF import

def import_hf_state_dict(sd, cfg: DistilBertConfig):
    """Map a HuggingFace ``DistilBertModel`` state dict onto the params
    pytree.  Accepts torch tensors or numpy arrays; a leading
    ``distilbert.`` prefix (full SequenceClassification checkpoints) is
    stripped."""
    def a(name):
        v = sd[name]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return jnp.asarray(np.asarray(v, np.float32))

    keys = list(sd.keys())
    if any(k.startswith("distilbert.") for k in keys):
        sd = {k[len("distilbert."):]: v for k, v in sd.items()
              if k.startswith("distilbert.")}

    def lin(prefix):
        return {"w": a(prefix + ".weight").T, "b": a(prefix + ".bias")}

    def ln(prefix):
        return {"g": a(prefix + ".weight"), "b": a(prefix + ".bias")}

    params = {
        "word_emb": a("embeddings.word_embeddings.weight"),
        "pos_emb": a("embeddings.position_embeddings.weight"),
        "emb_ln": ln("embeddings.LayerNorm"),
        "layers": [],
    }
    for i in range(cfg.n_layers):
        p = f"transformer.layer.{i}"
        params["layers"].append({
            "q": lin(f"{p}.attention.q_lin"),
            "k": lin(f"{p}.attention.k_lin"),
            "v": lin(f"{p}.attention.v_lin"),
            "o": lin(f"{p}.attention.out_lin"),
            "sa_ln": ln(f"{p}.sa_layer_norm"),
            "ffn1": lin(f"{p}.ffn.lin1"),
            "ffn2": lin(f"{p}.ffn.lin2"),
            "out_ln": ln(f"{p}.output_layer_norm"),
        })
    return params


# --------------------------------------------------------------- tokenizer

_PUNCT_CATS = ("P",)


def _is_punct(ch):
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) \
            or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith(_PUNCT_CATS)


_WS_RE = re.compile(r"\s+")


class WordPieceTokenizer:
    """BERT-style tokenizer: basic cleanup (NFC->strip controls, lowercase +
    NFD accent stripping, punctuation splitting) then greedy longest-match
    WordPiece with ``##`` continuation pieces — the uncased vocab.txt
    convention of distilbert-base-uncased / multi-qa-distilbert-cos-v1."""

    def __init__(self, vocab: Dict[str, int], lowercase: bool = True,
                 max_input_chars_per_word: int = 100):
        self.vocab = vocab
        self.lower = lowercase
        self.max_chars = max_input_chars_per_word
        self.cls = vocab["[CLS]"]
        self.sep = vocab["[SEP]"]
        self.pad = vocab.get("[PAD]", 0)
        self.unk = vocab["[UNK]"]

    @classmethod
    def from_vocab_file(cls, path: str, **kw):
        vocab = {}
        with open(path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                vocab[line.rstrip("\n")] = i
        return cls(vocab, **kw)

    def _basic(self, text: str) -> List[str]:
        out = []
        text = unicodedata.normalize("NFC", text)
        for word in _WS_RE.split(text.strip()):
            if not word:
                continue
            if self.lower:
                word = word.lower()
                word = "".join(c for c in unicodedata.normalize("NFD", word)
                               if unicodedata.category(c) != "Mn")
            cur = []
            for ch in word:
                if _is_punct(ch):
                    if cur:
                        out.append("".join(cur))
                        cur = []
                    out.append(ch)
                else:
                    cur.append(ch)
            if cur:
                out.append("".join(cur))
        return out

    def _wordpiece(self, word: str) -> List[int]:
        if len(word) > self.max_chars:
            return [self.unk]
        pieces, start = [], 0
        while start < len(word):
            end = len(word)
            piece = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    piece = self.vocab[sub]
                    break
                end -= 1
            if piece is None:
                return [self.unk]
            pieces.append(piece)
            start = end
        return pieces

    def encode(self, text: str, max_length: int = 512) -> List[int]:
        ids = [self.cls]
        for w in self._basic(text):
            ids.extend(self._wordpiece(w))
            if len(ids) >= max_length - 1:
                break
        ids = ids[: max_length - 1]
        ids.append(self.sep)
        return ids

    def batch(self, texts: Sequence[str], max_length: int = 512,
              pad_multiple: int = 64):
        """Tokenize + pad to a shared bucketed length: returns
        (ids [B, L], mask [B, L]) int32/int32 numpy arrays with L the
        smallest multiple of ``pad_multiple`` covering the batch (few
        distinct compile shapes)."""
        seqs = [self.encode(t, max_length=max_length) for t in texts]
        lmax = max((len(s) for s in seqs), default=1)
        lpad = min(-(-lmax // pad_multiple) * pad_multiple, max_length)
        ids = np.full((len(seqs), lpad), self.pad, np.int32)
        mask = np.zeros((len(seqs), lpad), np.int32)
        for i, s in enumerate(seqs):
            s = s[:lpad]
            ids[i, : len(s)] = s
            mask[i, : len(s)] = 1
        return ids, mask
