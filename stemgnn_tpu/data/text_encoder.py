"""Text -> feature encoders for text-attributed graphs.

Re-design of ``SentenceEncoder`` (STEM-GNN/dataset/data_utils.py:14-124):
the reference encodes node/edge/class texts with a sentence-transformer
("ST" = multi-qa-distilbert-cos-v1, dim 768) or llama2/e5 variants on GPU.

Backends here:

  * ``hash`` (default, fully offline): deterministic feature hashing — each
    whitespace/punctuation token hashes to a handful of dimensions with
    signed contributions, l2-normalized.  Captures lexical overlap, needs no
    weights, bitwise reproducible.  This is the stand-in used when model
    weights are unavailable in the build environment (zero egress).
  * ``tfidf``: corpus-fit TF-IDF (word uni+bigrams) + randomized truncated
    SVD (LSA) to ``dim`` — still fully offline and deterministic, but unlike
    ``hash`` it weighs informative tokens and places co-occurring terms in a
    shared latent space, giving real lexical semantics for text-attributed
    graphs when neural weights are unavailable.
  * ``st`` : sentence-transformers via the local transformers cache, when the
    model weights exist on disk.  Same dims as the reference (ENCODER_DIM_DICT,
    data_utils.py:11).
"""

from __future__ import annotations

import hashlib
import re
from typing import Sequence

import numpy as np

ENCODER_DIMS = {"hash": 768, "tfidf": 768, "ST": 768, "e5": 1024,
                "llama2_7b": 4096, "llama2_13b": 5120}

_TOKEN_RE = re.compile(r"[a-z0-9]+")


class HashTextEncoder:
    """Deterministic hashed bag-of-words embeddings."""

    def __init__(self, dim: int = 768, seeds_per_token: int = 4):
        self.dim = dim
        self.k = seeds_per_token

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            toks = _TOKEN_RE.findall(t.lower())
            for tok in toks:
                h = hashlib.blake2b(tok.encode(), digest_size=16).digest()
                v = int.from_bytes(h, "little")
                for j in range(self.k):
                    idx = (v >> (j * 24)) % self.dim
                    sign = 1.0 if (v >> (j * 24 + 23)) & 1 else -1.0
                    out[i, idx] += sign
            n = np.linalg.norm(out[i])
            if n > 0:
                out[i] /= n
        return out


def _randomized_svd(a, k: int, n_iter: int = 4, oversample: int = 16,
                    seed: int = 0):
    """Halko randomized truncated SVD of a (sparse) matrix.

    Returns (U [n, k], S [k]).  Power iterations with QR re-orthogonalization
    keep the range estimate stable on spectra with slow decay (typical for
    tf-idf matrices)."""
    rng = np.random.default_rng(seed)
    k_eff = min(k + oversample, min(a.shape))
    y = a @ rng.standard_normal((a.shape[1], k_eff)).astype(np.float32)
    q, _ = np.linalg.qr(y)
    for _ in range(n_iter):
        q, _ = np.linalg.qr(a.T @ q)
        q, _ = np.linalg.qr(a @ q)
    b = q.T @ a                       # [k_eff, vocab] dense
    u, s, _ = np.linalg.svd(np.asarray(b), full_matrices=False)
    u = q @ u
    k = min(k, k_eff)
    return u[:, :k], s[:k]


class TfidfSvdEncoder:
    """TF-IDF (word uni+bigram) + truncated SVD document embeddings (LSA).

    Each :meth:`encode` call fits on its own corpus (the registry encodes
    node / edge / class text groups separately, mirroring the reference's
    per-group ``SentenceEncoder.encode`` calls, data_utils.py:126-134).
    Rows are l2-normalized; if the achievable rank is below ``dim`` the
    remaining columns are zero.
    """

    def __init__(self, dim: int = 768, min_df: int = 2,
                 max_vocab: int = 65536, seed: int = 0):
        self.dim = dim
        self.min_df = min_df
        self.max_vocab = max_vocab
        self.seed = seed

    def _tokens(self, text: str):
        words = _TOKEN_RE.findall(text.lower())
        return words + [f"{a}_{b}" for a, b in zip(words, words[1:])]

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        from collections import Counter

        from scipy import sparse

        docs = [Counter(self._tokens(t)) for t in texts]
        df = Counter()
        for d in docs:
            df.update(d.keys())
        min_df = self.min_df if len(texts) >= 10 else 1
        vocab_items = [(tok, c) for tok, c in df.items() if c >= min_df]
        vocab_items.sort(key=lambda kv: (-kv[1], kv[0]))
        vocab = {tok: i for i, (tok, _) in
                 enumerate(vocab_items[: self.max_vocab])}
        n = len(texts)
        if not vocab or n == 0:
            return np.zeros((n, self.dim), np.float32)
        idf = np.zeros(len(vocab), np.float32)
        for tok, i in vocab.items():
            idf[i] = np.log((1.0 + n) / (1.0 + df[tok])) + 1.0
        rows, cols, vals = [], [], []
        for i, d in enumerate(docs):
            for tok, c in d.items():
                j = vocab.get(tok)
                if j is not None:
                    rows.append(i)
                    cols.append(j)
                    vals.append(c * idf[j])
        a = sparse.csr_matrix(
            (np.asarray(vals, np.float32), (rows, cols)),
            shape=(n, len(vocab)))
        norms = np.sqrt(np.asarray(a.multiply(a).sum(axis=1))).ravel()
        a = sparse.diags(1.0 / np.maximum(norms, 1e-12)).astype(
            np.float32) @ a
        u, s = _randomized_svd(a, self.dim, seed=self.seed)
        emb = u * s[None, :]
        out = np.zeros((n, self.dim), np.float32)
        out[:, : emb.shape[1]] = emb
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(norms, 1e-12)


class JaxSentenceEncoder:
    """Framework-owned ST backend: the pure-JAX DistilBERT forward
    (stemgnn_tpu.nn.distilbert) + WordPiece tokenizer, fed from a local
    weights directory — runs on the same TPU as training, no torch in the
    encode path.  Semantics of multi-qa-distilbert-cos-v1: last hidden ->
    attention-masked mean pool -> l2norm (data_utils.py:14-79).

    ``model_dir`` must contain ``vocab.txt`` plus ``model.safetensors`` or
    ``pytorch_model.bin`` (a standard HF snapshot of
    sentence-transformers/multi-qa-distilbert-cos-v1 or any DistilBERT).
    """

    def __init__(self, model_dir: str, batch_size: int = 128,
                 max_length: int = 512):
        import os.path as osp

        from stemgnn_tpu.nn.distilbert import (DistilBertConfig,
                                               WordPieceTokenizer,
                                               import_hf_state_dict)
        self.tokenizer = WordPieceTokenizer.from_vocab_file(
            osp.join(model_dir, "vocab.txt"))
        sd = None
        st_path = osp.join(model_dir, "model.safetensors")
        pt_path = osp.join(model_dir, "pytorch_model.bin")
        if osp.exists(st_path):
            try:
                from safetensors.numpy import load_file
                sd = load_file(st_path)
            except ImportError:
                sd = None
        if sd is None and osp.exists(pt_path):
            import torch
            sd = torch.load(pt_path, map_location="cpu",
                            weights_only=True)
        if sd is None:
            raise FileNotFoundError(
                f"no model.safetensors / pytorch_model.bin in {model_dir}")
        # infer layer count / dims from the checkpoint
        import re as _re
        n_layers = 1 + max(
            int(m.group(1)) for k in sd
            for m in [_re.search(r"transformer\.layer\.(\d+)\.", k)] if m)
        we = sd[[k for k in sd if k.endswith(
            "embeddings.word_embeddings.weight")][0]]
        shape = we.shape if hasattr(we, "shape") else np.asarray(we).shape
        ffn = sd[[k for k in sd if k.endswith("ffn.lin1.weight")][0]]
        ffn_out = (ffn.shape if hasattr(ffn, "shape")
                   else np.asarray(ffn).shape)[0]
        self.cfg = DistilBertConfig(vocab_size=int(shape[0]),
                                    dim=int(shape[1]), n_layers=n_layers,
                                    hidden_dim=int(ffn_out))
        self.params = import_hf_state_dict(sd, self.cfg)
        self.batch_size = batch_size
        self.max_length = max_length
        import functools

        import jax

        from stemgnn_tpu.nn.distilbert import (distilbert_apply,
                                               mean_pool_normalize)

        @functools.partial(jax.jit, static_argnames=())
        def fwd(params, ids, mask):
            hid = distilbert_apply(params, self.cfg, ids, mask)
            return mean_pool_normalize(hid, mask)

        self._fwd = fwd

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        outs = []
        bs = self.batch_size
        for i in range(0, len(texts), bs):
            chunk = list(texts[i: i + bs])
            ids, mask = self.tokenizer.batch(chunk,
                                             max_length=self.max_length)
            if len(chunk) < bs and len(texts) > bs:
                # keep the batch dim bucketed too (one compile shape)
                pad = bs - len(chunk)
                ids = np.pad(ids, ((0, pad), (0, 0)))
                mask = np.pad(mask, ((0, pad), (0, 0)))
            emb = np.asarray(self._fwd(self.params, ids, mask))
            outs.append(emb[: len(chunk)])
        return np.concatenate(outs, axis=0) if outs else \
            np.zeros((0, self.cfg.dim), np.float32)


class SentenceTransformerEncoder:
    """ST backend via locally cached transformers weights (mean pooling +
    l2norm, matching multi-qa-distilbert-cos-v1 semantics)."""

    def __init__(self, model_name: str = "sentence-transformers/multi-qa-distilbert-cos-v1",
                 batch_size: int = 64, device: str = "cpu"):
        import torch
        from transformers import AutoModel, AutoTokenizer
        self.tokenizer = AutoTokenizer.from_pretrained(model_name,
                                                       local_files_only=True)
        self.model = AutoModel.from_pretrained(model_name,
                                               local_files_only=True)
        self.model.eval()
        self.batch_size = batch_size
        self.torch = torch

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        torch = self.torch
        outs = []
        with torch.no_grad():
            for i in range(0, len(texts), self.batch_size):
                batch = list(texts[i: i + self.batch_size])
                enc = self.tokenizer(batch, padding=True, truncation=True,
                                     max_length=512, return_tensors="pt")
                hidden = self.model(**enc).last_hidden_state
                mask = enc["attention_mask"][..., None].float()
                emb = (hidden * mask).sum(1) / mask.sum(1).clamp(min=1e-9)
                emb = torch.nn.functional.normalize(emb, p=2, dim=-1)
                outs.append(emb.cpu().numpy())
        return np.concatenate(outs, axis=0)


def get_text_encoder(name: str = "hash", dim: int = 768, **kw):
    if name == "hash":
        return HashTextEncoder(dim=dim, **kw)
    if name == "tfidf":
        return TfidfSvdEncoder(dim=dim, **kw)
    if name in ("ST", "st"):
        # Prefer the framework-owned JAX forward when a local snapshot
        # exists (ST_MODEL_DIR env or the conventional cache path); fall
        # back to the torch/sentence-transformers stack.
        import os
        import os.path as osp
        model_dir = kw.pop("model_dir", None) or os.environ.get(
            "ST_MODEL_DIR", "/root/repo/data_cache/st_model")
        if osp.exists(osp.join(model_dir, "vocab.txt")):
            return JaxSentenceEncoder(model_dir=model_dir, **kw)
        try:
            return SentenceTransformerEncoder(**kw)
        except Exception as exc:  # weights not cached locally
            raise RuntimeError(
                "ST encoder weights unavailable offline; use the 'hash' "
                f"backend instead ({exc})") from exc
    raise ValueError(f"unknown text encoder {name}")
