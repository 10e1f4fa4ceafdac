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


class JaxE5Encoder:
    """Framework-owned 'e5' backend (intfloat/e5-large-v2 semantics,
    reference data_utils.py:102-124): pure-JAX BERT forward
    (stemgnn_tpu.nn.bert) + WordPiece tokenizer + attention-masked mean
    pool WITHOUT l2 normalization (and, faithfully, no query:/passage:
    prefixes — the reference adds none).  ``model_dir`` needs vocab.txt +
    model.safetensors / pytorch_model.bin of any HF BertModel."""

    def __init__(self, model_dir: str, batch_size: int = 64,
                 max_length: int = 512):
        import os.path as osp

        from stemgnn_tpu.nn.bert import BertConfig, import_hf_bert_state_dict
        from stemgnn_tpu.nn.distilbert import WordPieceTokenizer
        self.tokenizer = WordPieceTokenizer.from_vocab_file(
            osp.join(model_dir, "vocab.txt"))
        sd = _load_local_state_dict(model_dir)
        import re as _re
        n_layers = 1 + max(
            int(m.group(1)) for k in sd
            for m in [_re.search(r"encoder\.layer\.(\d+)\.", k)] if m)
        we = np.asarray(sd[[k for k in sd if k.endswith(
            "embeddings.word_embeddings.weight")][0]])
        ffn = np.asarray(sd[[k for k in sd if k.endswith(
            "intermediate.dense.weight")][0]])
        self.cfg = BertConfig(vocab_size=int(we.shape[0]),
                              dim=int(we.shape[1]), n_layers=n_layers,
                              n_heads=max(int(we.shape[1]) // 64, 1),
                              hidden_dim=int(ffn.shape[0]))
        self.params = import_hf_bert_state_dict(sd, self.cfg)
        self.batch_size = batch_size
        self.max_length = max_length
        import jax

        from stemgnn_tpu.nn.bert import bert_apply, e5_average_pool

        @jax.jit
        def fwd(params, ids, mask):
            hid = bert_apply(params, self.cfg, ids, mask)
            return e5_average_pool(hid, mask)

        self._fwd = fwd

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        outs = []
        bs = self.batch_size
        for i in range(0, len(texts), bs):
            chunk = list(texts[i: i + bs])
            ids, mask = self.tokenizer.batch(chunk,
                                             max_length=self.max_length)
            if len(chunk) < bs and len(texts) > bs:
                pad = bs - len(chunk)
                ids = np.pad(ids, ((0, pad), (0, 0)))
                mask = np.pad(mask, ((0, pad), (0, 0)))
            emb = np.asarray(self._fwd(self.params, ids, mask))
            outs.append(emb[: len(chunk)])
        return np.concatenate(outs, axis=0) if outs else \
            np.zeros((0, self.cfg.dim), np.float32)


class JaxLlamaEncoder:
    """Framework-owned 'llama2_*' backend (reference data_utils.py:80-100):
    pure-JAX Llama decoder (stemgnn_tpu.nn.llama), last hidden state,
    UNMASKED sequence mean (right-padded EOS positions included — the
    reference pools exactly so).  SentencePiece tokenization comes from the
    HF tokenizer files in the same local snapshot (weights-gated either
    way)."""

    def __init__(self, model_dir: str, batch_size: int = 8,
                 max_length: int = 500):
        from transformers import AutoTokenizer

        from stemgnn_tpu.nn.llama import (LlamaConfig,
                                          import_hf_llama_state_dict)
        self.tokenizer = AutoTokenizer.from_pretrained(model_dir,
                                                       local_files_only=True)
        self.tokenizer.pad_token = self.tokenizer.eos_token
        self.tokenizer.padding_side = "right"
        self.tokenizer.truncation_side = "right"
        sd = _load_local_state_dict(model_dir)
        import re as _re
        n_layers = 1 + max(int(m.group(1)) for k in sd
                           for m in [_re.search(r"layers\.(\d+)\.", k)] if m)
        we_key = [k for k in sd if k.endswith("embed_tokens.weight")][0]
        we_shape = sd[we_key].shape
        gate = [k for k in sd if k.endswith("mlp.gate_proj.weight")][0]
        kk = [k for k in sd if k.endswith("self_attn.k_proj.weight")][0]
        dim = int(we_shape[1])
        kv_dim = int(sd[kk].shape[0])
        n_heads = max(dim // 128, 1)
        self.cfg = LlamaConfig(
            vocab_size=int(we_shape[0]), dim=dim, n_layers=n_layers,
            n_heads=n_heads,
            n_kv_heads=max(kv_dim // (dim // n_heads), 1),
            hidden_dim=int(sd[gate].shape[0]))
        self.params = import_hf_llama_state_dict(sd, self.cfg)
        self.batch_size = batch_size
        self.max_length = max_length
        import jax

        from stemgnn_tpu.nn.llama import llama_apply, llama_mean_pool

        @jax.jit
        def fwd(params, ids):
            # faithful: the reference feeds input_ids only (no attention
            # mask), so padded EOS tokens participate in attention + mean
            return llama_mean_pool(llama_apply(params, self.cfg, ids))

        self._fwd = fwd

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        outs = []
        bs = self.batch_size
        for i in range(0, len(texts), bs):
            chunk = list(texts[i: i + bs])
            enc = self.tokenizer(chunk, padding="longest", truncation=True,
                                 max_length=self.max_length)
            ids = np.asarray(enc["input_ids"], np.int32)
            lpad = -(-ids.shape[1] // 64) * 64
            ids = np.pad(ids, ((0, 0), (0, lpad - ids.shape[1])),
                         constant_values=self.tokenizer.eos_token_id or 0)
            outs.append(np.asarray(self._fwd(self.params, ids)))
        return np.concatenate(outs, axis=0) if outs else \
            np.zeros((0, self.cfg.dim), np.float32)


def _load_local_state_dict(model_dir: str):
    import os.path as osp
    st_path = osp.join(model_dir, "model.safetensors")
    pt_path = osp.join(model_dir, "pytorch_model.bin")
    if osp.exists(st_path):
        try:
            from safetensors.numpy import load_file
            return load_file(st_path)
        except ImportError:
            pass
    if osp.exists(pt_path):
        import torch
        return torch.load(pt_path, map_location="cpu", weights_only=True)
    raise FileNotFoundError(
        f"no model.safetensors / pytorch_model.bin in {model_dir}")


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
    if name == "e5":
        import os
        model_dir = kw.pop("model_dir", None) or os.environ.get(
            "E5_MODEL_DIR", "/root/repo/data_cache/e5_model")
        return JaxE5Encoder(model_dir=model_dir, **kw)
    if name in ("llama2_7b", "llama2_13b"):
        import os
        env = name.upper() + "_MODEL_DIR"
        model_dir = kw.pop("model_dir", None) or os.environ.get(
            env, f"/root/repo/data_cache/{name}")
        return JaxLlamaEncoder(model_dir=model_dir, **kw)
    raise ValueError(f"unknown text encoder {name}")
