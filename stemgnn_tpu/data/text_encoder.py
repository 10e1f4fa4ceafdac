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
  * ``st`` : sentence-transformers via the local transformers cache, when the
    model weights exist on disk.  Same dims as the reference (ENCODER_DIM_DICT,
    data_utils.py:11).
"""

from __future__ import annotations

import hashlib
import re
from typing import Sequence

import numpy as np

ENCODER_DIMS = {"hash": 768, "ST": 768, "e5": 1024,
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
    if name in ("ST", "st"):
        try:
            return SentenceTransformerEncoder(**kw)
        except Exception as exc:  # weights not cached locally
            raise RuntimeError(
                "ST encoder weights unavailable offline; use the 'hash' "
                f"backend instead ({exc})") from exc
    raise ValueError(f"unknown text encoder {name}")
