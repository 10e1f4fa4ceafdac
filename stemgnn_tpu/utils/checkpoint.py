"""Checkpointing: full train state to disk, encoder/VQ separable.

The reference saves ``encoder_{i}.pt`` / ``vq_{i}.pt`` per epoch
(STEM-GNN/pretrain.py:160-165, pt_model.py:33-37) and reloads them in
finetune (finetune.py:166-177, utils/others.py:160-171 — including the
dummy-forward hack for lazily-created VQ buffers, which the functional design
makes unnecessary).  Here any pytree of arrays round-trips through ``.npz``
files with flattened key paths; the full train state (params + opt state +
EMA buffers + RNG key) checkpoints the same way for crash/preemption resume.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}#{i}/"))
    elif tree is None:
        out[prefix[:-1] + "!none"] = np.zeros(0)
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_pytree(path: str, tree: Any, meta: Optional[dict] = None):
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = _flatten(jax.device_get(tree))
    tmp = path + ".tmp.npz"          # np.savez appends .npz only if absent
    np.savez(tmp, **flat)
    os.replace(tmp, path)
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)


def load_pytree(path: str):
    """Rebuild the nested structure from flattened keys."""
    data = np.load(path)
    root: dict = {}
    for key in data.files:
        is_none = key.endswith("!none")
        k = key[:-5] if is_none else key
        parts = k.split("/")
        cur = root
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = None if is_none else data[key]
    return _listify(root)


def _listify(node):
    """Convert {#0: .., #1: ..} dicts back into lists."""
    if not isinstance(node, dict):
        return node
    keys = list(node.keys())
    if keys and all(re.fullmatch(r"#\d+", k) for k in keys):
        return [_listify(node[f"#{i}"]) for i in range(len(keys))]
    return {k: _listify(v) for k, v in node.items()}


def load_meta(path: str) -> Optional[dict]:
    try:
        with open(path + ".meta.json") as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def latest_checkpoint(ckpt_dir: str, prefix: str) -> Optional[str]:
    """Find the highest-epoch checkpoint ``{prefix}_{i}.npz`` for resume."""
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_i = None, -1
    pat = re.compile(re.escape(prefix) + r"_(\d+)\.npz$")
    for f in os.listdir(ckpt_dir):
        m = pat.match(f)
        if m and int(m.group(1)) > best_i:
            best_i = int(m.group(1))
            best = os.path.join(ckpt_dir, f)
    return best
