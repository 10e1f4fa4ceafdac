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
    """Convert {#0: .., #1: ..} dicts back into lists.

    Indices may be sparse: leafless containers (e.g. optax EmptyState inside
    a chain) produce no entries when flattened — present children are
    restored in index order, and :func:`restore_like` re-imposes the exact
    original structure from a template when one exists."""
    if not isinstance(node, dict):
        return node
    keys = list(node.keys())
    if keys and all(re.fullmatch(r"#\d+", k) for k in keys):
        return [_listify(node[k])
                for k in sorted(keys, key=lambda s: int(s[1:]))]
    return {k: _listify(v) for k, v in node.items()}


def restore_like(template, loaded):
    """Re-impose ``template``'s pytree structure (namedtuples, custom nodes)
    on a loaded checkpoint whose containers round-tripped as dicts/lists.

    Both trees traverse leaves in the same order (dict keys sorted by
    tree_flatten; lists positional), so unflattening the loaded leaves with
    the template's treedef reconstructs e.g. optax optimizer states exactly.
    """
    import jax
    leaves_t, treedef = jax.tree_util.tree_flatten(template)
    leaves_l = jax.tree_util.tree_leaves(loaded)
    if len(leaves_t) != len(leaves_l):
        raise ValueError(f"checkpoint leaf count {len(leaves_l)} != "
                         f"template {len(leaves_t)}")
    return jax.tree_util.tree_unflatten(treedef, leaves_l)


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
