"""Hyperparameter grid expansion (reference
STEM-GNN/dataset/gp/utils/utils.py:224 grid-search helper + load_yaml/
combine_dict/merge_mod config utilities)."""

from __future__ import annotations

import itertools
from typing import Dict, Iterator, List


def grid_search(space: Dict[str, list]) -> Iterator[dict]:
    """Yield every combination of the value lists in ``space``."""
    keys = list(space.keys())
    for combo in itertools.product(*(space[k] for k in keys)):
        yield dict(zip(keys, combo))


def combine_dict(*dicts: dict) -> dict:
    """Later dicts override earlier ones (gp/utils/utils.py combine_dict)."""
    out: dict = {}
    for d in dicts:
        if d:
            out.update(d)
    return out


def merge_mod(params: dict, mods: List[str]) -> dict:
    """Apply 'key=value' command-line modifications with literal eval
    (gp/utils/utils.py merge_mod)."""
    import ast
    out = dict(params)
    for mod in mods:
        k, v = mod.split("=", 1)
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v
    return out
