"""Persistent XLA compilation cache setup.

Big Pallas programs take minutes to compile through the remote TPU
compiler on tunneled transports; the persistent cache makes every rerun
start in seconds.  bench.py has always enabled it — the training CLIs go
through here so pretrain/finetune/scripts get the same treatment.
"""

from __future__ import annotations

import os
import os.path as osp


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Idempotently point jax at the repo-local ``.jax_cache``."""
    import jax
    if cache_dir is None:
        cache_dir = osp.join(
            osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))),
            ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return cache_dir
