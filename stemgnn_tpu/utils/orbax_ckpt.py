"""Orbax checkpoint backend (alternative to the npz pytree store).

The npz store (:mod:`stemgnn_tpu.utils.checkpoint`) is simple, portable, and
fine single-host.  For multi-host / long pretrains, Orbax adds async saves
(training continues while the previous state flushes), per-array sharded
on-disk layout, retention management, and atomicity guarantees — the TPU
ecosystem's standard replacement for the reference's per-epoch ``torch.save``
with bare try/except (STEM-GNN/pretrain.py:160-165).

API mirrors the npz layer: trees in, trees out; ``restore_like`` from the npz
module re-imposes exact container types (optax namedtuples) when needed.
Import is lazy so environments without orbax can still use the npz backend.
"""

from __future__ import annotations

import os
from typing import Any, Optional


def _ocp():
    try:
        import orbax.checkpoint as ocp
        return ocp
    except Exception as exc:                       # pragma: no cover
        raise ImportError(
            "orbax-checkpoint is not available; use the npz backend "
            "(stemgnn_tpu.utils.checkpoint)") from exc


class OrbaxCheckpointManager:
    """Step-indexed checkpoint manager: save(step, tree) / restore(step).

    ``async_save=True`` returns from ``save`` as soon as the on-device arrays
    are snapshotted; the write completes in the background (call ``close`` or
    ``wait`` before exiting).
    """

    def __init__(self, directory: str, max_to_keep: Optional[int] = None,
                 async_save: bool = True):
        ocp = _ocp()
        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, enable_async_checkpointing=async_save)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, tree: Any, *, force: bool = False) -> bool:
        ocp = self._ocp
        return self._mgr.save(step, args=ocp.args.StandardSave(tree),
                              force=force)

    def restore(self, step: Optional[int] = None, template: Any = None):
        """Restore ``step`` (default: latest).  With ``template`` the result
        adopts the template's exact pytree structure and array dtypes."""
        ocp = self._ocp
        if step is None:
            step = self.latest_step()
            if step is None:
                return None
        if template is not None:
            import jax
            abstract = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(jax.numpy.asarray(x).shape,
                                               jax.numpy.asarray(x).dtype),
                template)
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def save_pytree(path: str, tree: Any):
    """One-shot save of a pytree to ``path`` (a directory)."""
    ocp = _ocp()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), tree, force=True)


def load_pytree(path: str, template: Any = None):
    """One-shot restore; with ``template``, restores exact structure/dtypes."""
    ocp = _ocp()
    with ocp.StandardCheckpointer() as ckptr:
        if template is None:
            return ckptr.restore(os.path.abspath(path))
        import jax
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(jax.numpy.asarray(x).shape,
                                           jax.numpy.asarray(x).dtype),
            template)
        return ckptr.restore(os.path.abspath(path), abstract)
