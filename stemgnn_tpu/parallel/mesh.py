"""Device-mesh helpers.

The framework's distribution model (SURVEY.md §2.7, §7.1): a single
``jax.sharding.Mesh`` with axes

  * ``data`` — data-parallel over seed-node batches (pretrain);
    gradients + VQ codebook statistics are psum-ed over this axis (the
    analog of the reference's ``torch.distributed.all_reduce`` in the VQ,
    STEM-GNN/model/vq.py:666,672 — its only hot-loop collective),
  * ``edge`` — edge-partitioned full-graph mode: each chip owns an edge
    shard of one large graph; partial aggregations combine over ICI.

The reference has no tensor/pipeline parallelism to mirror (SURVEY.md §2.7);
model weights are small (tens of MB) and stay replicated.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> dict:
    """Gate ``jax.distributed.initialize`` for real multi-host pods.

    Single-process (the default, and everything the reference ever ran —
    SURVEY.md §2.7: no launcher anywhere) is a no-op.  On a pod, either pass
    the coordinator explicitly or export the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``
    — on Cloud TPU ``jax.distributed.initialize()`` auto-detects all three).

    Call BEFORE any other jax API.  Returns {"process_index", "process_count",
    "local_device_count", "global_device_count"}.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    multi = coordinator_address is not None or (num_processes or 1) > 1
    if multi:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }


def host_shard(array_like, axis_name_size: int,
               process_index: Optional[int] = None,
               process_count: Optional[int] = None):
    """This host's contiguous slice of a globally-indexed batch axis.

    For per-host data feeding on a pod: the global batch (e.g. stacked seed
    batches, one per device) is built identically on every host from a shared
    RNG seed; each host materializes only the slice owned by its local
    devices.  Returns (start, stop) indices into axis 0.
    """
    import numpy as _np
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    n = int(_np.asarray(axis_name_size))
    per = n // pc
    if per * pc != n:
        raise ValueError(f"global axis {n} not divisible by {pc} hosts")
    return pi * per, (pi + 1) * per


def make_mesh(axis_sizes: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Build a mesh over available devices.

    Default: 1-D ``data`` mesh over all devices.  Pass e.g.
    ``axis_sizes=(2, 4), axis_names=("data", "edge")`` for a 2-D layout.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(axis_sizes)) != n:
        raise ValueError(f"mesh {axis_sizes} != {n} devices")
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, axis_names)
