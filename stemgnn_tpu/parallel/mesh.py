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

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


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
