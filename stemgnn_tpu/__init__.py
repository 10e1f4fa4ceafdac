"""stemgnn_tpu — a TPU-native GNN message-passing framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
STEM-GNN reference (GNN encoder + multi-head cosine vector-quantization
bottleneck, pretrain/finetune loops, node/link/graph tasks, OOD eval suite),
built TPU-first:

  * fixed-shape padded graph containers (no dynamic shapes under jit),
  * sparse aggregation as fused Pallas SpMM / one-hot-matmul kernels with an
    XLA segment-op fallback,
  * the VQ bottleneck as a fused nearest-code kernel with codebook statistics
    psum-ed across a device mesh,
  * data/edge-partitioned parallelism via jax.sharding.Mesh + shard_map,
  * functional state everywhere (params / batch-norm stats / codebook EMA /
    RNG keys threaded through pure jitted step functions).

Reference behavior citations in docstrings point into /root/reference.
"""

__version__ = "0.1.0"

from stemgnn_tpu.core.graph import Graph  # noqa: F401
