"""Typed configuration tree.

Replaces the reference's three-level argparse + YAML ``set_defaults`` + wandb
round-trip (STEM-GNN/utils/args.py:4-142, finetune.py:299-304) with plain
dataclasses; YAML presets load into these via :func:`from_dict`.  Configs are
static (hashable) so they can be closed over by jitted step functions.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class EncoderConfig:
    """Mirrors Encoder(...) kwargs (STEM-GNN/model/encoder.py:132-175)."""
    input_dim: int = 768
    hidden_dim: int = 768
    num_layers: int = 2
    backbone: str = "sage"            # sage | gat | gcn | gin
    normalize: str = "batch"          # none | batch | layer (reference applies
                                      # BatchNorm1d for any non-'none' value,
                                      # encoder.py:173,313-314)
    dropout: float = 0.15
    activation: str = "relu"          # relu | leaky_relu
    moe: bool = False
    num_experts: int = 3
    tau: float = 1.0
    moe_layers: str = "none"          # none | all | last
    # Mixed precision: "bfloat16" runs encoder activations/messages/matmuls
    # in bf16 (params, BatchNorm statistics, VQ, and losses stay f32) —
    # halves the encoder's HBM traffic.  sage backbone only.
    compute_dtype: str = "float32"    # float32 | bfloat16
    # Message precision of the FUSED aggregation path (layout-attached
    # graphs on TPU): bfloat16 messages halve gather/scatter traffic and
    # enable the hub-dense decomposition; accumulation stays f32 either
    # way.  Set False for strict-f32 messages (hi/lo two-pass kernels,
    # ~2^-16 relative error; hub-dense disabled).  Forced on when
    # compute_dtype is bfloat16.
    fused_bf16_messages: bool = True

    @property
    def moe_enabled(self) -> bool:
        return self.moe and self.num_experts > 1

    def moe_layer_flags(self) -> Tuple[bool, ...]:
        """encoder.py:177-189."""
        if not self.moe_enabled or self.moe_layers == "none":
            return tuple([False] * self.num_layers)
        if self.moe_layers == "all":
            return tuple([True] * self.num_layers)
        if self.moe_layers == "last":
            flags = [False] * self.num_layers
            if self.num_layers > 0:
                flags[-1] = True
            return tuple(flags)
        raise ValueError(f"Unsupported moe_layers setting: {self.moe_layers}")


@dataclass(frozen=True)
class VQConfig:
    """Mirrors VectorQuantize(...) kwargs (STEM-GNN/model/vq.py:692-808) with
    the reference's pinned choices (pretrain.py:105-119, finetune.py:132-146):
    cosine codebook, separate codebook per head."""
    dim: int = 768
    codebook_size: int = 128
    codebook_dim: int = 768
    heads: int = 4
    separate_codebook_per_head: bool = True
    decay: float = 0.8
    eps: float = 1e-5
    commitment_weight: float = 10.0
    orthogonal_reg_weight: float = 1.0
    orthogonal_reg_max_codes: Optional[int] = 32
    orthogonal_reg_active_codes_only: bool = False
    use_cosine_sim: bool = True
    # r5 mixed precision: "bfloat16" runs the per-head pipeline (the
    # [H, N, d] l2norm / distance / one-hot-quantize / straight-through
    # intermediates — the VQ's HBM-bound bulk; the projections measured
    # neutral) in bf16.  Distance scores accumulate f32 (argmax-stable);
    # commitment/orthogonal reductions and EMA statistics stay f32.
    compute_dtype: str = "float32"
    kmeans_init: bool = False
    kmeans_iters: int = 10
    ema_update: bool = False
    learnable_codebook: bool = False   # effective value is
                                       # orthogonal_reg_weight > 0 or this
                                       # (vq.py:785)
    threshold_ema_dead_code: float = 0.0
    stochastic_sample_codes: bool = False
    sample_codebook_temp: float = 1.0
    straight_through_gumbel: bool = False
    # (The r1-r2 opt-in fused nearest-code Pallas kernel was removed in r3:
    # measured MXU-bound parity with XLA on the v5e, and the r3 Mosaic
    # toolchain stopped compiling it.  The VQ hot loop is the cosine score
    # einsum — already MXU-shaped in plain XLA.)
    sync_codebook: bool = False        # psum codebook stats over mesh axis
    # Affine re-parameterization of the euclidean codebook (vq.py:361-411):
    # EMA-track batch and codebook mean/variance; distances run against the
    # codebook mapped into the batch distribution.  Euclidean-only, like the
    # reference (CosineSimCodebook has no affine path).
    affine_param: bool = False
    affine_param_batch_decay: float = 0.99
    affine_param_codebook_decay: float = 0.9

    @property
    def codebook_input_dim(self) -> int:
        return self.codebook_dim * self.heads

    @property
    def requires_projection(self) -> bool:
        return self.codebook_input_dim != self.dim

    @property
    def num_codebooks(self) -> int:
        return self.heads if self.separate_codebook_per_head else 1

    @property
    def effective_learnable(self) -> bool:
        return self.learnable_codebook or self.orthogonal_reg_weight > 0


@dataclass(frozen=True)
class PretrainConfig:
    """config/pretrain.yaml equivalents."""
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    vq: VQConfig = field(default_factory=VQConfig)
    pretrain_dataset: str = "all"
    epochs: int = 50
    lr: float = 1e-4
    weight_decay: float = 1e-5
    batch_size: int = 1024
    fanout: int = 10
    feat_p: float = 0.2
    edge_p: float = 0.2
    topo_recon_ratio: float = 0.1
    feat_lambda: float = 100.0
    topo_lambda: float = 0.01
    topo_sem_lambda: float = 100.0
    sem_lambda: float = 1.0
    sem_encoder_decay: float = 0.99
    lamda_env: float = 0.0
    use_scheduler: bool = True
    grad_clip: float = 1.0
    seed: int = 42
    # Per-batch edge layouts for the minibatch steps (fused Pallas
    # aggregation; the in-step edge-dropout mask is folded in as a runtime
    # keep mask).  Measured a NET LOSS on the tunneled v5e: the ~5 MB/step
    # layout transfer at the tunnel's ~34 MB/s H2D (~140 ms) dwarfs the
    # ~23 ms/step the kernels save (host build is 14 ms; building in-jit
    # is worse still — a 112k device sort alone is 105 ms).  On hosts with
    # PCIe-attached TPUs the transfer is ~0.2 ms and this should win, so
    # the machinery stays ("on" forces it); "auto" resolves to off here.
    fused_minibatch: str = "auto"
    # r5 mixed-precision pretrain extensions (scripts/pretrain_step_probe.py
    # measured the full-graph step at bench scale; BASELINE r5 row):
    #   teacher_bf16 — the grad-free EMA-teacher encoder pass runs with
    #     compute_dtype=bfloat16 (its output feeds a cosine loss on
    #     l2-normalized vectors, so one bf16 rounding is benign);
    #   loss_bf16 — the recon-loss decoder matmuls (feat_dec, topo_dec
    #     projection, topo_sem_dec, sem_projector) compute in bf16 from a
    #     bf16 copy of the quantized codes; targets/reductions stay f32.
    # Both default OFF (reference-faithful f32); parity gates in
    # tests/test_end_to_end.py.
    teacher_bf16: bool = False
    loss_bf16: bool = False
    # Checkpoint every K epochs (the reference saves every epoch,
    # pretrain.py:160-165 — K=1 keeps that protocol; the final epoch
    # always saves).  At full-graph scale the per-epoch param fetch is a
    # measurable share of the 0.7 s halo epoch (BASELINE r5).
    save_every: int = 1


@dataclass(frozen=True)
class FinetuneConfig:
    """config/finetune.yaml equivalents (per task/dataset presets live in
    configs/finetune.yaml)."""
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    vq: VQConfig = field(default_factory=lambda: VQConfig(kmeans_init=True,
                                                          commitment_weight=0.25))
    dataset: str = "cora"
    task: str = "node"                # node | link | graph
    epochs: int = 1000
    early_stop: int = 200
    batch_size: int = 0               # 0 = full batch
    lr: float = 5e-4
    repeat: int = 10
    use_vq: bool = True
    freeze_vq: bool = True
    separate_decoder_for_each_head: bool = True
    decoder_jac_coeff: float = 0.0
    lamda_env: float = 0.0
    num_classes: int = 0
    fanout: int = 10
    link_fanout: int = 30
    # Layer-wise streaming eval (train/infer.py): the TPU-native analog of
    # the reference's full-neighborhood eval loaders (utils/loader.py:10-45).
    # With minibatch training it also skips materializing the full padded
    # graph, bounding eval memory at O(N*D + eval_edge_block*D).
    eval_chunked: bool = False
    eval_edge_block: int = 262_144
    # Full-batch node/link: run this many (train epoch + eval) iterations
    # inside ONE jitted lax.scan dispatch, reading back only the per-epoch
    # loss vectors and masked accuracies.  Early-stop/logging semantics are
    # per-epoch as in the reference; over a remote-dispatch transport this
    # removes ~6 host round-trips per epoch.  0 disables (per-epoch steps).
    epoch_chunk: int = 16
    # Full-batch on TPU: precompute an ops.edge_layout.EdgeLayout (attached
    # to the graph) so aggregation runs the fused Pallas scatter + hub-dense
    # path; hub_size bounds the dense CNT block (0 disables hubs).  The
    # layout path requires the sage backbone.
    use_fused_layout: bool = True
    hub_size: int = 2048
    # Scatter-side hub blocks (HubDense.sc_*): in-edges of hub receivers /
    # out-edges of hub senders as one transposed dense matmul.  Gated by
    # the same per-chip break-even model; 0 disables.
    sc_hub_size: int = 2048
    # Graph task: evaluate AUC on all three splits every K epochs instead of
    # every epoch (the reference evaluates per epoch, task/graph.py:80 — the
    # default 1 keeps that protocol).  At chempcba scale the 3-split eval
    # forward pass dominates epoch wall time (BASELINE r4 graph-scale row:
    # train ~6-8 s + eval ~28-33 s), so K>1 trades eval granularity for
    # ~K× less eval compute; early-stop patience then counts EVAL points.
    # The final epoch always evaluates.
    eval_every: int = 1
    # bf16 EVAL forward (r4 VERDICT item 6): the eval/predict encoder pass
    # runs with compute_dtype=bfloat16 while training stays f32.  AUC is a
    # rank statistic, so one bf16 rounding of the logits moves it only
    # where scores are near-ties (parity gate in tests/test_chem.py).
    # Applies to the graph task's 3-split eval (the compute-bound stage at
    # chempcba scale, BASELINE r4 row).  Default off (reference-faithful).
    eval_bf16: bool = False
    # Graph-task EVAL batch size (0 = batch_size).  The eval forward has
    # no optimizer state, so batches can be much larger than training's —
    # fewer dispatches and less per-batch padding waste for the
    # compute-bound 3-split AUC pass.  Predictions are per-graph, so the
    # metric is exactly invariant to the batch partition.
    eval_batch_size: int = 0
    # Evaluate the TRAIN split's AUC each eval (the reference's protocol,
    # task/graph.py:80).  False skips it — at an 80/10/10 split that is
    # ~80% of the eval forward compute for a diagnostic that no selection
    # decision reads (early stop and best-snapshot use val only); the
    # train metric then reports NaN.
    eval_train_auc: bool = True
    # Node reordering for gather locality (ops/reorder.py): "auto" applies
    # RCM when the windowed-gather break-even gate says the reordered graph
    # wins (full-batch fused path only); "rcm"/"degree" force a method;
    # "off" keeps dataset order.  Pure relabeling — labels/splits/features
    # permute with the nodes, metrics are unchanged.
    reorder: str = "auto"


def _update(dc, d: dict):
    names = {f.name for f in dataclasses.fields(dc)}
    sub = {}
    for k, v in d.items():
        if k not in names:
            continue
        cur = getattr(dc, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            sub[k] = _update(cur, v)
        else:
            sub[k] = v
    return dataclasses.replace(dc, **sub)


def from_dict(cls_or_default, d: dict):
    """Build a config from a (possibly partial, possibly nested) dict."""
    dc = cls_or_default if dataclasses.is_dataclass(cls_or_default) else cls_or_default()
    return _update(dc, d)


def load_yaml(path: str) -> dict:
    import yaml
    with open(path) as f:
        return yaml.safe_load(f)
