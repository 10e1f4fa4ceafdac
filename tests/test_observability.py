"""Observability tests: metrics logger backends, throughput meter, preemption
latch + checkpoint-on-signal in the pretrain loop."""

import json
import os
import signal

import numpy as np
import pytest

from stemgnn_tpu.utils.observability import (MetricsLogger, PreemptionHandler,
                                             ThroughputMeter)


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    ml = MetricsLogger(backends=("jsonl",), jsonl_path=path)
    ml.log({"losses/loss": 1.5, "note": "a"})
    ml.log({"train/val_value": 2.0}, step=10)
    ml.finish()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["losses/loss"] == 1.5 and lines[0]["step"] == 0
    assert lines[1]["step"] == 10


def test_throughput_meter():
    m = ThroughputMeter()
    m.update(1000, 100)
    m.update(1000, 100)
    r = m.rates()
    assert r["throughput/edges_per_s"] > 0
    assert r["throughput/steps_per_s"] > 0


def test_preemption_latch():
    h = PreemptionHandler(signals=(signal.SIGUSR1,))
    try:
        assert not h.should_stop
        os.kill(os.getpid(), signal.SIGUSR1)
        assert h.should_stop
    finally:
        h.restore()


def test_pretrain_resume_from_full_checkpoint(tmp_path):
    """Crash-recovery path: full_<epoch>.npz reloads into a usable state."""
    from stemgnn_tpu.core.config import (EncoderConfig, PretrainConfig,
                                         VQConfig)
    from stemgnn_tpu.data.merge import merge_datasets
    from stemgnn_tpu.data.synthetic import synthetic_node_dataset
    from stemgnn_tpu.train.pretrain_loop import run_pretrain
    from stemgnn_tpu.utils.checkpoint import latest_checkpoint, load_pytree

    D = 16
    ds = synthetic_node_dataset(num_nodes=120, feat_dim=D, seed=0)
    cfg = PretrainConfig(
        encoder=EncoderConfig(input_dim=D, hidden_dim=D, num_layers=2,
                              normalize="batch"),
        vq=VQConfig(dim=D, codebook_size=8, codebook_dim=8, heads=2,
                    commitment_weight=1.0, orthogonal_reg_weight=0.0),
        epochs=2, batch_size=16, fanout=3, lr=1e-3)
    run_pretrain(merge_datasets([ds]), cfg, weights=[1.0],
                 save_root=str(tmp_path), verbose=False)
    latest = latest_checkpoint(str(tmp_path), "full")
    assert latest is not None and latest.endswith("full_2.npz")
    bundle = load_pytree(latest)
    assert {"params", "teacher", "state", "epoch",
            "opt_state"} <= set(bundle)
    # params tree structurally valid: encoder weights present
    assert "lin_l" in bundle["params"]["encoder"]["layers"][0]


def test_pretrain_resume_continues_epochs(tmp_path):
    """--resume restores params/opt/teacher/RNG and continues at epoch+1."""
    from stemgnn_tpu.core.config import (EncoderConfig, PretrainConfig,
                                         VQConfig)
    from stemgnn_tpu.data.merge import merge_datasets
    from stemgnn_tpu.data.synthetic import synthetic_node_dataset
    from stemgnn_tpu.train.pretrain_loop import run_pretrain

    D = 16
    ds = synthetic_node_dataset(num_nodes=120, feat_dim=D, seed=0)
    merged = merge_datasets([ds])
    base = dict(
        encoder=EncoderConfig(input_dim=D, hidden_dim=D, num_layers=2,
                              normalize="batch"),
        vq=VQConfig(dim=D, codebook_size=8, codebook_dim=8, heads=2,
                    commitment_weight=1.0, orthogonal_reg_weight=0.0),
        batch_size=16, fanout=3, lr=1e-3)
    run_pretrain(merged, PretrainConfig(epochs=2, **base), weights=[1.0],
                 save_root=str(tmp_path), verbose=False)
    _, _, _, hist = run_pretrain(
        merged, PretrainConfig(epochs=3, **base), weights=[1.0],
        save_root=str(tmp_path), verbose=False, resume=True)
    assert len(hist) == 1          # only epoch 3 ran
    assert (tmp_path / "encoder_3.npz").exists()
