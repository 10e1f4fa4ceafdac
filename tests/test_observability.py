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


def test_sweep_config_roundtrip_offline_noop():
    """apply_wandb_sweep_config is a no-op when the wandb SDK is absent."""
    import argparse

    from stemgnn_tpu.utils.observability import apply_wandb_sweep_config
    ns = argparse.Namespace(lr=0.1, epochs=5, debug=False)
    out = apply_wandb_sweep_config(ns, "proj")
    assert out.lr == 0.1 and out.epochs == 5


def test_sweep_config_roundtrip_applies_overrides(monkeypatch):
    """Sweep-agent overrides read back from wandb.config update the args
    with type coercion (reference finetune.py:314-321 semantics)."""
    import argparse
    import sys
    import types

    fake = types.ModuleType("wandb")
    fake.run = None
    captured = {}

    def init(project=None, config=None, **kw):
        captured["project"] = project
        fake.run = object()
        # sweep agent overrides lr and epochs (epochs as str, as YAML
        # sweeps sometimes deliver)
        fake.config = dict(config, lr=0.5, epochs="9")
        return fake.run

    fake.init = init
    monkeypatch.setitem(sys.modules, "wandb", fake)
    from stemgnn_tpu.utils.observability import apply_wandb_sweep_config
    ns = argparse.Namespace(lr=0.1, epochs=5, name="x", debug=False)
    out = apply_wandb_sweep_config(ns, "proj")
    assert captured["project"] == "proj"
    assert out.lr == 0.5 and out.epochs == 9 and isinstance(out.epochs, int)
    assert out.name == "x"


def test_missing_feature_tsv_export(tmp_path):
    """The reference's per-split TSV artifact format
    (missing_feature.py:739-763): split / [missing_val] / missing_test."""
    import argparse
    import importlib.util
    import os
    import sys
    root = os.path.join(os.path.dirname(__file__), "..")
    sys.path.insert(0, os.path.join(root, "scripts"))
    spec = importlib.util.spec_from_file_location(
        "mf", os.path.join(root, "scripts", "missing_feature.py"))
    mf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mf)
    args = argparse.Namespace(
        perturb="valtest", tsv_name="", finetune_dataset="cora_synthetic",
        missing_prob=0.4, relative_noise_alpha=0.0, seed=3,
        pretrain_path=str(tmp_path))
    rows = [{"perturbed/valid": 81.5, "perturbed/test": 80.25},
            {"perturbed/valid": 82.0, "perturbed/test": 79.0}]
    mf._write_tsv(args, rows)
    name = ("finetune_cora_synthetic_missing_p0.4_alpha0.0_valtest_"
            "seed3.tsv")
    lines = open(tmp_path / name).read().strip().split("\n")
    assert lines[0].split("\t") == ["split", "missing_val", "missing_test"]
    assert lines[1].split("\t") == ["0", "81.5", "80.25"]
    assert lines[2].split("\t") == ["1", "82.0", "79.0"]


def test_device_auc_matches_host_at_scale():
    """device_multitask_auc == host eval_auc incl. at row counts where
    int32 rank products would wrap (r4 self-review regression: P*(P+1)
    overflowed past ~46K positives)."""
    import jax.numpy as jnp

    from stemgnn_tpu.utils.metrics import device_multitask_auc, eval_auc
    rng = np.random.default_rng(0)
    for G in (4000, 200_000):
        y = rng.integers(0, 2, (G, 3)).astype(float)
        y[rng.random((G, 3)) < 0.3] = np.nan
        pred = rng.standard_normal((G, 3)) + 0.5 * np.nan_to_num(y)
        pred[rng.random((G, 3)) < 0.1] = 0.25          # ties
        host = eval_auc(pred, y)
        dev = float(device_multitask_auc(
            jnp.asarray(pred, jnp.float32), jnp.asarray(np.nan_to_num(y)),
            jnp.asarray(~np.isnan(y))))
        assert abs(host - dev) < 1e-4, (G, host, dev)
