"""Shared CLI plumbing for the OOD / robustness eval scripts.

Mirrors the reference scripts' argument surface (finetune.yaml defaults +
pretrain-path resolution, e.g. scripts/degree_shift_ood.py:438-495) on top of
the typed config tree.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from stemgnn_tpu.utils.jax_cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()

from stemgnn_tpu.core import config as cfglib
from stemgnn_tpu.data.registry import dataset2task, load_dataset


def base_parser(name: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(name)
    p.add_argument("--finetune_dataset", "--dataset", "--data",
                   default="cora_synthetic")
    p.add_argument("--feat_dim", type=int, default=768)
    p.add_argument("--text_encoder", default="hash",
                   choices=["hash", "tfidf", "ST", "st", "e5",
                            "llama2_7b", "llama2_13b"])
    p.add_argument("--hidden_dim", type=int, default=768)
    p.add_argument("--num_layers", type=int, default=2)
    p.add_argument("--normalize", default="none")
    p.add_argument("--dropout", type=float, default=0.15)
    p.add_argument("--backbone", default="sage")
    p.add_argument("--code_dim", type=int, default=768)
    p.add_argument("--codebook_size", type=int, default=128)
    p.add_argument("--codebook_head", type=int, default=4)
    p.add_argument("--use_vq", type=int, default=1)
    p.add_argument("--freeze_vq", type=int, default=1)
    p.add_argument("--moe", action="store_true")
    p.add_argument("--moe_layers", default="none")
    p.add_argument("--moe_experts", "--K", type=int, default=3)
    p.add_argument("--moe_tau", "--tau", type=float, default=1.0)
    p.add_argument("--lamda_env", type=float, default=0.0)
    p.add_argument("--finetune_epochs", "--epochs", type=int, default=300)
    p.add_argument("--early_stop", type=int, default=100)
    p.add_argument("--finetune_lr", "--lr", type=float, default=5e-4)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pretrain_path", default="")
    p.add_argument("--pretrain_model_epoch", type=int, default=25)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--output_json", default="")
    return p


def build_cfg(args, num_classes: int) -> cfglib.FinetuneConfig:
    enc = cfglib.EncoderConfig(
        input_dim=args.feat_dim, hidden_dim=args.hidden_dim,
        num_layers=args.num_layers, backbone=args.backbone,
        normalize=args.normalize, dropout=args.dropout, moe=args.moe,
        num_experts=args.moe_experts, tau=args.moe_tau,
        moe_layers=args.moe_layers)
    vq = cfglib.VQConfig(
        dim=args.hidden_dim, codebook_size=args.codebook_size,
        codebook_dim=args.code_dim, heads=args.codebook_head,
        commitment_weight=0.25, kmeans_init=not bool(args.pretrain_path))
    return cfglib.FinetuneConfig(
        encoder=enc, vq=vq, dataset=args.finetune_dataset, task="node",
        epochs=args.finetune_epochs, early_stop=args.early_stop,
        lr=args.finetune_lr, use_vq=bool(args.use_vq),
        freeze_vq=bool(args.freeze_vq), lamda_env=args.lamda_env,
        num_classes=num_classes)


def load_node_dataset(args):
    name = args.finetune_dataset
    if dataset2task.get(name) != "node":
        raise ValueError(f"{name} is not a node-classification dataset")
    return load_dataset(name, feat_dim=args.feat_dim, seed=args.seed,
                        text_encoder=getattr(args, 'text_encoder', 'hash'))


def load_pretrained(args):
    if not args.pretrain_path:
        return None
    from stemgnn_tpu.train.pretrain_loop import load_pretrained_for_finetune
    enc = os.path.join(args.pretrain_path,
                       f"encoder_{args.pretrain_model_epoch}.npz")
    vq = os.path.join(args.pretrain_path,
                      f"vq_{args.pretrain_model_epoch}.npz")
    return load_pretrained_for_finetune(enc, vq)


def parse_with_sweep(parser: argparse.ArgumentParser,
                     project: str = "STEM-GNN-Finetune"):
    """parse_args + the reference's wandb sweep round-trip
    (degree_shift_ood.py:500-507: init with the CLI params as config, then
    read them BACK from wandb.config so sweep agents can drive the script).
    Offline or with --debug this is plain parse_args."""
    args = parser.parse_args()
    from stemgnn_tpu.utils.observability import apply_wandb_sweep_config
    return apply_wandb_sweep_config(args, project, debug=args.debug)


def emit(payload: dict, args):
    print(json.dumps(payload, indent=2, default=float))
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(payload, f, default=float)
