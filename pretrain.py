#!/usr/bin/env python
"""Pretrain driver CLI.

Re-design of /root/reference/STEM-GNN/pretrain.py: argparse + YAML preset
round-trip (utils/args.py:4-58), weighted multi-dataset mix (config/pt_data),
per-epoch checkpoints under ckpts/pretrain_model/<run_id>/.

Examples:
  python pretrain.py --use_params --pretrain_dataset synthetic --debug
  python pretrain.py --pretrain_dataset cora_synthetic --epochs 2 --feat_dim 64
"""

import argparse
import os
import os.path as osp

from stemgnn_tpu.core import config as cfglib
from stemgnn_tpu.data.merge import merge_datasets
from stemgnn_tpu.data.registry import load_dataset
from stemgnn_tpu.train.pretrain_loop import run_pretrain
from stemgnn_tpu.utils.seeding import seed_everything

ROOT = osp.dirname(osp.abspath(__file__))


def get_args():
    p = argparse.ArgumentParser("Pretrain")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--text_encoder", default="hash",
                   choices=["hash", "tfidf", "ST", "st", "e5",
                            "llama2_7b", "llama2_13b"],
                   help="text featurizer: hash/tfidf run offline; st/e5/"
                        "llama2_* use the first-party JAX forwards from a "
                        "local weights snapshot (nn/{distilbert,bert,"
                        "llama}.py)")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--gpu", type=int, default=0,
                   help="accepted for reference-CLI compatibility "
                        "(utils/args.py:10); device selection is jax-native "
                        "here and the flag is ignored")
    p.add_argument("--use_params", action="store_true",
                   help="load configs/pretrain.yaml defaults")
    p.add_argument("--feat_dim", "--input_dim", type=int, default=768)
    p.add_argument("--hidden_dim", type=int, default=768)
    p.add_argument("--num_layers", "--layers", type=int, default=2)
    p.add_argument("--activation", "--act", default="relu")
    p.add_argument("--backbone", default="sage")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 encoder activations/messages (params, "
                        "BatchNorm stats, VQ and losses stay f32)")
    p.add_argument("--save_every", type=int, default=1,
                   help="checkpoint every K epochs (1 = reference "
                        "per-epoch protocol; final epoch always saves)")
    p.add_argument("--mixed_precision", "--mp", action="store_true",
                   help="full mixed-precision pretrain (r5): --bf16 plus "
                        "bf16 EMA-teacher pass and bf16 loss-decoder "
                        "matmuls (teacher_bf16/loss_bf16; parity-gated — "
                        "see scripts/pretrain_step_probe.py)")
    p.add_argument("--normalize", default="batch",
                   choices=["none", "batch", "layer"])
    p.add_argument("--dropout", type=float, default=0.15)
    p.add_argument("--code_dim", type=int, default=768)
    p.add_argument("--codebook_size", type=int, default=128)
    p.add_argument("--codebook_head", type=int, default=4)
    p.add_argument("--codebook_decay", type=float, default=0.8)
    p.add_argument("--commit_weight", type=float, default=10)
    p.add_argument("--ortho_reg_weight", type=float, default=1)
    p.add_argument("--ortho_reg_max_codes", type=int, default=32)
    p.add_argument("--moe", action="store_true")
    p.add_argument("--moe_layers", default="none",
                   choices=["none", "all", "last"])
    p.add_argument("--moe_experts", "--K", type=int, default=3)
    p.add_argument("--moe_tau", "--tau", type=float, default=1.0)
    p.add_argument("--lamda_env", type=float, default=0.0)
    p.add_argument("--pretrain_dataset", "--pt_data", default="synthetic")
    p.add_argument("--pretrain_run_id", "--pt_run_id", default="")
    p.add_argument("--pretrain_epochs", "--pt_epochs", "--epochs", type=int,
                   default=50)
    p.add_argument("--pretrain_lr", "--pt_lr", type=float, default=1e-4)
    p.add_argument("--pretrain_weight_decay", "--pt_decay", type=float,
                   default=1e-5)
    p.add_argument("--pretrain_batch_size", "--pt_batch", type=int,
                   default=1024)
    p.add_argument("--fanout", type=int, default=10)
    p.add_argument("--feat_p", type=float, default=0.2)
    p.add_argument("--edge_p", type=float, default=0.2)
    p.add_argument("--topo_recon_ratio", type=float, default=0.1)
    p.add_argument("--feat_lambda", type=float, default=100)
    p.add_argument("--topo_lambda", type=float, default=0.01)
    p.add_argument("--topo_sem_lambda", type=float, default=100)
    p.add_argument("--sem_lambda", type=float, default=1)
    p.add_argument("--sem_encoder_decay", type=float, default=0.99)
    p.add_argument("--use_schedular", "--use_scheduler", type=bool,
                   default=True)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--data_parallel", action="store_true",
                   help="data-parallel over all visible devices (psum grads "
                        "+ VQ codebook stats over the mesh)")
    p.add_argument("--donate", action="store_true",
                   help="donate train-state buffers (long TPU runs)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest full_<epoch>.npz bundle "
                        "under the run's checkpoint dir")
    p.add_argument("--halo_shards", type=int, default=0,
                   help="> 0 switches to FULL-GRAPH halo pretraining: the "
                        "merged graph node-sharded over this many devices "
                        "('edge' mesh axis, fused Pallas kernels), the "
                        "remaining devices forming a 'data' axis of "
                        "independent augmentation views + disjoint seed "
                        "slices (SURVEY.md §7.1 end state)")
    p.add_argument("--halo_hub", type=int, default=0,
                   help="hub-dense size for the halo layouts (single-edge-"
                        "type datasets only)")
    return p


def main():
    from stemgnn_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    parser = get_args()
    args = parser.parse_args()
    if args.use_params:
        preset = cfglib.load_yaml(osp.join(ROOT, "configs", "pretrain.yaml"))
        flat = {k: v for k, v in preset.items() if not isinstance(v, dict)}
        rename = {"epochs": "pretrain_epochs", "lr": "pretrain_lr",
                  "weight_decay": "pretrain_weight_decay",
                  "batch_size": "pretrain_batch_size",
                  "use_scheduler": "use_schedular"}
        flat = {rename.get(k, k): v for k, v in flat.items()}
        parser.set_defaults(**{k: v for k, v in flat.items()
                               if hasattr(args, k)})
        args = parser.parse_args()

    seed_everything(args.seed)

    weights_map = cfglib.load_yaml(osp.join(ROOT, "configs", "pt_data.yaml"))
    mix = weights_map.get(args.pretrain_dataset,
                          {args.pretrain_dataset: 1.0})
    names, weights = list(mix.keys()), list(mix.values())
    print(f"Pre-training on {names} (weights {weights})")
    datasets = [load_dataset(n, feat_dim=args.feat_dim, seed=args.seed,
                             text_encoder=args.text_encoder)
                for n in names]
    merged = merge_datasets(datasets)

    cfg = cfglib.PretrainConfig(
        encoder=cfglib.EncoderConfig(
            input_dim=args.feat_dim, hidden_dim=args.hidden_dim,
            num_layers=args.num_layers, backbone=args.backbone,
            normalize=args.normalize, dropout=args.dropout,
            activation=args.activation, moe=args.moe,
            num_experts=args.moe_experts, tau=args.moe_tau,
            moe_layers=args.moe_layers,
            compute_dtype="bfloat16" if (args.bf16 or args.mixed_precision)
            else "float32"),
        vq=cfglib.VQConfig(
            dim=args.hidden_dim, codebook_size=args.codebook_size,
            codebook_dim=args.code_dim, heads=args.codebook_head,
            decay=args.codebook_decay, commitment_weight=args.commit_weight,
            orthogonal_reg_weight=args.ortho_reg_weight,
            orthogonal_reg_max_codes=args.ortho_reg_max_codes,
            compute_dtype="bfloat16" if args.mixed_precision
            else "float32"),
        epochs=args.pretrain_epochs, lr=args.pretrain_lr,
        weight_decay=args.pretrain_weight_decay,
        batch_size=args.pretrain_batch_size, fanout=args.fanout,
        feat_p=args.feat_p, edge_p=args.edge_p,
        topo_recon_ratio=args.topo_recon_ratio,
        feat_lambda=args.feat_lambda, topo_lambda=args.topo_lambda,
        topo_sem_lambda=args.topo_sem_lambda, sem_lambda=args.sem_lambda,
        sem_encoder_decay=args.sem_encoder_decay,
        lamda_env=args.lamda_env, use_scheduler=bool(args.use_schedular),
        teacher_bf16=args.mixed_precision, loss_bf16=args.mixed_precision,
        save_every=args.save_every, seed=args.seed)

    run_id = args.pretrain_run_id or "default"
    save_root = osp.join(ROOT, "ckpts", "pretrain_model", run_id)
    os.makedirs(save_root, exist_ok=True)
    # Persist the config next to the checkpoints (replaces the reference's
    # parse-hyperparams-from-directory-name hack, SURVEY.md §5 config note).
    import dataclasses
    import json
    with open(osp.join(save_root, "config.json"), "w") as f:
        json.dump({"encoder": dataclasses.asdict(cfg.encoder),
                   "vq": dataclasses.asdict(cfg.vq),
                   "pretrain": {k: v for k, v in dataclasses.asdict(cfg).items()
                                if k not in ("encoder", "vq")}},
                  f, indent=2, default=str)
    if args.halo_shards:
        import jax

        from stemgnn_tpu.parallel.halo_pretrain import run_pretrain_halo
        from stemgnn_tpu.parallel.mesh import make_mesh
        devs = jax.devices()
        ne = args.halo_shards
        nd = max(len(devs) // ne, 1)
        mesh = make_mesh(axis_sizes=(nd, ne), axis_names=("data", "edge"),
                         devices=devs[: nd * ne])
        print(f"Full-graph halo pretrain on a {nd}x{ne} (data x edge) mesh")
        run_pretrain_halo(merged, cfg, mesh, weights=weights,
                          save_root=save_root, hub_size=args.halo_hub,
                          interpret=jax.default_backend() != "tpu")
        print(f"Checkpoints saved under {save_root}")
        return
    mesh = None
    if args.data_parallel:
        from stemgnn_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
        print(f"Data-parallel over {mesh.devices.size} devices")
    run_pretrain(merged, cfg, weights=weights, save_root=save_root,
                 max_steps=args.max_steps, mesh=mesh, resume=args.resume,
                 donate=args.donate)
    print(f"Checkpoints saved under {save_root}")


if __name__ == "__main__":
    main()
