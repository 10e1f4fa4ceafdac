#!/usr/bin/env python
"""Finetune driver CLI.

Re-design of /root/reference/STEM-GNN/finetune.py: per-task/per-dataset YAML
presets (config/finetune.yaml nesting), pretrain checkpoint resolution
(ckpts/pretrain_model/<run_id>/{encoder,vq}_{epoch}.npz), frozen-VQ default,
repeated splits with per-split seed, best-epoch selection and final mean±std.

Examples:
  python finetune.py --use_params --finetune_dataset cora_synthetic
  python finetune.py --finetune_dataset kg_synthetic --epochs 100
"""

import argparse
import os.path as osp

from stemgnn_tpu.core import config as cfglib
from stemgnn_tpu.data.registry import dataset2task, load_dataset
from stemgnn_tpu.train.finetune_loop import run_finetune
from stemgnn_tpu.train.pretrain_loop import load_pretrained_for_finetune
from stemgnn_tpu.utils.seeding import seed_everything

ROOT = osp.dirname(osp.abspath(__file__))


def get_args():
    p = argparse.ArgumentParser("Finetune")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--gpu", type=int, default=0,
                   help="accepted for reference-CLI compatibility "
                        "(utils/args.py:10); device selection is jax-native "
                        "here and the flag is ignored")
    p.add_argument("--use_params", action="store_true")
    p.add_argument("--setting", default="standard", choices=["standard"])
    p.add_argument("--pretrain_dataset", "--pt_data", default="na")
    p.add_argument("--pretrain_task", "--pt_task", default="all")
    p.add_argument("--pretrain_model_epoch", "--pt_epochs", type=int,
                   default=25)
    p.add_argument("--pretrain_run_id", "--pt_run_id", default="")
    p.add_argument("--pretrain_seed", "--pt_seed", type=int, default=42,
                   help="reference-CLI compatibility (run-id bookkeeping, "
                        "utils/args.py:75); checkpoints here resolve by "
                        "--pretrain_run_id directly")
    p.add_argument("--pretrain_path", default="")
    p.add_argument("--feat_dim", "--input_dim", type=int, default=768)
    p.add_argument("--hidden_dim", type=int, default=768)
    p.add_argument("--num_layers", type=int, default=2)
    p.add_argument("--activation", "--act", default="relu")
    p.add_argument("--backbone", default="sage")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 encoder activations + VQ projections")
    p.add_argument("--normalize", default="batch")
    p.add_argument("--dropout", type=float, default=0.15)
    p.add_argument("--code_dim", type=int, default=768)
    p.add_argument("--codebook_size", type=int, default=128)
    p.add_argument("--codebook_head", type=int, default=4)
    p.add_argument("--codebook_decay", type=float, default=0.8)
    p.add_argument("--commit_weight", type=float, default=0.25)
    p.add_argument("--ortho_reg_weight", type=float, default=1)
    p.add_argument("--ortho_reg_max_codes", type=int, default=32)
    p.add_argument("--use_vq", type=int, default=1, choices=[0, 1])
    p.add_argument("--moe", action="store_true")
    p.add_argument("--moe_layers", default="none",
                   choices=["none", "all", "last"])
    p.add_argument("--moe_experts", "--K", type=int, default=3)
    p.add_argument("--moe_tau", "--tau", type=float, default=1.0)
    p.add_argument("--lamda_env", type=float, default=0.0)
    p.add_argument("--finetune_dataset", "--dataset", "--data",
                   default="cora_synthetic")
    p.add_argument("--freeze_vq", type=int, default=1, choices=[0, 1])
    p.add_argument("--repeat", type=int, default=10)
    p.add_argument("--finetune_epochs", "--epochs", type=int, default=1000)
    p.add_argument("--early_stop", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=0)
    p.add_argument("--finetune_lr", "--lr", type=float, default=1e-3)
    p.add_argument("--finetune_seed", type=int, default=None)
    p.add_argument("--separate_decoder_for_each_head", type=int, default=1)
    p.add_argument("--decoder_jac_coeff", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--text_encoder", default="hash",
                   choices=["hash", "tfidf", "ST", "st", "e5",
                            "llama2_7b", "llama2_13b"],
                   help="text featurizer: hash/tfidf run offline; st/e5/"
                        "llama2_* use the first-party JAX forwards from a "
                        "local weights snapshot (nn/{distilbert,bert,"
                        "llama}.py)")
    p.add_argument("--save_model", default="",
                   help="write the best-val task model (params + state + "
                        "config) to this npz for infer.py --mode predict")
    p.add_argument("--eval_every", type=int, default=1,
                   help="graph task: run the 3-split AUC eval every K "
                        "epochs (1 = reference protocol; at chempcba scale "
                        "eval dominates epoch wall time)")
    p.add_argument("--eval_bf16", type=int, default=0, choices=[0, 1],
                   help="graph task: bf16 eval forward (training stays "
                        "f32; AUC is a rank statistic — parity-tested)")
    p.add_argument("--eval_batch_size", type=int, default=0,
                   help="graph task: eval batch size (0 = batch_size; "
                        "larger eval batches cut the compute-bound AUC "
                        "pass's dispatch/padding overhead)")
    p.add_argument("--eval_train_auc", type=int, default=1, choices=[0, 1],
                   help="graph task: evaluate the train split's AUC each "
                        "eval (1 = reference protocol; 0 skips ~80%% of "
                        "the eval compute, train metric reports NaN)")
    p.add_argument("--donate", action="store_true",
                   help="donate train-state buffers (long TPU runs)")
    p.add_argument("--eval_chunked", type=int, default=0, choices=[0, 1],
                   help="layer-wise streaming eval (huge graphs)")
    p.add_argument("--use_fused_layout", type=int, default=1, choices=[0, 1],
                   help="full-batch TPU: precomputed edge layout -> fused "
                        "Pallas scatter + hub-dense aggregation")
    p.add_argument("--hub_size", type=int, default=2048,
                   help="dense hub block size (0 disables hub-dense)")
    p.add_argument("--halo_balance", action="store_true",
                   help="degree-balanced node relabeling before the halo "
                        "partition (equalizes per-shard edge load on "
                        "power-law graphs)")
    p.add_argument("--halo_order", default="none",
                   choices=["none", "balance", "rcm", "community"],
                   help="node ordering before the halo partition: balance "
                        "(= --halo_balance) equalizes shard load but "
                        "destroys locality; rcm gives contiguous-community "
                        "ownership (fewer boundary edges + windowed-kernel "
                        "locality)")
    p.add_argument("--reorder", default="auto",
                   choices=["auto", "off", "rcm", "degree", "community"],
                   help="single-device full-batch locality relabel "
                        "(cfg.reorder; auto = RCM when the break-even gate "
                        "predicts the windowed kernels win)")
    p.add_argument("--halo_shards", type=int, default=0,
                   help="> 0: full-graph NODE finetune with the graph "
                        "node-sharded over this many devices (halo "
                        "all_to_all exchange on the fused Pallas kernels, "
                        "parallel/full_graph.py:run_finetune_halo_parallel)")
    return p


def main():
    from stemgnn_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    parser = get_args()
    args = parser.parse_args()
    name = args.finetune_dataset
    task = dataset2task[name]
    if args.use_params:
        presets = cfglib.load_yaml(osp.join(ROOT, "configs", "finetune.yaml"))
        preset = presets.get(task, {}).get(name, {})
        flat = {}
        for k, v in preset.items():
            if k == "encoder":
                flat.update(v)
            elif k == "dataset":
                flat["finetune_dataset"] = v
            elif k == "epochs":
                flat["finetune_epochs"] = v
            elif k == "lr":
                flat["finetune_lr"] = v
            else:
                flat[k] = v
        parser.set_defaults(**{k: v for k, v in flat.items()
                               if hasattr(args, k)})
        args = parser.parse_args()

    # Sweep agents override hyperparameters through wandb.config
    # (reference finetune.py:314-321); offline this is a no-op.
    from stemgnn_tpu.utils.observability import apply_wandb_sweep_config
    args = apply_wandb_sweep_config(args, "STEM-GNN-Finetune",
                                    debug=args.debug)
    name = args.finetune_dataset
    task = dataset2task[name]

    seed_everything(args.seed)
    ds = load_dataset(name, feat_dim=args.feat_dim, seed=args.seed,
                      text_encoder=args.text_encoder)
    if task == "graph":
        graphs, labels, split = ds
        num_classes = labels.shape[1]
        payload = (graphs, labels, split)
    else:
        num_classes = ds.num_classes
        payload = ds

    pretrained = None
    path = args.pretrain_path
    if not path and args.pretrain_dataset != "na":
        run_id = args.pretrain_run_id or "default"
        path = osp.join(ROOT, "ckpts", "pretrain_model", run_id)
    if path:
        enc_p = osp.join(path, f"encoder_{args.pretrain_model_epoch}.npz")
        vq_p = osp.join(path, f"vq_{args.pretrain_model_epoch}.npz")
        if not osp.exists(enc_p):
            raise FileNotFoundError(
                f"Cannot find encoder checkpoint {enc_p}. "
                "Set --pretrain_path to a valid folder.")
        pretrained = load_pretrained_for_finetune(enc_p, vq_p)
        print("Loaded pretrained encoder and VQ.")
        # Adopt the architecture hyperparams saved next to the checkpoint
        # (replaces the reference's MoE-settings-from-dir-name inference,
        # e.g. degree_shift_ood.py:472-494).
        cfg_json = osp.join(path, "config.json")
        if osp.exists(cfg_json):
            import json
            with open(cfg_json) as f:
                saved = json.load(f)
            enc_saved = saved.get("encoder", {})
            vq_saved = saved.get("vq", {})
            for k_src, k_dst in [("hidden_dim", "hidden_dim"),
                                 ("num_layers", "num_layers"),
                                 ("backbone", "backbone"),
                                 ("moe", "moe"),
                                 ("num_experts", "moe_experts"),
                                 ("tau", "moe_tau"),
                                 ("moe_layers", "moe_layers")]:
                if k_src in enc_saved:
                    setattr(args, k_dst, enc_saved[k_src])
            for k_src, k_dst in [("codebook_size", "codebook_size"),
                                 ("codebook_dim", "code_dim"),
                                 ("heads", "codebook_head")]:
                if k_src in vq_saved:
                    setattr(args, k_dst, vq_saved[k_src])
            print("Adopted architecture hyperparams from config.json")

    cfg = cfglib.FinetuneConfig(
        encoder=cfglib.EncoderConfig(
            input_dim=args.feat_dim, hidden_dim=args.hidden_dim,
            num_layers=args.num_layers, backbone=args.backbone,
            normalize=args.normalize, dropout=args.dropout,
            activation=args.activation, moe=args.moe,
            num_experts=args.moe_experts, tau=args.moe_tau,
            moe_layers=args.moe_layers,
            compute_dtype="bfloat16" if args.bf16 else "float32"),
        vq=cfglib.VQConfig(
            dim=args.hidden_dim, codebook_size=args.codebook_size,
            codebook_dim=args.code_dim, heads=args.codebook_head,
            decay=args.codebook_decay, commitment_weight=args.commit_weight,
            orthogonal_reg_weight=args.ortho_reg_weight,
            orthogonal_reg_max_codes=args.ortho_reg_max_codes,
            kmeans_init=True),
        dataset=name, task=task, epochs=args.finetune_epochs,
        early_stop=args.early_stop, batch_size=args.batch_size,
        lr=args.finetune_lr,
        repeat=1 if args.finetune_seed is not None else args.repeat,
        use_vq=bool(args.use_vq), freeze_vq=bool(args.freeze_vq),
        separate_decoder_for_each_head=bool(args.separate_decoder_for_each_head),
        decoder_jac_coeff=args.decoder_jac_coeff, lamda_env=args.lamda_env,
        num_classes=num_classes, eval_chunked=bool(args.eval_chunked),
        use_fused_layout=bool(args.use_fused_layout), hub_size=args.hub_size,
        reorder=args.reorder, eval_every=args.eval_every,
        eval_bf16=bool(args.eval_bf16),
        eval_batch_size=args.eval_batch_size,
        eval_train_auc=bool(args.eval_train_auc))

    if args.halo_shards:
        if task != "node":
            raise SystemExit("--halo_shards supports the node task")
        import jax

        from stemgnn_tpu.parallel.full_graph import run_finetune_halo_parallel
        from stemgnn_tpu.parallel.mesh import make_mesh
        devs = jax.devices()[: args.halo_shards]
        mesh = make_mesh(axis_names=("edge",), devices=devs)
        print(f"Halo full-graph finetune over {len(devs)} devices")
        logger = run_finetune_halo_parallel(
            payload, cfg, mesh, pretrained=pretrained, verbose=True,
            hub_size=args.hub_size, balance=args.halo_balance,
            order=args.halo_order,
            # auto: fused on TPU (cfg.use_fused_layout), XLA path elsewhere
            fused=None if args.use_fused_layout else False)
    else:
        logger = run_finetune(payload, cfg, pretrained=pretrained,
                              verbose=True, donate=args.donate,
                              save_model_to=args.save_model)
    best = logger.get_best()
    print("final/train: {:.2f} ± {:.2f}".format(best["train"]["mean"],
                                                best["train"]["std"]))
    print("final/val:   {:.2f} ± {:.2f}".format(best["val"]["mean"],
                                                best["val"]["std"]))
    print("final/test:  {:.2f} ± {:.2f}".format(best["test"]["mean"],
                                                best["test"]["std"]))

    # Metric schema mirrors the reference's final/ payload (finetune.py:280-291)
    from stemgnn_tpu.utils.observability import MetricsLogger
    ml = MetricsLogger(backends=("jsonl",),
                       jsonl_path=osp.join(ROOT, "metrics",
                                           f"finetune_{name}.jsonl"),
                       debug=args.debug)
    ml.log({f"final/{k}_{m}": best[k][m]
            for k in ("train", "val", "test") for m in ("mean", "std")})
    for run_idx, rec in logger.get_best_raw().items():
        ml.log({f"best/{k}": rec[k] for k in ("train", "val", "test")},
               step=run_idx)
    ml.finish()


if __name__ == "__main__":
    main()
