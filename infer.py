#!/usr/bin/env python
"""Batch inference / export CLI — the serving entry point.

The reference has no inference driver (its artifacts live only inside the
finetune process); this closes the deployment story:

  * ``--mode encode`` (default): load a PRETRAIN checkpoint
    (``ckpts/pretrain_model/<run_id>/{encoder,vq}_<epoch>.npz``), encode a
    dataset's full graph, and export per-node **embeddings** [N, D],
    **quantized embeddings** [N, D] and **VQ code indices** [N, H] as one
    npz — the model's reusable artifacts (the VQ codes are the pretrained
    graph "tokens").  Graph-task datasets export the per-MOLECULE pooled
    analogs [G, D] / [G, H].
  * ``--mode predict``: load a task model saved by
    ``finetune.py --save_model`` and export class probabilities for every
    node (edge, for link tasks; molecule, for graph tasks — multitask
    sigmoid probabilities).

Examples:
  python infer.py --finetune_dataset WN18RR --text_encoder tfidf \\
      --pretrain_run_id r3mix --pretrain_model_epoch 50 --out wn_codes.npz
  python infer.py --mode predict --model ckpts/finetune_model/wn.npz \\
      --finetune_dataset WN18RR --text_encoder tfidf --out preds.npz
"""

import argparse
import os.path as osp

import numpy as np

ROOT = osp.dirname(osp.abspath(__file__))


def get_args():
    p = argparse.ArgumentParser("Infer")
    p.add_argument("--mode", default="encode", choices=["encode", "predict"])
    p.add_argument("--finetune_dataset", "--dataset", "--data",
                   default="cora_synthetic")
    p.add_argument("--feat_dim", type=int, default=768)
    p.add_argument("--text_encoder", default="hash")
    p.add_argument("--pretrain_run_id", default="")
    p.add_argument("--pretrain_path", default="")
    p.add_argument("--pretrain_model_epoch", type=int, default=50)
    p.add_argument("--model", default="",
                   help="task-model npz from finetune.py --save_model "
                        "(mode=predict)")
    p.add_argument("--out", default="inference_out.npz")
    p.add_argument("--seed", type=int, default=42)
    return p


def main():
    from stemgnn_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    args = get_args().parse_args()

    import jax

    from stemgnn_tpu.data.registry import dataset2task, load_dataset
    from stemgnn_tpu.models import task as task_model
    from stemgnn_tpu.train.graph_setup import fused_full_graph
    from stemgnn_tpu.utils import checkpoint as ckpt

    name = args.finetune_dataset
    task = dataset2task[name]
    ds = load_dataset(name, feat_dim=args.feat_dim, seed=args.seed,
                      text_encoder=args.text_encoder)

    if args.mode == "predict":
        if not args.model:
            raise SystemExit("--mode predict needs --model (a task-model "
                             "npz from finetune.py --save_model)")
        payload = ckpt.load_pytree(args.model)
        meta = ckpt.load_meta(args.model) or {}
        from stemgnn_tpu.core.config import FinetuneConfig, from_dict
        cfg = from_dict(FinetuneConfig(), meta["config"])
        params, state = payload["params"], payload["state"]
        if task == "graph":
            # pooled per-molecule multitask probabilities (the serving
            # analog of the reference's AUC scores, task/graph.py:60-97)
            from stemgnn_tpu.train.finetune_loop import graph_task_predict
            graphs, labels, _ = ds
            logits = graph_task_predict(graphs, labels.shape[1], cfg,
                                        params, state)
            probs = 1.0 / (1.0 + np.exp(-logits))
            np.savez_compressed(args.out, probs=probs, logits=logits,
                                pred=(probs > 0.5).astype(np.int8))
            print(f"wrote {args.out}: probs {probs.shape} "
                  f"(per-molecule multitask)")
            return
        graph = fused_full_graph(ds, cfg)
        import jax.numpy as jnp
        z, state2, _ = task_model.encode(params, state, cfg, graph,
                                         training=False)
        if task == "link":
            z = (z[graph.senders] + z[graph.receivers]) / 2.0
            row_mask = graph.edge_mask
            n_items = ds.num_edges
        else:
            row_mask = graph.node_mask
            n_items = ds.num_nodes
        logits, _, _ = task_model.task_logits(params, state2, cfg, z,
                                              training=False, mask=row_mask)
        probs = np.asarray(jax.nn.softmax(jnp.mean(logits, axis=1),
                                          axis=-1))[:n_items]
        np.savez_compressed(args.out, probs=probs,
                            pred=probs.argmax(-1))
        print(f"wrote {args.out}: probs {probs.shape}")
        return

    # ---- mode=encode: pretrained encoder + VQ -> embeddings/codes
    from stemgnn_tpu.core.config import (EncoderConfig, FinetuneConfig,
                                         VQConfig)
    from stemgnn_tpu.train.pretrain_loop import load_pretrained_for_finetune
    from stemgnn_tpu.vq import vq_apply

    path = args.pretrain_path
    if not path:
        run_id = args.pretrain_run_id or "default"
        path = osp.join(ROOT, "ckpts", "pretrain_model", run_id)
    enc_p = osp.join(path, f"encoder_{args.pretrain_model_epoch}.npz")
    vq_p = osp.join(path, f"vq_{args.pretrain_model_epoch}.npz")
    pre = load_pretrained_for_finetune(enc_p, vq_p)

    # adopt architecture from config.json next to the checkpoint when present
    enc_kw = dict(input_dim=args.feat_dim, hidden_dim=args.feat_dim,
                  num_layers=2, normalize="batch", dropout=0.0)
    vq_kw = dict(dim=args.feat_dim, codebook_size=128,
                 codebook_dim=args.feat_dim, heads=4)
    cfg_json = osp.join(path, "config.json")
    if osp.exists(cfg_json):
        import json
        with open(cfg_json) as f:
            saved = json.load(f)
        for k in ("hidden_dim", "num_layers", "backbone", "normalize"):
            if k in saved.get("encoder", {}):
                enc_kw[k] = saved["encoder"][k]
        for k_src, k_dst in (("codebook_size", "codebook_size"),
                             ("codebook_dim", "codebook_dim"),
                             ("heads", "heads")):
            if k_src in saved.get("vq", {}):
                vq_kw[k_dst] = saved["vq"][k_src]
    cfg = FinetuneConfig(encoder=EncoderConfig(**enc_kw),
                         vq=VQConfig(**vq_kw), dataset=name, task=task)

    params = {"encoder": pre["encoder_params"], "vq": pre["vq_params"]}
    state = {"encoder": pre["encoder_state"], "vq": pre["vq_state"]}
    if task == "graph":
        # per-molecule pooled embeddings + VQ codes (the molecule-level
        # analog of the node export below)
        from stemgnn_tpu.train.finetune_loop import graph_task_encode
        graphs, _, _ = ds
        pooled, quant, codes = graph_task_encode(graphs, cfg, params, state)
        np.savez_compressed(args.out, embeddings=pooled, quantized=quant,
                            codes=codes)
        print(f"wrote {args.out}: embeddings {pooled.shape}, codes "
              f"{codes.shape} (per-molecule)")
        return
    graph = fused_full_graph(ds, cfg)
    from stemgnn_tpu.nn.encoder import encoder_apply
    z, _, _ = encoder_apply(
        params["encoder"], state["encoder"], cfg.encoder, graph.node_feat,
        graph.senders, graph.receivers, edge_feat=graph.edge_feat,
        edge_mask=graph.edge_mask, node_mask=graph.node_mask,
        training=False, layout=graph.layout, edge_table=graph.edge_table)
    res = vq_apply(params["vq"], state["vq"], cfg.vq, z, training=False,
                   mask=graph.node_mask)
    n = ds.num_nodes
    np.savez_compressed(
        args.out,
        embeddings=np.asarray(z)[:n],
        quantized=np.asarray(res["quantize"])[:n],
        codes=np.asarray(res["indices"])[:n])
    print(f"wrote {args.out}: embeddings [{n}, {z.shape[1]}], codes "
          f"[{n}, {np.asarray(res['indices']).shape[-1]}]")


if __name__ == "__main__":
    main()
