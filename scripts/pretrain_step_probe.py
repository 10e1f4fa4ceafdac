"""FULL pretrain-step roofline at bench scale (r4 VERDICT item 1).

Extends the phase-probe discipline (scripts/phase_probe.py: the aggregate
alone) to the whole reference pretrain step at arxiv/bench shapes: encoder
(2 fused aggregates + lin_l/lin_r matmuls + BatchNorm) + 4-head cosine VQ +
the four recon losses + the EMA-teacher second encoder pass
(STEM-GNN/model/pt_model.py:93,116-142) + AdamW/clip/EMA updates.

Everything is timed single-chip with the two-point dependent-scan method
(scripts/_bench_common.py) — full train steps scan the (params, teacher,
opt, state, key) carry exactly like the epoch-chunked training loops, so
the measured marginal step is the training-realistic one.  No shard_map
anywhere (the scan+shard_map+collectives combination wedges the tunneled
chip — docs/wedge.md).

Phases:
  full_step            the complete jitted train step (aug + 4 losses +
                       AdamW + teacher EMA), dynamic edge-dropout masks
  full_step_static     same with edge_p=0 (static layout masks)
  encoder_fwd_bwd      student encoder alone, fwd+bwd (2 layers)
  teacher_fwd          grad-free teacher pass, f32 (the sem_recon teacher)
  teacher_fwd_bf16     same with compute_dtype=bfloat16 (candidate lever)
  vq_fwd_bwd           VQ alone at [N, D], fwd+bwd
  losses_fwd_bwd       the 4 recon losses given fixed (query, tz), fwd+bwd
  optimizer            AdamW + clip + teacher EMA on fixed grads

NOTE on topo_sem in ``full_step``: the single-chip ``pretrain_forward``
reads per-edge features from ``orig_g.edge_feat`` (None under the fused
layout), so the full-step numbers here EXCLUDE the topo_sem term while
``losses_fwd_bwd`` INCLUDES its [num, 2D] @ [2D, D] decode (measured
standalone) — the halo path (S>=1) runs topo_sem from the type table
(parallel/halo_pretrain.py:220-227) and is timed separately by
scripts/bench_halo_chunk.py.
"""

import argparse
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))
sys.path.insert(0, _HERE)

import numpy as np
import jax
import jax.numpy as jnp

from _bench_common import _two_point  # noqa: E402


def build_bench_graph(n=169_343, e0=1_166_243, d=768):
    from stemgnn_tpu.core.graph import make_graph, round_up
    from stemgnn_tpu.data.synthetic import random_power_law_graph
    from stemgnn_tpu.ops.edge_layout import build_edge_layout

    _, s_raw, r_raw, _ = random_power_law_graph(n, e0, d, seed=0,
                                                with_edge_feat=False)
    pair = np.unique(np.stack([np.concatenate([s_raw, r_raw]),
                               np.concatenate([r_raw, s_raw])], 1), axis=0)
    s_np, r_np = pair[:, 0].astype(np.int32), pair[:, 1].astype(np.int32)
    e = s_np.shape[0]
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, d)).astype(np.float32)
    g = make_graph(x, s_np, r_np, node_pad_to=round_up(n, 128))
    e_pad = g.num_edges_padded
    s_pad = np.zeros(e_pad, np.int32)
    r_pad = np.zeros(e_pad, np.int32)
    s_pad[:e], r_pad[:e] = s_np, r_np
    mask = np.arange(e_pad) < e
    # T=1 type table (the arxiv-style single edge text), auto-H hubs
    lay = build_edge_layout(s_pad, r_pad, g.num_nodes_padded,
                            xe_ids=np.zeros(e_pad, np.int32), edge_mask=mask,
                            edge_chunk=512, hub_size=2048, sc_hub_size=2048,
                            num_edge_types=1, feat_dim_hint=d)
    et = jnp.asarray(rng.standard_normal((1, d)).astype(np.float32))
    g = g.replace(layout=jax.device_put(lay), edge_table=et)
    return g, e


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--phases", default="all",
                    help="comma list or 'all'")
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes (CPU smoke test)")
    args = ap.parse_args()

    import optax

    from stemgnn_tpu.core.config import PretrainConfig, EncoderConfig, VQConfig
    from stemgnn_tpu.models.pretrain import (ema_update_teacher,
                                             pretrain_forward, pretrain_init)
    from stemgnn_tpu.nn.encoder import encoder_apply
    from stemgnn_tpu.nn.layers import linear_apply
    from stemgnn_tpu.train import augment
    from stemgnn_tpu.train.optim import make_optimizer
    from stemgnn_tpu.vq import vq_apply

    if args.small:
        d = 64
        g, e = build_bench_graph(n=2_000, e0=10_000, d=d)
    else:
        d = 768
        g, e = build_bench_graph(d=d)
    n_pad = g.num_nodes_padded
    print(f"# graph: {n_pad} padded nodes, {e} edges, d={d}", flush=True)

    cfg = PretrainConfig(
        encoder=EncoderConfig(input_dim=d, hidden_dim=d, num_layers=2,
                              normalize="batch", dropout=0.15),
        vq=VQConfig(dim=d, codebook_size=128, codebook_dim=d, heads=4),
        batch_size=0)
    import dataclasses
    cfg_static = dataclasses.replace(cfg, edge_p=0.0)

    params, teacher, state = pretrain_init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(cfg.lr, cfg.weight_decay, grad_clip=cfg.grad_clip)
    opt_state = tx.init(params)

    # ---------------- full train step (scan over the train-state carry)
    def time_full_step(cfg_v, label, drop_hash: bool = False):
        def body_fn(carry, g):
            params, teacher, opt_state, state, key = carry
            key, k_step = jax.random.split(key)
            k_f, k_e, k_fwd = jax.random.split(k_step, 3)
            aug_feat = augment.mask_feature(k_f, g.node_feat, cfg_v.feat_p)
            drop_seed = None
            if cfg_v.edge_p == 0:
                aug_mask = g.edge_mask
            elif drop_hash:
                # hub-preserving pair-hash dropout (r5): no materialized
                # mask — the fused path masks the hub count matrices
                drop_seed = augment.dropout_edge_seed(k_e)
                aug_mask = g.edge_mask
            else:
                aug_mask = augment.dropout_edges_undirected(
                    k_e, g.senders, g.receivers, g.edge_mask, cfg_v.edge_p)
            aug_g = g.replace(node_feat=aug_feat, edge_mask=aug_mask)

            def loss_fn(p):
                return pretrain_forward(p, teacher, state, cfg_v, aug_g, g,
                                        bs=n_pad, rng=k_fwd, training=True,
                                        layout=g.layout,
                                        edge_table=g.edge_table,
                                        drop_seed=drop_seed)

            (loss, (aux, new_state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            teacher = ema_update_teacher(teacher, params["encoder"],
                                         cfg_v.sem_encoder_decay)
            return (params, teacher, opt_state, new_state, key), loss

        def make_run(length):
            @jax.jit
            def run(carry, g):
                carry, losses = jax.lax.scan(
                    lambda c, _: body_fn(c, g), carry, None, length=length)
                return jnp.sum(losses)
            return run

        carry0 = (params, teacher, opt_state, state, jax.random.PRNGKey(1))
        dt = _two_point(make_run, carry0, g, args.iters)
        print(f"{label}: {dt * 1e3:.2f} ms "
              f"({e / dt / 1e6:.1f}M edges/s-equivalent)", flush=True)
        return dt

    want = (args.phases.split(",") if args.phases != "all" else
            ["full", "encoder", "teacher", "vq", "losses", "optimizer"])

    res = {}
    if "full" in want:
        res["full_step"] = time_full_step(cfg, "full_step")
        res["full_step_static"] = time_full_step(cfg_static,
                                                 "full_step_static")

    if "full" in want or "drop" in want:
        # pair-hash (hub-preserving) dynamic edge dropout
        res["full_step_drop_hash"] = time_full_step(cfg, "full_step_drop_hash",
                                                    drop_hash=True)
        cfg_mp_d = dataclasses.replace(
            cfg, encoder=dataclasses.replace(cfg.encoder,
                                             compute_dtype="bfloat16"),
            vq=dataclasses.replace(cfg.vq, compute_dtype="bfloat16"),
            teacher_bf16=True, loss_bf16=True)
        res["full_step_mp_drop_hash"] = time_full_step(
            cfg_mp_d, "full_step_mp_drop_hash", drop_hash=True)

        # parity: same seed through drop_hash vs the materialized mask
        def one_drop_loss(use_hash):
            k_f, k_e, k_fwd = jax.random.split(jax.random.PRNGKey(11), 3)

            @jax.jit
            def run(params, teacher, state, gg):
                seed = augment.dropout_edge_seed(k_e)
                aug_feat = augment.mask_feature(k_f, gg.node_feat,
                                                cfg.feat_p)
                if use_hash:
                    aug_g = gg.replace(node_feat=aug_feat)
                    ds = seed
                else:
                    aug_g = gg.replace(
                        node_feat=aug_feat,
                        edge_mask=augment.dropout_edges_undirected_seeded(
                            seed, gg.senders, gg.receivers, gg.edge_mask,
                            cfg.edge_p))
                    ds = None
                loss, _ = pretrain_forward(
                    params, teacher, state, cfg, aug_g, gg, bs=n_pad,
                    rng=k_fwd, training=True, layout=gg.layout,
                    edge_table=gg.edge_table, drop_seed=ds)
                return loss
            return float(run(params, teacher, state, g))

        lh, lm_ = one_drop_loss(True), one_drop_loss(False)
        print(f"# drop parity: hash {lh:.5f} vs mask {lm_:.5f} "
              f"(rel {abs(lh - lm_) / max(abs(lm_), 1e-9):.2e})",
              flush=True)

    if "full" in want or "mixed" in want:
        # r5 mixed-precision configuration: encoder+teacher+VQ-projection
        # matmuls and loss decoders in bf16 (f32 BN/stats/reductions)
        cfg_mp = dataclasses.replace(
            cfg, encoder=dataclasses.replace(cfg.encoder,
                                             compute_dtype="bfloat16"),
            vq=dataclasses.replace(cfg.vq, compute_dtype="bfloat16"),
            teacher_bf16=True, loss_bf16=True)
        cfg_mp_static = dataclasses.replace(cfg_mp, edge_p=0.0)
        res["full_step_mp"] = time_full_step(cfg_mp, "full_step_mp")
        res["full_step_mp_static"] = time_full_step(cfg_mp_static,
                                                    "full_step_mp_static")
        # parity: one f32 vs one mp step from identical inits/rng
        def one_loss(cfg_v):
            k_f, _, k_fwd = jax.random.split(jax.random.PRNGKey(9), 3)
            loss, (aux, _) = jax.jit(
                lambda p, t, s, gg: pretrain_forward(
                    p, t, s, cfg_v, gg.replace(
                        node_feat=augment.mask_feature(k_f, gg.node_feat,
                                                       cfg_v.feat_p)),
                    gg, bs=n_pad, rng=k_fwd, training=True,
                    layout=gg.layout, edge_table=gg.edge_table))(
                params, teacher, state, g)
            return float(loss), {k: float(v)
                                 for k, v in aux["losses"].items()}
        lf, la = one_loss(cfg_static)
        lm, lb = one_loss(cfg_mp_static)
        rel = abs(lm - lf) / max(abs(lf), 1e-9)
        print(f"# mp parity: f32 loss {lf:.5f} vs mp loss {lm:.5f} "
              f"(rel {rel:.2e}); per-loss f32={la} mp={lb}", flush=True)

    # ---------------- components (scan x through a [N, D]-carry chain)
    from _bench_common import bench_scan

    x0 = jnp.asarray(np.asarray(g.node_feat))

    if "encoder" in want:
        def enc_fwd_bwd(x, g):
            def f(x):
                z, _, _ = encoder_apply(
                    params["encoder"], state["encoder"], cfg.encoder, x,
                    g.senders, g.receivers, edge_mask=g.edge_mask,
                    node_mask=g.node_mask, training=True,
                    rng=jax.random.PRNGKey(2), layout=g.layout,
                    edge_table=g.edge_table)
                return jnp.sum(z.astype(jnp.float32) ** 2)
            return jax.grad(f)(x)

        res["encoder_fwd_bwd"] = bench_scan(enc_fwd_bwd, x0, g,
                                            iters=args.iters)
        print(f"encoder_fwd_bwd: {res['encoder_fwd_bwd'] * 1e3:.2f} ms",
              flush=True)

    if "teacher" in want:
        def teacher_fwd(x, g, enc_cfg):
            z, _, _ = encoder_apply(
                teacher, state["sem_encoder"], enc_cfg, x,
                g.senders, g.receivers, edge_mask=g.edge_mask,
                node_mask=g.node_mask, training=True,
                rng=jax.random.PRNGKey(3), layout=g.layout,
                edge_table=g.edge_table)
            return jax.lax.stop_gradient(z).astype(jnp.float32)

        res["teacher_fwd"] = bench_scan(
            lambda x, g: teacher_fwd(x, g, cfg.encoder), x0, g,
            iters=args.iters)
        print(f"teacher_fwd: {res['teacher_fwd'] * 1e3:.2f} ms", flush=True)
        enc_bf16 = dataclasses.replace(cfg.encoder,
                                       compute_dtype="bfloat16")
        res["teacher_fwd_bf16"] = bench_scan(
            lambda x, g: teacher_fwd(x, g, enc_bf16), x0, g,
            iters=args.iters)
        print(f"teacher_fwd_bf16: {res['teacher_fwd_bf16'] * 1e3:.2f} ms",
              flush=True)

    if "vq" in want:
        def vq_fwd_bwd(x, g):
            def f(x):
                r = vq_apply(params["vq"], state["vq"], cfg.vq, x,
                             training=True, rng=jax.random.PRNGKey(4),
                             mask=g.node_mask)
                return jnp.sum(r["quantize"] ** 2) + r["loss"]
            return jax.grad(f)(x)

        res["vq_fwd_bwd"] = bench_scan(vq_fwd_bwd, x0, g, iters=args.iters)
        print(f"vq_fwd_bwd: {res['vq_fwd_bwd'] * 1e3:.2f} ms", flush=True)

    if "losses" in want:
        # fixed tz (teacher output) and upstream query; fwd+bwd through the
        # 4 losses wrt query — includes the topo_sem [num, 2D] decode the
        # single-chip full step skips.  tz rides in aux (a closure capture
        # would bake 520 MB of constants into the remote-compile payload)
        tz_fix = jnp.asarray(np.random.default_rng(1).standard_normal(
            (n_pad, d)).astype(np.float32))
        ratio = cfg.topo_recon_ratio
        num = max(int(g.num_edges_padded * ratio), 1)

        def losses_fwd_bwd(query, aux):
            g, tz_fix = aux

            def f(query):
                seed_mask = g.node_mask.astype(jnp.float32)
                recon = linear_apply(params["feat_dec"], query)
                se = (recon - g.node_feat) ** 2
                feat = jnp.sum(se * seed_mask[:, None]) / (
                    jnp.sum(seed_mask) * d)
                k = jax.random.PRNGKey(5)
                k1, k2 = jax.random.split(k)
                slots = jax.random.randint(k1, (num,), 0,
                                           g.num_edges_padded)
                w = g.edge_mask[slots].astype(jnp.float32)
                pos_s, pos_r = g.senders[slots], g.receivers[slots]
                from stemgnn_tpu.nn.decoders import inner_product_decode
                pos_p = inner_product_decode(params["topo_dec"], query,
                                             pos_s, pos_r, sigmoid=True)
                neg_s = jax.random.randint(k2, (num,), 0, n_pad)
                neg_p = inner_product_decode(params["topo_dec"], query,
                                             neg_s, pos_r, sigmoid=True)
                topo = (-jnp.sum(w * jnp.log(pos_p + 1e-15))
                        / jnp.maximum(jnp.sum(w), 1.0)
                        - jnp.mean(jnp.log(1.0 - neg_p + 1e-15)))
                zz = jnp.concatenate([query[pos_s], query[pos_r]], axis=-1)
                pred_e = linear_apply(params["topo_sem_dec"], zz)
                target = jnp.take(g.edge_table, jnp.zeros(num, jnp.int32),
                                  axis=0)
                topo_sem = jnp.sum(
                    w * jnp.mean((pred_e - target) ** 2, axis=-1)) / \
                    jnp.maximum(jnp.sum(w), 1.0)
                hproj = linear_apply(params["sem_projector"], query)

                def l2n(t):
                    return t / jnp.maximum(
                        jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)

                sem = jnp.sum((1.0 - jnp.sum(l2n(tz_fix) * l2n(hproj), -1))
                              * seed_mask) / jnp.maximum(jnp.sum(seed_mask),
                                                         1.0)
                return (cfg.feat_lambda * feat + cfg.topo_lambda * topo
                        + cfg.topo_sem_lambda * topo_sem
                        + cfg.sem_lambda * sem)
            return jax.grad(f)(query)

        res["losses_fwd_bwd"] = bench_scan(losses_fwd_bwd, x0, (g, tz_fix),
                                           iters=args.iters)
        print(f"losses_fwd_bwd (incl. topo_sem): "
              f"{res['losses_fwd_bwd'] * 1e3:.2f} ms", flush=True)

    if "mixed_comp" in want:
        # post-optimization composition: the f32 components re-measured
        # under the mixed-precision configuration
        import dataclasses as _dc
        enc_bf = _dc.replace(cfg.encoder, compute_dtype="bfloat16")
        x0_bf = x0.astype(jnp.bfloat16)

        def enc_fwd_bwd_mp(x, g):
            def f(x):
                z, _, _ = encoder_apply(
                    params["encoder"], state["encoder"], enc_bf, x,
                    g.senders, g.receivers, edge_mask=g.edge_mask,
                    node_mask=g.node_mask, training=True,
                    rng=jax.random.PRNGKey(2), layout=g.layout,
                    edge_table=g.edge_table)
                return jnp.sum(z.astype(jnp.float32) ** 2)
            return jax.grad(f)(x)

        dt = bench_scan(enc_fwd_bwd_mp, x0_bf, g, iters=args.iters)
        print(f"encoder_fwd_bwd_mp: {dt * 1e3:.2f} ms", flush=True)

        def vq_fwd_bwd_mp(x, g):
            def f(x):
                r = vq_apply(params["vq"], state["vq"], cfg.vq,
                             x.astype(jnp.bfloat16), training=True,
                             rng=jax.random.PRNGKey(4), mask=g.node_mask)
                return jnp.sum(r["quantize"] ** 2) + r["loss"]
            return jax.grad(f)(x)

        dt = bench_scan(vq_fwd_bwd_mp, x0, g, iters=args.iters)
        print(f"vq_fwd_bwd_mp (bf16 projections): {dt * 1e3:.2f} ms",
              flush=True)

        vq_bf = _dc.replace(cfg.vq, compute_dtype="bfloat16")

        def vq_fwd_bwd_bf16pipe(x, g):
            def f(x):
                r = vq_apply(params["vq"], state["vq"], vq_bf,
                             x.astype(jnp.bfloat16), training=True,
                             rng=jax.random.PRNGKey(4), mask=g.node_mask)
                return jnp.sum(r["quantize"] ** 2) + r["loss"]
            return jax.grad(f)(x)

        dt = bench_scan(vq_fwd_bwd_bf16pipe, x0, g, iters=args.iters)
        print(f"vq_fwd_bwd_bf16_pipeline: {dt * 1e3:.2f} ms", flush=True)

    if "optimizer" in want:
        grads_fix = jax.tree_util.tree_map(
            lambda p: jnp.ones_like(p) * 1e-6, params)

        def opt_step(x, aux):
            grads_fix, opt_state, params, teacher = aux
            # chain through x[0,0] so the scan carry stays honest
            gr = jax.tree_util.tree_map(
                lambda t: t + (x[0, 0] * 1e-20).astype(t.dtype), grads_fix)
            updates, new_opt = tx.update(gr, opt_state, params)
            p2 = optax.apply_updates(params, updates)
            t2 = ema_update_teacher(teacher, p2["encoder"],
                                    cfg.sem_encoder_decay)
            probe = (p2["feat_dec"]["w"][0, 0]
                     + t2["layers"][0]["lin_l"]["w"][0, 0]
                     + jax.tree_util.tree_leaves(new_opt)[0].reshape(-1)[0])
            return x.at[0, 0].add((probe * 1e-20).astype(x.dtype))

        res["optimizer"] = bench_scan(opt_step, x0,
                                      (grads_fix, opt_state, params,
                                       teacher), iters=args.iters)
        print(f"optimizer+teacher_ema: {res['optimizer'] * 1e3:.2f} ms",
              flush=True)

    if "full" in want and len(res) > 2:
        comp = sum(v for k, v in res.items()
                   if k in ("encoder_fwd_bwd", "teacher_fwd", "vq_fwd_bwd",
                            "losses_fwd_bwd", "optimizer"))
        print(f"# component sum {comp * 1e3:.2f} ms vs full_step "
              f"{res['full_step'] * 1e3:.2f} ms "
              f"(residual {(res['full_step'] - comp) * 1e3:+.2f} ms; "
              f"full_step lacks topo_sem, components lack augmentation)",
              flush=True)


if __name__ == "__main__":
    main()
