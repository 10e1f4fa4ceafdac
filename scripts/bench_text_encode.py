#!/usr/bin/env python
"""Text-encode stage throughput on the TPU (r3 VERDICT item 5).

The reference's feature pipeline runs every node/edge/class text through a
sentence-transformer (multi-qa-distilbert-cos-v1, 768-dim —
dataset/data_utils.py:26,69-124) on GPU.  This measures the first-party
pure-JAX DistilBERT forward (nn/distilbert.py — the JaxSentenceEncoder
path) with random weights at realistic shapes, and projects corpus
wall-clock for cora (2.7K texts) and arxiv (169K texts).

Dependent-scan timing discipline per CLAUDE.md (the tunnel lies to naive
timers).  Run on the chip: `python scripts/bench_text_encode.py`.
"""

import argparse
import json
import os.path as osp
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))
from stemgnn_tpu.utils.jax_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def bench_fwd(params, cfg, B, L, dtype, iters=8, reps=3):
    from stemgnn_tpu.nn.distilbert import (distilbert_apply,
                                           mean_pool_normalize)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)
    p = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)

    @jax.jit
    def run(p, ids, mask):
        def body(c, _):
            h = distilbert_apply(p, cfg, ids, mask)
            emb = mean_pool_normalize(h, mask).astype(jnp.float32)
            probe = emb[0, 0]
            return c + probe * 1e-9, probe
        c, probes = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return jnp.sum(probes)

    float(run(p, ids, mask))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(p, ids, mask))
        ts.append(max((time.perf_counter() - t0 - 0.003) / iters, 1e-9))
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    from stemgnn_tpu.nn.distilbert import DistilBertConfig, distilbert_init

    cfg = DistilBertConfig()          # the ST shape: 6 layers, 768, 12 heads
    params = distilbert_init(jax.random.PRNGKey(0), cfg)
    rows = []
    for dtype, dn in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        for B, L in ((128, 128), (256, 128), (128, 256), (64, 512)):
            dt = bench_fwd(params, cfg, B, L, dtype)
            texts_s = B / dt
            toks_s = B * L / dt
            rows.append({"dtype": dn, "batch": B, "seq": L,
                         "ms_per_batch": round(dt * 1e3, 2),
                         "texts_per_s": round(texts_s),
                         "tokens_per_s": round(toks_s)})
            print(f"{dn} B={B} L={L}: {dt*1e3:7.2f} ms/batch  "
                  f"{texts_s:8.0f} texts/s  {toks_s/1e6:6.2f}M tok/s",
                  flush=True)
    # Projection at the realistic operating point (L=256 covers title+
    # abstract for nearly all arxiv papers; bf16 weights)
    best = max((r for r in rows if r["dtype"] == "bf16" and r["seq"] == 256),
               key=lambda r: r["texts_per_s"])
    for name, n_texts in (("cora", 2708), ("pubmed", 19717),
                          ("arxiv", 169343)):
        secs = n_texts / best["texts_per_s"]
        print(f"projected {name} ({n_texts} texts, L<=256, bf16): "
              f"{secs:.1f} s", flush=True)
    if args.json:
        print(json.dumps(rows))


if __name__ == "__main__":
    main()
