#!/usr/bin/env python
"""Probe: do int8 MXU (2x rate) or output/operand dtype tricks beat the bf16
hub-dense matmuls through XLA on this chip (r3 VERDICT item 1)?

Hub blocks at bench shapes (N=169472 padded, H=768, D=768):
  * gather-hub:  CNT [N, H] @ f(x_hub) [H, D] -> [N, D]   (big output write)
  * scatter-hub: sc_cnt [H, N] @ f(x) [N, D]  -> [H, D]   (big contraction)

Variants: bf16, int8 x int8 -> int32, bf16 with bf16 output, int8-stored
CNT upcast to bf16 (halves the CNT read), plus the quantize-pass cost.
Dependent-scan timing discipline per CLAUDE.md; every output feeds the
probe so nothing is DCE-eliminated; 3 repeats for spread.
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def bench(fn, args, iters=20, reps=3):
    @jax.jit
    def run(c0, args):
        def body(c, _):
            outs = fn(*args, c)
            if not isinstance(outs, tuple):
                outs = (outs,)
            probe = sum(o.reshape(-1)[0].astype(jnp.float32) for o in outs)
            return c + probe * 1e-9, probe
        c, probes = jax.lax.scan(body, c0, None, length=iters)
        return jnp.sum(probes)

    float(run(jnp.float32(0), args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(jnp.float32(0), args))
        ts.append(max((time.perf_counter() - t0 - 0.003) / iters, 1e-9))
    return min(ts), max(ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=169_472)
    p.add_argument("--h", type=int, default=768)
    p.add_argument("--d", type=int, default=768)
    args = p.parse_args()
    N, H, D = args.n, args.h, args.d
    rng = np.random.default_rng(0)

    cnt_bf = jnp.asarray((rng.random((N, H)) < 0.01).astype(np.float32),
                         jnp.bfloat16)
    cnt_i8 = cnt_bf.astype(jnp.int8)
    f_bf = jnp.asarray(rng.standard_normal((N, D)), jnp.bfloat16)
    fh_bf = jnp.asarray(np.asarray(f_bf[:H]))
    f_i8 = jnp.clip(jnp.round(f_bf.astype(jnp.float32) * 21), -127,
                    127).astype(jnp.int8)
    fh_i8 = jnp.asarray(np.asarray(f_i8[:H]))
    sc_bf, sc_i8 = jnp.asarray(np.asarray(cnt_bf.T)), \
        jnp.asarray(np.asarray(cnt_i8.T))

    flops_g = 2 * N * H * D / 1e9

    def dot(a, b, pt):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=pt)

    def row(label, fn, a):
        lo, hi = bench(fn, a)
        print(f"{label}: {lo*1e3:.3f}-{hi*1e3:.3f} ms "
              f"({flops_g/lo/1e3:.1f} T/s)", flush=True)
        return lo

    # ---- gather-hub [N,H]@[H,D]
    row("gh bf16->f32 ", lambda a, b, c: dot(a, b, jnp.float32)
        + c, (cnt_bf, fh_bf))
    row("gh bf16->bf16", lambda a, b, c: dot(a, b, jnp.bfloat16)
        + c.astype(jnp.bfloat16), (cnt_bf, fh_bf))
    row("gh int8->i32 ", lambda a, b, c: dot(a, b, jnp.int32)
        + c.astype(jnp.int32), (cnt_i8, fh_i8))
    row("gh i8cnt*bf16", lambda a, b, c: dot(a.astype(jnp.bfloat16), b,
                                             jnp.bfloat16)
        + c.astype(jnp.bfloat16), (cnt_i8, fh_bf))

    # ---- scatter-hub [H,N]@[N,D]
    row("sc bf16->f32 ", lambda a, b, c: dot(a, b, jnp.float32)
        + c, (sc_bf, f_bf))
    row("sc int8->i32 ", lambda a, b, c: dot(a, b, jnp.int32)
        + c.astype(jnp.int32), (sc_i8, f_i8))
    row("sc i8cnt*bf16", lambda a, b, c: dot(a.astype(jnp.bfloat16), b,
                                             jnp.float32)
        + c, (sc_i8, f_bf))

    # ---- quantize pass
    def quant(x, c):
        s = jnp.max(jnp.abs(x.astype(jnp.float32)))
        q = jnp.clip(jnp.round(x.astype(jnp.float32) * (127.0 / s)),
                     -127, 127).astype(jnp.int8)
        return q.astype(jnp.float32) + c
    lo, hi = bench(quant, (f_bf,))
    print(f"quantize [N,D]: {lo*1e3:.3f}-{hi*1e3:.3f} ms "
          f"({N*D*2/lo/1e9:.0f} GB/s)", flush=True)

    # ---- both blocks together, both outputs live
    def combo_bf(cnt, sc, x, xh, c):
        return dot(cnt, xh, jnp.float32) + c, dot(sc, x, jnp.float32)

    def combo_i8(cnt, sc, x, c):
        s = jnp.max(jnp.abs(x.astype(jnp.float32)))
        q = jnp.clip(jnp.round(x.astype(jnp.float32) * (127.0 / s)),
                     -127, 127).astype(jnp.int8)
        a = dot(cnt, q[:cnt.shape[1]], jnp.int32).astype(jnp.float32) \
            * (s / 127.0) ** 2 + c
        b = dot(sc, q, jnp.int32)
        return a, b

    lo, hi = bench(combo_bf, (cnt_bf, sc_bf, f_bf, fh_bf))
    print(f"combo bf16 (both blocks): {lo*1e3:.3f}-{hi*1e3:.3f} ms",
          flush=True)
    lo, hi = bench(combo_i8, (cnt_i8, sc_i8, f_bf))
    print(f"combo int8 (quant + both): {lo*1e3:.3f}-{hi*1e3:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
