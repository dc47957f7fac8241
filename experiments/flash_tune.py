#!/usr/bin/env python
"""Flash-kernel block-size tuning sweep.

The flash softmax kernel shipped with fixed 128x128 blocks; at ViT-B long-N
shapes (N=4097, B=4, H=12, D=64) the whole-model step measured only ~4% MFU
— each (128,128) cell is a tiny matmul whose grid-step overhead dominates,
and D=64 pads to 128 lanes (2x wasted PV output columns). Larger KV blocks
amortise the accumulator updates; larger Q blocks amortise K/V reloads.

This sweeps (block_q, block_kv) for forward and forward+backward at the
given shape, chained-dependency timed (docs/BENCHMARKING.md rule 6), and
reports ms/call and implied attention-only TFLOP/s
(4*B*H*N^2*D flops fwd; x3.5 with backward). Configs that fail to compile
(VMEM overflow) are reported as such.

Usage:
    python experiments/flash_tune.py --batch 4 --heads 12 --head-dim 64 \
        --seq 4097 [--grad] [--steps 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from efficient_rpe_vit_tpu.utils.timing import chained_time


def bench_config(N, B, H, D, block_q, block_kv, steps, grad):
    from efficient_rpe_vit_tpu.ops.pallas import flash_softmax_attention

    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (B, H, N, D), jnp.bfloat16)
    k = jax.random.normal(k2, (B, H, N, D), jnp.bfloat16)
    v = jax.random.normal(k3, (B, H, N, D), jnp.bfloat16)
    scale = D ** -0.5

    def path(q, k, v):
        return flash_softmax_attention(q, k, v, scale, block_q, block_kv)

    if grad:
        f = jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(path(q, k, v) ** 2).astype(jnp.float32),
            argnums=(0, 1, 2)))

        def feedback(cur, out):
            return (cur[0] + 0 * out[0].astype(cur[0].dtype), cur[1], cur[2])
    else:
        f = jax.jit(path)

        def feedback(cur, out):
            return (cur[0], cur[1], cur[2] + 0 * out.astype(cur[2].dtype))

    return chained_time(f, (q, k, v), steps, feedback)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--head-dim", type=int, default=64)
    ap.add_argument("--seq", type=int, default=4097)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--grad", action="store_true",
                    help="also time forward+backward")
    ap.add_argument("--blocks-q", nargs="+", type=int,
                    default=[128, 256, 512])
    ap.add_argument("--blocks-kv", nargs="+", type=int,
                    default=[128, 256, 512, 1024])
    args = ap.parse_args()

    B, H, N, D = args.batch, args.heads, args.seq, args.head_dim
    fwd_flops = 4 * B * H * N * N * D  # QK^T + PV, 2 flops/MAC
    print(f"backend={jax.default_backend()} B={B} H={H} N={N} D={D} bf16 "
          f"chained x{args.steps}, median of 3")
    header = "| bq | bkv | fwd ms | fwd TFLOP/s |"
    if args.grad:
        header += " fwd+bwd ms | fwd+bwd TFLOP/s |"
    print(header)
    print("|---" * header.count("|") + "|"[:0])
    best = (None, float("inf"))
    for bq in args.blocks_q:
        for bkv in args.blocks_kv:
            try:
                t = bench_config(N, B, H, D, bq, bkv, args.steps, False)
            except Exception as e:
                print(f"| {bq} | {bkv} | FAILED {type(e).__name__} |", flush=True)
                continue
            row = f"| {bq} | {bkv} | {t*1e3:.2f} | {fwd_flops/t/1e12:.1f} |"
            if args.grad:
                try:
                    tg = bench_config(N, B, H, D, bq, bkv,
                                      max(3, args.steps // 2), True)
                    row += f" {tg*1e3:.2f} | {3.5*fwd_flops/tg/1e12:.1f} |"
                except Exception as e:
                    row += f" FAILED {type(e).__name__} |"
            print(row, flush=True)
            if t < best[1]:
                best = ((bq, bkv), t)
    if best[0]:
        print(f"best fwd: block_q={best[0][0]} block_kv={best[0][1]} "
              f"({best[1]*1e3:.2f} ms, {fwd_flops/best[1]/1e12:.1f} TFLOP/s)")


if __name__ == "__main__":
    main()
