#!/usr/bin/env python
"""On-chip A/B: Pallas flash softmax attention vs XLA dense softmax.

VERDICT r1 weak #4: FLASH_MIN_N = 1e9 made the flash kernel dead code in
'auto' dispatch, justified only by ViT-dim measurements (N=197, D=16).
Flash's advantage grows with N (the [B,H,N,N] score matrix XLA materialises
is quadratic); this script measures both paths across N at D=64 to find the
real crossover, forward and forward+backward (the tiled Pallas backward now
exists), using chained-dependency timing (see docs/BENCHMARKING.md).

Usage:  python experiments/flash_ab.py [--steps 20]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from efficient_rpe_vit_tpu.utils.timing import chained_time as _chained_time


def bench(N: int, steps: int, B: int, H: int, D: int, grad: bool,
          dtype=jnp.bfloat16):
    from efficient_rpe_vit_tpu.ops.attention_core import softmax_attention
    from efficient_rpe_vit_tpu.ops.pallas import flash_softmax_attention

    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (B, H, N, D), dtype)
    k = jax.random.normal(k2, (B, H, N, D), dtype)
    v = jax.random.normal(k3, (B, H, N, D), dtype)
    scale = D ** -0.5

    paths = {
        "xla": lambda q, k, v: softmax_attention(q, k, v, scale),
        "flash": lambda q, k, v: flash_softmax_attention(q, k, v, scale),
    }
    results = {}
    for name, path in paths.items():
        if grad:
            f = jax.jit(jax.grad(
                lambda q, k, v: jnp.sum(path(q, k, v) ** 2).astype(
                    jnp.float32),
                argnums=(0, 1, 2)))

            def feedback(cur, out):
                return (cur[0] + 0 * out[0].astype(cur[0].dtype),
                        cur[1], cur[2])
        else:
            f = jax.jit(path)

            def feedback(cur, out):
                return (cur[0], cur[1], cur[2] + 0 * out.astype(cur[2].dtype))

        results[name] = _chained_time(f, (q, k, v), steps, feedback)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--sizes", nargs="+", type=int,
                    default=[197, 512, 1024, 2048, 4096])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--head-dim", type=int, default=64)
    args = ap.parse_args()

    print(f"backend={jax.default_backend()} B={args.batch} H={args.heads} "
          f"D={args.head_dim} bf16, chained A/B, {args.steps} steps, "
          f"median of 3")
    print("| N | fwd xla (ms) | fwd flash (ms) | grad xla (ms) | "
          "grad flash (ms) | fwd winner | grad winner |")
    print("|---|---|---|---|---|---|---|")
    for N in args.sizes:
        fwd = bench(N, args.steps, args.batch, args.heads, args.head_dim,
                    grad=False)
        bwd = bench(N, max(5, args.steps // 2), args.batch, args.heads,
                    args.head_dim, grad=True)
        fw = "xla" if fwd["xla"] <= fwd["flash"] else "flash"
        gw = "xla" if bwd["xla"] <= bwd["flash"] else "flash"
        print(f"| {N} | {fwd['xla']*1e3:.2f} | {fwd['flash']*1e3:.2f} | "
              f"{bwd['xla']*1e3:.2f} | {bwd['flash']*1e3:.2f} | {fw} | {gw} |",
              flush=True)


if __name__ == "__main__":
    main()
