#!/usr/bin/env python
"""On-chip A/B of the KERPLE dense-vs-FFT dispatch crossover.

VERDICT r1 weak #7: KERPLE_DENSE_CROSSOVER_N (=256) and DENSE_CROSSOVER_N
(=128) routed dense vs O(N log N) FFT on dense-side measurements only. This
script measures BOTH paths at N in {197, 256, 512, 1024, 2048, 4096} on the
real chip, forward and forward+backward, with chained dependencies (each
iteration feeds the previous output back in) so we time compute rather than
dispatch — the only trustworthy protocol on the tunneled TPU (cross-run
pool noise is 2-3x; see docs/BENCHMARKING.md).

Also A/Bs the raw toeplitz_matmul (fft_toeplitz.py dense vs fft) at the
shapes KERPLE feeds it, validating DENSE_CROSSOVER_N.

Usage:  python experiments/crossover_ab.py [--steps 30] [--out docs/...]
Prints a markdown table and (with --out) appends it to the file.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from efficient_rpe_vit_tpu.utils.timing import chained_time as _chained_time


def bench_kerple(N: int, steps: int, B: int = 8, H: int = 2, F: int = 44,
                 D: int = 16, grad: bool = False):
    from efficient_rpe_vit_tpu.ops.attention_core import (
        kerple_linear_attention,
    )

    rng = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    qp = jnp.abs(jax.random.normal(k1, (B, H, N, F), jnp.bfloat16)) * 0.2
    kp = jnp.abs(jax.random.normal(k2, (B, H, N, F), jnp.bfloat16)) * 0.2
    v = jax.random.normal(k3, (B, H, N, D), jnp.bfloat16)
    coeffs = jnp.exp(jax.random.normal(k4, (H, 2 * N - 1)) * 0.05)

    results = {}
    for method in ("dense", "fft"):
        if grad:
            def loss(qp, kp, v, coeffs):
                return jnp.sum(
                    kerple_linear_attention(qp, kp, v, coeffs,
                                            method=method) ** 2
                ).astype(jnp.float32)

            f = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

            def feedback(cur, out):
                dq, dk, dv = out
                return (cur[0] + 0 * jnp.abs(dq).astype(cur[0].dtype),
                        cur[1], cur[2], cur[3])

            results[method] = _chained_time(
                f, (qp, kp, v, coeffs), steps, feedback)
        else:
            f = jax.jit(lambda qp, kp, v, c: kerple_linear_attention(
                qp, kp, v, c, method=method))

            def feedback(cur, out):
                # fold the output back into v (same shape) to chain deps
                return (cur[0], cur[1],
                        cur[2] + 0 * out.astype(cur[2].dtype), cur[3])

            results[method] = _chained_time(
                f, (qp, kp, v, coeffs), steps, feedback)
    return results


def bench_toeplitz(N: int, steps: int, H: int = 2, B: int = 8, F: int = 44):
    """Raw Toeplitz matmul at the D2 shape KERPLE feeds it: [B,H,N,F]."""
    from efficient_rpe_vit_tpu.ops.fft_toeplitz import toeplitz_matmul

    rng = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (B, H, N, F), jnp.bfloat16)
    coeffs = jnp.exp(jax.random.normal(k2, (H, 2 * N - 1)) * 0.05)

    results = {}
    for method in ("dense", "fft"):
        f = jax.jit(lambda c, x: toeplitz_matmul(c, x, method=method))

        def feedback(cur, out):
            return (cur[0], cur[1] + 0 * out.astype(cur[1].dtype))

        results[method] = _chained_time(f, (coeffs, x), steps, feedback)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--sizes", nargs="+", type=int,
                    default=[197, 256, 512, 1024, 2048, 4096])
    # shape flags: the r2 tables were measured at the MNIST dims (B=8 H=2
    # F=44 D=16); VERDICT r3 #1 requires re-validating every dispatch
    # constant at ViT-Base dims (H=12, D=64, F=round(64 ln 64)=266)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--heads", type=int, default=2)
    ap.add_argument("--features", type=int, default=44)
    ap.add_argument("--head-dim", type=int, default=16)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    B, H, F, D = args.batch, args.heads, args.features, args.head_dim
    backend = jax.default_backend()
    lines = [
        f"\n### KERPLE dense vs FFT crossover ({backend}, chained A/B, "
        f"{args.steps} steps, median of 3, B={B} H={H} F={F} D={D})\n",
        "| N | fwd dense (ms) | fwd fft (ms) | grad dense (ms) | "
        "grad fft (ms) | fwd winner | grad winner |",
        "|---|---|---|---|---|---|---|",
    ]
    for N in args.sizes:
        fwd = bench_kerple(N, args.steps, B=B, H=H, F=F, D=D)
        bwd = bench_kerple(N, max(10, args.steps // 2), B=B, H=H, F=F,
                           D=D, grad=True)
        fw = "dense" if fwd["dense"] <= fwd["fft"] else "fft"
        gw = "dense" if bwd["dense"] <= bwd["fft"] else "fft"
        lines.append(
            f"| {N} | {fwd['dense']*1e3:.2f} | {fwd['fft']*1e3:.2f} | "
            f"{bwd['dense']*1e3:.2f} | {bwd['fft']*1e3:.2f} | {fw} | {gw} |"
        )
        print(lines[-1], flush=True)

    lines += [
        f"\n### Raw toeplitz_matmul dense vs FFT ([{B},{H},N,{F}] bf16)\n",
        "| N | dense (ms) | fft (ms) | winner |",
        "|---|---|---|---|",
    ]
    for N in args.sizes:
        r = bench_toeplitz(N, args.steps, H=H, B=B, F=F)
        w = "dense" if r["dense"] <= r["fft"] else "fft"
        lines.append(f"| {N} | {r['dense']*1e3:.2f} | {r['fft']*1e3:.2f} |"
                     f" {w} |")
        print(lines[-1], flush=True)

    table = "\n".join(lines)
    print(table)
    if args.out:
        with open(args.out, "a") as f:
            f.write(table + "\n")
        print(f"appended to {args.out}")


if __name__ == "__main__":
    main()
