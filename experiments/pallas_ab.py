#!/usr/bin/env python
"""On-chip A/B: fused Pallas masked-linear KERPLE vs XLA dense path.

Round 1 concluded "XLA dense beats the Pallas kernels at ViT head dims" —
but that A/B used the broken block_until_ready barrier (docs/BENCHMARKING.md
rule 6). This re-measures at the BENCH shape (B=256, H=2, N=197, F=44,
D=16, the headline config) and a long-N shape, with value-fetch chained
timing, covering forward and forward+backward with both backward modes
(jnp_residual / fully-fused Pallas).

The HBM argument for the kernel: the dense path materialises several
[B,H,N,N] fp32 tensors per step (~79 MB each at the bench shape); the
fused kernel keeps them in VMEM tiles.

Usage:  python experiments/pallas_ab.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from efficient_rpe_vit_tpu.utils.timing import chained_time


def bench_shape(B, H, N, F, D, steps=20):
    from efficient_rpe_vit_tpu.ops import pallas as pk
    from efficient_rpe_vit_tpu.ops.attention_core import (
        kerple_linear_attention,
    )
    from efficient_rpe_vit_tpu.ops.fft_toeplitz import toeplitz_from_coeffs

    rng = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    qp = jnp.abs(jax.random.normal(k1, (B, H, N, F), jnp.bfloat16)) * 0.2
    kp = jnp.abs(jax.random.normal(k2, (B, H, N, F), jnp.bfloat16)) * 0.2
    v = jax.random.normal(k3, (B, H, N, D), jnp.bfloat16)
    coeffs = jnp.exp(jax.random.normal(k4, (H, 2 * N - 1)) * 0.05)

    def dense(qp, kp, v, c):
        return kerple_linear_attention(qp, kp, v, c, method="dense")

    def pallas(qp, kp, v, c):
        T = toeplitz_from_coeffs(c, N)
        return pk.fused_masked_linear_attention(qp, kp, v, T)

    rows = {}
    for name, path in (("dense", dense), ("pallas", pallas)):
        f = jax.jit(path)

        def fb(cur, out):
            return (cur[0], cur[1], cur[2] + 0 * out.astype(cur[2].dtype),
                    cur[3])

        rows[f"fwd_{name}"] = chained_time(f, (qp, kp, v, coeffs), steps, fb)

    bwd_modes = {"dense": None, "pallas_jnp": "jnp_residual",
                 "pallas_fused": "pallas"}
    from efficient_rpe_vit_tpu.ops.pallas import attention_kernels as ak

    for name, mode in bwd_modes.items():
        if mode is not None:
            old = ak.MASKED_LINEAR_BWD_MODE
            ak.MASKED_LINEAR_BWD_MODE = mode
        path = dense if mode is None else pallas
        g = jax.jit(jax.grad(
            lambda qp, kp, v, c: jnp.sum(path(qp, kp, v, c) ** 2).astype(
                jnp.float32),
            argnums=(0, 1, 2)))

        def fb(cur, out):
            return (cur[0] + 0 * out[0].astype(cur[0].dtype), cur[1],
                    cur[2], cur[3])

        try:
            rows[f"grad_{name}"] = chained_time(
                g, (qp, kp, v, coeffs), max(10, steps // 2), fb)
        finally:
            if mode is not None:
                ak.MASKED_LINEAR_BWD_MODE = old
    return rows


def main():
    print(f"backend={jax.default_backend()}")
    for (B, H, N, F, D) in [(256, 2, 197, 44, 16), (8, 2, 1024, 44, 16),
                            (32, 4, 512, 128, 64)]:
        rows = bench_shape(B, H, N, F, D)
        pretty = "  ".join(f"{k}={v * 1e3:.2f}ms" for k, v in rows.items())
        print(f"B={B} H={H} N={N} F={F} D={D}: {pretty}", flush=True)


if __name__ == "__main__":
    main()
