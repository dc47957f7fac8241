#!/usr/bin/env python
"""Measured O(N) vs O(N²) attention scaling on the real chip.

The reference's efficiency story cites the Performer paper's theoretical
speedups (2x @ L=1024 ... 160x @ L=65536, docs/FAVOR_PLUS_DOCUMENTATION.md
§8.3) but never measures them. This script measures the actual
linear-attention vs softmax-attention forward+backward time across N on
the TPU (value-fetch chained protocol, docs/BENCHMARKING.md rule 6),
producing the table for docs/FAVOR_PLUS.md.

Shapes follow the ViT-Base-ish regime (H=8, D=64, F=round(D ln D)=266) at
fixed token budget: B*N held constant so total work scales as the
algorithms do, not with the token count.

Usage:  python experiments/scaling_ab.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from efficient_rpe_vit_tpu.ops.attention_core import (
    linear_attention,
    softmax_attention,
)
from efficient_rpe_vit_tpu.utils.timing import chained_time


def bench(N: int, token_budget: int = 32768, H: int = 8, D: int = 64,
          F: int = 266, steps: int = 20):
    B = max(1, token_budget // N)
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (B, H, N, D), jnp.bfloat16)
    k = jax.random.normal(k2, (B, H, N, D), jnp.bfloat16)
    v = jax.random.normal(k3, (B, H, N, D), jnp.bfloat16)
    qp = jnp.abs(jax.random.normal(k1, (B, H, N, F), jnp.bfloat16)) * 0.2
    kp = jnp.abs(jax.random.normal(k2, (B, H, N, F), jnp.bfloat16)) * 0.2

    def soft_loss(q, k, v):
        return jnp.sum(
            softmax_attention(q, k, v, D ** -0.5) ** 2
        ).astype(jnp.float32)

    def flash_loss(q, k, v):
        from efficient_rpe_vit_tpu.ops.pallas import flash_softmax_attention

        return jnp.sum(
            flash_softmax_attention(q, k, v, D ** -0.5) ** 2
        ).astype(jnp.float32)

    def lin_loss(qp, kp, v):
        return jnp.sum(linear_attention(qp, kp, v) ** 2).astype(jnp.float32)

    def fb(cur, out):
        return (cur[0] + 0 * out[0].astype(cur[0].dtype), cur[1], cur[2])

    def timed(loss, args):
        return chained_time(jax.jit(jax.grad(loss, argnums=(0, 1, 2))),
                            args, steps, fb)

    # The dense softmax backward keeps ~3 [B,H,N,N] fp32 temps; past the
    # HBM budget the remote compiler itself falls over — predict the
    # O(N^2) memory wall instead of tripping it.
    softmax_bytes = 3 * B * H * N * N * 4
    t_soft = (timed(soft_loss, (q, k, v))
              if softmax_bytes < 12e9 else None)
    # flash kernel: no [N,N] in HBM in either direction — runs where the
    # dense path can't
    t_flash = timed(flash_loss, (q, k, v))
    t_lin = timed(lin_loss, (qp, kp, v))
    return B, t_soft, t_flash, t_lin


def main():
    print(f"backend={jax.default_backend()}  H=8 D=64 F=266 bf16, "
          f"fwd+bwd, token budget 32768, value-fetch chained timing")
    print("| N | B | softmax XLA (ms) | flash Pallas (ms) | "
          "linear/FAVOR+ (ms) | linear speedup |")
    print("|---|---|---|---|---|---|")
    for N in [256, 1024, 4096, 16384]:
        B, ts, tf, tl = bench(N)
        s = f"{ts*1e3:.2f}" if ts is not None else "OOM"
        f = f"{tf*1e3:.2f}" if tf is not None else "OOM"
        ref = ts if ts is not None else tf
        sp = f"{ref/tl:.1f}x" if ref is not None and tl else "—"
        print(f"| {N} | {B} | {s} | {f} | {tl*1e3:.2f} | {sp} |", flush=True)


if __name__ == "__main__":
    main()
