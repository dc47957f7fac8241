#!/usr/bin/env python
"""Block-size sweep for the coeffs-native KERPLE kernels.

`masked_linear_default_blocks` was tuned for the round-3 T-BASED kernels,
where each grid cell also streamed a [block_q, block_kv] fp32 tile of T
from HBM (1 MB at 512-blocks) — that traffic made (512, 1024) regress and
pinned the policy at (512, 512). The coeffs-native kernels
(ops/pallas/masked_linear_coeffs.py) replace the T tile with a
[block_q + block_kv] coefficient window (16 KB), so the traffic argument
changed and the policy deserves a re-measure (VERDICT r4 follow-on to
next #5).

Chained value-fetch protocol (docs/BENCHMARKING.md rule 6), fwd and
fwd+bwd, attention-op level at ViT-B dims.

Usage: python experiments/coeffs_tune.py [--seq 4097] [--grad]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from efficient_rpe_vit_tpu.utils.timing import chained_time

CONFIGS = [
    (256, 256), (256, 512), (512, 256), (512, 512),
    (512, 768), (512, 1024), (768, 512), (768, 768), (1024, 512),
]


def bench_config(N, B, H, F, D, block_q, block_kv, steps, grad):
    from efficient_rpe_vit_tpu.ops.pallas import (
        masked_linear_attention_coeffs,
    )

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    qp = jax.nn.relu(jax.random.normal(ks[0], (B, H, N, F), jnp.bfloat16))
    kp = jax.nn.relu(jax.random.normal(ks[1], (B, H, N, F), jnp.bfloat16))
    v = jax.random.normal(ks[2], (B, H, N, D), jnp.bfloat16)
    co = jnp.exp(jax.random.normal(ks[3], (H, 2 * N - 1)) * 0.1)

    def path(qp, kp, v, co):
        return masked_linear_attention_coeffs(qp, kp, v, co,
                                              block_q, block_kv)

    if grad:
        f = jax.jit(jax.grad(
            lambda qp, kp, v, co: jnp.sum(
                path(qp, kp, v, co).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2, 3)))

        def feedback(cur, out):
            return (cur[0] + 0 * out[0].astype(cur[0].dtype), cur[1],
                    cur[2], cur[3])
    else:
        f = jax.jit(path)

        def feedback(cur, out):
            return (cur[0], cur[1], cur[2] + 0 * out.astype(cur[2].dtype),
                    cur[3])

    return chained_time(f, (qp, kp, v, co), steps, feedback)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--features", type=int, default=266)
    ap.add_argument("--head-dim", type=int, default=64)
    ap.add_argument("--seq", type=int, default=4097)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--grad", action="store_true")
    ap.add_argument("--out", default="results/coeffs_tune_r4.json")
    args = ap.parse_args()

    B, H, N = args.batch, args.heads, args.seq
    F, D = args.features, args.head_dim
    # A = q'k'^T (N^2 F), A*T ~ free, A@v (N^2 D), den rowsum; 2 flops/MAC
    fwd_flops = 2 * B * H * N * N * (F + D)
    rows = []
    print(f"backend={jax.default_backend()}  coeffs-kernel sweep "
          f"B={B} H={H} N={N} F={F} D={D}", flush=True)
    for bq, bkv in CONFIGS:
        row = {"block_q": bq, "block_kv": bkv}
        try:
            t = bench_config(N, B, H, F, D, bq, bkv, args.steps, False)
            row["fwd_ms"] = round(t * 1e3, 2)
            row["fwd_tflops"] = round(fwd_flops / t / 1e12, 1)
            if args.grad:
                tg = bench_config(N, B, H, F, D, bq, bkv, args.steps, True)
                row["fwdbwd_ms"] = round(tg * 1e3, 2)
                # bwd: dq (N^2(D+F)), dkv (N^2(2D+2F... approx)), P3
                row["fwdbwd_tflops"] = round(3.5 * fwd_flops / tg / 1e12, 1)
        except Exception as e:
            row["failed"] = f"{type(e).__name__}: {str(e)[:160]}"
        print(row, flush=True)
        rows.append(row)
    out = {"shape": {"B": B, "H": H, "N": N, "F": F, "D": D,
                     "dtype": "bfloat16"},
           "protocol": "chained value-fetch (experiments/coeffs_tune.py)",
           "backend": jax.default_backend(), "rows": rows}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
