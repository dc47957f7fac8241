#!/usr/bin/env python
"""Same-process A/B: XLA rotation chain with input-dtype vs fp32
intermediates, at the model level (full ViT-B train step, N=4097) on the
performer circulant variants — the rows that keep the XLA chain under
consumer-aware dispatch (ops/rotations.py). Toggle:
ops.rotations.CHAIN_INPUT_DTYPE (each bench_one builds a fresh jit).

Rule-7 chained micro said 0.265 -> 0.173 ms/rotation fwd, 0.518 -> 0.361
fwd+bwd; this checks the win survives the model level (round-2 lesson).

Usage: python experiments/chain_dtype_ab.py [--out F] [--steps N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from efficient_rpe_vit_tpu.ops import rotations
from experiments.vitbase_bench import bench_one

VARIANTS = ["performer_favor_circulant", "performer_relu_circulant"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/chain_dtype_ab_r5.json")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--variants", nargs="+", default=VARIANTS)
    args = ap.parse_args()

    print(f"backend={jax.default_backend()}")
    rows = []
    for variant in args.variants:
        pair = {}
        for arm in ("fp32", "indtype"):
            rotations.CHAIN_INPUT_DTYPE = arm == "indtype"
            r = bench_one(variant, 128, 2, 4, args.steps)
            r["arm"] = arm
            pair[arm] = r
            print(f"{variant} [{arm}]: {r['step_ms']:.1f} ms/step  "
                  f"MFU {r.get('mfu', 0) * 100:.1f}%", flush=True)
        speedup = pair["fp32"]["step_ms"] / pair["indtype"]["step_ms"]
        print(f"{variant}: indtype/fp32 speedup {speedup:.3f}x", flush=True)
        rows.append({"variant": variant, "N": 4097,
                     "fp32": pair["fp32"], "indtype": pair["indtype"],
                     "indtype_speedup": speedup})
    rotations.CHAIN_INPUT_DTYPE = True

    with open(args.out, "w") as f:
        json.dump({"backend": jax.default_backend(), "rows": rows}, f,
                  indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
