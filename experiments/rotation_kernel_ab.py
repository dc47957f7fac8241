#!/usr/bin/env python
"""Same-process A/B: Pallas circulant-rotation kernel vs the XLA DFT-matmul
chain, at the model level (full ViT-B train step, N=4097).

Cross-run comparisons on the tunneled TPU drift 2-3x (docs/BENCHMARKING.md
rule 4); this interleaves both arms in ONE process per variant so the
numbers are comparable. The toggle is ops.rotations.USE_PALLAS_ROTATION —
each bench_one() call builds a fresh model + jit, so flipping it retraces.

Usage: python experiments/rotation_kernel_ab.py [--out F] [--steps N]
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

VARIANTS = ["baseline_circulant", "performer_favor_circulant",
            "performer_relu_circulant"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/rotation_kernel_ab_r5.json")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--variants", nargs="+", default=VARIANTS)
    args = ap.parse_args()

    print(f"backend={jax.default_backend()}")
    rows = []
    for variant in args.variants:
        pair = {}
        for arm in ("xla", "pallas"):
            rotations.USE_PALLAS_ROTATION = arm == "pallas"
            r = bench_one(variant, 128, 2, 4, args.steps)
            r["arm"] = arm
            pair[arm] = r
            print(f"{variant} [{arm}]: {r['step_ms']:.1f} ms/step  "
                  f"MFU {r.get('mfu', 0) * 100:.1f}%", flush=True)
        speedup = pair["xla"]["step_ms"] / pair["pallas"]["step_ms"]
        print(f"{variant}: pallas/xla speedup {speedup:.3f}x", flush=True)
        rows.append({"variant": variant, "N": 4097,
                     "xla": pair["xla"], "pallas": pair["pallas"],
                     "pallas_speedup": speedup})

    with open(args.out, "w") as f:
        json.dump({"backend": jax.default_backend(), "rows": rows}, f,
                  indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
