#!/usr/bin/env python
"""Model-level dense-vs-flash softmax crossover A/B (round 4).

The `FLASH_MIN_N` dispatch constant must come from FULL train-step A/Bs,
not isolated kernel timings (docs/BENCHMARKING.md: the Pallas call is a
fusion barrier, so kernel wins don't automatically survive the model
level). Round 3 bracketed the crossover at 1025..2026 (dense won N=1025
by 9%) and set 1536. The round-4 fused single-pass backward made flash
1.35x faster backward, which moved the boundary: at N=1025 flash now
WINS the full ViT-B train step (results/flash_crossover_r4.json,
79.7 vs 75.3 img/s). This harness re-brackets the boundary from below
with mid-range N (24^2+1=577, 28^2+1=785, 32^2+1=1025), timing the SAME
ViT-B baseline train step with dispatch forced each way.

Usage: python experiments/flash_crossover.py [--out results/...json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from efficient_rpe_vit_tpu.ops import attention_core

from vitbase_bench import bench_one  # noqa: E402 (same directory)


def log(msg):
    print(f"[xover {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


# (image, patch, N, batch, steps) — batches keep the dense path's
# 3*B*H*N^2*4-byte temps well under SOFTMAX_DENSE_MEMORY_BUDGET
SHAPES = [
    (48, 2, 577, 32, 12),
    (56, 2, 785, 24, 12),
    (64, 2, 1025, 16, 10),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/flash_crossover_r4_mid.json")
    ap.add_argument("--shapes", nargs="+", default=None,
                    help="subset of N values to run (e.g. 577 785)")
    args = ap.parse_args()

    rows = []
    for image, patch, n, batch, steps in SHAPES:
        if args.shapes and str(n) not in args.shapes:
            continue
        for mode, min_n in (("dense", 10**9), ("flash", 1)):
            attention_core.FLASH_MIN_N = min_n
            log(f"N={n} B={batch} {mode}: compiling + timing...")
            try:
                r = bench_one("baseline", image, patch, batch, steps)
                r.update({"N": n, "mode": mode})
                log(f"N={n} {mode}: {r['images_per_sec']:.1f} img/s "
                    f"({r['step_ms']:.1f} ms)")
            except Exception as e:
                r = {"N": n, "mode": mode, "error": str(e)[:200]}
                log(f"N={n} {mode} FAILED: {str(e)[:200]}")
            rows.append(r)
            with open(args.out, "w") as f:
                json.dump({"rows": rows}, f, indent=1)
    log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
