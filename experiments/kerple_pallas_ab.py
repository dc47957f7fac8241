#!/usr/bin/env python
"""Model-level A/B: KERPLE dense masked-matmul vs fused Pallas kernel.

Round-2 recorded a hard lesson (ops/attention_core.py dispatch notes): the
Pallas masked-linear kernel won every ISOLATED shape but lost 2x in the
full train step at the dim-32 bench shape, because the custom call is a
fusion/layout barrier for XLA. Round 3 changed two inputs to that verdict:
tuned (512,512) blocks made the kernel ~2.5x faster, and ViT-Base dims
(D=64, F=266) fill the MXU lanes the dim-32 shapes left idle. This
experiment re-asks the question AT THE MODEL LEVEL for the shapes where
the dense path still rules the dispatch table (N=197, N=1025 — at N=4097
dense exceeds the byte budget and `auto` already rides Pallas).

Protocol: full jitted ViT-B train step (fwd+bwd+adam), state-chained
steps, one value-fetch barrier per chain (docs/BENCHMARKING.md rule 6),
same-process A/B/B/A order so tunnel drift cancels to first order.

The verdict feeds KERPLE's `auto` dispatch: if the Pallas kernel wins at
the model level below the byte budget, a time crossover (mirroring
FLASH_MIN_N) is warranted; if dense holds, the byte guard stays the only
trigger. Either way the result is recorded in docs/BENCHMARKING.md.

Usage: python experiments/kerple_pallas_ab.py [--shapes N=1025] [--out F]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

PEAK_FLOPS_BF16 = 197e12  # TPU v5e public spec

# (label, image_size, patch_size, N, batch, timed_steps)
SHAPES = [
    ("N=197", 28, 2, 197, 64, 20),
    ("N=1025", 64, 2, 1025, 16, 10),
]


def make_step(method: str, image: int, patch: int, batch: int):
    from efficient_rpe_vit_tpu.configs import mnist_config
    from efficient_rpe_vit_tpu.models import create_model
    from efficient_rpe_vit_tpu.train import create_train_state, make_train_step

    cfg = mnist_config(
        image_size=image, patch_size=patch, batch_size=batch,
        dim=768, depth=12, heads=12, mlp_dim=3072, dropout=0.0,
        compute_dtype="bfloat16",
    )
    model = create_model("performer_favor_most_general", cfg,
                         rpe_config={"method": method})
    rng = jax.random.PRNGKey(0)
    m = cfg.model
    sample = jnp.zeros((2, m.image_size, m.image_size, m.in_channels))
    state = create_train_state(model, cfg, rng, sample, steps_per_epoch=100)
    train_step = make_train_step(model, donate=True)
    images = jax.random.normal(
        rng, (batch, m.image_size, m.image_size, m.in_channels)
    )
    labels = jnp.arange(batch) % m.num_classes
    return train_step, state, images, labels, rng


def timed_chain(train_step, state, images, labels, key, steps: int):
    """One state-chained timed window ending in a value fetch."""
    t0 = time.perf_counter()
    for _ in range(steps):
        key, sub = jax.random.split(key)
        state, loss, _ = train_step(state, images, labels, sub)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    float(loss + 0.0 * jnp.sum(leaf.astype(jnp.float32)))
    return time.perf_counter() - t0, state, key


def bench_shape(label, image, patch, n, batch, steps, warmup=3):
    arms = {}
    for method in ("dense", "pallas"):
        train_step, state, images, labels, key = make_step(
            method, image, patch, batch)
        flops = None
        try:
            k2, sub = jax.random.split(key)
            lowered = train_step.lower(state, images, labels, sub)
            ca = lowered.cost_analysis()
            if not ca or "flops" not in ca:
                ca = lowered.compile().cost_analysis()
            flops = float(ca["flops"])
        except Exception as e:  # pragma: no cover - backend dependent
            print(f"  [warn] cost analysis unavailable ({method}): {e}")
        for _ in range(warmup):
            key, sub = jax.random.split(key)
            state, loss, _ = train_step(state, images, labels, sub)
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        float(loss + 0.0 * jnp.sum(leaf.astype(jnp.float32)))
        arms[method] = dict(step=train_step, state=state, images=images,
                            labels=labels, key=key, flops=flops, times=[])

    # A/B/B/A: tunnel drift is slow relative to one chain, so mirrored
    # ordering cancels it to first order
    for method in ("dense", "pallas", "pallas", "dense"):
        a = arms[method]
        dt, a["state"], a["key"] = timed_chain(
            a["step"], a["state"], a["images"], a["labels"], a["key"], steps)
        a["times"].append(dt / steps)

    rows = {}
    for method, a in arms.items():
        per_step = sorted(a["times"])[len(a["times"]) // 2]
        row = {
            "step_ms": per_step * 1e3,
            "images_per_sec": batch / per_step,
            "chains_ms": [t * 1e3 for t in a["times"]],
        }
        if a["flops"]:
            row["mfu"] = a["flops"] / per_step / PEAK_FLOPS_BF16
        rows[method] = row
        mfu = f"{row['mfu']*100:.1f}%" if "mfu" in row else "n/a"
        print(f"{label} {method}: {row['images_per_sec']:.1f} img/s  "
              f"{row['step_ms']:.1f} ms/step  MFU {mfu}  "
              f"chains={[f'{t:.1f}' for t in row['chains_ms']]}", flush=True)
    rows["speedup_pallas_over_dense"] = (
        rows["dense"]["step_ms"] / rows["pallas"]["step_ms"])
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", nargs="+", default=None)
    ap.add_argument("--steps-scale", type=float, default=1.0)
    ap.add_argument("--out", default="results/kerple_pallas_ab_r3.json")
    args = ap.parse_args()

    backend = jax.default_backend()
    print(f"backend={backend}  KERPLE dense vs pallas, full ViT-B train step")
    result = {"backend": backend, "dims": {"dim": 768, "heads": 12,
              "head_dim": 64, "mlp_dim": 3072, "depth": 12,
              "dtype": "bfloat16"}, "shapes": {}}
    for label, image, patch, n, batch, steps in SHAPES:
        if args.shapes and label not in args.shapes:
            continue
        steps = max(3, int(steps * args.steps_scale))
        try:
            result["shapes"][label] = bench_shape(
                label, image, patch, n, batch, steps)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}")
            result["shapes"][label] = {
                "error": f"{type(e).__name__}: {str(e)[:300]}"}
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
