#!/usr/bin/env python
"""Batch-size sweep for the bench.py ViT-B KERPLE MFU row (round 4).

The VERDICT r3 target for the compute-bound row is >=35% MFU at ViT-B
N=197; round 4 measured 33.1% at the row's batch 64. At this shape the
step is trunk-dominated (MLP + projections ~70% of FLOPs), so arithmetic
intensity — batch — is the first-order lever, not the attention math.
This sweep times the SAME full train step (fwd + bwd + adam, donated) at
B in {64, 128, 256} and, at the winning batch, the fused K-step dispatch,
to pick the configuration bench.py's vitb row should ship.

Protocol: chained steps, one value-fetch barrier (docs/BENCHMARKING.md
rule 6). MFU from XLA cost analysis — the N=197 KERPLE path is pure XLA
(dense masked matmul), so cost analysis counts every FLOP.

Usage: python experiments/vitb_batch_sweep.py [--out results/...json]
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

PEAK_FLOPS_BF16 = 197e12


def log(msg):
    print(f"[sweep {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def bench_batch(batch: int, steps: int, fused_k: int | None = None):
    from efficient_rpe_vit_tpu.configs import mnist_config
    from efficient_rpe_vit_tpu.models import create_model
    from efficient_rpe_vit_tpu.train import (
        create_train_state,
        make_multi_step,
        make_train_step,
    )

    cfg = mnist_config(image_size=28, patch_size=2, batch_size=batch,
                       dim=768, depth=12, heads=12, mlp_dim=3072,
                       dropout=0.0, compute_dtype="bfloat16")
    model = create_model("performer_favor_most_general", cfg)
    rng = jax.random.PRNGKey(0)
    m = cfg.model
    sample = jnp.zeros((2, m.image_size, m.image_size, m.in_channels))
    state = create_train_state(model, cfg, rng, sample, steps_per_epoch=100)

    images = jax.random.normal(
        rng, (batch, m.image_size, m.image_size, m.in_channels))
    labels = jnp.arange(batch) % m.num_classes

    one_step = make_train_step(model, donate=False)
    key, sub = jax.random.split(rng)
    try:
        lowered = one_step.lower(state, images, labels, sub)
        ca = lowered.cost_analysis()
        if not ca or "flops" not in ca:
            ca = lowered.compile().cost_analysis()
        flops = float(ca["flops"])
    except Exception as e:
        log(f"cost analysis unavailable: {e}")
        flops = None

    def chain_barrier(state, loss):
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        return float(loss + 0.0 * jnp.sum(leaf.astype(jnp.float32)))

    if fused_k:
        multi_step = make_multi_step(model, donate=True)
        images_k = jax.device_put(
            jnp.broadcast_to(images, (fused_k,) + images.shape))
        labels_k = jax.device_put(
            jnp.broadcast_to(labels, (fused_k,) + labels.shape))
        calls = max(2, steps // fused_k)
        log(f"B={batch} fused K={fused_k}: compiling...")
        key = rng
        for _ in range(2):
            key, sub = jax.random.split(key)
            state, losses, _ = multi_step(state, images_k, labels_k, sub)
        chain_barrier(state, losses[-1])
        log(f"B={batch} fused: warm; timing {calls} calls x {fused_k}...")
        t0 = time.perf_counter()
        for _ in range(calls):
            key, sub = jax.random.split(key)
            state, losses, _ = multi_step(state, images_k, labels_k, sub)
        chain_barrier(state, losses[-1])
        elapsed = time.perf_counter() - t0
        n_steps = calls * fused_k
    else:
        train_step = make_train_step(model, donate=True)
        log(f"B={batch}: compiling...")
        key = rng
        for _ in range(3):
            key, sub = jax.random.split(key)
            state, loss, _ = train_step(state, images, labels, sub)
        chain_barrier(state, loss)
        log(f"B={batch}: warm; timing {steps} steps...")
        t0 = time.perf_counter()
        for _ in range(steps):
            key, sub = jax.random.split(key)
            state, loss, _ = train_step(state, images, labels, sub)
        chain_barrier(state, loss)
        elapsed = time.perf_counter() - t0
        n_steps = steps

    row = {
        "batch": batch,
        "fused_k": fused_k,
        "timed_steps": n_steps,
        "step_ms": round(elapsed / n_steps * 1e3, 3),
        "images_per_sec": round(batch * n_steps / elapsed, 1),
    }
    if flops is not None:
        row["flops_per_step"] = flops
        row["mfu"] = round(flops * n_steps / elapsed / PEAK_FLOPS_BF16, 5)
    log(f"B={batch} fused_k={fused_k}: {row['step_ms']} ms/step, "
        f"{row['images_per_sec']} img/s, MFU {row.get('mfu')}")
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/vitb_batch_sweep_r4.json")
    args = ap.parse_args()

    rows = []
    for batch, steps in [(64, 20), (128, 16), (256, 12)]:
        try:
            rows.append(bench_batch(batch, steps))
        except Exception as e:
            log(f"B={batch} FAILED: {type(e).__name__}: {str(e)[:200]}")
            rows.append({"batch": batch, "error": str(e)[:200]})
        # dump incrementally so a mid-run kill keeps partial results
        with open(args.out, "w") as f:
            json.dump({"backend": jax.default_backend(), "rows": rows}, f,
                      indent=1)

    # fused dispatch at the best measured batch
    best = max((r for r in rows if "mfu" in r), key=lambda r: r["mfu"],
               default=None)
    if best is not None:
        try:
            rows.append(bench_batch(best["batch"], 24, fused_k=8))
        except Exception as e:
            log(f"fused FAILED: {type(e).__name__}: {str(e)[:200]}")
    with open(args.out, "w") as f:
        json.dump({"backend": jax.default_backend(), "rows": rows}, f,
                  indent=1)
    log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
