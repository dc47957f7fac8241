#!/usr/bin/env python
"""Model-level A/B: phi fused INTO the KERPLE coeffs kernel vs XLA-side phi.

SURVEY §7 step 8(b) / VERDICT r4 #2: compute phi+/ReLU(x@Omega) in-kernel
from the [B,H,N,D] q/k tiles so the [B,H,N,Fp] feature tensors never
roundtrip HBM on the forward. The structural price: the q-side phi caches
in VMEM scratch across the KV sweep, but the k-side phi is recomputed per
grid cell (+~9% kernel matmul flops + per-tile exp transcendentals). This
experiment decides whether the saved HBM traffic beats the recompute AT
THE MODEL LEVEL — the round-2 lesson (kernel wins must survive the model
level, ops/attention_core.py dispatch notes) applied in reverse.

Protocol: full jitted ViT-B train step (fwd+bwd+adam), state-chained
steps, one value-fetch barrier per chain, same-process A/B/B/A order
(docs/BENCHMARKING.md rule 6).

Usage: python experiments/fused_phi_ab.py [--variants ...] [--out F]
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

# (label, image_size, patch_size, N, batch, timed_steps)
SHAPES = [
    ("N=4097", 128, 2, 4097, 4, 8),
]

VARIANTS = ["performer_favor_most_general", "performer_relu_most_general"]


def make_step(variant: str, fused: bool, image: int, patch: int, batch: int):
    from efficient_rpe_vit_tpu.configs import mnist_config
    from efficient_rpe_vit_tpu.models import create_model
    from efficient_rpe_vit_tpu.train import create_train_state, make_train_step

    cfg = mnist_config(
        image_size=image, patch_size=patch, batch_size=batch,
        dim=768, depth=12, heads=12, mlp_dim=3072, dropout=0.0,
        compute_dtype="bfloat16",
    )
    model = create_model(
        variant, cfg,
        attention_config={"fused_phi": True} if fused else None,
    )
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
    t0 = time.perf_counter()
    for _ in range(steps):
        key, sub = jax.random.split(key)
        state, loss, _ = train_step(state, images, labels, sub)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    float(loss + 0.0 * jnp.sum(leaf.astype(jnp.float32)))
    return time.perf_counter() - t0, state, key


def bench(variant, label, image, patch, n, batch, steps, warmup=3):
    arms = {}
    for mode, fused in (("xla_phi", False), ("fused_phi", True)):
        train_step, state, images, labels, key = make_step(
            variant, fused, image, patch, batch)
        for _ in range(warmup):
            key, sub = jax.random.split(key)
            state, loss, _ = train_step(state, images, labels, sub)
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        float(loss + 0.0 * jnp.sum(leaf.astype(jnp.float32)))
        arms[mode] = dict(step=train_step, state=state, images=images,
                          labels=labels, key=key, times=[])

    for mode in ("xla_phi", "fused_phi", "fused_phi", "xla_phi"):
        a = arms[mode]
        dt, a["state"], a["key"] = timed_chain(
            a["step"], a["state"], a["images"], a["labels"], a["key"], steps)
        a["times"].append(dt / steps)

    rows = {}
    for mode, a in arms.items():
        per_step = sorted(a["times"])[len(a["times"]) // 2]
        rows[mode] = {
            "step_ms": per_step * 1e3,
            "images_per_sec": batch / per_step,
            "chains_ms": [t * 1e3 for t in a["times"]],
        }
        print(f"{variant} {label} {mode}: "
              f"{rows[mode]['images_per_sec']:.1f} img/s  "
              f"{rows[mode]['step_ms']:.1f} ms/step  "
              f"chains={[f'{t*1e3:.0f}' for t in a['times']]}", flush=True)
    rows["speedup_fused_over_xla"] = (
        rows["xla_phi"]["step_ms"] / rows["fused_phi"]["step_ms"])
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="+", default=VARIANTS)
    ap.add_argument("--steps-scale", type=float, default=1.0)
    ap.add_argument("--out", default="results/fused_phi_ab_r5.json")
    args = ap.parse_args()

    backend = jax.default_backend()
    print(f"backend={backend}  fused-phi vs xla-phi, full ViT-B train step")
    result = {"backend": backend, "dims": {"dim": 768, "heads": 12,
              "head_dim": 64, "mlp_dim": 3072, "depth": 12,
              "dtype": "bfloat16"}, "variants": {}}
    for variant in args.variants:
        for label, image, patch, n, batch, steps in SHAPES:
            steps = max(3, int(steps * args.steps_scale))
            try:
                result["variants"][f"{variant}@{label}"] = bench(
                    variant, label, image, patch, n, batch, steps)
            except Exception as e:
                print(f"{variant} {label}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}")
                result["variants"][f"{variant}@{label}"] = {
                    "error": f"{type(e).__name__}: {str(e)[:300]}"}
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
