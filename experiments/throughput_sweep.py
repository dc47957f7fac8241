#!/usr/bin/env python
"""Per-variant training throughput (images/sec/chip), the BASELINE.json
north-star table: chained full train steps for ALL 11 variants on
CIFAR-10- or MNIST-shaped inputs, value-fetch protocol
(docs/BENCHMARKING.md rules 1/2/6), bf16 compute.

Usage:
    python experiments/throughput_sweep.py [--dataset cifar10]
        [--batch 256] [--steps 60] [--out results/throughput_cifar10.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

VARIANTS = [
    "baseline", "baseline_circulant", "baseline_rope",
    "performer_favor", "performer_favor_most_general",
    "performer_favor_circulant", "performer_favor_rope",
    "performer_relu", "performer_relu_most_general",
    "performer_relu_circulant", "performer_relu_rope",
]


def bench_variant(name: str, dataset: str, batch: int, steps: int):
    from efficient_rpe_vit_tpu.configs import cifar10_config, mnist_config
    from efficient_rpe_vit_tpu.models import create_model
    from efficient_rpe_vit_tpu.train import create_train_state, make_train_step

    cfg = (mnist_config if dataset == "mnist" else cifar10_config)(
        batch_size=batch, compute_dtype="bfloat16"
    )
    m = cfg.model
    model = create_model(name, cfg)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((2, m.image_size, m.image_size, m.in_channels))
    state = create_train_state(model, cfg, rng, sample, steps_per_epoch=100)
    step = make_train_step(model, donate=True)
    images = jax.random.normal(
        rng, (batch, m.image_size, m.image_size, m.in_channels)
    )
    labels = jnp.arange(batch) % m.num_classes

    def chain_barrier(state, loss):
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        return float(loss + 0.0 * jnp.sum(leaf.astype(jnp.float32)))

    key = rng
    for _ in range(5):
        key, sub = jax.random.split(key)
        state, loss, _ = step(state, images, labels, sub)
    chain_barrier(state, loss)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            key, sub = jax.random.split(key)
            state, loss, _ = step(state, images, labels, sub)
        chain_barrier(state, loss)
        times.append((time.perf_counter() - t0) / steps)
    step_s = sorted(times)[1]
    return batch / step_s, step_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="cifar10",
                    choices=["mnist", "cifar10"])
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    results = {"dataset": args.dataset, "batch": args.batch,
               "backend": jax.default_backend(),
               "protocol": "chained value-fetch, median of 3 x "
                           f"{args.steps} steps, bf16",
               "variants": {}}
    print(f"| variant | img/s/chip | ms/step | ({args.dataset}, "
          f"bs {args.batch}, {jax.default_backend()}) |")
    print("|---|---|---|---|")
    for name in VARIANTS:
        ips, step_s = bench_variant(name, args.dataset, args.batch,
                                    args.steps)
        results["variants"][name] = {
            "images_per_sec": round(ips, 1),
            "ms_per_step": round(step_s * 1e3, 3),
        }
        print(f"| {name} | {ips:,.0f} | {step_s*1e3:.2f} | |", flush=True)
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"written to {args.out}")


if __name__ == "__main__":
    main()
