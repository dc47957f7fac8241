#!/usr/bin/env python
"""Long-N convergence evidence: ViT-B N=4097 actually LEARNS (VERDICT r4 #3).

The round-4 artifact (results/longn_dropout_train_r4.json) proved only
no-NaN/no-OOM — 5 steps of RISING loss at the config-default LR 1e-3,
which is far too hot for dim-768/B=4. This run trains >=100 steps with
reference-default attention dropout 0.1 (softmax.py:112) at an LR sized
for the shape, on BOTH long-N attention routes:

  * baseline                      — flash softmax Pallas path (in-kernel
                                    hashed dropout + fused backward),
  * performer_favor_most_general  — KERPLE coeffs-native Pallas path.

The data is a small fixed synthetic set (distinct labeled images, cycled)
so the model can genuinely fit it: a downward loss curve demonstrates the
gradients drive the weights toward the data, not merely that the step is
finite. Done = final loss < initial loss with a visibly downward trend
(reference training loop contract: experiments/utils/training.py:20-104).

Usage: python experiments/longn_train.py [--steps 120] [--out F]
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

VARIANTS = ["baseline", "performer_favor_most_general"]


def run(variant: str, steps: int, lr: float, batch: int = 4,
        n_train: int = 16):
    from efficient_rpe_vit_tpu.configs import mnist_config
    from efficient_rpe_vit_tpu.models import create_model
    from efficient_rpe_vit_tpu.train import create_train_state, make_train_step

    cfg = mnist_config(
        image_size=128, patch_size=2, batch_size=batch,
        dim=768, depth=12, heads=12, mlp_dim=3072,
        dropout=0.1,                      # reference default, in-kernel
        compute_dtype="bfloat16",
        learning_rate=lr, scheduler="constant", epochs=1,
    )
    model = create_model(variant, cfg)
    rng = jax.random.PRNGKey(0)
    m = cfg.model
    sample = jnp.zeros((2, m.image_size, m.image_size, m.in_channels))
    state = create_train_state(model, cfg, rng, sample,
                               steps_per_epoch=steps)
    step_fn = make_train_step(model, donate=True)

    data_key = jax.random.PRNGKey(42)
    images = jax.random.normal(
        data_key, (n_train, m.image_size, m.image_size, m.in_channels))
    labels = jnp.arange(n_train) % m.num_classes
    n_batches = n_train // batch

    losses, accs = [], []
    key = jax.random.PRNGKey(7)
    t0 = time.perf_counter()
    for i in range(steps):
        b = i % n_batches
        x = images[b * batch:(b + 1) * batch]
        y = labels[b * batch:(b + 1) * batch]
        key, sub = jax.random.split(key)
        state, loss, correct = step_fn(state, x, y, sub)
        losses.append(float(loss))
        accs.append(float(correct) / batch)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))  # value-fetch barrier
    wall = time.perf_counter() - t0

    first5 = sum(losses[:5]) / 5
    last5 = sum(losses[-5:]) / 5
    row = {
        "variant": variant,
        "steps": steps,
        "lr": lr,
        "batch": batch,
        "n_train": n_train,
        "dropout": 0.1,
        "losses": losses,
        "accuracies": accs,
        "loss_first5_mean": first5,
        "loss_last5_mean": last5,
        "decreased": last5 < first5,
        "finite": all(jnp.isfinite(jnp.asarray(losses)).tolist()),
        "wall_s": wall,
    }
    print(f"{variant}: loss {losses[0]:.3f} -> {losses[-1]:.3f} "
          f"(first5 {first5:.3f}, last5 {last5:.3f}, "
          f"{'DOWN' if row['decreased'] else 'NOT DOWN'}), "
          f"acc {accs[-1]*100:.0f}%, {wall:.0f}s", flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--variants", nargs="+", default=VARIANTS)
    ap.add_argument("--out", default="results/longn_train_r5.json")
    args = ap.parse_args()

    result = {
        "backend": jax.default_backend(),
        "N": 4097,
        "dims": {"dim": 768, "heads": 12, "mlp_dim": 3072, "depth": 12,
                 "dtype": "bfloat16"},
        "note": (
            "ViT-B N=4097, reference-default attention dropout 0.1, "
            "constant LR, fixed synthetic set (16 images cycled): a "
            "downward loss curve = the long-N Pallas gradients (flash "
            "softmax / KERPLE coeffs) drive real learning, replacing the "
            "rising-loss smoke test longn_dropout_train_r4.json."
        ),
        "runs": [],
    }
    for v in args.variants:
        result["runs"].append(run(v, args.steps, args.lr))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
