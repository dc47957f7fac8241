#!/usr/bin/env python
"""ViT-Base-scale training benchmark with an MFU target (VERDICT r2 #1).

The round-2 headline (dim 32, head_dim 16) defends 3.2% MFU with a roofline
argument — the MXU idles at those shapes. This benchmark measures the full
jitted train step (fwd + bwd + adam) at the dims the reference's own
Circulant suite uses (dim 768, 12 heads, head_dim 64 —
/root/reference/test_circulant_string.py:30-43), bfloat16, at N in
{197, 1025, 4097} (196 / 32x32 / 64x64 patch grids + CLS), for:

  * baseline              — softmax attention (memory-aware auto dispatch:
                            dense below the HBM byte budget, flash Pallas
                            kernel above it, ops/attention_core.py),
  * performer_favor       — FAVOR+ O(N) linear attention (F = 266),
  * performer_favor_most_general — KERPLE (dense masked-matmul vs streamed
                            FFT, memory-bounded auto dispatch).

Protocol: chained train steps (state feeds forward), one value-fetch
barrier around the timed chain (docs/BENCHMARKING.md rule 6 — the only
trustworthy protocol on the tunneled TPU). MFU = XLA-cost-analysis FLOPs x
steps / elapsed / chip peak (197 TFLOP/s bf16 on v5e).

Batch sizes are chosen to fit a 16 GB chip at ViT-B activation sizes
(no rematerialisation in the step): 64 @ N=197, 16 @ N=1025, 4 @ N=4097.
At N=4097 the softmax dense path's [B,H,N,N] temps would need ~19 GB, so
'auto' rides the flash kernel — the regime where dense simply OOMs.

Usage:  python experiments/vitbase_bench.py [--steps-scale 1.0] [--out F]
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
    ("N=4097", 128, 2, 4097, 4, 5),
]

VARIANTS = ["baseline", "performer_favor", "performer_favor_most_general"]


def pallas_attention_flops(variant: str, B: int, H: int, N: int, D: int,
                           depth: int, num_features) -> float:
    """Analytic FLOPs of the Pallas attention custom calls in one train
    step — XLA's cost analysis reports ZERO flops for custom calls, so
    without this the MFU of any variant riding a Pallas path is
    under-reported by the attention's entire FLOP count (measured: at
    N=4097 the softmax row's XLA-visible flops (8.50T) came out BELOW the
    all-XLA FAVOR+ row's (9.49T)).

    Counts true (unpadded) matmul flops, mirroring the kernels:
      * flash softmax: fwd S + PV = 2 matmuls; tiled bwd = 5 (S, dP, dv,
        dq, dk) -> 7 * 2*B*H*N^2*D per layer (flash_bwd.py).
      * coeffs-native KERPLE: fwd QK^T (F) + Wv (D); bwd P1 2, P2 4,
        P3 2 -> 5 * 2*B*H*N^2*(F+D) per layer (masked_linear_coeffs.py).
    Gated on the same dispatch conditions the model uses; returns 0 when
    the variant runs a pure-XLA path (already counted by cost analysis).
    """
    from efficient_rpe_vit_tpu.ops.attention_core import (
        KERPLE_DENSE_CROSSOVER_N,
        KERPLE_DENSE_MEMORY_BUDGET,
        softmax_needs_flash,
    )
    from efficient_rpe_vit_tpu.ops.feature_maps import (
        default_num_features,
        mxu_num_features,
    )
    from efficient_rpe_vit_tpu.ops.pallas import pallas_available

    from efficient_rpe_vit_tpu.ops import rotations

    if not pallas_available():
        return 0.0
    total = 0.0
    rot_prefer = (
        (variant.startswith("baseline") or variant == "vit")
        and softmax_needs_flash(B, H, N)
    )
    if ("circulant" in variant
            and rotations.rotation_kernel_enabled(rot_prefer)):
        # round 5: the circulant rotation is a Pallas kernel on the
        # flash-consumer path (ops/pallas/rotation_kernels.py; "auto"
        # dispatch — ops/rotations.py USE_PALLAS_ROTATION note). True
        # matmul flops: fwd 4 DFT contractions per q/k call
        # (8*B*H*N*D*K each call), bwd 6 (dx 4 + spectrum recompute 2) —
        # rope stays an XLA matmul (counted by cost analysis).
        K = D // 2 + 1
        total += depth * (16.0 + 24.0) * B * H * N * D * K
    if variant.startswith("baseline") or variant == "vit":
        # softmax family: the rope rotation is XLA-side (already counted);
        # the flash kernel flops are rotation-independent
        if softmax_needs_flash(B, H, N):
            total += depth * 7.0 * 2 * B * H * N * N * D
        return total
    if "most_general" in variant:  # KERPLE (favor_plus and relu families)
        dense_bytes = 5 * B * H * N * N * 4
        if (N >= KERPLE_DENSE_CROSSOVER_N
                or dense_bytes > KERPLE_DENSE_MEMORY_BUDGET):
            if num_features == "mxu":
                F = mxu_num_features(D)
            elif num_features is not None:
                F = int(num_features)
            else:
                F = default_num_features(D)
            total += depth * 5.0 * 2 * B * H * N * N * (F + D)
        return total
    return total  # plain linear attention: pure XLA einsums


def bench_one(variant: str, image: int, patch: int, batch: int,
              steps: int, warmup: int = 3, remat: bool = False,
              num_features=None):
    from efficient_rpe_vit_tpu.configs import mnist_config
    from efficient_rpe_vit_tpu.models import create_model
    from efficient_rpe_vit_tpu.train import create_train_state, make_train_step

    # dropout 0: attention-probability dropout would pin softmax to the
    # dense path (no flash with dropout), and removing it makes the three
    # mechanisms' steps directly comparable
    cfg = mnist_config(
        image_size=image, patch_size=patch, batch_size=batch,
        dim=768, depth=12, heads=12, mlp_dim=3072, dropout=0.0,
        compute_dtype="bfloat16",
    )
    kw = {}
    if remat:
        kw["remat"] = True
    if num_features is not None and variant != "baseline":
        # 'mxu' -> lane-aligned feature count (256 at D=64 instead of the
        # paper default 266, which pads to 384 lanes: 1.44x wasted MXU
        # work on every F matmul); ints pass through
        kw["attention_config"] = {"num_features": num_features}
    model = create_model(variant, cfg, **kw)
    rng = jax.random.PRNGKey(0)
    m = cfg.model
    sample = jnp.zeros((2, m.image_size, m.image_size, m.in_channels))
    state = create_train_state(model, cfg, rng, sample, steps_per_epoch=100)
    train_step = make_train_step(model, donate=True)

    images = jax.random.normal(
        rng, (batch, m.image_size, m.image_size, m.in_channels)
    )
    labels = jnp.arange(batch) % m.num_classes

    def chain_barrier(state, loss):
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        return float(loss + 0.0 * jnp.sum(leaf.astype(jnp.float32)))

    key = rng
    # FLOPs from the lowered HLO before the timed region (no extra compile
    # when the backend provides lowered cost analysis)
    flops = None
    try:
        key, sub = jax.random.split(key)
        lowered = train_step.lower(state, images, labels, sub)
        ca = lowered.cost_analysis()
        if not ca or "flops" not in ca:
            ca = lowered.compile().cost_analysis()
        flops = float(ca["flops"])
    except Exception as e:  # pragma: no cover - backend dependent
        print(f"  [warn] cost analysis unavailable: {e}")

    for _ in range(warmup):
        key, sub = jax.random.split(key)
        state, loss, _ = train_step(state, images, labels, sub)
    chain_barrier(state, loss)

    t0 = time.perf_counter()
    for _ in range(steps):
        key, sub = jax.random.split(key)
        state, loss, _ = train_step(state, images, labels, sub)
    chain_barrier(state, loss)
    elapsed = time.perf_counter() - t0

    out = {
        "variant": variant,
        "batch": batch,
        "timed_steps": steps,
        "step_ms": elapsed / steps * 1e3,
        "images_per_sec": batch * steps / elapsed,
    }
    if flops is not None:
        pallas_flops = pallas_attention_flops(
            variant, batch, 12, (image // patch) ** 2 + 1, 64, 12,
            num_features)
        out["flops_per_step_xla"] = flops
        out["mfu_xla"] = flops * steps / elapsed / PEAK_FLOPS_BF16
        if pallas_flops:
            out["pallas_attention_flops"] = pallas_flops
        out["flops_per_step"] = flops + pallas_flops
        out["mfu"] = out["flops_per_step"] * steps / elapsed / PEAK_FLOPS_BF16
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-scale", type=float, default=1.0)
    ap.add_argument("--out", default="results/vitbase_bench_r3.json")
    ap.add_argument("--variants", nargs="+", default=VARIANTS)
    ap.add_argument("--remat", action="store_true",
                    help="activation-checkpoint each block (trade FLOPs "
                         "for HBM at long N)")
    ap.add_argument("--shapes", nargs="+", default=None,
                    help="subset of shape labels, e.g. N=197 N=1025")
    ap.add_argument("--num-features", default=None,
                    help="linear-attention feature count: an int or 'mxu' "
                         "(lane-aligned; ops/feature_maps.py). Default: "
                         "the paper default floor(d ln d) = 266 at D=64.")
    args = ap.parse_args()
    num_features = args.num_features
    if num_features is not None and num_features != "mxu":
        num_features = int(num_features)

    backend = jax.default_backend()
    print(f"backend={backend}  ViT-B dims: 768/12h/D64, mlp 3072, "
          f"depth 12, bf16, full train step (fwd+bwd+adam)")
    rows = []
    for label, image, patch, N, batch, steps in SHAPES:
        if args.shapes and label not in args.shapes:
            continue
        steps = max(3, int(steps * args.steps_scale))
        for variant in args.variants:
            try:
                r = bench_one(variant, image, patch, batch, steps,
                              remat=args.remat, num_features=num_features)
            except Exception as e:
                print(f"{label} {variant}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}")
                rows.append({"shape": label, "N": N, "variant": variant,
                             "error": f"{type(e).__name__}: {str(e)[:300]}"})
                continue
            r.update({"shape": label, "N": N})
            rows.append(r)
            mfu = f"{r['mfu']*100:.1f}%" if "mfu" in r else "n/a"
            print(f"{label} {variant}: {r['images_per_sec']:.1f} img/s  "
                  f"{r['step_ms']:.1f} ms/step (B={r['batch']})  MFU {mfu}",
                  flush=True)

    result = {"backend": backend, "dims": {"dim": 768, "heads": 12,
              "head_dim": 64, "mlp_dim": 3072, "depth": 12,
              "dtype": "bfloat16"}, "rows": rows}
    if num_features is not None:
        result["num_features"] = num_features
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
