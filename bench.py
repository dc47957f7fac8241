#!/usr/bin/env python
"""Headline benchmark: KERPLE training throughput (images/sec/chip).

Replicates the reference's benchmarked configuration
(docs/KERPLE_DOCUMENTATION.md:160-165): FAVOR+ + KERPLE on MNIST-shaped
inputs at sequence length 197 (28x28, patch 2 -> 196 patches + CLS),
batch 256 — where the reference reports 500-800 images/sec on a single GPU.

Measures the full training step (forward + backward + optimizer), dispatched
as K-step fused `lax.scan` programs (`make_multi_step` — the framework's
production dispatch path, `train.py --fused-steps`), and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is against the reference's midpoint (650 img/s).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_IMAGES_PER_SEC = 650.0  # reference midpoint of 500-800 img/s
BATCH = 256
# K complete optimizer steps per dispatch (make_multi_step: one lax.scan
# program, the TPU-native analogue of CUDA-graph step capture). Even at
# this batch size the ~3 ms/call tunnel dispatch costs ~15% of the 6.4 ms
# step — fusing K steps amortises it away (measured +15% end-to-end;
# docs/BENCHMARKING.md "fused multi-step").
FUSED_K = 25
WARMUP_CALLS = 2
# Enough fused calls that the ~25 ms value-fetch barrier round trip is
# <0.1% of the timed region (utils/timing.py: block_until_ready is NOT a
# trustworthy barrier through the TPU tunnel — only a host value fetch is).
TIMED_CALLS = 8
HEALTH_TIMEOUT_S = 300  # first TPU compile can take minutes via the tunnel
# TPU v5e (v5 lite) peak: 197 TFLOP/s bf16 per chip (public spec).
PEAK_FLOPS_BF16 = 197e12


def _device_healthy(timeout_s: int = HEALTH_TIMEOUT_S) -> bool:
    """Probe the default backend in a SUBPROCESS with a timeout: a degraded
    remote-TPU tunnel hangs compiles indefinitely, which would otherwise
    hang this benchmark forever. The probe fetches a VALUE (not just
    block_until_ready, which can lie through the tunnel)."""
    probe = (
        "import jax, jax.numpy as jnp;"
        "print(float(jnp.sum(jax.jit(lambda x: x @ x)(jnp.ones((64, 64))))),"
        "jax.default_backend())"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", probe], capture_output=True, text=True,
            timeout=timeout_s,
        )
        return out.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _wait_for_device(attempts: int = 20, probe_timeout_s: int = HEALTH_TIMEOUT_S,
                     sleep_s: int = 150) -> bool:
    """Tunnel outages ranged from 20-60 min (round 2) to 4+ HOURS
    (round 3, 2026-08-18). Retry the health probe (each allowed the full
    first-compile window, HEALTH_TIMEOUT_S — a healthy-but-slow tunnel
    must not read as dead; a hard-down tunnel fails fast with
    UNAVAILABLE) for up to ~50 min fast-fail / ~2.5 h hang-bounded before
    surrendering to the CPU fallback, so an end-of-round capture that
    lands inside an outage still records a real-TPU number."""
    for i in range(attempts):
        if _device_healthy(probe_timeout_s):
            return True
        if i < attempts - 1:
            time.sleep(sleep_s)
    return False


_FALLBACK = not _wait_for_device()

import jax  # noqa: E402

if _FALLBACK:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def main():
    from efficient_rpe_vit_tpu.configs import mnist_config
    from efficient_rpe_vit_tpu.models import create_model
    from efficient_rpe_vit_tpu.train import (
        create_train_state,
        make_multi_step,
    )

    # reference benchmark conditions: seq len 196 patches -> patch_size 2.
    # bfloat16 compute (fp32 params/accumulation) is the TPU-native policy:
    # measured 1.4-4.4x over fp32 on v5e, still trains to the same accuracy
    # (tests/test_bf16.py).
    cfg = mnist_config(patch_size=2, batch_size=BATCH,
                       compute_dtype="bfloat16")
    model = create_model("performer_favor_most_general", cfg)
    rng = jax.random.PRNGKey(0)
    m = cfg.model
    sample = jnp.zeros((2, m.image_size, m.image_size, m.in_channels))
    state = create_train_state(model, cfg, rng, sample, steps_per_epoch=100)
    multi_step = make_multi_step(model, donate=True)

    images = jax.random.normal(rng, (BATCH, m.image_size, m.image_size,
                                     m.in_channels))
    labels = jnp.arange(BATCH) % m.num_classes
    # K stacked copies of the batch: each scan iteration is one complete
    # optimizer step on a [BATCH]-sized batch (the reference's protocol),
    # dispatched K-at-a-time
    images_k = jax.device_put(jnp.broadcast_to(images, (FUSED_K,) + images.shape))
    labels_k = jax.device_put(jnp.broadcast_to(labels, (FUSED_K,) + labels.shape))

    def chain_barrier(state, loss):
        """Value fetch covering the ENTIRE chain: the loss alone forces only
        the last step's forward; folding in a param leaf forces its
        backward + optimizer update as well. block_until_ready must not be
        used — it can return early through the tunnel (docs/BENCHMARKING.md
        rule 6)."""
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        return float(loss + 0.0 * jnp.sum(leaf.astype(jnp.float32)))

    key = rng
    for _ in range(WARMUP_CALLS):
        key, sub = jax.random.split(key)
        state, losses, _ = multi_step(state, images_k, labels_k, sub)
    chain_barrier(state, losses[-1])

    t0 = time.perf_counter()
    for _ in range(TIMED_CALLS):
        key, sub = jax.random.split(key)
        state, losses, _ = multi_step(state, images_k, labels_k, sub)
    chain_barrier(state, losses[-1])
    elapsed = time.perf_counter() - t0

    images_per_sec = BATCH * FUSED_K * TIMED_CALLS / elapsed
    result = {
        "metric": "kerple_train_throughput_seq197_bs256",
        "value": round(images_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 2),
    }
    # MFU from the HLO's own FLOP count (XLA cost analysis) against the
    # chip's bf16 peak — the honest cross-hardware efficiency metric
    # (VERDICT r1 missing #6). Lowered.cost_analysis() reads the estimate
    # WITHOUT a second compile (lower().compile() would recompile the whole
    # step, minutes through the tunnel — review finding). Guarded:
    # availability varies by backend/plugin version.
    try:
        from efficient_rpe_vit_tpu.train import make_train_step

        # FLOPs from the SINGLE-step program's cost analysis: per-step
        # FLOPs are identical inside the K-step scan, and lowering/AOT-
        # compiling the one-step program is minutes cheaper through the
        # tunnel than recompiling the whole fused program (the axon
        # plugin only exposes cost analysis on a compiled executable)
        one_step = make_train_step(model, donate=False)
        key, sub = jax.random.split(key)
        lowered = one_step.lower(state, images, labels, sub)
        ca = lowered.cost_analysis()
        if not ca or "flops" not in ca:
            ca = lowered.compile().cost_analysis()
        flops = float(ca["flops"])  # one optimizer step
        result["flops_per_step"] = flops
        result["mfu"] = round(
            flops * FUSED_K * TIMED_CALLS / elapsed / PEAK_FLOPS_BF16, 5
        )
    except Exception:
        pass
    if _FALLBACK:
        # the accelerator tunnel was unreachable; this number is CPU-only
        result["backend"] = "cpu-fallback"
        # MFU/FLOP-rate vs the TPU peak are meaningless on CPU
        result.pop("mfu", None)
        result.pop("flops_per_step", None)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
