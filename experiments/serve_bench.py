#!/usr/bin/env python
"""Serving latency benchmark: exported artifacts vs the live model.

The int8/bf16 export work (docs/SERVING.md) measured artifact SIZE and
ACCURACY; this closes the loop with measured serving LATENCY on the real
chip. For each weights dtype (fp32 / bfloat16 / int8) the trained
checkpoint is exported in-process for the current backend, and the
artifact's forward is timed with the calibrated chained value-fetch
protocol (docs/BENCHMARKING.md rules 1/2/6 — the only protocol that
resolves sub-millisecond models through the ~25 ms tunnel round trip).
A live `model.apply` control row quantifies the artifact call overhead
(expected ~zero: jax.export replays the same StableHLO the live jit
compiles).

Reference anchor: the reference's only serving story is re-running
`benchmark_inference` on the torch module (experiments/utils/
training.py:210-283); it has no deployment artifact to measure.

Usage:
    python experiments/serve_bench.py \
        [--checkpoint results/int8_quant_r3/train/baseline_mnist_best.msgpack]
        [--batches 1 32 256] [--out results/serve_bench_r3.json] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_CKPT = "results/int8_quant_r3/train/baseline_mnist_best.msgpack"


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=DEFAULT_CKPT)
    p.add_argument("--model", default=None,
                   help="variant name; default from checkpoint metadata")
    p.add_argument("--dataset", default=None,
                   choices=[None, "mnist", "cifar10"])
    p.add_argument("--batches", nargs="+", type=int, default=[1, 32, 256])
    p.add_argument("--out", default="results/serve_bench_r3.json")
    p.add_argument("--quick", action="store_true",
                   help="uncalibrated short chains (CI smoke, not a "
                        "measurement)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--vitb", action="store_true",
                   help="serve a ViT-B/16 (224x224x3, dim 768, depth 12, "
                        "N=197, 1000 classes) instead of a checkpoint — "
                        "the scale where p50 ms/sample means something "
                        "(VERDICT r4 #7). The model is briefly fitted on a "
                        "fixed synthetic set so the int8-vs-fp32 agreement "
                        "rows measure a structured function, then every "
                        "artifact dtype is timed AND compared against the "
                        "fp32 artifact (top-1 agreement + logit MAE).")
    p.add_argument("--fit-steps", type=int, default=40,
                   help="--vitb: synthetic fit steps before export")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from efficient_rpe_vit_tpu.configs import cifar10_config, mnist_config
    from efficient_rpe_vit_tpu.models import create_model
    from efficient_rpe_vit_tpu.serve import export_forward
    from efficient_rpe_vit_tpu.train import (
        benchmark_inference,
        create_train_state,
    )
    from efficient_rpe_vit_tpu.train.checkpoint import (
        load_checkpoint,
        model_kwargs_from_metadata,
    )

    if args.vitb:
        from efficient_rpe_vit_tpu.train import make_train_step

        model_name = args.model or "baseline"
        dataset = "synthetic-imagenet-shaped"
        cfg = mnist_config(
            image_size=224, patch_size=16, in_channels=3, num_classes=1000,
            dim=768, depth=12, heads=12, mlp_dim=3072, dropout=0.0,
            compute_dtype="bfloat16", batch_size=32,
            learning_rate=1e-4, scheduler="constant",
        )
        model = create_model(model_name, cfg)
        m = cfg.model
        sample = jnp.zeros((2, m.image_size, m.image_size, m.in_channels))
        state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   sample, steps_per_epoch=args.fit_steps)
        # brief synthetic fit: exported logits become a structured
        # function of the input, so the int8 agreement rows below are a
        # meaningful proxy for the accuracy delta (no real ImageNet-scale
        # data exists in this environment — the honest substitute)
        fit_key = jax.random.PRNGKey(42)
        fit_x = jax.random.normal(fit_key, (64, 224, 224, 3))
        fit_y = jnp.arange(64) % 1000
        step_fn = make_train_step(model, donate=True)
        key = jax.random.PRNGKey(7)
        for i in range(args.fit_steps):
            b = (i % 2) * 32
            key, sub = jax.random.split(key)
            state, loss, _ = step_fn(
                state, fit_x[b:b + 32], fit_y[b:b + 32], sub)
        print(f"vitb fit: {args.fit_steps} steps, final loss "
              f"{float(loss):.3f}")
        state = state.eval_view()
        variables = {"params": state.params}
        if state.constants is not None:
            variables["constants"] = state.constants
    else:
        meta = {}
        meta_path = args.checkpoint + ".meta.json"
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f).get("metadata", {})
        model_name = args.model or meta.get("model_name")
        dataset = args.dataset or meta.get("dataset", "mnist")
        if model_name is None:
            raise SystemExit("--model required (no checkpoint metadata)")

        cfg = mnist_config() if dataset == "mnist" else cifar10_config()
        model = create_model(model_name, cfg,
                             **model_kwargs_from_metadata(meta))
        m = cfg.model
        sample = jnp.zeros((2, m.image_size, m.image_size, m.in_channels))
        state = create_train_state(
            model, cfg, jax.random.PRNGKey(0), sample,
            ema_decay=float(meta.get("ema_decay") or 0.0))
        state, _ = load_checkpoint(args.checkpoint, state)
        state = state.eval_view()
        variables = {"params": state.params}
        if state.constants is not None:
            variables["constants"] = state.constants

    backend = jax.default_backend()
    print(f"backend={backend}  model={model_name}  dataset={dataset}")

    bench_kwargs = dict(num_chains=3, num_iterations=6,
                        target_chain_time=0.0) if args.quick else \
        dict(num_chains=10, num_iterations=100)

    def artifact_chain(exported):
        """Chained forwards through the DESERIALIZED artifact (same
        data-dependent coupling as make_inference_chain; the loop bound is
        traced, so calibration reuses one compile)."""

        @jax.jit
        def chain(_variables, images, length):
            def body(_, x):
                out = exported.call(x)
                return images + (1e-30 * jnp.sum(out)).astype(images.dtype)

            x = jax.lax.fori_loop(0, length, body, images)
            return jnp.sum(x)

        return chain

    rows = []
    artifacts = {}
    # (label, weights_dtype or the live-model sentinel)
    cases = [("live_model", "live"), ("artifact_fp32", None),
             ("artifact_bf16", "bfloat16"), ("artifact_int8", "int8")]
    for label, wd in cases:
        # each case is fault-isolated: at ViT-B scale the fp32
        # weight-embedded artifact is ~340 MB of StableHLO constants,
        # which this environment's remote-compile tunnel rejects outright
        # (HTTP 413 request-length limit) — an environment ceiling, not a
        # framework one; the bf16/int8 artifacts (the dtypes one would
        # actually serve) fit. Record the error and keep measuring.
        try:
            chain_fn = None
            artifact_bytes = None
            if wd != "live":
                exported = export_forward(
                    model, variables, image_size=m.image_size,
                    in_channels=m.in_channels, weights_dtype=wd,
                )
                # measure what would be written to disk, then serve the
                # deserialized form — exactly the production path
                blob = bytes(exported.serialize())
                artifact_bytes = len(blob)
                from jax import export as jax_export

                exported = jax_export.deserialize(bytearray(blob))
                artifacts[label] = exported
                chain_fn = artifact_chain(exported)
            for batch in args.batches:
                # per-batch isolation: a transient tunnel error on one
                # batch size must not discard the case's other rows or
                # its agreement entry below
                try:
                    images = jax.random.normal(
                        jax.random.PRNGKey(batch),
                        (batch, m.image_size, m.image_size, m.in_channels),
                    )
                    r = benchmark_inference(state, model, images,
                                            chain_fn=chain_fn,
                                            **bench_kwargs)
                except Exception as e:
                    err = f"{type(e).__name__}: {str(e)[:300]}"
                    rows.append({"case": label, "batch": batch,
                                 "error": err})
                    print(f"{label:14s} B={batch:<4d} FAILED {err}",
                          flush=True)
                    if "413" in err:
                        # request-length limit: deterministic for this
                        # artifact size — retrying other batches would
                        # burn ~10 min per compile attempt for the same
                        # outcome
                        break
                    continue
                row = {"case": label, "batch": batch,
                       "p50_ms": r["latency_p50_ms"],
                       "mean_ms": r["latency_mean_ms"],
                       "us_per_sample": r["latency_ms_per_sample"] * 1e3,
                       "images_per_sec": r["throughput_images_per_sec"],
                       "chain_length": r["chain_length"],
                       "fetch_rt_ms": r["fetch_rt_ms"]}
                if artifact_bytes is not None:
                    row["artifact_bytes"] = artifact_bytes
                if r.get("clipped_chains"):
                    row["clipped_chains"] = r["clipped_chains"]
                rows.append(row)
                print(f"{label:14s} B={batch:<4d} "
                      f"p50 {row['p50_ms']:.4f} ms/batch"
                      f"  {row['us_per_sample']:.2f} us/sample"
                      f"  {row['images_per_sec']:,.0f} img/s", flush=True)
        except Exception as e:
            # export/serialize/compile failure for the whole case (e.g.
            # the ~340 MB fp32 ViT-B artifact vs the remote-compile
            # request limit) — record and keep measuring the other cases
            artifacts.pop(label, None)
            err = f"{type(e).__name__}: {str(e)[:300]}"
            rows.append({"case": label, "error": err})
            if artifact_bytes is not None:
                rows[-1]["artifact_bytes"] = artifact_bytes
            print(f"{label:14s} FAILED {err}", flush=True)

    agreement = None
    if args.vitb and ("artifact_fp32" in artifacts or artifacts):
        # quantization fidelity at ViT-B scale: top-1 agreement + logit
        # error of each reduced-precision artifact vs the fp32 reference
        # on held-out inputs (the int8 "accuracy delta" at a scale with
        # no real eval set in this environment). When the fp32 ARTIFACT
        # cannot compile here (340 MB StableHLO vs the remote-compile
        # request limit), the live fp32-weights model is the reference —
        # same weights, same math.
        probe = jax.random.normal(jax.random.PRNGKey(123),
                                  (64, m.image_size, m.image_size,
                                   m.in_channels))
        if "artifact_fp32" in artifacts:
            ref_logits = artifacts["artifact_fp32"].call(probe)
            ref_name = "artifact_fp32"
        else:
            ref_logits = model.apply(variables, probe, deterministic=True)
            ref_name = "live_model_fp32_weights"
        ref_logits = ref_logits.astype(jnp.float32)
        ref_top1 = jnp.argmax(ref_logits, -1)
        agreement = {"reference": ref_name}
        for label in ("artifact_bf16", "artifact_int8"):
            if label not in artifacts:
                continue
            try:
                lg = artifacts[label].call(probe).astype(jnp.float32)
            except Exception as e:
                # the agreement probe is a fresh batch-64 compile of the
                # weight-embedded artifact — the same tunnel limits that
                # can fail a latency row apply here; keep the record
                agreement[label] = {
                    "error": f"{type(e).__name__}: {str(e)[:300]}"}
                print(f"{label}: agreement probe FAILED "
                      f"{agreement[label]['error']}", flush=True)
                continue
            agreement[label] = {
                "top1_agreement": float(
                    jnp.mean(jnp.argmax(lg, -1) == ref_top1)),
                "logit_mae": float(jnp.mean(jnp.abs(lg - ref_logits))),
                "logit_max_abs": float(jnp.max(jnp.abs(ref_logits))),
            }
            print(f"{label}: top-1 agreement "
                  f"{agreement[label]['top1_agreement']*100:.1f}%  "
                  f"logit MAE {agreement[label]['logit_mae']:.4f} "
                  f"(|logit| max {agreement[label]['logit_max_abs']:.2f})")

    result = {"backend": backend, "model": model_name, "dataset": dataset,
              "checkpoint": None if args.vitb else args.checkpoint,
              "quick": bool(args.quick), "rows": rows}
    if args.vitb:
        result["dims"] = {"image": 224, "patch": 16, "dim": 768,
                          "depth": 12, "heads": 12, "num_classes": 1000,
                          "fit_steps": args.fit_steps}
        result["agreement_vs_fp32_artifact"] = agreement
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
