#!/usr/bin/env python
"""Export a trained checkpoint as a self-contained serving artifact.

Reads a `save_checkpoint` msgpack (the variant comes from its metadata,
exactly like predict.py), embeds the trained weights into the jitted
deterministic forward, and serializes it with jax.export — a StableHLO
artifact with a SYMBOLIC batch dimension that any jax process can
deserialize and call without this framework, the flax model zoo, or a
config (the reference's checkpoints, by contrast, need the whole Python
class tree to reload — experiments/utils/training.py:373-413).

Examples:
    python experiments/export.py --checkpoint ckpt.msgpack --out model.hlo
    python experiments/export.py --checkpoint ckpt.msgpack --out model.hlo \
        --platforms cpu tpu        # CPU host exporting for TPU serving
    python experiments/export.py --model baseline --out model.hlo  # fresh init
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None,
                   help="path written by save_checkpoint (msgpack); omit "
                        "to export a freshly initialised model (pipeline "
                        "testing)")
    p.add_argument("--model", default=None,
                   help="variant name; default from the checkpoint metadata")
    p.add_argument("--dataset", default=None, choices=[None, "mnist", "cifar10"])
    p.add_argument("--out", required=True, help="artifact path to write")
    p.add_argument("--platforms", nargs="+", default=None,
                   help="lowering platforms (e.g. cpu tpu); default: "
                        "current backend")
    p.add_argument("--weights-dtype", default=None,
                   choices=[None, "bfloat16", "float32", "int8"],
                   help="cast floating weights for the artifact (bfloat16 "
                        "halves its size and is the MXU's native input; "
                        "int8 = weight-only symmetric per-channel "
                        "quantization, ~4x smaller, logits move by "
                        "quantization error)")
    p.add_argument("--validate", action="store_true",
                   help="reload the artifact and check logits vs the live "
                        "model at two batch sizes")
    p.add_argument("--cpu", action="store_true")
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
    from efficient_rpe_vit_tpu.serve import load_exported, save_exported
    from efficient_rpe_vit_tpu.train import create_train_state
    from efficient_rpe_vit_tpu.train.checkpoint import load_checkpoint

    meta = {}
    if args.checkpoint:
        meta_path = args.checkpoint + ".meta.json"
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f).get("metadata", {})
    model_name = args.model or meta.get("model_name")
    dataset = args.dataset or meta.get("dataset", "mnist")
    if model_name is None:
        raise SystemExit("--model required (no checkpoint metadata)")

    from efficient_rpe_vit_tpu.train.checkpoint import (
        model_kwargs_from_metadata,
    )

    cfg = mnist_config() if dataset == "mnist" else cifar10_config()
    model = create_model(model_name, cfg, **model_kwargs_from_metadata(meta))
    m = cfg.model
    sample = jnp.zeros((2, m.image_size, m.image_size, m.in_channels))
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), sample,
                               ema_decay=float(meta.get("ema_decay") or 0.0))
    if args.checkpoint:
        state, _ = load_checkpoint(args.checkpoint, state)
    state = state.eval_view()  # export the EMA shadow when tracked

    variables = {"params": state.params}
    if state.constants is not None:
        variables["constants"] = state.constants

    path = save_exported(
        args.out, model, variables,
        image_size=m.image_size, in_channels=m.in_channels,
        platforms=args.platforms,
        weights_dtype=args.weights_dtype,
        metadata={
            "model_name": model_name,
            "dataset": dataset,
            "num_classes": int(m.num_classes),
            "mean": [float(v) for v in np.atleast_1d(cfg.data.mean)],
            "std": [float(v) for v in np.atleast_1d(cfg.data.std)],
            "from_checkpoint": bool(args.checkpoint),
        },
    )
    print(f"wrote {path} ({os.path.getsize(path)} bytes) "
          f"+ {path}.meta.json")

    if args.validate:
        fn, _ = load_exported(path)
        ok = True
        # bf16 weights move logits by rounding; fp32 artifacts must match;
        # int8 moves logits by quantization error — gate on top-1 agreement
        tol = {None: 1e-4, "float32": 1e-4,
               "bfloat16": 5e-2}.get(args.weights_dtype)
        for batch in (2, 5):
            x = jax.random.normal(
                jax.random.PRNGKey(batch),
                (batch, m.image_size, m.image_size, m.in_channels),
            )
            ref = model.apply(variables, x, deterministic=True)
            got = fn(x)
            err = float(jnp.max(jnp.abs(got - ref)))
            if tol is not None:
                print(f"validate B={batch}: max |Δlogit| = {err:.2e}")
                ok = ok and err < tol
            else:  # int8
                agree = float(jnp.mean(
                    (jnp.argmax(got, -1) == jnp.argmax(ref, -1))
                    .astype(jnp.float32)))
                print(f"validate B={batch}: max |Δlogit| = {err:.2e}, "
                      f"top-1 agreement = {agree:.0%}")
                ok = ok and agree == 1.0
        if not ok:
            raise SystemExit("validation FAILED")
        print("validation OK")


if __name__ == "__main__":
    main()
