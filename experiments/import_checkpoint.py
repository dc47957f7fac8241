#!/usr/bin/env python
"""Import a reference (PyTorch) checkpoint into this framework.

Reads a torch checkpoint produced by the reference's `save_checkpoint`
(experiments/utils/training.py:373-412 — a pickled dict with
'model_state_dict', 'epoch', 'metrics', ...) or a bare state_dict, maps the
weights onto our flax params (exact logit parity is the tested contract),
and writes a framework-native msgpack checkpoint.

Usage:
    python experiments/import_checkpoint.py \
        --torch-checkpoint ref_ckpt.pt --model baseline --dataset mnist \
        --output imported.msgpack
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--torch-checkpoint", required=True)
    p.add_argument("--model", required=True)
    p.add_argument("--dataset", default="mnist", choices=["mnist", "cifar10"])
    p.add_argument("--output", required=True)
    args = p.parse_args(argv)

    import torch  # CPU torch, only needed for this tool

    from efficient_rpe_vit_tpu.configs import get_dataset_config
    from efficient_rpe_vit_tpu.models import create_model
    from efficient_rpe_vit_tpu.train import create_train_state, save_checkpoint
    from efficient_rpe_vit_tpu.utils.import_torch import state_dict_to_params

    blob = torch.load(args.torch_checkpoint, map_location="cpu",
                      weights_only=False)
    if isinstance(blob, dict) and "model_state_dict" in blob:
        sd = blob["model_state_dict"]
        epoch = int(blob.get("epoch", 0))
        metrics = blob.get("metrics", {})
    else:
        sd, epoch, metrics = blob, 0, {}

    config = get_dataset_config(args.dataset)
    model = create_model(args.model, config)
    m = config.model
    state = create_train_state(
        model, config, jax.random.PRNGKey(0),
        jnp.zeros((2, m.image_size, m.image_size, m.in_channels)),
    )
    params, constants = state_dict_to_params(sd, state.params, state.constants)
    state = state.replace(params=params, constants=constants)
    path = save_checkpoint(
        args.output, state, epoch, metrics=metrics,
        metadata={"model_name": args.model, "dataset": args.dataset,
                  "imported_from": args.torch_checkpoint},
    )
    print(f"Imported {args.torch_checkpoint} -> {path}")
    return path


if __name__ == "__main__":
    main()
