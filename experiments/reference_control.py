#!/usr/bin/env python
"""Apples-to-apples accuracy control against the PyTorch reference.

The reference's published anchor (README.md:29-34) is 94.20% (baseline) on
the FULL 60k-image MNIST train split in 3 epochs. This environment only has
the 10k test split, deterministically re-split 8k train / 2k test
(efficient_rpe_vit_tpu/data/datasets.py). Comparing our 8k-split numbers to
the 60k anchor conflates framework fidelity with data volume — so this
script trains the REFERENCE (torch, CPU) on the SAME 8k/2k re-split with
the same hyperparameters and seeds, producing the control column for
docs/results/rope_circulant_comparison.md.

Uses the reference's own train_epoch/evaluate/create_optimizer/
create_lr_scheduler (imported from /root/reference via importlib under a
non-colliding package name) so the training loop semantics are exactly the
reference's (experiments/utils/training.py:20-370).

Usage:
    python experiments/reference_control.py \
        --models baseline baseline_rope baseline_circulant \
        --seeds 42 153 --epochs 10 --out results/reference_control
"""

import argparse
import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("REFERENCE_DIR", "/root/reference")
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def _import_reference():
    """Import the reference's models/configs packages and its
    experiments.utils as 'ref_utils' (avoiding the name collision with our
    own experiments/ package, which shadows the reference's namespace pkg).
    """
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    spec = importlib.util.spec_from_file_location(
        "ref_utils",
        os.path.join(REFERENCE, "experiments", "utils", "__init__.py"),
        submodule_search_locations=[
            os.path.join(REFERENCE, "experiments", "utils")
        ],
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_utils"] = mod
    spec.loader.exec_module(mod)

    from configs.datasets.mnist import MNIST_CONFIG  # reference
    from models import create_model  # reference

    return mod, create_model, MNIST_CONFIG


def _torch_loaders(torch, batch_size: int, seed: int):
    """The SAME 8k/2k split our JAX pipeline uses, as torch DataLoaders with
    the reference's normalisation (x/255 - mean)/std, NCHW."""
    from torch.utils.data import DataLoader, TensorDataset

    from efficient_rpe_vit_tpu.data.datasets import load_dataset

    raw = load_dataset("mnist", allow_synthetic=False)
    mean, std = 0.1307, 0.3081  # reference configs/datasets/mnist.py:34-35

    def prep(x):
        x = x.astype(np.float32) / 255.0
        x = (x - mean) / std
        return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))  # NHWC->NCHW

    gen = torch.Generator().manual_seed(seed)
    train = TensorDataset(prep(raw["train_images"]),
                          torch.from_numpy(raw["train_labels"]))
    test = TensorDataset(prep(raw["test_images"]),
                         torch.from_numpy(raw["test_labels"]))
    return (
        DataLoader(train, batch_size=batch_size, shuffle=True,
                   drop_last=True, generator=gen),
        DataLoader(test, batch_size=batch_size, shuffle=False),
    )


def run_one(model_name: str, seed: int, epochs: int, batch_size: int,
            lr: float):
    import torch
    import torch.nn as nn

    ref_utils, ref_create_model, mnist_cfg = _import_reference()

    torch.manual_seed(seed)
    np.random.seed(seed)
    train_loader, test_loader = _torch_loaders(torch, batch_size, seed)

    model = ref_create_model(model_name, mnist_cfg)
    device = torch.device("cpu")
    model.to(device)
    criterion = nn.CrossEntropyLoss()
    optimizer = ref_utils.create_optimizer(model, lr, optimizer_type="adam")
    scheduler = ref_utils.create_lr_scheduler(optimizer, "cosine", epochs)

    best_acc, per_epoch = 0.0, []
    t0 = time.time()
    for epoch in range(1, epochs + 1):
        tr = ref_utils.train_epoch(model, train_loader, optimizer, criterion,
                                   device, epoch, log_interval=10 ** 9)
        ev = ref_utils.evaluate(model, test_loader, criterion, device)
        if scheduler is not None:
            scheduler.step()
        best_acc = max(best_acc, ev["accuracy"])
        per_epoch.append({
            "epoch": epoch,
            "train_loss": tr["loss"], "train_accuracy": tr["accuracy"],
            "test_loss": ev["loss"], "test_accuracy": ev["accuracy"],
        })
        print(f"  [{model_name} seed {seed}] epoch {epoch}: "
              f"train {tr['accuracy']:.2f}% test {ev['accuracy']:.2f}%",
              flush=True)
    total = time.time() - t0
    return {
        "framework": "pytorch-reference",
        "model": model_name,
        "seed": seed,
        "epochs": epochs,
        "batch_size": batch_size,
        "lr": lr,
        "split": "mnist-10k-resplit-8k2k",
        "best_test_accuracy": best_acc,
        "final_test_accuracy": per_epoch[-1]["test_accuracy"],
        "final_train_accuracy": per_epoch[-1]["train_accuracy"],
        "final_test_loss": per_epoch[-1]["test_loss"],
        "total_train_time": total,
        "per_epoch": per_epoch,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+",
                    default=["baseline", "baseline_rope", "baseline_circulant"])
    ap.add_argument("--seeds", nargs="+", type=int, default=[42, 153])
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="results/reference_control")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    for model_name in args.models:
        for seed in args.seeds:
            path = os.path.join(args.out, f"{model_name}_seed{seed}.json")
            if os.path.exists(path):
                print(f"skip existing {path}")
                continue
            res = run_one(model_name, seed, args.epochs, args.batch_size,
                          args.lr)
            with open(path, "w") as f:
                json.dump(res, f, indent=2)
            print(f"wrote {path}: best {res['best_test_accuracy']:.2f}%")


if __name__ == "__main__":
    main()
