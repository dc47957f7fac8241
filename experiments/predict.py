#!/usr/bin/env python
"""Offline inference CLI: load a checkpoint, classify images.

The deployment-facing surface the training CLIs don't cover: restore a
`save_checkpoint` msgpack (metadata identifies the variant), build the
jitted forward once, and either

  * classify a .npy batch ([N, H, W], [N, H, W, C] or flattened) to a
    JSON/NPY prediction file, or
  * evaluate the dataset test split (default) printing accuracy +
    synchronized latency stats.

Examples:
    python experiments/predict.py --checkpoint ckpt.msgpack
    python experiments/predict.py --checkpoint ckpt.msgpack \
        --input digits.npy --output preds.json
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
                   help="path written by save_checkpoint (msgpack)")
    p.add_argument("--artifact", default=None,
                   help="serving artifact written by export.py — "
                        "classification runs from the artifact + its "
                        "sidecar alone (no model zoo, no config)")
    p.add_argument("--model", default=None,
                   help="variant name; default from the checkpoint metadata")
    p.add_argument("--dataset", default=None, choices=[None, "mnist", "cifar10"],
                   help="config to build with; default from metadata")
    p.add_argument("--input", default=None,
                   help=".npy images to classify; omit to evaluate the "
                        "dataset test split")
    p.add_argument("--output", default=None,
                   help="write predictions to .json or .npy")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--attention-maps", default=None, metavar="PNG",
                   help="render CLS->patch attention heatmaps (softmax "
                        "variants; checkpoint mode) for up to 4 inputs to "
                        "this PNG — the working version of the "
                        "reference's get_attention_maps placeholder")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args(argv)


def _render_attention_maps(model, variables, x, out_png):
    """Grid of CLS->patch attention per block (head-averaged), one row per
    sample, overlaid on the input image."""
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = x[:4]
    logits, maps = jax.jit(
        lambda v, xb: model.apply(v, xb, deterministic=True,
                                  return_attention=True)
    )(variables, jnp.asarray(x))
    n_blocks = len(maps)
    B = x.shape[0]
    side = int(np.sqrt(maps[0].shape[-1] - 1))
    fig, axes = plt.subplots(B, n_blocks + 1,
                             figsize=(1.6 * (n_blocks + 1), 1.6 * B),
                             squeeze=False)
    for b in range(B):
        img = np.asarray(x[b])
        axes[b][0].imshow(img.squeeze(), cmap="gray")
        axes[b][0].set_title("input" if b == 0 else "", fontsize=8)
        for blk in range(n_blocks):
            # CLS row, averaged over heads, patches only -> [P] -> grid
            cls_attn = np.asarray(maps[blk][b]).mean(0)[0, 1:]
            axes[b][blk + 1].imshow(cls_attn.reshape(side, side),
                                    cmap="viridis")
            if b == 0:
                axes[b][blk + 1].set_title(f"block {blk}", fontsize=8)
    for ax in fig.axes:
        ax.set_xticks([]), ax.set_yticks([])
    fig.tight_layout()
    fig.savefig(out_png, dpi=150)
    plt.close(fig)
    preds = np.argmax(np.asarray(logits), -1)
    print(f"attention maps ({B} samples x {n_blocks} blocks) -> {out_png} "
          f"(preds {preds.tolist()})")
    return out_png


def _normalise(x, mean, std):
    x = np.asarray(x, np.float32)
    if x.max() > 1.5:  # raw 0-255 input
        x = x / 255.0
    return (x - mean) / std


def _load_input_npy(path, in_channels):
    """[N, H, W, C] from a .npy of flattened / [N,H,W] / [N,H,W,C] images
    (square images assumed for the flattened form, like the reference's
    MNIST exports)."""
    x = np.load(path)
    if x.ndim == 2:  # single flattened image or [N, H*W*C]
        side = int(np.sqrt(x.shape[-1] / in_channels))
        x = x.reshape(-1, side, side, in_channels)
    elif x.ndim == 3:  # [N, H, W] grayscale
        x = x[..., None]
    return x


def _classify_and_emit(run_batch, x, batch_size, name, output):
    """Batch-loop `run_batch` over x, argmax, and write/print preds."""
    preds = []
    for i in range(0, len(x), batch_size):
        logits = run_batch(x[i:i + batch_size])
        preds.append(np.argmax(np.asarray(logits), -1))
    preds = np.concatenate(preds)
    if output:
        if output.endswith(".npy"):
            np.save(output, preds)
        else:
            with open(output, "w") as f:
                json.dump({"model": name, "predictions": preds.tolist()}, f)
        print(f"{len(preds)} predictions written to {output}")
    else:
        print(preds.tolist())
    return preds


def _predict_from_artifact(args):
    """Serve from an exported artifact: no model zoo, no config import —
    geometry and normalisation come from the artifact's sidecar."""
    import jax.numpy as jnp

    from efficient_rpe_vit_tpu.serve import load_exported

    fn, meta = load_exported(args.artifact)
    if "input_shape" not in meta:
        raise SystemExit(
            f"artifact sidecar {args.artifact}.meta.json is missing or "
            "incomplete — it carries the input geometry and normalisation "
            "stats; re-export with export.py or copy the sidecar next to "
            "the artifact"
        )
    md = meta.get("metadata", {})
    _, H, W, C = meta["input_shape"]
    mean = np.asarray(md.get("mean", [0.0]), np.float32)
    std = np.asarray(md.get("std", [1.0]), np.float32)
    name = md.get("model_name", "artifact")

    if args.input:
        x = _normalise(_load_input_npy(args.input, C), mean, std)
        return _classify_and_emit(
            lambda xb: fn(jnp.asarray(xb)), x, args.batch_size, name,
            args.output)

    # evaluate the dataset test split (dataset name from the sidecar)
    from efficient_rpe_vit_tpu.configs import cifar10_config, mnist_config
    from efficient_rpe_vit_tpu.data import get_dataloaders

    dataset = args.dataset or md.get("dataset", "mnist")
    cfg = mnist_config() if dataset == "mnist" else cifar10_config()
    _, test_ds = get_dataloaders(cfg)
    correct = total = 0
    for images, labels in test_ds:
        logits = fn(images)
        correct += int(np.sum(np.argmax(np.asarray(logits), -1)
                              == np.asarray(labels)))
        total += int(labels.shape[0])
    acc = 100.0 * correct / max(1, total)
    print(f"{name} (artifact) on {dataset} test split: "
          f"acc {acc:.2f}% over {total} samples")
    return {"accuracy": acc, "samples": total}


def main(argv=None):
    args = parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from efficient_rpe_vit_tpu.configs import cifar10_config, mnist_config
    from efficient_rpe_vit_tpu.data import get_dataloaders
    from efficient_rpe_vit_tpu.models import create_model
    from efficient_rpe_vit_tpu.train import create_train_state
    from efficient_rpe_vit_tpu.train.checkpoint import load_checkpoint

    if (args.checkpoint is None) == (args.artifact is None):
        raise SystemExit("exactly one of --checkpoint / --artifact required")

    if args.artifact:
        return _predict_from_artifact(args)

    meta_path = args.checkpoint + ".meta.json"
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f).get("metadata", {})
    model_name = args.model or meta.get("model_name")
    dataset = args.dataset or meta.get("dataset", "mnist")
    if model_name is None:
        raise SystemExit("--model required (checkpoint has no metadata)")

    from efficient_rpe_vit_tpu.train.checkpoint import (
        model_kwargs_from_metadata,
    )

    cfg = mnist_config() if dataset == "mnist" else cifar10_config()
    model = create_model(model_name, cfg, **model_kwargs_from_metadata(meta))
    m = cfg.model
    sample = jnp.zeros((2, m.image_size, m.image_size, m.in_channels))
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), sample,
                               ema_decay=float(meta.get("ema_decay") or 0.0))
    state, _ = load_checkpoint(args.checkpoint, state)
    state = state.eval_view()  # serve the EMA shadow when tracked

    variables = {"params": state.params}
    if state.constants is not None:
        variables["constants"] = state.constants
    fwd = jax.jit(lambda v, x: model.apply(v, x, deterministic=True))

    mean = np.asarray(cfg.data.mean, np.float32)
    std = np.asarray(cfg.data.std, np.float32)

    if args.attention_maps:
        if model.attention_type != "softmax":
            raise SystemExit(
                "--attention-maps needs a softmax-attention variant "
                "(linear attention never materialises the [N, N] weights)")
        if args.input:
            x = _normalise(_load_input_npy(args.input, m.in_channels),
                           mean, std)
        else:
            _, test_ds = get_dataloaders(cfg)
            x, _ = next(iter(test_ds))
            x = np.asarray(x)
        return _render_attention_maps(model, variables, x,
                                      args.attention_maps)

    if args.input:
        x = _normalise(_load_input_npy(args.input, m.in_channels),
                       mean, std)
        return _classify_and_emit(
            lambda xb: fwd(variables, jnp.asarray(xb)), x, args.batch_size,
            model_name, args.output)

    # evaluate the dataset test split
    from efficient_rpe_vit_tpu.train.training import (
        benchmark_inference, make_eval_step,
    )

    _, test_ds = get_dataloaders(cfg)
    eval_step = make_eval_step(model)
    from efficient_rpe_vit_tpu.train.training import evaluate

    result = evaluate(state, eval_step, test_ds)
    bench_x, _ = next(iter(test_ds))
    inf = benchmark_inference(state, model, bench_x[:args.batch_size],
                              num_warmup=3, num_iterations=20, fwd=fwd)
    print(f"{model_name} on {dataset} test split: "
          f"acc {result['accuracy']:.2f}% over {result['samples']} samples; "
          f"{inf['throughput_images_per_sec']:.1f} img/s, "
          f"p50 {inf['latency_p50_ms']:.2f} ms/batch")
    return result


if __name__ == "__main__":
    main()
