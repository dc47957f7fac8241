"""Checkpoint save/load: params + optimizer state + metadata.

Same semantics as the reference (experiments/utils/training.py:373-442):
persist epoch, model/optimizer state, metrics, and model metadata; resume
continues at epoch+1. Serialisation via flax msgpack (a single portable
file + a JSON sidecar of metadata), no torch pickle.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization


def save_checkpoint(
    path: str,
    state,
    epoch: int,
    metrics: Optional[Dict[str, Any]] = None,
    metadata: Optional[Dict[str, Any]] = None,
) -> str:
    """Write `<path>` (msgpack pytree) and `<path>.meta.json`."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "constants": state.constants if state.constants is not None else {},
        "mutable_state": (state.mutable_state
                          if state.mutable_state is not None else {}),
    }
    # key present only when EMA is tracked: keeps old checkpoints loadable
    if getattr(state, "ema_params", None) is not None:
        payload["ema_params"] = state.ema_params
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))
    meta = {
        "epoch": int(epoch),
        "metrics": metrics or {},
        "metadata": metadata or {},
    }
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f, indent=2, default=float)
    return path


def load_checkpoint(path: str, state) -> Tuple[Any, Dict[str, Any]]:
    """Restore into a template TrainState; returns (state, meta dict).

    Resume semantics: caller starts at meta['epoch'] + 1
    (reference: train.py:227-230).
    """
    with open(path, "rb") as f:
        raw = f.read()
    template = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "constants": state.constants if state.constants is not None else {},
        "mutable_state": (state.mutable_state
                          if state.mutable_state is not None else {}),
    }
    has_ema = getattr(state, "ema_params", None) is not None
    if has_ema:
        template["ema_params"] = state.ema_params
    try:
        restored = serialization.from_bytes(template, raw)
    except ValueError:
        if not has_ema:
            raise
        # pre-EMA checkpoint loaded into an EMA-enabled state: restore
        # without the key and initialise the shadow from the restored
        # params (the EMA of a freshly-resumed run starts at the params)
        template.pop("ema_params")
        restored = serialization.from_bytes(template, raw)
        restored["ema_params"] = jax.tree_util.tree_map(
            lambda a: a.copy() if hasattr(a, "copy") else a,
            restored["params"],
        )
    new_state = state.replace(
        step=restored["step"],
        params=restored["params"],
        opt_state=restored["opt_state"],
        constants=restored["constants"] if state.constants is not None else None,
        mutable_state=(restored["mutable_state"]
                       if state.mutable_state is not None else None),
        ema_params=restored["ema_params"] if has_ema else None,
    )
    meta_path = path + ".meta.json"
    meta: Dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return new_state, meta


# ─── Orbax backend (TPU-ecosystem standard) ──────────────────────────────
# The msgpack path above is a single portable file, but it gathers every
# array to the host process — fine single-chip, wrong for sharded
# multi-chip states. Orbax writes each array with its sharding layout
# (and can restore distributed without gathering), which is the TPU-native
# checkpointing story (SURVEY.md §5.4). Same epoch/metrics/metadata
# semantics as the msgpack pair; directories instead of single files.

def save_checkpoint_orbax(
    path: str,
    state,
    epoch: int,
    metrics: Optional[Dict[str, Any]] = None,
    metadata: Optional[Dict[str, Any]] = None,
) -> str:
    """Write an Orbax checkpoint directory at `path` (+ meta.json inside)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    payload = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "constants": state.constants if state.constants is not None else {},
        "mutable_state": (state.mutable_state
                          if state.mutable_state is not None else {}),
    }
    if getattr(state, "ema_params", None) is not None:
        payload["ema_params"] = state.ema_params
    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
        ckptr.save(path, payload, force=True)
    meta = {
        "epoch": int(epoch),
        "metrics": metrics or {},
        "metadata": metadata or {},
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2, default=float)
    return path


def load_checkpoint_orbax(path: str, state) -> Tuple[Any, Dict[str, Any]]:
    """Restore an Orbax checkpoint directory into a template TrainState.

    Sharded template leaves restore with their shardings (no host gather).
    Returns (state, meta dict); resume at meta['epoch'] + 1.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    template = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "constants": state.constants if state.constants is not None else {},
        "mutable_state": (state.mutable_state
                          if state.mutable_state is not None else {}),
    }
    has_ema = getattr(state, "ema_params", None) is not None
    if has_ema:
        template["ema_params"] = state.ema_params
    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
        try:
            restored = ckptr.restore(path,
                                     ocp.args.StandardRestore(template))
        except (ValueError, KeyError):
            if not has_ema:
                raise
            # pre-EMA checkpoint into an EMA-enabled state (see
            # load_checkpoint): restore without the key, shadow := params
            template.pop("ema_params")
            restored = ckptr.restore(path,
                                     ocp.args.StandardRestore(template))
            restored["ema_params"] = jax.tree_util.tree_map(
                lambda a: a.copy() if hasattr(a, "copy") else a,
                restored["params"],
            )
    new_state = state.replace(
        step=restored["step"],
        params=restored["params"],
        opt_state=restored["opt_state"],
        constants=(restored["constants"]
                   if state.constants is not None else None),
        mutable_state=(restored["mutable_state"]
                       if state.mutable_state is not None else None),
        ema_params=restored["ema_params"] if has_ema else None,
    )
    meta_path = os.path.join(path, "meta.json")
    meta: Dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return new_state, meta


def model_kwargs_from_metadata(meta: Dict[str, Any]) -> Dict[str, Any]:
    """create_model kwargs recorded in a checkpoint's metadata sidecar.

    Checkpoints written by `train.py --save-model` record the
    architecture knobs that the variant name alone does not carry
    (MoE MLPs, custom feature counts), so consumers (predict.py,
    export.py) can rebuild the exact module tree the params were trained
    in — a mismatched template fails serialization loudly otherwise.
    """
    kwargs: Dict[str, Any] = {}
    if meta.get("mlp_type") == "moe":
        kwargs["mlp_config"] = {
            "mlp_type": "moe",
            "num_experts": int(meta.get("num_experts") or 4),
        }
    nf = meta.get("num_features")
    if nf is not None:
        kwargs["attention_config"] = {
            "num_features": nf if nf == "mxu" else int(nf)
        }
    if meta.get("depth"):
        kwargs["depth"] = int(meta["depth"])
    return kwargs
