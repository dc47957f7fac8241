"""Device mesh construction and sharding rules.

The genuinely new systems layer over the reference (SURVEY.md §2.12, §5.8):
the reference is single-process single-device with zero parallelism; here we
scale via `jax.sharding.Mesh` + NamedSharding and let XLA insert the
collectives (psum for DP gradient reduction, all-gather/reduce-scatter for
TP) over ICI.

Mesh axes:
  * 'data'  — batch (data parallel). Gradients are reduced across it by
    XLA automatically because params are replicated on it.
  * 'model' — tensor parallel: attention heads + MLP hidden. QKV/fc1
    kernels shard their output dim; proj/fc2 kernels shard their input dim
    (Megatron-style column->row split: one all-reduce per block, inserted
    by XLA from the sharding annotations).

Rules degrade gracefully: any axis that doesn't divide evenly falls back to
replication for that tensor (correctness first — XLA handles the rest).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices=None,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a 2D (data, model) mesh over the available devices.

    Defaults to pure data-parallel over every device.
    """
    devices = list(devices if devices is not None else jax.devices())
    n_total = len(devices)
    if n_data is None:
        if n_total % n_model != 0:
            raise ValueError(
                f"{n_total} devices not divisible by n_model={n_model}"
            )
        n_data = n_total // n_model
    if n_data * n_model != n_total:
        raise ValueError(
            f"mesh {n_data}x{n_model} != {n_total} available devices"
        )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names)


# --- sharding rules -------------------------------------------------------

# (path-suffix, ndim) -> PartitionSpec builder. Column-parallel producers
# shard the output feature dim; row-parallel consumers shard the input dim.
_COLUMN_KERNELS = ("qkv/kernel", "fc1/kernel")
_ROW_KERNELS = ("proj/kernel", "fc2/kernel")
_COLUMN_BIASES = ("qkv/bias", "fc1/bias")


def _path_str(path) -> str:
    parts = []
    for p in path:
        key = getattr(p, "key", None)
        parts.append(str(key) if key is not None else str(p))
    return "/".join(parts)


def make_param_specs(params, mesh: Mesh, model_axis: str = "model"):
    """PartitionSpec pytree for a ViT params tree.

    Everything is replicated across 'data'; head-structured tensors split
    across `model_axis` when shapes divide evenly. A mesh without
    `model_axis` (e.g. a ('data', 'seq') context-parallel mesh) replicates
    all parameters.
    """
    size = mesh.shape[model_axis] if model_axis in mesh.axis_names else 1

    def spec_for(path, x):
        name = _path_str(path)
        if size > 1:
            if any(name.endswith(s) for s in _COLUMN_KERNELS):
                if x.shape[-1] % size == 0:
                    return P(None, model_axis)
            if any(name.endswith(s) for s in _ROW_KERNELS):
                if x.shape[0] % size == 0:
                    return P(model_axis, None)
            if any(name.endswith(s) for s in _COLUMN_BIASES):
                if x.shape[-1] % size == 0:
                    return P(model_axis)
            if name.endswith("omega") and x.shape[0] % size == 0:
                return P(model_axis, None, None)  # [heads, d, m] head-split
            if name.endswith("rel_pos_bias") and x.shape[0] % size == 0:
                return P(model_axis, None)  # [heads, 2n-1]
            if name.endswith("circulant_coeffs") and x.shape[0] % size == 0:
                return P(model_axis, None, None)  # [heads, coord, d]
        return P()  # replicated

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_pytree(tree, specs, mesh: Mesh):
    """device_put a pytree with per-leaf NamedShardings."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def batch_spec(data_axis: str = "data") -> P:
    """Batch-dim sharding for inputs/labels."""
    return P(data_axis)
