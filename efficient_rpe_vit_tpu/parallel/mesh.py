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


def _add_fsdp_axis(spec: P, shape, axis_name: str, size: int) -> P:
    """Extend a (possibly model-split) spec with a ZeRO-style shard of the
    LARGEST still-unsharded dim over `axis_name`, when it divides evenly.

    Leaves that don't divide (biases, layer norms, cls token, tiny heads
    tables) stay as-is — replication over the data axis is always correct,
    and those leaves are a rounding error of the parameter bytes anyway."""
    entries = list(spec) + [None] * (len(shape) - len(spec))
    best = None
    for d, (e, n) in enumerate(zip(entries, shape)):
        if e is None and n % size == 0 and n // size >= 1:
            if best is None or n > shape[best]:
                best = d
    if best is None:
        return spec
    entries[best] = axis_name
    while entries and entries[-1] is None:
        entries.pop()
    return P(*entries)


def make_param_specs(params, mesh: Mesh, model_axis: str = "model",
                     fsdp_axis: str = None):
    """PartitionSpec pytree for a ViT params tree.

    Head-structured tensors split across `model_axis` when shapes divide
    evenly (Megatron TP); everything else replicates. A mesh without
    `model_axis` (e.g. a ('data', 'seq') context-parallel mesh) replicates
    all parameters.

    `fsdp_axis` (typically 'data') additionally shards every leaf's largest
    still-unsharded dim over that axis — the ZeRO/FSDP analogue: parameters
    and (via the mirrored opt-state specs) Adam moments live scattered over
    the data axis, XLA all-gathers them at use sites and reduce-scatters
    the gradients, so per-device state bytes shrink ~n_data-fold.
    """
    size = mesh.shape[model_axis] if model_axis in mesh.axis_names else 1
    fsdp_size = (
        mesh.shape[fsdp_axis]
        if fsdp_axis is not None and fsdp_axis in mesh.axis_names else 1
    )

    def spec_for(path, x):
        name = _path_str(path)
        spec = P()
        if size > 1:
            if any(name.endswith(s) for s in _COLUMN_KERNELS):
                if x.shape[-1] % size == 0:
                    spec = P(None, model_axis)
            elif any(name.endswith(s) for s in _ROW_KERNELS):
                if x.shape[0] % size == 0:
                    spec = P(model_axis, None)
            elif any(name.endswith(s) for s in _COLUMN_BIASES):
                if x.shape[-1] % size == 0:
                    spec = P(model_axis)
            elif name.endswith("omega") and x.shape[0] % size == 0:
                spec = P(model_axis, None, None)  # [heads, d, m] head-split
            elif name.endswith("rel_pos_bias") and x.shape[0] % size == 0:
                spec = P(model_axis, None)  # [heads, 2n-1]
            elif name.endswith("circulant_coeffs") and x.shape[0] % size == 0:
                spec = P(model_axis, None, None)  # [heads, coord, d]
        if fsdp_size > 1:
            spec = _add_fsdp_axis(spec, x.shape, fsdp_axis, fsdp_size)
        return spec

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_pytree(tree, specs, mesh: Mesh):
    """device_put a pytree with per-leaf NamedShardings."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def batch_spec(data_axis: str = "data") -> P:
    """Batch-dim sharding for inputs/labels."""
    return P(data_axis)
