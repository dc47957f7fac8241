"""AOT model export via jax.export (weight-embedded StableHLO).

Design notes (TPU-first, no reference analogue — the reference's
checkpoints require the whole Python model zoo to reload):

  * **Weights are constants.** The exported computation closes over the
    trained variables, so the artifact is self-contained: deserialize and
    call. XLA constant-folds and lays them out at compile time on the
    serving host.
  * **Symbolic batch.** The leading batch dimension is exported as the
    symbolic size ``b`` (jax.export.symbolic_shape), so the same artifact
    serves any batch size with one compilation per concrete size on the
    serving side — no server-side bucketing logic in the framework.
  * **Cross-platform.** ``platforms=("cpu", "tpu")`` lowers once for both;
    the artifact records the list and jax refuses to run it elsewhere.
    This is how a CPU CI host exports artifacts destined for TPU serving.
  * The sidecar ``<path>.meta.json`` carries the variant name, dataset,
    normalisation stats, and class count, so a serving process needs no
    framework config import to pre/post-process.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

_EXPORT_SUFFIX = ".meta.json"


def export_forward(
    model,
    variables,
    *,
    image_size: int,
    in_channels: int,
    platforms: Optional[Sequence[str]] = None,
    input_dtype=jnp.float32,
    weights_dtype=None,
):
    """Export the deterministic forward as a weight-embedded artifact.

    Args:
        model: a flax module with ``apply(variables, x, deterministic=True)``
            (any factory variant).
        variables: trained variables dict ({'params': ..., [
            'constants': ...]}).
        image_size / in_channels: input geometry (from the config).
        platforms: lowering platforms, e.g. ("cpu", "tpu"); default is the
            current backend.
        weights_dtype: optionally cast floating-point weights for the
            artifact (e.g. ``jnp.bfloat16`` halves its size and feeds the
            MXU its native input dtype; logits move by ~bf16 rounding).
    Returns:
        jax.export.Exported (serialize with ``.serialize()``).
    """
    if weights_dtype is not None:
        wd = jnp.dtype(weights_dtype)
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(wd)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            variables,
        )

    def forward(x):
        return model.apply(variables, x, deterministic=True)

    (b,) = jax_export.symbolic_shape("b")
    x_spec = jax.ShapeDtypeStruct(
        (b, image_size, image_size, in_channels), input_dtype
    )
    kwargs: Dict[str, Any] = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jax_export.export(jax.jit(forward), **kwargs)(x_spec)


def save_exported(
    path: str,
    model,
    variables,
    *,
    image_size: int,
    in_channels: int,
    platforms: Optional[Sequence[str]] = None,
    metadata: Optional[Dict[str, Any]] = None,
    weights_dtype=None,
) -> str:
    """Export + write ``path`` (serialized bytes) and ``path.meta.json``."""
    exported = export_forward(
        model,
        variables,
        image_size=image_size,
        in_channels=in_channels,
        platforms=platforms,
        weights_dtype=weights_dtype,
    )
    blob = exported.serialize()
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    with open(path, "wb") as f:
        f.write(bytes(blob))
    meta = {
        "format": "jax.export.stablehlo",
        "platforms": list(exported.platforms),
        "weights_dtype": (str(jnp.dtype(weights_dtype))
                          if weights_dtype is not None else "unchanged"),
        "input_shape": ["b", image_size, image_size, in_channels],
        "out_avals": [
            {"shape": [str(s) for s in a.shape], "dtype": str(a.dtype)}
            for a in exported.out_avals
        ],
        "metadata": metadata or {},
    }
    with open(path + _EXPORT_SUFFIX, "w") as f:
        json.dump(meta, f, indent=2)
    return path


def load_exported(path: str) -> Tuple[Any, Dict[str, Any]]:
    """Load an artifact written by `save_exported`.

    Returns:
        (fn, meta): ``fn(x) -> logits`` (jittable; compiles per concrete
        batch size on first call) and the sidecar meta dict ({} if the
        sidecar is missing).
    """
    with open(path, "rb") as f:
        exported = jax_export.deserialize(bytearray(f.read()))
    meta: Dict[str, Any] = {}
    mp = path + _EXPORT_SUFFIX
    if os.path.exists(mp):
        with open(mp) as f:
            meta = json.load(f)

    def fn(x):
        return exported.call(x)

    return fn, meta
