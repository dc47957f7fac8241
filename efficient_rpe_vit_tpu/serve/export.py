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


class _QuantLeaf:
    """int8 weights + fp32 per-channel scales for one param leaf.

    Held inside the variables tree between quantization (host, concrete
    arrays) and dequantization (inside the exported forward, where both
    members become embedded constants and XLA folds the dequant).
    """

    def __init__(self, q, scale):
        self.q = q
        self.scale = scale


def _quantize_int8_params(params):
    """Weight-only symmetric per-output-channel int8 quantization.

    Every floating leaf with ndim >= 2 (matmul kernels, embeddings) is
    mapped to round(a / s) in [-127, 127] with s = amax/127 over all axes
    but the last (per-output-channel granularity — the standard weight-only
    PTQ scheme). Biases/LayerNorm vectors stay fp32: they are tiny and
    quantizing them buys nothing. The 'constants' collection (e.g. the
    FAVOR+ random-feature matrices, whose values define the kernel
    estimator) is never quantized — only trained 'params'.
    """

    def q(leaf):
        if not (hasattr(leaf, "dtype")
                and jnp.issubdtype(leaf.dtype, jnp.floating)
                and leaf.ndim >= 2):
            return leaf
        a = jnp.asarray(leaf, jnp.float32)
        amax = jnp.max(jnp.abs(a), axis=tuple(range(a.ndim - 1)),
                       keepdims=True)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        qv = jnp.clip(jnp.round(a / scale), -127, 127).astype(jnp.int8)
        return _QuantLeaf(qv, scale)

    return jax.tree_util.tree_map(q, params)


def _dequantize(tree):
    return jax.tree_util.tree_map(
        lambda l: l.q.astype(jnp.float32) * l.scale
        if isinstance(l, _QuantLeaf) else l,
        tree,
        is_leaf=lambda l: isinstance(l, _QuantLeaf),
    )


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
            ``"int8"`` instead applies weight-only symmetric per-channel
            quantization to the trained params (~4x smaller artifact;
            logits move by quantization error — validate on your data).
    Returns:
        jax.export.Exported (serialize with ``.serialize()``).
    """
    if weights_dtype is not None:
        wd = jnp.dtype(weights_dtype)
        if wd == jnp.int8:
            variables = dict(variables)
            variables["params"] = _quantize_int8_params(variables["params"])
        else:
            # jnp.asarray before the cast: checkpoint restore yields numpy
            # leaves, and a numpy ml_dtypes bf16 constant gets promoted back
            # to fp32 when traced, silently undoing the size/dtype win.
            variables = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a).astype(wd)
                if (hasattr(a, "dtype")
                    and jnp.issubdtype(a.dtype, jnp.floating))
                else a,
                variables,
            )

    def forward(x):
        v = dict(variables)
        v["params"] = _dequantize(v["params"])
        return model.apply(v, x, deterministic=True)

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
        **({"quantization": "weight-only symmetric per-output-channel "
                            "int8 (float params with ndim>=2; constants "
                            "and bias/norm vectors stay fp32)"}
           if weights_dtype is not None
           and jnp.dtype(weights_dtype) == jnp.int8 else {}),
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
