"""Import reference (PyTorch) model weights into flax params.

The reference derives Omega/weights from torch's global RNG, so exact logit
parity requires *loading* reference-generated weights rather than
re-deriving them (SURVEY.md §7 hard part 3). This module maps a reference
`BaseViT.state_dict()` (or a torch checkpoint produced by its
`save_checkpoint`, training.py:373-412) onto our ViT's params/constants.

Works with plain numpy dicts too, so it has no hard torch dependency.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _to_numpy(v):
    if isinstance(v, np.ndarray):
        return v
    # torch tensor (avoid importing torch unless given one)
    detach = getattr(v, "detach", None)
    if detach is not None:
        return detach().cpu().numpy()
    return np.asarray(v)


def state_dict_to_params(
    state_dict: Dict[str, Any],
    params,
    constants=None,
) -> Tuple[Any, Any]:
    """Map a reference state_dict onto (params, constants) pytrees.

    Args:
        state_dict: name -> tensor/ndarray, in the reference's naming scheme
            (patch_embedding.*, cls_token, pos_embedding,
            transformer_blocks.{i}.{attention,mlp,norm1,norm2,rpe}.*,
            mlp_head.{0,1}.*).
        params: template flax params (defines structure/shapes).
        constants: optional template 'constants' collection (omega buffers).

    Returns:
        (params, constants) with reference values (torch Linear weights are
        transposed into flax kernel layout).
    """
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    p = jax.tree_util.tree_map(np.asarray, params)
    p = jax.tree_util.tree_map(np.copy, p)

    def put(dst, key, value):
        if dst[key].shape != value.shape:
            raise ValueError(
                f"shape mismatch for {key}: ours {dst[key].shape} vs "
                f"reference {value.shape}"
            )
        dst[key] = value

    put(p["patch_embedding"], "kernel", sd["patch_embedding.weight"].T)
    put(p["patch_embedding"], "bias", sd["patch_embedding.bias"])
    p["cls_token"] = sd["cls_token"]
    p["pos_embedding"] = sd["pos_embedding"]
    put(p["head_norm"], "scale", sd["mlp_head.0.weight"])
    put(p["head_norm"], "bias", sd["mlp_head.0.bias"])
    put(p["head"], "kernel", sd["mlp_head.1.weight"].T)
    put(p["head"], "bias", sd["mlp_head.1.bias"])

    i = 0
    while f"block_{i}" in p:
        blk = p[f"block_{i}"]
        pre = f"transformer_blocks.{i}."
        put(blk["norm1"], "scale", sd[pre + "norm1.weight"])
        put(blk["norm1"], "bias", sd[pre + "norm1.bias"])
        put(blk["norm2"], "scale", sd[pre + "norm2.weight"])
        put(blk["norm2"], "bias", sd[pre + "norm2.bias"])
        put(blk["attention"]["qkv"], "kernel", sd[pre + "attention.qkv.weight"].T)
        if pre + "attention.qkv.bias" in sd and "bias" in blk["attention"]["qkv"]:
            put(blk["attention"]["qkv"], "bias", sd[pre + "attention.qkv.bias"])
        put(blk["attention"]["proj"], "kernel", sd[pre + "attention.proj.weight"].T)
        put(blk["attention"]["proj"], "bias", sd[pre + "attention.proj.bias"])
        put(blk["mlp"]["fc1"], "kernel", sd[pre + "mlp.0.weight"].T)
        put(blk["mlp"]["fc1"], "bias", sd[pre + "mlp.0.bias"])
        put(blk["mlp"]["fc2"], "kernel", sd[pre + "mlp.3.weight"].T)
        put(blk["mlp"]["fc2"], "bias", sd[pre + "mlp.3.bias"])
        if pre + "rpe.rel_pos_bias" in sd and "rpe" in blk:
            put(blk["rpe"], "rel_pos_bias", sd[pre + "rpe.rel_pos_bias"])
        if pre + "rpe.circulant_coeffs" in sd and "rpe" in blk:
            put(blk["rpe"], "circulant_coeffs", sd[pre + "rpe.circulant_coeffs"])
        i += 1

    new_constants = None
    if constants is not None:
        c = jax.tree_util.tree_map(np.asarray, constants)
        c = jax.tree_util.tree_map(np.copy, c)
        j = 0
        while f"block_{j}" in c:
            key = f"transformer_blocks.{j}.attention.omega"
            if key in sd:
                c[f"block_{j}"]["attention"]["omega"] = sd[key]
            j += 1
        new_constants = jax.tree_util.tree_map(jnp.asarray, c)

    return jax.tree_util.tree_map(jnp.asarray, p), new_constants


def import_reference_model(ref_model, variables) -> Dict[str, Any]:
    """Convenience: torch nn.Module + flax variables -> new variables dict."""
    params, constants = state_dict_to_params(
        ref_model.state_dict(),
        variables["params"],
        variables.get("constants"),
    )
    out = dict(variables)
    out["params"] = params
    if constants is not None:
        out["constants"] = constants
    return out
