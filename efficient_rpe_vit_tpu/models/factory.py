"""Model factory: variant names -> configured ViT modules.

Mirrors the reference's factory (models/factory.py:18-272): the same 14
variant-name entries (11 working variants + 2 aliases + the rejected
softmax+KERPLE combination which raises at construction), the same
per-mechanism `attention_params` / `rpe_params` config merging
(factory.py:187-204), and the same metadata surface
(`list_available_models`, `get_model_info`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

from ..configs import ExperimentConfig
from .attention import ATTENTION_REGISTRY
from .rpe import RPE_REGISTRY
from .vit import ViT

# name -> (attention_type, rpe_type)   (reference: factory.py:18-40)
MODEL_VARIANTS: Dict[str, Tuple[str, Optional[str]]] = {
    # Baseline models
    "baseline": ("softmax", None),
    "baseline_most_general": ("softmax", "most_general"),  # rejected at build
    "baseline_circulant": ("softmax", "circulant_string"),
    "baseline_rope": ("softmax", "rope"),
    # Performer FAVOR+ models
    "performer_favor": ("favor_plus", None),
    "performer_favor_most_general": ("favor_plus", "most_general"),
    "performer_favor_circulant": ("favor_plus", "circulant_string"),
    "performer_favor_rope": ("favor_plus", "rope"),
    # Performer ReLU models
    "performer_relu": ("relu", None),
    "performer_relu_most_general": ("relu", "most_general"),
    "performer_relu_circulant": ("relu", "circulant_string"),
    "performer_relu_rope": ("relu", "rope"),
    # Aliases
    "performer": ("favor_plus", None),
    "vit": ("softmax", None),
}


def _resolve_variant(model_name: str) -> Tuple[str, Optional[str]]:
    if model_name in MODEL_VARIANTS:
        return MODEL_VARIANTS[model_name]
    # custom "<attention>_<rpe>" names (reference: factory.py:170-185) —
    # greedy over registry prefixes so multi-token names like
    # "favor_plus_rope_2d" parse correctly
    parts = model_name.split("_")
    for i in range(len(parts), 0, -1):
        attention_type = "_".join(parts[:i])
        if attention_type in ATTENTION_REGISTRY:
            rpe_type = "_".join(parts[i:]) or None
            if rpe_type is not None and rpe_type not in RPE_REGISTRY:
                raise ValueError(
                    f"Unknown RPE type: {rpe_type}. "
                    f"Available types: {list(RPE_REGISTRY.keys())}"
                )
            return attention_type, rpe_type
    raise ValueError(
        f"Unknown model: {model_name}. "
        f"Available models: {list(MODEL_VARIANTS.keys())}"
    )


def create_model(
    model_name: str,
    config: ExperimentConfig | Dict[str, Any],
    attention_config: Optional[Dict[str, Any]] = None,
    rpe_config: Optional[Dict[str, Any]] = None,
    mlp_config: Optional[Dict[str, Any]] = None,
    **overrides,
) -> ViT:
    """Build a ViT module for a named variant.

    Args:
        model_name: variant name (e.g. 'baseline', 'performer_favor_rope').
        config: ExperimentConfig or the flat dict from `.to_dict()`.
        attention_config / rpe_config: per-call mechanism overrides, merged
            over the config's `attention_params` / `rpe_params` defaults.
        mlp_config: optional MLP override; {"mlp_type": "moe",
            "num_experts": E, "expert_mesh": mesh} switches the block MLPs
            to the soft-mixture-of-experts layer (models/layers.py::MoeMlp).
        **overrides: architecture field overrides (dim, depth, dropout, ...).

    Returns:
        An (unbound) flax ViT module. Initialise with
        `model.init(rngs, images)`; metadata is available as
        `model.attention_type` / `model.rpe_type` fields.

    Raises:
        NotImplementedError: for the rejected softmax+KERPLE combination —
            at construction time rather than first call (fail fast; the
            reference raises in forward, softmax.py:68-77).
    """
    attention_type, rpe_type = _resolve_variant(model_name)

    cfg = config.to_dict() if isinstance(config, ExperimentConfig) else dict(config)
    cfg.update(overrides)

    # per-mechanism defaults from the config (reference: factory.py:191-204)
    attn_kwargs = dict((cfg.get("attention_params") or {}).get(attention_type, {}))
    if attention_config:
        attn_kwargs.update(attention_config)
    rpe_kwargs: Dict[str, Any] = {}
    if rpe_type is not None:
        rpe_kwargs = dict((cfg.get("rpe_params") or {}).get(rpe_type, {}))
        if rpe_config:
            rpe_kwargs.update(rpe_config)
    # drop Nones so module defaults apply
    attn_kwargs = {k: v for k, v in attn_kwargs.items() if v is not None}
    rpe_kwargs = {k: v for k, v in rpe_kwargs.items() if v is not None}

    from .attention import SoftmaxAttention
    from .rpe import KerpleRPE

    if (ATTENTION_REGISTRY[attention_type] is SoftmaxAttention
            and rpe_type is not None
            and RPE_REGISTRY[rpe_type] is KerpleRPE):
        raise NotImplementedError(
            "KERPLE RPE is designed specifically for kernelized attention "
            "(FAVOR+/ReLU Performer) and cannot be used with standard softmax "
            "attention. For softmax attention, use RoPE or Circulant-STRING "
            "RPE instead."
        )

    mlp_kwargs = dict(mlp_config or {})
    mlp_type = mlp_kwargs.pop("mlp_type", "dense")

    return ViT(
        image_size=cfg["image_size"],
        in_channels=cfg["in_channels"],
        patch_size=cfg["patch_size"],
        num_classes=cfg["num_classes"],
        dim=cfg["dim"],
        depth=cfg["depth"],
        heads=cfg["heads"],
        mlp_dim=cfg["mlp_dim"],
        dropout=cfg.get("dropout", 0.1),
        attention_type=attention_type,
        rpe_type=rpe_type,
        attention_kwargs=tuple(sorted(attn_kwargs.items())),
        rpe_kwargs=tuple(sorted(rpe_kwargs.items())),
        mlp_type=mlp_type,
        mlp_kwargs=tuple(sorted(mlp_kwargs.items())),
        dtype=cfg.get("compute_dtype", "float32"),
        remat=cfg.get("remat", False),
    )


def list_available_models() -> list:
    """All pre-configured variant names (reference: factory.py:241-248)."""
    return list(MODEL_VARIANTS.keys())


def get_model_info(model_name: str) -> Dict[str, Any]:
    """Variant metadata (reference: factory.py:251-272)."""
    if model_name not in MODEL_VARIANTS:
        raise ValueError(f"Unknown model: {model_name}")
    attention_type, rpe_type = MODEL_VARIANTS[model_name]
    return {
        "name": model_name,
        "attention_type": attention_type,
        "rpe_type": rpe_type,
        "attention_complexity": "O(N²)" if attention_type == "softmax" else "O(N)",
        "has_rpe": rpe_type is not None,
    }


def count_parameters(params) -> Dict[str, int]:
    """Total parameter count of a params pytree
    (reference: base_vit.py:235-253; flax params are all trainable)."""
    import jax

    total = sum(x.size for x in jax.tree_util.tree_leaves(params))
    return {"total": total, "trainable": total, "non_trainable": 0}
