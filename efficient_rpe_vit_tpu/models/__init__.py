from .rpe import RoPE, KerpleRPE, CirculantStringRPE, RPE_REGISTRY
from .attention import (
    SoftmaxAttention,
    FavorPlusAttention,
    ReluAttention,
    FavorHyperAttention,
    ATTENTION_REGISTRY,
)
from .layers import Mlp, TransformerBlock
from .vit import ViT
from .factory import (
    MODEL_VARIANTS,
    create_model,
    list_available_models,
    get_model_info,
)

__all__ = [
    "RoPE",
    "KerpleRPE",
    "CirculantStringRPE",
    "RPE_REGISTRY",
    "SoftmaxAttention",
    "FavorPlusAttention",
    "ReluAttention",
    "FavorHyperAttention",
    "ATTENTION_REGISTRY",
    "Mlp",
    "TransformerBlock",
    "ViT",
    "MODEL_VARIANTS",
    "create_model",
    "list_available_models",
    "get_model_info",
]
