"""Shared model layers: MLP and the unified transformer block.

Mirrors the reference's pre-norm block (models/components/
unified_transformer.py:13-90): x + attn(LN(x), rpe) then x + mlp(LN(x)),
with the RPE threaded INTO the attention call (KERPLE must run inside the
kernelised-attention math, not after it).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from .attention import ATTENTION_REGISTRY
from .rpe import RPE_REGISTRY


class Mlp(nn.Module):
    """Linear -> GELU -> Dropout -> Linear -> Dropout
    (reference: unified_transformer.py:52-58)."""

    dim: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dtype = jnp.dtype(self.dtype)
        x = nn.Dense(self.mlp_dim, name="fc1", dtype=dtype,
                     kernel_init=nn.initializers.xavier_uniform())(x)
        x = nn.gelu(x, approximate=False)  # exact erf, matches torch nn.GELU
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.dim, name="fc2", dtype=dtype,
                     kernel_init=nn.initializers.xavier_uniform())(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


def _freeze_kwargs(d: Optional[Dict[str, Any]]):
    """Dict -> hashable tuple for flax static fields."""
    if not d:
        return ()
    return tuple(sorted(d.items()))


class TransformerBlock(nn.Module):
    """Pre-norm transformer block with statically injected attention + RPE.

    `attention_type` / `rpe_type` are registry names resolved at module
    construction; each (attention, rpe) pair traces to its own XLA program.
    Per reference semantics, every block owns its *own* RPE instance
    (base_vit.py:112-150), so RPE params are per-block.
    """

    dim: int
    heads: int
    mlp_dim: int
    num_patches: int  # sequence length including CLS
    dropout: float = 0.0
    attention_type: str = "softmax"
    rpe_type: Optional[str] = None
    attention_kwargs: tuple = ()  # sorted (key, value) pairs
    rpe_kwargs: tuple = ()
    dtype: str = "float32"

    def setup(self):
        attn_cls = ATTENTION_REGISTRY[self.attention_type]
        self.attention = attn_cls(
            dim=self.dim,
            heads=self.heads,
            dropout=self.dropout,
            dtype=self.dtype,
            **dict(self.attention_kwargs),
        )
        if self.rpe_type is not None:
            rpe_cls = RPE_REGISTRY[self.rpe_type]
            self.rpe = rpe_cls(
                num_patches=self.num_patches,
                dim=self.dim,
                heads=self.heads,
                **dict(self.rpe_kwargs),
            )
        else:
            self.rpe = None
        # LayerNorm statistics stay fp32; output cast to compute dtype
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        self.mlp = Mlp(dim=self.dim, mlp_dim=self.mlp_dim,
                       dropout=self.dropout, dtype=self.dtype)

    def __call__(self, x, deterministic: bool = True,
                 return_attention: bool = False):
        attn_out = self.attention(
            self.norm1(x), rpe=self.rpe, deterministic=deterministic,
            return_attention=return_attention,
        )
        weights = None
        if return_attention:
            attn_out, weights = attn_out
        x = x + attn_out
        x = x + self.mlp(self.norm2(x), deterministic=deterministic)
        if return_attention:
            return x, weights
        return x
