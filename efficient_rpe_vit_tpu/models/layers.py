"""Shared model layers: MLP and the unified transformer block.

Mirrors the reference's pre-norm block (models/components/
unified_transformer.py:13-90): x + attn(LN(x), rpe) then x + mlp(LN(x)),
with the RPE threaded INTO the attention call (KERPLE must run inside the
kernelised-attention math, not after it).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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


def _moe_partial_combine(x, gates, w1, b1, w2, b2, axis_name=None):
    """Per-shard soft-MoE body: each device computes ITS experts' outputs
    for all tokens and weight-combines with its gate slice; a psum over the
    expert axis (when sharded) completes the mixture. Exact — identical to
    the single-device computation."""
    h = jnp.einsum("bnc,ecm->ebnm", x, w1,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    h = h + b1[:, None, None, :]
    h = nn.gelu(h, approximate=False)
    y = jnp.einsum("ebnm,emc->ebnc", h, w2,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    y = y + b2[:, None, None, :]
    out = jnp.einsum("ebnc,bne->bnc", y, gates,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out


class MoeMlp(nn.Module):
    """Soft-mixture-of-experts MLP (dense routing) with optional expert
    parallelism.

    Every expert is a standard Mlp (fc1 -> GELU -> fc2); a learned router
    produces softmax gates and the output is the gate-weighted mixture.
    Soft (dense) routing keeps the layer exact and fully differentiable —
    no capacity factors, token dropping, or load-balancing losses — which
    is the right regime at this model family's scale, and makes expert
    parallelism EXACT: with `expert_mesh` set, expert weights shard over
    `expert_axis`, each device computes only its local experts (compute
    scales 1/E per device), and one psum combines the mixture.

    New capability over the reference (which has no MoE); completes the
    dp x tp x cp x pp x ep axis set (docs/PARALLELISM.md).
    """

    dim: int
    mlp_dim: int
    num_experts: int = 4
    dropout: float = 0.0
    dtype: str = "float32"
    expert_mesh: Optional[Mesh] = None
    expert_axis: str = "expert"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dtype = jnp.dtype(self.dtype)
        E, C, M = self.num_experts, self.dim, self.mlp_dim
        gates = jax.nn.softmax(
            nn.Dense(E, name="router", dtype=dtype,
                     kernel_init=nn.initializers.xavier_uniform())(x),
            axis=-1,
        )  # [B, N, E]
        init = nn.initializers.xavier_uniform()
        w1 = self.param("w1", init, (E, C, M)).astype(dtype)
        b1 = self.param("b1", nn.initializers.zeros, (E, M)).astype(dtype)
        w2 = self.param("w2", init, (E, M, C)).astype(dtype)
        b2 = self.param("b2", nn.initializers.zeros, (E, C)).astype(dtype)

        if self.expert_mesh is not None:
            mesh, axis = self.expert_mesh, self.expert_axis
            e_spec = lambda nd: P(*((axis,) + (None,) * (nd - 1)))
            fn = jax.shard_map(
                functools.partial(_moe_partial_combine, axis_name=axis),
                mesh=mesh,
                in_specs=(P(), P(None, None, axis), e_spec(3), e_spec(2),
                          e_spec(3), e_spec(2)),
                out_specs=P(),
            )
            put = lambda t, s: jax.device_put(t, NamedSharding(mesh, s))
            out = fn(put(x, P()), put(gates, P(None, None, axis)),
                     put(w1, e_spec(3)), put(b1, e_spec(2)),
                     put(w2, e_spec(3)), put(b2, e_spec(2)))
        else:
            out = _moe_partial_combine(x, gates, w1, b1, w2, b2)
        # dropout once on the combined output (a per-expert mask would make
        # expert-parallel stochastic-inequal to single-device)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)


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
    mlp_type: str = "dense"  # 'dense' | 'moe'
    mlp_kwargs: tuple = ()   # e.g. (('num_experts', 4), ('expert_mesh', m))
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
        if self.mlp_type == "moe":
            self.mlp = MoeMlp(dim=self.dim, mlp_dim=self.mlp_dim,
                              dropout=self.dropout, dtype=self.dtype,
                              **dict(self.mlp_kwargs))
        else:
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
