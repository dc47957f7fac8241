"""Attention modules: softmax O(N^2), FAVOR+ O(N), ReLU O(N).

Flax parameter containers over `ops.attention_core` / `ops.feature_maps`.
RPE dispatch is **static**: the RPE argument is a (possibly None) flax
module whose Python type selects the compute path at trace time — the
reference's runtime isinstance chain (favor_plus.py:179-209) becomes
compile-time branch selection, so each of the 11 variants compiles to its
own fused XLA program.

Compatibility contracts preserved:
  * fused QKV projection, optional bias (softmax.py:38, favor_plus.py:58),
  * softmax scale d^-1/2; linear-attention scale d^-1/4 on both q and k
    (favor_plus.py:71),
  * KERPLE requires L2-normalised q/k (favor_plus.py:197-201) and is
    REJECTED by softmax attention (softmax.py:68-77),
  * FAVOR+/ReLU raise on return_attention (favor_plus.py:267-273),
  * optional feature redraw every `feature_redraw_interval` training steps
    (favor_plus.py:167-171) via a mutable 'state' counter + 'features' rng.
"""

from __future__ import annotations

from typing import Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..ops import (
    default_num_features,
    gaussian_features,
    linear_attention,
    orthogonal_gaussian_features,
    phi_positive,
    phi_relu,
    softmax_attention,
)
from ..ops.feature_maps import mxu_num_features, phi_hyperbolic
from .rpe import CirculantStringRPE, KerpleRPE, RoPE, RoPE2D

# Checkpoint the phi feature maps once their fp32 autodiff residual
# (B*H*N*M floats, kept twice per block) crosses this size; fires only at
# long-N / ViT-B scales, never at the reference's dim-32 shapes.
PHI_CHECKPOINT_BYTES = 128 * 1024 ** 2


def _split_heads(x, heads: int):
    """[B, N, C] -> [B, H, N, C/H]"""
    B, N, C = x.shape
    return x.reshape(B, N, heads, C // heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    """[B, H, N, D] -> [B, N, H*D]"""
    B, H, N, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, N, H * D)


class SoftmaxAttention(nn.Module):
    """Standard multi-head softmax attention (reference: softmax.py:14-124)."""

    dim: int
    heads: int
    dropout: float = 0.0
    qkv_bias: bool = False
    dtype: str = "float32"
    # Context parallelism: when seq_mesh is set, the attention core runs
    # ring softmax attention with the sequence sharded over `seq_axis`
    # (parallel/seq_parallel.py). Attention-probability dropout is not
    # applied on this path (the probabilities never materialise); the
    # output-projection dropout still applies.
    seq_mesh: Optional[Mesh] = None
    seq_axis: str = "seq"

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads

    @nn.compact
    def __call__(self, x, mask=None, rpe=None, return_attention: bool = False,
                 deterministic: bool = True):
        if isinstance(rpe, KerpleRPE):
            raise NotImplementedError(
                "KERPLE RPE is designed specifically for kernelized attention "
                "(FAVOR+/ReLU Performer) and cannot be used with standard "
                "softmax attention. KERPLE requires linear attention "
                "mechanisms to achieve O(n log n) complexity. For softmax "
                "attention, use RoPE or Circulant-STRING RPE instead."
            )
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, name="qkv",
                       dtype=jnp.dtype(self.dtype),
                       kernel_init=nn.initializers.xavier_uniform())(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (_split_heads(t, self.heads) for t in (q, k, v))

        if isinstance(rpe, (RoPE, RoPE2D)):
            q, k = rpe.apply_rotary(q, k)
        elif isinstance(rpe, CirculantStringRPE):
            # the rotated q/k feed the flash Pallas kernel whenever the
            # memory-aware dispatch will pick it — the condition under
            # which the Pallas rotation kernel wins (chains
            # layout-compatibly into the custom call; ops/rotations.py)
            from ..ops.attention_core import softmax_needs_flash

            prefer = (
                self.seq_mesh is None
                and isinstance(q.shape[0], int)
                and not return_attention
                and softmax_needs_flash(q.shape[0], q.shape[1], q.shape[2])
            )
            q, k = rpe.rotate(q, k, prefer_kernel=prefer)

        if self.seq_mesh is not None:
            if mask is not None or return_attention:
                raise NotImplementedError(
                    "context-parallel softmax attention supports neither "
                    "masks nor return_attention"
                )
            if self.dropout > 0 and not deterministic:
                # the ring never materialises the probability matrix, so
                # attention-probability dropout cannot be applied — refuse
                # loudly rather than silently training a different model
                raise NotImplementedError(
                    "context-parallel softmax attention does not support "
                    "attention-probability dropout; set dropout=0 or train "
                    "without seq_mesh"
                )
            from ..parallel.seq_parallel import ring_softmax_attention

            out = ring_softmax_attention(
                q, k, v, self.head_dim ** -0.5, self.seq_mesh, self.seq_axis
            )
        else:
            # Attention-probability dropout rides the memory-aware dispatch
            # (ops/attention_core.py): the dense path applies a bernoulli
            # mask to the probabilities; the flash path regenerates
            # position-hashed keep masks inside its tiled kernels, so
            # reference-default training (dropout 0.1, softmax.py:112)
            # stays memory-safe at any N.
            live_rate = (
                float(self.dropout)
                if self.dropout > 0 and not deterministic else 0.0
            )
            out = softmax_attention(
                q, k, v, self.head_dim ** -0.5, mask=mask,
                return_attention=return_attention,
                dropout_rate=live_rate,
                dropout_rng=(
                    self.make_rng("dropout") if live_rate > 0 else None
                ),
            )
        if return_attention:
            out, attn_weights = out
        out = _merge_heads(out)
        out = nn.Dense(self.dim, name="proj", dtype=jnp.dtype(self.dtype),
                       kernel_init=nn.initializers.xavier_uniform())(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        if return_attention:
            return out, attn_weights
        return out


class _KernelAttention(nn.Module):
    """Shared machinery for FAVOR+ and ReLU linear attention
    (reference: favor_plus.py:16-275 / relu.py:16-273 are structural clones)."""

    dim: int
    heads: int
    dropout: float = 0.0
    # int, None (paper default floor(d_h ln d_h)), or "mxu" (lane-aligned:
    # nearest multiple of 128 — identical matmul cost, zero padding waste;
    # ops/feature_maps.py::mxu_num_features)
    num_features: Union[int, str, None] = None
    use_orthogonal: bool = True
    feature_redraw_interval: Optional[int] = None
    qkv_bias: bool = False
    dtype: str = "float32"
    # Context parallelism: when seq_mesh is set, the attention core shards
    # the sequence over `seq_axis` — one psum of the [F, D]/[F] summaries
    # for the plain linear path, a ppermute ring for KERPLE
    # (parallel/seq_parallel.py). Exact: matches single-device outputs.
    seq_mesh: Optional[Mesh] = None
    seq_axis: str = "seq"
    # KERPLE-only: compute phi INSIDE the Pallas coeffs kernel
    # (ops/pallas/masked_linear_coeffs.py::kerple_attention_fused_phi,
    # SURVEY §7 step 8(b)) so q'/k' never roundtrip HBM on the forward.
    # Explicit A/B knob, not a default: the k-side phi recompute costs
    # ~+9% kernel flops per tile — see results/fused_phi_ab_r5.json for
    # the model-level verdict.
    fused_phi: bool = False

    feature_kind: str = "favor_plus"  # overridden by subclasses

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads

    @property
    def m(self) -> int:
        if self.num_features == "mxu":
            return mxu_num_features(self.head_dim)
        return (
            self.num_features
            if self.num_features is not None
            else default_num_features(self.head_dim)
        )

    def _draw_omega(self, key):
        if self.use_orthogonal:
            return orthogonal_gaussian_features(key, self.heads, self.head_dim, self.m)
        return gaussian_features(key, self.heads, self.head_dim, self.m)

    def _phi(self, x, omega):
        if self.feature_kind == "favor_plus":
            return phi_positive(x, omega)
        if self.feature_kind == "favor_hyper":
            return phi_hyperbolic(x, omega)
        return phi_relu(x, omega)

    @nn.compact
    def __call__(self, x, mask=None, rpe=None, return_attention: bool = False,
                 deterministic: bool = True):
        if return_attention:
            raise NotImplementedError(
                "Linear attention doesn't compute explicit attention "
                "matrices. Returning attention weights would require O(N^2) "
                "computation."
            )
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, name="qkv",
                       dtype=jnp.dtype(self.dtype),
                       kernel_init=nn.initializers.xavier_uniform())(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (_split_heads(t, self.heads) for t in (q, k, v))

        # Omega lives in the non-trainable 'constants' collection; generated
        # once at init from the 'params' rng (explicit-key analogue of the
        # reference's buffer, favor_plus.py:73-81).
        omega_var = self.variable(
            "constants", "omega",
            lambda: self._draw_omega(self.make_rng("params")),
        )

        # Optional feature redraw during training (favor_plus.py:167-171).
        if (
            self.feature_redraw_interval is not None
            and not deterministic
            and not self.is_initializing()
        ):
            counter = self.variable(
                "state", "redraw_counter", lambda: jnp.zeros((), jnp.int32)
            )
            do_redraw = (counter.value % self.feature_redraw_interval) == 0
            # lax.cond, not jnp.where: the blockwise QR in _draw_omega must
            # only execute on the interval steps — a where would run it (and
            # materialise both omegas) every training step.
            omega_var.value = jax.lax.cond(
                do_redraw,
                self._draw_omega,
                lambda _key: omega_var.value,
                self.make_rng("features"),
            )
            counter.value = counter.value + 1
        elif self.feature_redraw_interval is not None and self.is_initializing():
            self.variable(
                "state", "redraw_counter", lambda: jnp.zeros((), jnp.int32)
            )
        omega = omega_var.value

        # Static RPE dispatch (trace-time; no runtime branching in XLA).
        scale = self.head_dim ** -0.25  # d^-1/4 on both q and k
        use_kerple = isinstance(rpe, KerpleRPE)
        if isinstance(rpe, (RoPE, RoPE2D)):
            q, k = rpe.apply_rotary(q, k)
            q, k = q * scale, k * scale
        elif isinstance(rpe, CirculantStringRPE):
            q, k = rpe.rotate(q, k)
            q, k = q * scale, k * scale
        elif use_kerple:
            # L2 normalisation for stability (Luo et al. 2021 §3.3, Thm 3).
            # Safe-norm form: the clamp sits INSIDE the sqrt so both the
            # forward AND the sqrt's VJP are finite on all-zero rows (which
            # occur as pipeline-drain ticks in parallel/pipeline.py; a
            # clamp outside the sqrt still yields NaN grads via
            # 0-cotangent * sqrt'(0)=inf). Bit-identical to the reference's
            # raw division (favor_plus.py:200-201) for any real activation.
            def _safe_normalize(t):
                sq = jnp.sum(t * t, axis=-1, keepdims=True)
                return t / jnp.sqrt(jnp.maximum(sq, 1e-24))

            q = _safe_normalize(q)
            k = _safe_normalize(k)
        else:
            q, k = q * scale, k * scale

        if self.fused_phi and use_kerple and self.seq_mesh is None:
            if self.feature_kind not in ("favor_plus", "relu"):
                raise NotImplementedError(
                    f"fused_phi supports favor_plus/relu, not "
                    f"{self.feature_kind}"
                )
            from ..ops.pallas import (
                kerple_attention_fused_phi,
                pallas_available,
            )

            # interpret mode off-TPU keeps the flag testable on CPU
            out = kerple_attention_fused_phi(
                q, k, v, omega, rpe.coeffs(), self.feature_kind,
                interpret=not pallas_available(),
            )
            out = _merge_heads(out)
            out = nn.Dense(self.dim, name="proj", dtype=jnp.dtype(self.dtype),
                           kernel_init=nn.initializers.xavier_uniform())(out)
            out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
            return out

        # Long-N memory guard: XLA keeps each phi's fp32 exp output alive
        # as an autodiff residual (measured 289 MB x 2 per block at ViT-B
        # N=4097 — the dominant HBM consumer of a long-N kernel-attention
        # train step). Recomputing phi in the backward costs one O(N)
        # einsum, so checkpoint it once the residual would be big; below
        # the threshold the residual is cheaper than the recompute.
        phi_bytes = 4 * q.shape[0] * q.shape[1] * q.shape[2] * self.m
        # symbolic dims (jax.export shape polymorphism) make the byte
        # product non-concrete; those traces are inference-only, where the
        # checkpoint is irrelevant — skip it
        if isinstance(phi_bytes, int) and phi_bytes > PHI_CHECKPOINT_BYTES:
            q_prime, k_prime = jax.checkpoint(
                lambda q, k, om: (self._phi(q, om), self._phi(k, om))
            )(q, k, omega)
        else:
            q_prime = self._phi(q, omega)
            k_prime = self._phi(k, omega)

        if self.seq_mesh is not None:
            from ..parallel.seq_parallel import (
                ring_kerple_attention,
                seq_parallel_linear_attention,
            )

            if use_kerple:
                out = ring_kerple_attention(
                    q_prime, k_prime, v, rpe.coeffs(),
                    self.seq_mesh, self.seq_axis,
                )
            else:
                out = seq_parallel_linear_attention(
                    q_prime, k_prime, v, self.seq_mesh, self.seq_axis
                )
        elif use_kerple:
            out = rpe.attention(q_prime, k_prime, v)
        else:
            out = linear_attention(q_prime, k_prime, v)

        out = _merge_heads(out)
        out = nn.Dense(self.dim, name="proj", dtype=jnp.dtype(self.dtype),
                       kernel_init=nn.initializers.xavier_uniform())(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return out


class FavorPlusAttention(_KernelAttention):
    """FAVOR+ positive-random-feature attention (Choromanski et al. 2020;
    reference: models/attention/favor_plus.py)."""

    feature_kind: str = "favor_plus"


class ReluAttention(_KernelAttention):
    """ReLU-feature linear attention (reference: models/attention/relu.py)."""

    feature_kind: str = "relu"


class FavorHyperAttention(_KernelAttention):
    """Positive hyperbolic random features (Performer paper Lemma 1) —
    antithetic +/- projection pairs halve estimator variance at the same m.
    New in this framework (no reference counterpart)."""

    feature_kind: str = "favor_hyper"


# name -> class, with aliases (reference: models/attention/__init__.py:16-23)
ATTENTION_REGISTRY = {
    "softmax": SoftmaxAttention,
    "baseline": SoftmaxAttention,
    "favor_plus": FavorPlusAttention,
    "favor+": FavorPlusAttention,
    "performer": FavorPlusAttention,
    "relu": ReluAttention,
    "favor_hyper": FavorHyperAttention,  # new: hyperbolic features
}
