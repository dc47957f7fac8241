"""RPE modules — thin flax parameter containers over `ops.rotations` /
`ops.fft_toeplitz` functional cores.

Mirrors the reference's RPE family (models/rpe/): RoPE (0 params), KERPLE
([heads, 2n-1] biases), Circulant-STRING ([heads, coord_dim, head_dim]
coefficients). Registry name/alias vocabulary matches
reference models/rpe/__init__.py:17-24.
"""

from __future__ import annotations

import warnings
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops import (
    apply_rope,
    grid_positions_2d,
    kerple_linear_attention,
    rope_tables,
    toeplitz_matmul,
)
from ..ops.rotations import apply_circulant_string


class RoPE(nn.Module):
    """1D rotary embedding over token index 0..N-1 *including CLS*
    (reference: models/rpe/rope.py:18-137; parameter-free)."""

    num_patches: int  # sequence length including CLS
    dim: int
    heads: int
    theta: float = 10000.0

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads

    def setup(self):
        cos, sin = rope_tables(self.num_patches, self.head_dim, self.theta)
        self._cos, self._sin = cos, sin  # static numpy constants

    def apply_rotary(self, q, k):
        return apply_rope(q, k, self._cos, self._sin)

    def __call__(self, x):  # BaseRPE-interface no-op (reference: rope.py:139-162)
        return x


class RoPE2D(nn.Module):
    """Axial 2D rotary embedding over the patch grid — the honest upgrade
    of the reference's 1D RoPE (its README claims 2D vision positions but
    the code rotates by 1D token index; SURVEY.md §2.10). First half of
    head_dim rotates by x, second half by y; CLS excluded. Parameter-free.
    New in this framework (no reference counterpart)."""

    num_patches: int  # sequence length including CLS
    dim: int
    heads: int
    theta: float = 100.0

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads

    def setup(self):
        from ..ops.rotations import rope_2d_tables

        cos, sin = rope_2d_tables(self.num_patches - 1, self.head_dim,
                                  self.theta)
        self._cos, self._sin = cos, sin

    def apply_rotary(self, q, k):
        from ..ops.rotations import apply_rope_2d

        return apply_rope_2d(q, k, self._cos, self._sin)

    def __call__(self, x):
        return x


class KerpleRPE(nn.Module):
    """KERPLE 'most general' RPE (Luo et al. 2021, Alg. 1).

    Learnable biases b_{j-i} per head; Toeplitz C[i,j] = exp(b_{j-i}) applied
    inside kernelised attention (reference: models/rpe/kerple.py:18-344).
    Param shape [heads, 2n-1], init N(0, 0.02) (kerple.py:62-72).
    """

    num_patches: int  # sequence length including CLS
    dim: int
    heads: int
    method: str = "auto"  # kerple compute path: auto | dense | fft

    def setup(self):
        self.rel_pos_bias = self.param(
            "rel_pos_bias",
            nn.initializers.normal(stddev=0.02),
            (self.heads, 2 * self.num_patches - 1),
        )

    @property
    def max_rel_pos(self) -> int:
        return 2 * self.num_patches - 1

    def coeffs(self):
        """Positive Toeplitz coefficients c_k = exp(b_k)."""
        return jnp.exp(self.rel_pos_bias)

    def attention(self, q_prime, k_prime, v):
        """Full KERPLE linear attention (numerator/denominator fused)."""
        return kerple_linear_attention(
            q_prime, k_prime, v, self.coeffs(), method=self.method
        )

    def apply_rpe_fft(self, k_prime, v: Optional[jnp.ndarray] = None):
        """Reference-compatible D1/D2 API (kerple.py:99-344).

        D1 (v given):  [B, H, n, F, D] = T @ outer(phi(K), V)
        D2 (v None):   [B, H, n, F]    = T @ phi(K)
        Exposed for tests/diagnostics; the fused `attention` path above is
        what models actually run (it never materialises D1).
        """
        c = self.coeffs()
        if v is None:
            return toeplitz_matmul(c, k_prime, method="fft")
        B, H, N, F = k_prime.shape
        D = v.shape[-1]
        a1 = (k_prime[..., :, None] * v[..., None, :]).reshape(B, H, N, F * D)
        return toeplitz_matmul(c, a1, method="fft").reshape(B, H, N, F, D)

    def __call__(self, x):
        raise NotImplementedError(
            "KERPLE does not use the standard forward() interface. "
            "It must run inside kernelised attention (FAVOR+/ReLU); see "
            "models/attention.py."
        )


class CirculantStringRPE(nn.Module):
    """Circulant-STRING RPE (Schenck et al. 2025).

    Learnable circulant coefficients [heads, coord_dim, head_dim], init
    N(0, 0.01); FFT rotation along head_dim; true 2D integer grid positions;
    CLS excluded (reference: models/rpe/circulant_string.py:66-341).
    """

    num_patches: int  # sequence length including CLS
    dim: int
    heads: int
    coord_dim: int = 2
    block_size: Optional[int] = None
    enable_block_circulant: bool = False
    image_size: Optional[int] = None  # accepted for factory parity; unused
    patch_size: Optional[int] = None

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads

    def setup(self):
        self._blocked = False
        if self.block_size is not None:
            if self.head_dim % self.block_size != 0:
                raise ValueError(
                    f"head_dim ({self.head_dim}) must be divisible by "
                    f"block_size ({self.block_size})"
                )
            if self.enable_block_circulant:
                # Real block-circulant structure (the STRING paper's sweep;
                # stubbed as future work in the reference,
                # circulant_string.py:377-398). Same parameter count,
                # smaller per-block FFTs.
                self._blocked = True
            else:
                # Reference behaviour for bare block_size: warn + fall back
                # (circulant_string.py:127-144) — kept for parity.
                warnings.warn(
                    f"block_size={self.block_size} specified but "
                    "enable_block_circulant is False; using full-dimension "
                    "circulant (reference-compatible fallback). Pass "
                    "enable_block_circulant=True to use the real "
                    "block-circulant structure.",
                    UserWarning,
                )
        if self._blocked:
            shape = (self.heads, self.coord_dim,
                     self.head_dim // self.block_size, self.block_size)
        else:
            shape = (self.heads, self.coord_dim, self.head_dim)
        self.circulant_coeffs = self.param(
            "circulant_coeffs", nn.initializers.normal(stddev=0.01), shape
        )
        self._positions = grid_positions_2d(self.num_patches - 1, self.coord_dim)

    def get_eigenvalues(self):
        from ..ops import circulant_eigenvalues

        return circulant_eigenvalues(self.circulant_coeffs)

    def rotate(self, q, k, prefer_kernel: bool = False):
        """Rotate q/k patch tokens; CLS passes through.

        prefer_kernel: the caller's hint that the rotated q/k feed a
        Pallas custom call (flash softmax) — the measured win condition
        for the single-pass rotation kernel (ops/rotations.py
        USE_PALLAS_ROTATION note)."""
        if self._blocked:
            from ..ops.rotations import (
                _rotate_keep_cls,
                apply_block_circulant_rotation,
            )

            if q.shape[2] <= 1:
                return q, k
            q_rot = _rotate_keep_cls(
                apply_block_circulant_rotation, q, self._positions,
                self.circulant_coeffs)
            k_rot = _rotate_keep_cls(
                apply_block_circulant_rotation, k, self._positions,
                self.circulant_coeffs)
            return q_rot, k_rot
        return apply_circulant_string(q, k, self._positions,
                                      self.circulant_coeffs,
                                      prefer_kernel=prefer_kernel)

    def __call__(self, x):  # BaseRPE-interface no-op
        return x


# name -> class, with aliases (reference: models/rpe/__init__.py:17-24)
# rope_2d / rope_axial are new in this framework (true-2D RoPE upgrade).
RPE_REGISTRY = {
    "most_general": KerpleRPE,
    "kerple": KerpleRPE,
    "circulant_string": CirculantStringRPE,
    "circulant": CirculantStringRPE,
    "rope": RoPE,
    "rotary": RoPE,
    "rope_2d": RoPE2D,
    "rope_axial": RoPE2D,
}
