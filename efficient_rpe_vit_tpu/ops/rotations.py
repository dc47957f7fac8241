"""Positional rotations: RoPE (1D) and Circulant-STRING (2D, FFT).

RoPE (reference: models/rpe/rope.py:40-137): frequencies
theta_m = base^(-2m/d); pairs of even/odd lanes rotated by angle pos*theta_m.
NOTE the reference is 1D-sequential over token index *including CLS*
(rope.py:96-98), despite README claims of 2D support — we reproduce the 1D
behaviour for parity (SURVEY.md §2.10).

Circulant-STRING (reference: models/rpe/circulant_string.py, Schenck et al.
2025): rotation R(r) = exp(sum_k r_k L_k) with L_k = C_k - C_k^T circulant
skew-symmetric generators. Diagonalised by the DFT: eigenvalues
lambda_L = 2i*Im(FFT(c)) are purely imaginary, so exp lies on the unit circle
(no overflow). Applied as x' = IFFT(exp(mu) * FFT(x)) along head_dim.
CLS token (index 0) is excluded from rotation (circulant_string.py:321-341).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# ------------------------------------------------------------------ RoPE ---

def rope_tables(num_positions: int, head_dim: int, theta: float = 10000.0):
    """Precompute cos/sin tables.

    Returns:
        (cos, sin): each [num_positions, head_dim // 2], float32 numpy —
        static constants folded into the compiled program.
    """
    freqs = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim))
    angles = np.arange(num_positions, dtype=np.float32)[:, None] * freqs[None, :]
    return np.cos(angles), np.sin(angles)


def apply_rope(q, k, cos, sin):
    """Rotate interleaved even/odd lane pairs of q and k.

    [x_even, x_odd] -> [x_even*cos - x_odd*sin, x_even*sin + x_odd*cos]
    (reference: rope.py:109-137).

    Args:
        q, k: [B, H, N, D].
        cos, sin: [N', D//2] with N' >= N (sliced to N).
    Returns:
        (q_rot, k_rot) same shapes/dtypes as inputs.
    """
    B, H, N, D = q.shape
    cos = jnp.asarray(cos)[:N][None, None]  # [1, 1, N, D//2]
    sin = jnp.asarray(sin)[:N][None, None]

    def rot(x):
        x_even = x[..., 0::2]
        x_odd = x[..., 1::2]
        r_even = x_even * cos - x_odd * sin
        r_odd = x_even * sin + x_odd * cos
        return jnp.stack([r_even, r_odd], axis=-1).reshape(B, H, N, D)

    return rot(q), rot(k)


# ----------------------------------------------------- Circulant-STRING ---

def grid_positions_2d(num_patch_tokens: int, coord_dim: int = 2) -> np.ndarray:
    """Row-major integer (x, y) grid for a square patch layout.

    Matches the reference's meshgrid('ij') + [xx, yy] stacking
    (circulant_string.py:183-205): position[i*W + j] = (j, i).

    Returns:
        [num_patch_tokens, coord_dim] float32 numpy (static constant).
    """
    if num_patch_tokens <= 0:
        return np.zeros((0, coord_dim), np.float32)
    side = int(np.sqrt(num_patch_tokens))
    if side * side != num_patch_tokens:
        raise ValueError(
            f"num_patch_tokens={num_patch_tokens} must be a perfect square "
            "for 2D position encoding"
        )
    yy, xx = np.meshgrid(
        np.arange(side, dtype=np.float32),
        np.arange(side, dtype=np.float32),
        indexing="ij",
    )
    pos = np.stack([xx.ravel(), yy.ravel()], axis=-1)  # [n, 2] = (x, y)
    if coord_dim != 2:
        # generalised coordinates: zero-pad / truncate extra dims
        out = np.zeros((num_patch_tokens, coord_dim), np.float32)
        out[:, : min(2, coord_dim)] = pos[:, : min(2, coord_dim)]
        return out
    return pos


def circulant_eigenvalues(coeffs):
    """Eigenvalues of L = C - C^T from circulant first-row coefficients.

    lambda_L = FFT(c) - conj(FFT(c)) = 2i * Im(FFT(c)) — purely imaginary
    (reference: circulant_string.py:207-232).

    Args:
        coeffs: [..., D] real.
    Returns:
        [..., D] complex64, purely imaginary.
    """
    lam = jnp.fft.fft(coeffs.astype(jnp.float32), axis=-1)
    return lam - jnp.conj(lam)


def apply_circulant_rotation(x, positions, coeffs):
    """x' = exp(sum_k r_k L_k) @ x via FFT along head_dim.

    Args:
        x: [B, H, N, D] (patch tokens only — CLS excluded by the caller).
        positions: [N, coord_dim] real.
        coeffs: [H, coord_dim, D] real learnable circulant coefficients.
    Returns:
        [B, H, N, D] rotated, same dtype as x.
    """
    eig = circulant_eigenvalues(coeffs)  # [H, C, D] purely imaginary
    pos = jnp.asarray(positions, dtype=jnp.float32)
    # mu[h, n, d] = sum_c pos[n, c] * eig[h, c, d]  (complex)
    mu = jnp.einsum("nc,hcd->hnd", pos.astype(eig.dtype), eig)
    x_freq = jnp.fft.fft(x.astype(jnp.complex64), axis=-1)
    # exp(mu) lies on the unit circle (mu purely imaginary) — no overflow.
    x_rot = jnp.fft.ifft(jnp.exp(mu)[None] * x_freq, axis=-1).real
    return x_rot.astype(x.dtype)


def apply_circulant_string(q, k, positions, coeffs):
    """Rotate patch tokens of q and k; CLS (index 0) passes through unchanged
    (reference: circulant_string.py:297-341)."""
    if q.shape[2] <= 1:
        return q, k
    q_rot = jnp.concatenate(
        [q[:, :, :1], apply_circulant_rotation(q[:, :, 1:], positions, coeffs)],
        axis=2,
    )
    k_rot = jnp.concatenate(
        [k[:, :, :1], apply_circulant_rotation(k[:, :, 1:], positions, coeffs)],
        axis=2,
    )
    return q_rot, k_rot
