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

import jax
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


def rope_2d_tables(num_patch_tokens: int, head_dim: int,
                   theta: float = 100.0):
    """Axial 2D RoPE tables over the patch grid (the honest upgrade the
    reference's README promises but its code doesn't deliver —
    SURVEY.md §2.10).

    The head_dim is split in half: the first half rotates by the x
    coordinate, the second by the y coordinate (axial frequencies like
    naver-ai/rope-vit's 2D variant). `theta` defaults lower than 1D RoPE
    because grid coordinates span ~14 positions, not thousands.

    Returns:
        (cos, sin): [num_patch_tokens, head_dim // 2] float32 numpy for the
        PATCH tokens only (CLS is excluded by the caller).
    """
    if head_dim % 4 != 0:
        raise ValueError(f"axial 2D RoPE needs head_dim % 4 == 0, got {head_dim}")
    pos = grid_positions_2d(num_patch_tokens)  # [N, 2] = (x, y)
    quarter = head_dim // 4
    freqs = 1.0 / (
        theta ** (np.arange(quarter, dtype=np.float32) / quarter)
    )  # [quarter]
    ang_x = pos[:, 0:1] * freqs[None, :]  # [N, quarter]
    ang_y = pos[:, 1:2] * freqs[None, :]
    angles = np.concatenate([ang_x, ang_y], axis=-1)  # [N, head_dim//2]
    return np.cos(angles), np.sin(angles)


def apply_rope_2d(q, k, cos, sin):
    """Axial 2D rotary embedding; CLS (token 0) passes through unrotated.

    Args:
        q, k: [B, H, N, D] with CLS at index 0.
        cos, sin: [N-1, D//2] patch-token tables from rope_2d_tables.
    """
    if q.shape[2] <= 1:
        return q, k
    q_rot, k_rot = apply_rope(q[:, :, 1:], k[:, :, 1:], cos, sin)
    q = jnp.concatenate([q[:, :, :1], q_rot], axis=2)
    k = jnp.concatenate([k[:, :, :1], k_rot], axis=2)
    return q, k


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
    """x' = exp(sum_k r_k L_k) @ x via real FFT along head_dim.

    TPU note: because L is real skew-symmetric, exp(mu) has Hermitian
    symmetry in frequency, so the whole rotation lives in the rfft
    half-spectrum — half the FFT work of the reference's complex path
    (circulant_string.py:276-295) and no complex64 cast of x. The angle
    theta = 2*Im(FFT(c)) at the rfft frequencies is computed directly from
    a real DFT matmul (D is tiny, this is one small MXU op).

    Args:
        x: [B, H, N, D] (patch tokens only — CLS excluded by the caller).
        positions: [N, coord_dim] real.
        coeffs: [H, coord_dim, D] real learnable circulant coefficients.
    Returns:
        [B, H, N, D] rotated, same dtype as x.
    """
    D = x.shape[-1]
    pos = jnp.asarray(positions, dtype=jnp.float32)
    # Im(FFT(c))_k = -sum_d c_d sin(2*pi*k*d/D), at rfft freqs k=0..D//2
    k = np.arange(D // 2 + 1, dtype=np.float32)
    d = np.arange(D, dtype=np.float32)
    sin_dft = jnp.asarray(-np.sin(2 * np.pi * k[:, None] * d[None, :] / D))
    im_fft = jnp.einsum("hcd,kd->hck", coeffs.astype(jnp.float32), sin_dft)
    # theta[h, n, k] = 2 * sum_c pos[n, c] * Im(FFT(c_h,c))_k
    theta = 2.0 * jnp.einsum("nc,hck->hnk", pos, im_fft)  # [H, N, D//2+1]
    rot = jax.lax.complex(jnp.cos(theta), jnp.sin(theta))
    x_freq = jnp.fft.rfft(x.astype(jnp.float32), axis=-1)
    x_rot = jnp.fft.irfft(rot[None] * x_freq, n=D, axis=-1)
    return x_rot.astype(x.dtype)


def apply_block_circulant_rotation(x, positions, coeffs):
    """Block-circulant STRING rotation: head_dim is split into independent
    circulant blocks, each with its own generator.

    The optimisation the STRING paper sweeps (block sizes {4..64}, optimal
    often ~16) and which the reference stubs as future work
    (circulant_string.py:377-398) — implemented here. Same parameter count
    as full-dimension circulant (num_blocks * block_size = head_dim) but
    smaller FFTs and block-localised mixing.

    Args:
        x: [B, H, N, D] patch tokens.
        positions: [N, coord_dim].
        coeffs: [H, coord_dim, num_blocks, block_size] with
            num_blocks * block_size == D.
    Returns:
        [B, H, N, D] rotated.
    """
    B, H, N, D = x.shape
    nb, bs = coeffs.shape[-2], coeffs.shape[-1]
    if nb * bs != D:
        raise ValueError(
            f"num_blocks*block_size = {nb}*{bs} != head_dim {D}"
        )
    pos = jnp.asarray(positions, dtype=jnp.float32)
    k = np.arange(bs // 2 + 1, dtype=np.float32)
    d = np.arange(bs, dtype=np.float32)
    sin_dft = jnp.asarray(-np.sin(2 * np.pi * k[:, None] * d[None, :] / bs))
    # Im(FFT(c_block))_k per (head, coord, block)
    im_fft = jnp.einsum("hcgd,kd->hcgk", coeffs.astype(jnp.float32), sin_dft)
    theta = 2.0 * jnp.einsum("nc,hcgk->hngk", pos, im_fft)  # [H,N,nb,k]
    rot = jax.lax.complex(jnp.cos(theta), jnp.sin(theta))
    xb = x.astype(jnp.float32).reshape(B, H, N, nb, bs)
    x_freq = jnp.fft.rfft(xb, axis=-1)
    x_rot = jnp.fft.irfft(rot[None] * x_freq, n=bs, axis=-1)
    return x_rot.reshape(B, H, N, D).astype(x.dtype)


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
