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

import os

import jax
import numpy as np
import jax.numpy as jnp

# Dispatch gate for the single-pass Pallas rotation kernel
# (ops/pallas/rotation_kernels.py). Tri-state:
#   "auto" (default) — use the kernel only when the rotation's CONSUMER
#       is itself a Pallas custom call (the flash softmax kernel): there
#       the kernel chains layout-compatibly into the custom call and wins
#       (+4% full ViT-B N=4097 train step), while the XLA DFT-matmul
#       chain pays relayout/epilogue copies at the custom-call boundary.
#       When the consumer is XLA (the performer phi projections), the
#       fused XLA chain wins instead — isolated, the chain runs
#       0.28 ms/rotation vs the kernel's 0.54 at [4,12,4097,64] bf16
#       (chained in-jit protocol; the ~1.5 ms tunnel dispatch floor makes
#       single-call timings meaningless) — so "auto" keeps it there.
#       Model-level A/Bs: results/rotation_kernel_ab_r5c.json.
#   True / "1"  — force the kernel everywhere (A/B arms, ERV_PALLAS_ROTATION=1).
#   False / "0" — force the XLA chain everywhere.
_ROT_ENV = os.environ.get("ERV_PALLAS_ROTATION", "auto")
USE_PALLAS_ROTATION = (
    True if _ROT_ENV in ("1", "true", "True")
    else False if _ROT_ENV in ("0", "false", "False")
    else "auto"
)


def rotation_kernel_enabled(prefer_kernel: bool) -> bool:
    """Resolve the tri-state gate for one rotation site.

    prefer_kernel: True when the rotation output feeds a Pallas custom
    call (flash softmax) rather than XLA ops — the measured win condition
    for the kernel under "auto"."""
    mode = USE_PALLAS_ROTATION
    if mode is True:
        return True
    if mode is False:
        return False
    return bool(prefer_kernel)


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


def _rope_full_tables(cos, sin, N: int):
    """Expand half-width tables to full-width single-pass form: (cos_full,
    sin_full) each [N, D], every table lane repeated twice. With them the
    interleaved rotation is  r = x * cos_full + (x @ J) * sin_full  where
    J is the constant rotate-90° pairing matrix (see `_rope_pair_matrix`)."""
    rep = np.repeat if isinstance(cos, np.ndarray) else (
        lambda a, r, axis: jnp.repeat(a, r, axis=axis))
    return rep(cos[:N], 2, axis=-1), rep(sin[:N], 2, axis=-1)


def _rope_pair_matrix(D: int) -> np.ndarray:
    """Constant [D, D] pairing matrix J with (x @ J)[2i] = -x[2i+1] and
    (x @ J)[2i+1] = x[2i] — the 90°-rotated partner each interleaved RoPE
    lane pairs with its sin term.

    Why a MATMUL: the natural pairswap formulations (strided even/odd
    slices + stack, or reshape[..., D//2, 2] + reverse) all change the
    TPU's minor-most (lane) layout, which XLA lowers as full relayout
    copies — measured ~27x HBM speed-of-light at ViT-B N=4097 (~40 ms of a
    267 ms step). As a matmul the pairing is one MXU pass (2*B*H*N*D^2
    FLOPs ≈ 26 GFLOP at that shape, ~0.1 ms) whose elementwise epilogue
    fuses, and its entries are ±1 so it is exact in any dtype."""
    J = np.zeros((D, D), np.float32)
    idx = np.arange(0, D, 2)
    J[idx + 1, idx] = -1.0
    J[idx, idx + 1] = 1.0
    return J


def apply_rope(q, k, cos, sin):
    """Rotate interleaved even/odd lane pairs of q and k.

    [x_even, x_odd] -> [x_even*cos - x_odd*sin, x_even*sin + x_odd*cos]
    (reference: rope.py:109-137), computed as x*cos_full + (x@J)*sin_full
    — one MXU pairing pass + one fused elementwise pass (see
    `_rope_pair_matrix` for why not a lane shuffle).

    Math runs in float32 and the result is cast BACK to the input dtype:
    under bf16 compute the old upcast-and-keep-fp32 behaviour silently ran
    every downstream matmul (flash QK^T, the phi feature projections) at
    half MXU rate — the round-4 long-N rope regression.

    Args:
        q, k: [B, H, N, D].
        cos, sin: [N', D//2] with N' >= N (sliced to N).
    Returns:
        (q_rot, k_rot) same shapes AND dtypes as inputs.
    """
    N, D = q.shape[2], q.shape[3]
    cos_full, sin_full = _rope_full_tables(cos, sin, N)
    cos_full = jnp.asarray(cos_full, jnp.float32)[None, None]
    sin_full = jnp.asarray(sin_full, jnp.float32)[None, None]
    J = jnp.asarray(_rope_pair_matrix(D))

    def rot(x):
        # x @ J is exact (one ±1 term per output lane) even at bf16, so
        # the pairing matmul runs at the input dtype / full MXU rate
        paired = jnp.dot(x, J.astype(x.dtype),
                         preferred_element_type=jnp.float32)
        return (x.astype(jnp.float32) * cos_full
                + paired * sin_full).astype(x.dtype)

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

    Implemented by prepending an identity row (cos=1, sin=0) to the patch
    tables and rotating ALL N tokens in one pass — x*1 + pairswap(x)*0 is
    exactly x, so CLS is bit-identical to the slice-and-concat form without
    paying two full-tensor concat copies per q/k.

    Args:
        q, k: [B, H, N, D] with CLS at index 0.
        cos, sin: [N-1, D//2] patch-token tables from rope_2d_tables.
    """
    if q.shape[2] <= 1:
        return q, k
    n_patch = q.shape[2] - 1
    cos = np.asarray(cos)[:n_patch]
    sin = np.asarray(sin)[:n_patch]
    cos_all = np.concatenate([np.ones((1, cos.shape[1]), cos.dtype), cos])
    sin_all = np.concatenate([np.zeros((1, sin.shape[1]), sin.dtype), sin])
    return apply_rope(q, k, cos_all, sin_all)


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


def _circulant_theta(positions, coeffs, block: int):
    """Rotation angles theta[h, n, k] = 2 * sum_c pos[n,c] * Im(FFT(c_h,c))_k
    at the rfft frequencies k = 0..block//2 of a length-`block` circulant.

    Im(FFT(c))_k = -sum_d c_d sin(2*pi*k*d/block) — a tiny real DFT matmul.
    """
    pos = jnp.asarray(positions, dtype=jnp.float32)
    k = np.arange(block // 2 + 1, dtype=np.float32)
    d = np.arange(block, dtype=np.float32)
    sin_dft = jnp.asarray(
        -np.sin(2 * np.pi * k[:, None] * d[None, :] / block)
    )
    im_fft = jnp.einsum("...d,kd->...k", coeffs.astype(jnp.float32), sin_dft)
    # coeffs [H, C, ..., D] -> im_fft [H, C, ..., K]; contract the coord dim
    return 2.0 * jnp.einsum("nc,hc...k->hn...k", pos, im_fft)


def _rdft_matrices(D: int):
    """Real-arithmetic rfft/irfft as DFT matmuls (static fp32 constants).

    jnp.fft at size 64 lowers to a generic TPU FFT that runs far below HBM
    speed-of-light; as matmuls the transform is a [*, D] @ [D, D//2+1]
    contraction the MXU eats for free. Forward: x_re = x @ C_f,
    x_im = -(x @ S_f). Inverse: y = y_re @ C_b - y_im @ S_b (the weight
    w_k in C_b/S_b folds the Hermitian-half doubling and the 1/D scale).
    """
    k = np.arange(D // 2 + 1, dtype=np.float32)
    d = np.arange(D, dtype=np.float32)
    ang = 2 * np.pi * k[:, None] * d[None, :] / D  # [K, D]
    w = np.full(D // 2 + 1, 2.0, np.float32)
    w[0] = 1.0
    if D % 2 == 0:
        w[-1] = 1.0
    C_f = jnp.asarray(np.cos(ang).T)           # [D, K]
    S_f = jnp.asarray(np.sin(ang).T)           # [D, K]
    C_b = jnp.asarray(np.cos(ang) * w[:, None] / D)  # [K, D]
    S_b = jnp.asarray(np.sin(ang) * w[:, None] / D)  # [K, D]
    return C_f, S_f, C_b, S_b


# XLA-chain intermediates ride the INPUT dtype (a no-op under fp32
# compute; under bf16 it halves the HBM bytes of the tile-padded [*, K]
# spectrum arrays). Rule-7 chained micro at [4,12,4097,64] bf16:
# 0.265 -> 0.173 ms/rotation fwd, 0.518 -> 0.361 fwd+bwd; the bf16
# rounding of the intermediates is ~1% relative — the model's own
# compute precision. False restores the old fp32 intermediates (A/B arm).
CHAIN_INPUT_DTYPE = True


def _dft_chain(x, ct, st, C_f, S_f, C_b, S_b):
    """spectrum -> rotate -> inverse as matmuls; intermediates at the
    input dtype when CHAIN_INPUT_DTYPE (fp32 accumulation either way)."""
    if not CHAIN_INPUT_DTYPE:
        x32 = x.astype(jnp.float32)
        x_re = x32 @ C_f
        x_im = -(x32 @ S_f)
        y_re = ct * x_re - st * x_im
        y_im = st * x_re + ct * x_im
        return (y_re @ C_b - y_im @ S_b).astype(x.dtype)
    dt = x.dtype
    x_re = jnp.dot(x, C_f.astype(dt),
                   preferred_element_type=jnp.float32).astype(dt)
    x_im = (-jnp.dot(x, S_f.astype(dt),
                     preferred_element_type=jnp.float32)).astype(dt)
    y_re = (ct * x_re - st * x_im).astype(dt)
    y_im = (st * x_re + ct * x_im).astype(dt)
    return (jnp.dot(y_re, C_b.astype(dt), preferred_element_type=jnp.float32)
            - jnp.dot(y_im, S_b.astype(dt),
                      preferred_element_type=jnp.float32)).astype(dt)


def apply_circulant_rotation(x, positions, coeffs):
    """x' = exp(sum_k r_k L_k) @ x via the real half-spectrum along head_dim.

    TPU note: because L is real skew-symmetric, exp(mu) has Hermitian
    symmetry in frequency, so the whole rotation lives in the rfft
    half-spectrum — half the work of the reference's complex path
    (circulant_string.py:276-295) and no complex64 cast of x. Both the
    transform and the angle table are real DFT *matmuls* (D is tiny; MXU
    ops), not jnp.fft calls — the generic TPU FFT at size 64 was the
    dominant cost of the round-4 long-N circulant regression.

    Args:
        x: [B, H, N, D] (patch tokens only — CLS excluded by the caller).
        positions: [N, coord_dim] real.
        coeffs: [H, coord_dim, D] real learnable circulant coefficients.
    Returns:
        [B, H, N, D] rotated, same dtype as x.
    """
    D = x.shape[-1]
    theta = _circulant_theta(positions, coeffs, D)  # [H, N, K]
    ct, st = jnp.cos(theta), jnp.sin(theta)

    # A single-pass Pallas kernel for this chain exists
    # (ops/pallas/rotation_kernels.py); a direct call carries no
    # consumer information, so under "auto" it stays on the XLA chain —
    # see the USE_PALLAS_ROTATION note above for the measured policy. The
    # angle tables stay in XLA either way so the coeffs autodiff chain is
    # XLA's.
    from .pallas import pallas_available

    if (rotation_kernel_enabled(False) and pallas_available()
            and isinstance(x.shape[0], int)):
        from .pallas.rotation_kernels import circulant_rotate

        return circulant_rotate(x, ct, st)

    ct, st = ct[None], st[None]
    C_f, S_f, C_b, S_b = _rdft_matrices(D)
    return _dft_chain(x, ct, st, C_f, S_f, C_b, S_b)


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
    theta = _circulant_theta(positions, coeffs, bs)  # [H, N, nb, K]
    ct, st = jnp.cos(theta)[None], jnp.sin(theta)[None]
    C_f, S_f, C_b, S_b = _rdft_matrices(bs)
    xb = x.reshape(B, H, N, nb, bs)
    return _dft_chain(xb, ct, st, C_f, S_f, C_b, S_b).reshape(B, H, N, D)


def _rotate_keep_cls(rotate_fn, x, positions, coeffs):
    """Rotate ALL N tokens with a zero position row prepended for CLS, then
    select the original CLS row back in. The zero position makes row 0's
    rotation the identity mathematically; the select makes it bit-exact
    (the fp32 DFT roundtrip is ~1e-7, the reference demands untouched CLS,
    circulant_string.py:321-341). Both the pad and the select fuse into
    the rotation's elementwise epilogue — no full-tensor slice+concat
    copies, which cost two extra HBM passes per q/k at long N."""
    pos = np.asarray(positions, dtype=np.float32)
    pos_all = np.concatenate([np.zeros((1, pos.shape[1]), np.float32), pos])
    x_rot = rotate_fn(x, pos_all, coeffs)
    is_cls = (jnp.arange(x.shape[2]) == 0)[None, None, :, None]
    return jnp.where(is_cls, x, x_rot)


def apply_circulant_string(q, k, positions, coeffs, prefer_kernel=False):
    """Rotate patch tokens of q and k; CLS (index 0) passes through unchanged
    (reference: circulant_string.py:297-341).

    prefer_kernel: set True by callers whose CONSUMER of the rotated q/k
    is a Pallas custom call (flash softmax) — the condition under which
    the rotation kernel wins at the model level (USE_PALLAS_ROTATION
    note). On the Pallas path the angle tables are computed ONCE and
    shared by q and k, and the CLS passthrough happens in-kernel
    (`keep_cls`) instead of a caller-side jnp.where pass over each full
    tensor."""
    if q.shape[2] <= 1:
        return q, k
    from .pallas import pallas_available

    if (rotation_kernel_enabled(prefer_kernel) and pallas_available()
            and isinstance(q.shape[0], int)):
        from .pallas.rotation_kernels import BLOCK_N, circulant_rotate

        pos = np.asarray(positions, dtype=np.float32)
        pos_all = np.concatenate(
            [np.zeros((1, pos.shape[1]), np.float32), pos])
        theta = _circulant_theta(pos_all, coeffs, q.shape[-1])
        ct, st = jnp.cos(theta), jnp.sin(theta)
        return (circulant_rotate(q, ct, st, BLOCK_N, False, True),
                circulant_rotate(k, ct, st, BLOCK_N, False, True))
    q_rot = _rotate_keep_cls(apply_circulant_rotation, q, positions, coeffs)
    k_rot = _rotate_keep_cls(apply_circulant_rotation, k, positions, coeffs)
    return q_rot, k_rot
