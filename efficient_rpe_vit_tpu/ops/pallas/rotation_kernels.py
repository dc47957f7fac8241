"""Single-pass Circulant-STRING rotation kernel (Pallas TPU).

STATUS: built, parity-tested, and measured SLOWER than the XLA DFT-matmul
chain at the model level — 0.86-0.97x on the three circulant variants at
ViT-B N=4097 (same-process A/B, results/rotation_kernel_ab_r5.json). The
K = D/2+1 = 33 half-spectrum pads to 128 lanes (3.9x wasted MXU columns
per DFT pass) and the [block_n, 128] tiles are too small to hide
grid-step overhead at D=64, while XLA fuses the chain's elementwise
epilogues well since the round-5 rotation rework. Dispatch therefore
defaults to the XLA chain (ops/rotations.py::USE_PALLAS_ROTATION); the
kernel stays as the real-DFT-in-Pallas pattern for head dims that fill
the lanes (K >= 128, i.e. D >= 254). It runs the whole chain in-register
per [block_n, 128] tile:

    x_re = x C_f ; x_im = -(x S_f)
    y_re = ct*x_re - st*x_im ; y_im = st*x_re + ct*x_im
    y    = y_re C_b - y_im S_b

with the DFT matrices as tiny padded [128, 128] constants and the angle
tables ct/st = cos/sin(theta[h, n, k]) STAYING IN XLA — theta is a
function of the learnable coefficients, so keeping it outside the kernel
lets autodiff own the coeffs chain while the kernel's custom VJP returns
(dx, dct, dst). The rotation is orthogonal: dx is the SAME kernel with
the angle sign flipped, plus the spectral products for dct/dst
accumulated over batch (grid (H, tile, B) with B innermost, so the angle
blocks stay VMEM-resident across the batch sweep).

Reference math: circulant_string.py:276-295 (the complex-FFT original).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAVE_PLTPU = False

from .attention_kernels import LANES, _pad_axis, _round_up

BLOCK_N = 512


def _dft_mats_padded(D: int):
    """rfft/irfft as padded [Dp, Kp] / [Kp, Dp] fp32 matmul constants.

    Padded D rows and K columns are zero: padded freq lanes produce zero
    spectrum, and zero C_b/S_b rows add nothing on the way back, so the
    padded geometry computes exactly the unpadded transform."""
    K = D // 2 + 1
    Dp = _round_up(D, LANES)
    Kp = _round_up(K, LANES)
    k = np.arange(K, dtype=np.float32)
    d = np.arange(D, dtype=np.float32)
    ang = 2 * np.pi * k[:, None] * d[None, :] / D  # [K, D]
    w = np.full(K, 2.0, np.float32)
    w[0] = 1.0
    if D % 2 == 0:
        w[-1] = 1.0
    C_f = np.zeros((Dp, Kp), np.float32)
    S_f = np.zeros((Dp, Kp), np.float32)
    C_b = np.zeros((Kp, Dp), np.float32)
    S_b = np.zeros((Kp, Dp), np.float32)
    C_f[:D, :K] = np.cos(ang).T
    S_f[:D, :K] = np.sin(ang).T
    C_b[:K, :D] = np.cos(ang) * w[:, None] / D
    S_b[:K, :D] = np.sin(ang) * w[:, None] / D
    return (jnp.asarray(C_f), jnp.asarray(S_f),
            jnp.asarray(C_b), jnp.asarray(S_b))


def _spectrum(x, C_f, S_f):
    dt = x.dtype
    x_re = jnp.dot(x, C_f.astype(dt), preferred_element_type=jnp.float32)
    x_im = -jnp.dot(x, S_f.astype(dt), preferred_element_type=jnp.float32)
    return x_re, x_im


def _rot_kernel(x_ref, ct_ref, st_ref, cf_ref, sf_ref, cb_ref, sb_ref,
                o_ref):
    x = x_ref[0, 0]                      # [bn, Dp]
    ct = ct_ref[0]                       # [bn, Kp]
    st = st_ref[0]
    x_re, x_im = _spectrum(x, cf_ref[...], sf_ref[...])
    y_re = ct * x_re - st * x_im
    y_im = st * x_re + ct * x_im
    dt = x.dtype
    y = (jnp.dot(y_re.astype(dt), cb_ref[...].astype(dt),
                 preferred_element_type=jnp.float32)
         - jnp.dot(y_im.astype(dt), sb_ref[...].astype(dt),
                   preferred_element_type=jnp.float32))
    o_ref[0, 0] = y.astype(o_ref.dtype)


def _bwd_kernel(g_ref, x_ref, ct_ref, st_ref, cf_ref, sf_ref, cbt_ref,
                sbt_ref, cft_ref, sft_ref, dx_ref, dct_ref, dst_ref,
                dct_acc, dst_acc, *, n_batch: int):
    b = pl.program_id(2)

    @pl.when(b == 0)
    def _init():
        dct_acc[...] = jnp.zeros_like(dct_acc)
        dst_acc[...] = jnp.zeros_like(dst_acc)

    g = g_ref[0, 0]                      # [bn, Dp] cotangent
    x = x_ref[0, 0]
    ct = ct_ref[0]
    st = st_ref[0]
    dt = g.dtype
    # dy_re = g C_b^T ; dy_im = -(g S_b^T)
    dy_re = jnp.dot(g, cbt_ref[...].astype(dt),
                    preferred_element_type=jnp.float32)
    dy_im = -jnp.dot(g, sbt_ref[...].astype(dt),
                     preferred_element_type=jnp.float32)
    # through the rotation: dx_re = ct*dy_re + st*dy_im ; etc.
    dx_re = ct * dy_re + st * dy_im
    dx_im = -st * dy_re + ct * dy_im
    dx = (jnp.dot(dx_re.astype(dt), cft_ref[...].astype(dt),
                  preferred_element_type=jnp.float32)
          - jnp.dot(dx_im.astype(dt), sft_ref[...].astype(dt),
                    preferred_element_type=jnp.float32))
    dx_ref[0, 0] = dx.astype(dx_ref.dtype)

    # angle grads need the forward spectrum (recomputed in-register)
    x_re, x_im = _spectrum(x, cf_ref[...], sf_ref[...])
    dct_acc[...] += dy_re * x_re + dy_im * x_im
    dst_acc[...] += dy_im * x_re - dy_re * x_im

    @pl.when(b == n_batch - 1)
    def _store():
        dct_ref[0] = dct_acc[...]
        dst_ref[0] = dst_acc[...]


def _pad_all(x, ct, st, block_n):
    B, H, N, D = x.shape
    Np = _round_up(N, block_n)
    Dp = _round_up(D, LANES)
    Kp = _round_up(D // 2 + 1, LANES)
    xp = _pad_axis(_pad_axis(x, 2, Np), 3, Dp)
    ctp = _pad_axis(_pad_axis(ct, 1, Np), 2, Kp)
    stp = _pad_axis(_pad_axis(st, 1, Np), 2, Kp)
    return xp, ctp, stp, Np, Dp, Kp


def _rot_fwd_impl(x, ct, st, *, block_n, interpret):
    B, H, N, D = x.shape
    block_n = min(block_n, _round_up(N, 8 if not interpret else 1))
    block_n = _round_up(block_n, 8)
    xp, ctp, stp, Np, Dp, Kp = _pad_all(x, ct, st, block_n)
    C_f, S_f, C_b, S_b = _dft_mats_padded(D)
    n_t = Np // block_n
    out = pl.pallas_call(
        _rot_kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, Np, Dp), x.dtype),
        # (h, tile, b): the ct/st blocks depend only on (h, tile), so they
        # stay VMEM-resident across the innermost batch sweep
        grid=(H, n_t, B),
        in_specs=[
            pl.BlockSpec((1, 1, block_n, Dp), lambda h, i, b: (b, h, i, 0)),
            pl.BlockSpec((1, block_n, Kp), lambda h, i, b: (h, i, 0)),
            pl.BlockSpec((1, block_n, Kp), lambda h, i, b: (h, i, 0)),
            pl.BlockSpec((Dp, Kp), lambda h, i, b: (0, 0)),
            pl.BlockSpec((Dp, Kp), lambda h, i, b: (0, 0)),
            pl.BlockSpec((Kp, Dp), lambda h, i, b: (0, 0)),
            pl.BlockSpec((Kp, Dp), lambda h, i, b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_n, Dp),
                               lambda h, i, b: (b, h, i, 0)),
        compiler_params=(
            pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"))
            if _HAVE_PLTPU and not interpret else None
        ),
        interpret=interpret,
    )(xp, ctp, stp, C_f, S_f, C_b, S_b)
    return out[:, :, :N, :D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def circulant_rotate(x, ct, st, block_n: int = BLOCK_N,
                     interpret: bool = False):
    """Apply the per-(head, position) half-spectrum rotation to x.

    Args:
        x: [B, H, N, D].
        ct, st: [H, N, K] cos/sin of the rotation angles at the rfft
            frequencies (K = D//2 + 1), fp32 — computed in XLA from the
            learnable circulant coefficients so their autodiff chain
            stays outside the kernel.
    Returns:
        [B, H, N, D] rotated, same dtype as x.
    """
    return _rot_fwd_impl(x, ct, st, block_n=block_n, interpret=interpret)


def _cr_fwd(x, ct, st, block_n, interpret):
    out = _rot_fwd_impl(x, ct, st, block_n=block_n, interpret=interpret)
    return out, (x, ct, st)


def _cr_bwd(block_n, interpret, residuals, g):
    x, ct, st = residuals
    B, H, N, D = x.shape
    block_n_eff = min(block_n, _round_up(N, 8 if not interpret else 1))
    block_n_eff = _round_up(block_n_eff, 8)
    xp, ctp, stp, Np, Dp, Kp = _pad_all(x, ct, st, block_n_eff)
    gp = _pad_axis(_pad_axis(g, 2, Np), 3, Dp)
    C_f, S_f, C_b, S_b = _dft_mats_padded(D)
    n_t = Np // block_n_eff
    scr = (lambda *a: pltpu.VMEM(*a)) if _HAVE_PLTPU else None
    dx, dct, dst = pl.pallas_call(
        functools.partial(_bwd_kernel, n_batch=B),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Np, Dp), x.dtype),
            jax.ShapeDtypeStruct((H, Np, Kp), jnp.float32),
            jax.ShapeDtypeStruct((H, Np, Kp), jnp.float32),
        ),
        grid=(H, n_t, B),
        in_specs=[
            pl.BlockSpec((1, 1, block_n_eff, Dp), lambda h, i, b: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_n_eff, Dp), lambda h, i, b: (b, h, i, 0)),
            pl.BlockSpec((1, block_n_eff, Kp), lambda h, i, b: (h, i, 0)),
            pl.BlockSpec((1, block_n_eff, Kp), lambda h, i, b: (h, i, 0)),
            pl.BlockSpec((Dp, Kp), lambda h, i, b: (0, 0)),
            pl.BlockSpec((Dp, Kp), lambda h, i, b: (0, 0)),
            pl.BlockSpec((Dp, Kp), lambda h, i, b: (0, 0)),  # C_b^T
            pl.BlockSpec((Dp, Kp), lambda h, i, b: (0, 0)),  # S_b^T
            pl.BlockSpec((Kp, Dp), lambda h, i, b: (0, 0)),  # C_f^T
            pl.BlockSpec((Kp, Dp), lambda h, i, b: (0, 0)),  # S_f^T
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_n_eff, Dp),
                         lambda h, i, b: (b, h, i, 0)),
            pl.BlockSpec((1, block_n_eff, Kp), lambda h, i, b: (h, i, 0)),
            pl.BlockSpec((1, block_n_eff, Kp), lambda h, i, b: (h, i, 0)),
        ),
        scratch_shapes=[
            scr((block_n_eff, Kp), jnp.float32),
            scr((block_n_eff, Kp), jnp.float32),
        ] if scr else [],
        compiler_params=(
            pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"))
            if _HAVE_PLTPU and not interpret else None
        ),
        interpret=interpret,
    )(gp, xp, ctp, stp, C_f, S_f, C_b.T, S_b.T, C_f.T, S_f.T)
    return (dx[:, :, :N, :D],
            dct[:, :N, :ct.shape[-1]],
            dst[:, :N, :st.shape[-1]])


circulant_rotate.defvjp(_cr_fwd, _cr_bwd)
