"""Single-pass Circulant-STRING rotation kernel (Pallas TPU), native-lane.

The rotation x' = IFFT(exp(i*theta[h,n]) * FFT(x)) along head_dim is pure
memory traffic at ViT dims: ~4 GFLOP of DFT matmuls against ~50 MB of
tensor I/O per call at ViT-B N=4097.  The XLA DFT-matmul chain
(ops/rotations.py) materialises the x_re/x_im/y_re/y_im half-spectrum
intermediates in HBM, where the minor-dim-33 arrays are tile-padded to
128 lanes — ~4x the useful bytes per intermediate, measured ~39 ms of a
ViT-B N=4097 circulant train step.

The first cut of this kernel (round 5) beat none of that: it pre-padded
N to the block size and D/K to 128 lanes in XLA, so the pad/slice copies
plus the 2x (D) / 3.9x (K) lane blowup put MORE bytes on the wire than
the chain it replaced (0.86-0.97x at the model level,
results/rotation_kernel_ab_r5.json with the "padded" variant).  This
rewrite keeps every HBM array at its NATIVE width:

  * x blocks ride [block_n, D] — contiguous DMA, no relayout, no padding;
  * the angle tables ct/st ride [block_n, D] fp32, padded once from
    K = D//2+1 at trace time (tiny: [H, N, K] -> [H, N, D]);
  * the grid is ragged over N (Pallas masks the tail block), so no
    XLA-side pad of x to a block multiple and no slice on the way out;
  * the whole spectrum -> rotate -> inverse chain runs in-register per
    tile with the padded-[D, D] DFT matrices as fp32 constants
    (zero columns beyond K compute exactly the half-spectrum transform);
  * the CLS passthrough (reference: circulant_string.py:321-341) is an
    in-kernel select on global row 0 (`keep_cls`), replacing the caller's
    extra elementwise pass over the full tensor.

So the kernel moves only the bytes the math needs — read x + ct/st,
write y — and the forward/backward pair is HBM-speed-of-light bounded.

Angle tables STAY IN XLA: theta is a function of the learnable circulant
coefficients, so keeping cos/sin(theta) outside the kernel lets autodiff
own the coeffs chain while the custom VJP returns (dx, dct, dst).  The
rotation is orthogonal: dx is the same kernel with the angle sign
flipped, plus the spectral products for dct/dst accumulated over batch
(grid (H, tile, B) with B innermost keeps the angle blocks VMEM-resident
across the batch sweep).

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

BLOCK_N = 512


def _dft_mats_native(D: int):
    """rfft/irfft as [D, D] fp32 matmul constants at native lane width.

    Columns k >= K = D//2+1 are zero: they produce zero spectrum on the
    way in and the corresponding C_b/S_b rows add nothing on the way
    back, so the square geometry computes exactly the half-spectrum
    transform — no 128-lane padding of the K axis anywhere in HBM."""
    K = D // 2 + 1
    k = np.arange(K, dtype=np.float32)
    d = np.arange(D, dtype=np.float32)
    ang = 2 * np.pi * k[:, None] * d[None, :] / D  # [K, D]
    w = np.full(K, 2.0, np.float32)
    w[0] = 1.0
    if D % 2 == 0:
        w[-1] = 1.0
    C_f = np.zeros((D, D), np.float32)
    S_f = np.zeros((D, D), np.float32)
    C_b = np.zeros((D, D), np.float32)
    S_b = np.zeros((D, D), np.float32)
    C_f[:, :K] = np.cos(ang).T
    S_f[:, :K] = np.sin(ang).T
    C_b[:K] = np.cos(ang) * w[:, None] / D
    S_b[:K] = np.sin(ang) * w[:, None] / D
    return (jnp.asarray(C_f), jnp.asarray(S_f),
            jnp.asarray(C_b), jnp.asarray(S_b))


def _spectrum(x32, cf_ref, sf_ref):
    x_re = jnp.dot(x32, cf_ref[...], preferred_element_type=jnp.float32)
    x_im = -jnp.dot(x32, sf_ref[...], preferred_element_type=jnp.float32)
    return x_re, x_im


def _is_cls_row(block_n: int, rows: int):
    """[rows, 1] bool: is this row the global CLS row (index 0)?  Kept at
    lane width 1 so the iota+compare cost is ~D× smaller than a
    full-width predicate; broadcasting happens inside the consumer's
    select/multiply."""
    i = pl.program_id(1)
    row = i * block_n + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    return row == 0


def _rot_kernel(x_ref, ct_ref, st_ref, cf_ref, sf_ref, cb_ref, sb_ref,
                o_ref, *, block_n: int, keep_cls: bool):
    x = x_ref[0, 0]                      # [bn, D] input dtype
    ct = ct_ref[0]                       # [bn, D] fp32
    st = st_ref[0]
    x32 = x.astype(jnp.float32)
    x_re, x_im = _spectrum(x32, cf_ref, sf_ref)
    y_re = ct * x_re - st * x_im
    y_im = st * x_re + ct * x_im
    y = (jnp.dot(y_re, cb_ref[...], preferred_element_type=jnp.float32)
         - jnp.dot(y_im, sb_ref[...], preferred_element_type=jnp.float32))
    if keep_cls:
        # CLS (global row 0) passes through bit-exactly — the reference
        # demands an untouched CLS token (circulant_string.py:321-341).
        # The row predicate is a [bn, 1] column iota broadcast into the
        # select (a full-width [bn, D] int32 iota + compare measured
        # ~0.14 ms/rotation at ViT-B N=4097 — ~35% of the kernel).
        y = jnp.where(_is_cls_row(block_n, y.shape[0]), x32, y)
    o_ref[0, 0] = y.astype(o_ref.dtype)


def _bwd_kernel(g_ref, x_ref, ct_ref, st_ref, cf_ref, sf_ref, cbt_ref,
                sbt_ref, cft_ref, sft_ref, dx_ref, dct_ref, dst_ref,
                dct_acc, dst_acc, *, block_n: int, keep_cls: bool,
                n_batch: int):
    b = pl.program_id(2)

    @pl.when(b == 0)
    def _init():
        dct_acc[...] = jnp.zeros_like(dct_acc)
        dst_acc[...] = jnp.zeros_like(dst_acc)

    g = g_ref[0, 0]                      # [bn, D] cotangent
    x = x_ref[0, 0]
    ct = ct_ref[0]
    st = st_ref[0]
    g32 = g.astype(jnp.float32)
    # dy_re = g C_b^T ; dy_im = -(g S_b^T)
    dy_re = jnp.dot(g32, cbt_ref[...], preferred_element_type=jnp.float32)
    dy_im = -jnp.dot(g32, sbt_ref[...], preferred_element_type=jnp.float32)
    if keep_cls:
        # forward ignored the rotation at global row 0, so no cotangent
        # flows through it: dx row 0 is g itself, angle grads get zero
        # ([bn, 1] column predicate — see the forward kernel note)
        not_cls = jnp.where(_is_cls_row(block_n, dy_re.shape[0]), 0.0, 1.0)
        dy_re = dy_re * not_cls
        dy_im = dy_im * not_cls
    # through the rotation: dx_re = ct*dy_re + st*dy_im ; etc.
    dx_re = ct * dy_re + st * dy_im
    dx_im = -st * dy_re + ct * dy_im
    dx = (jnp.dot(dx_re, cft_ref[...], preferred_element_type=jnp.float32)
          - jnp.dot(dx_im, sft_ref[...], preferred_element_type=jnp.float32))
    if keep_cls:
        dx = jnp.where(_is_cls_row(block_n, dx.shape[0]), g32, dx)
    dx_ref[0, 0] = dx.astype(dx_ref.dtype)

    # angle grads need the forward spectrum (recomputed in-register)
    x_re, x_im = _spectrum(x.astype(jnp.float32), cf_ref, sf_ref)
    dct_acc[...] += dy_re * x_re + dy_im * x_im
    dst_acc[...] += dy_im * x_re - dy_re * x_im

    @pl.when(b == n_batch - 1)
    def _store():
        dct_ref[0] = dct_acc[...]
        dst_ref[0] = dst_acc[...]


def _pad_tables(ct, st, D: int):
    """[H, N, K] -> [H, N, D] fp32 (zero pad): the only padding anywhere —
    the table is ~50x smaller than x, and the padded lanes meet the DFT
    constants' zero columns, so their values are never observed."""
    K = ct.shape[-1]
    if K == D:
        return ct.astype(jnp.float32), st.astype(jnp.float32)
    pad = [(0, 0), (0, 0), (0, D - K)]
    return (jnp.pad(ct.astype(jnp.float32), pad),
            jnp.pad(st.astype(jnp.float32), pad))


def _rot_fwd_impl(x, ct, st, *, block_n, interpret, keep_cls):
    B, H, N, D = x.shape
    block_n = min(_round_block(block_n), _round_block(N))
    ctp, stp = _pad_tables(ct, st, D)
    C_f, S_f, C_b, S_b = _dft_mats_native(D)
    n_t = pl.cdiv(N, block_n)
    kern = functools.partial(_rot_kernel, block_n=block_n,
                             keep_cls=keep_cls)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, H, N, D), x.dtype),
        # (h, tile, b): the ct/st blocks depend only on (h, tile), so they
        # stay VMEM-resident across the innermost batch sweep
        grid=(H, n_t, B),
        in_specs=[
            pl.BlockSpec((1, 1, block_n, D), lambda h, i, b: (b, h, i, 0)),
            pl.BlockSpec((1, block_n, D), lambda h, i, b: (h, i, 0)),
            pl.BlockSpec((1, block_n, D), lambda h, i, b: (h, i, 0)),
            pl.BlockSpec((D, D), lambda h, i, b: (0, 0)),
            pl.BlockSpec((D, D), lambda h, i, b: (0, 0)),
            pl.BlockSpec((D, D), lambda h, i, b: (0, 0)),
            pl.BlockSpec((D, D), lambda h, i, b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_n, D),
                               lambda h, i, b: (b, h, i, 0)),
        compiler_params=(
            pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"))
            if _HAVE_PLTPU and not interpret else None
        ),
        interpret=interpret,
    )(x, ctp, stp, C_f, S_f, C_b, S_b)


def _round_block(n: int) -> int:
    return max(8, (n + 7) // 8 * 8)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def circulant_rotate(x, ct, st, block_n: int = BLOCK_N,
                     interpret: bool = False, keep_cls: bool = False):
    """Apply the per-(head, position) half-spectrum rotation to x.

    Args:
        x: [B, H, N, D].
        ct, st: [H, N, K] cos/sin of the rotation angles at the rfft
            frequencies (K = D//2 + 1), fp32 — computed in XLA from the
            learnable circulant coefficients so their autodiff chain
            stays outside the kernel.
        keep_cls: pass token 0 through unrotated IN-KERNEL (bit-exact),
            replacing the caller-side jnp.where over the full tensor.
    Returns:
        [B, H, N, D] rotated, same dtype as x.
    """
    return _rot_fwd_impl(x, ct, st, block_n=block_n, interpret=interpret,
                         keep_cls=keep_cls)


def _cr_fwd(x, ct, st, block_n, interpret, keep_cls):
    out = _rot_fwd_impl(x, ct, st, block_n=block_n, interpret=interpret,
                        keep_cls=keep_cls)
    return out, (x, ct, st)


def _cr_bwd(block_n, interpret, keep_cls, residuals, g):
    x, ct, st = residuals
    B, H, N, D = x.shape
    K = ct.shape[-1]
    block_n = min(_round_block(block_n), _round_block(N))
    ctp, stp = _pad_tables(ct, st, D)
    C_f, S_f, C_b, S_b = _dft_mats_native(D)
    n_t = pl.cdiv(N, block_n)
    kern = functools.partial(_bwd_kernel, block_n=block_n,
                             keep_cls=keep_cls, n_batch=B)
    scr = (lambda *a: pltpu.VMEM(*a)) if _HAVE_PLTPU else None
    dx, dct, dst = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((B, H, N, D), x.dtype),
            jax.ShapeDtypeStruct((H, N, D), jnp.float32),
            jax.ShapeDtypeStruct((H, N, D), jnp.float32),
        ),
        grid=(H, n_t, B),
        in_specs=[
            pl.BlockSpec((1, 1, block_n, D), lambda h, i, b: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_n, D), lambda h, i, b: (b, h, i, 0)),
            pl.BlockSpec((1, block_n, D), lambda h, i, b: (h, i, 0)),
            pl.BlockSpec((1, block_n, D), lambda h, i, b: (h, i, 0)),
            pl.BlockSpec((D, D), lambda h, i, b: (0, 0)),
            pl.BlockSpec((D, D), lambda h, i, b: (0, 0)),
            pl.BlockSpec((D, D), lambda h, i, b: (0, 0)),  # C_b^T
            pl.BlockSpec((D, D), lambda h, i, b: (0, 0)),  # S_b^T
            pl.BlockSpec((D, D), lambda h, i, b: (0, 0)),  # C_f^T
            pl.BlockSpec((D, D), lambda h, i, b: (0, 0)),  # S_f^T
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_n, D),
                         lambda h, i, b: (b, h, i, 0)),
            pl.BlockSpec((1, block_n, D), lambda h, i, b: (h, i, 0)),
            pl.BlockSpec((1, block_n, D), lambda h, i, b: (h, i, 0)),
        ),
        scratch_shapes=[
            scr((block_n, D), jnp.float32),
            scr((block_n, D), jnp.float32),
        ] if scr else [],
        compiler_params=(
            pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"))
            if _HAVE_PLTPU and not interpret else None
        ),
        interpret=interpret,
    )(g, x, ctp, stp, C_f, S_f, C_b.T, S_b.T, C_f.T, S_f.T)
    return dx, dct[..., :K], dst[..., :K]


circulant_rotate.defvjp(_cr_fwd, _cr_bwd)
