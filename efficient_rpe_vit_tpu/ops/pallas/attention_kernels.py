"""Fused attention kernels (Pallas TPU).

Two kernels share one tiling skeleton — grid (B, H, Q-tiles, KV-tiles) with
fp32 VMEM accumulators persisting across the KV (reduction) dimension:

  * `flash_softmax_attention` — flash-style softmax attention: online
    softmax (running max m / normaliser l / output acc), the [N, N] scores
    matrix never leaves VMEM. Replaces the reference's materialised
    `(q@k^T).softmax() @ v` (softmax.py:100-115).
  * `fused_masked_linear_attention` — KERPLE's Toeplitz-masked kernelised
    attention: w = (phi(q) phi(k)^T) * T accumulated straight into the
    output and row-normaliser, so neither the [B,H,N,N] weight matrix nor
    the reference's [B,H,N,F,D] outer-product tensor (kerple.py:252-256)
    ever touches HBM. No online max needed — the weights are products of
    positives, not exponentials.

Numerics: all accumulation fp32 (`preferred_element_type`); padded KV
columns are masked with -0.7*float_max in the softmax kernel and contribute
exact zeros in the masked-linear kernel (zero-padded phi(k) rows).

Backward passes: the masked-linear kernel uses jax.custom_vjp with
explicit-formula VJPs from saved (den, out) residuals — in XLA
("jnp_residual", measured fastest at short N) or via the fully-fused
Pallas kernels in masked_linear_bwd.py ("pallas");
`MASKED_LINEAR_BWD_MODE = "auto"` switches between them on the KERPLE
byte budget. flash_softmax_attention saves (out, lse) residuals and runs
the tiled dq/dkv-split Pallas backward in flash_bwd.py
(`FLASH_BWD_MODE = "pallas"`) — no [B,H,N,N] tensor in either direction.
Gradients match the direct jnp derivatives bit-close in tests.

Both launchers pad each sequence axis independently to its block size and
(F, D) up to lane multiples, then slice the result; tests run the kernels
in interpret mode on CPU. Dispatch (see ops/attention_core.py): XLA's
fused dense paths win at short N, so `auto` selects these kernels only
past the measured model-level crossovers or the HBM byte budgets, with
block sizes from the tuned `flash_default_blocks` /
`masked_linear_default_blocks` policies (docs/BENCHMARKING.md round-3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu import fails on some non-TPU builds
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAVE_PLTPU = False

LANES = 128
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
EPS = 1e-6


def pallas_available() -> bool:
    return _HAVE_PLTPU and jax.default_backend() == "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def flash_default_blocks(n: int) -> tuple:
    """(block_q, block_kv) policy for the flash kernels.

    The original fixed (128, 128) grid makes each cell a tiny matmul whose
    grid-step overhead dominates at long N (measured ~4% MFU on the whole
    N=4097 ViT-B step); larger KV blocks amortise the accumulator updates
    and larger Q blocks amortise K/V reloads. Tuned with
    experiments/flash_tune.py (see docs/BENCHMARKING.md for the sweep).
    Clamped to the (padded) sequence so short sequences don't pad up to a
    giant block."""
    np128 = _round_up(max(n, 1), LANES)
    return min(512, np128), min(1024, np128)


def masked_linear_default_blocks(n: int) -> tuple:
    """(block_q, block_kv) policy for the masked-linear kernels.

    Measured at B=4 H=12 N=4097 F=266 D=64 bf16 (chained, value-fetch):
    (128,128) 33.5 ms fwd / 137 ms fwd+bwd -> (512,512) 13.3 / 51.3 ms
    (72 TFLOP/s fwd). Unlike flash, (512,1024) regresses slightly here —
    the F=266->384-padded q/k tiles make the KV block heavier."""
    np128 = _round_up(max(n, 1), LANES)
    return min(512, np128), min(512, np128)


def _pad_axis(x, axis: int, target: int):
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# ════════════════════════════════════════════════════════════════════════
# Counter-based dropout hash (attention-probability dropout in-kernel)
# ════════════════════════════════════════════════════════════════════════
# The keep decision for logical attention cell (b, h, i, j) is a pure hash
# of (seed, b, h, i, j): the forward and both backward passes rebuild
# IDENTICAL masks from global coordinates — independent of tiling and with
# no [B, H, N, N] mask tensor in HBM (the memory story that motivates the
# flash kernel in the first place). splitmix32-style finalizers on int32
# wrapping arithmetic; the unsigned threshold compare is done by flipping
# the sign bit (no uint32 needed in Mosaic). Statistical quality is far
# beyond what dropout needs; parity with the dense path is exercised by
# rebuilding the same mask with `dropout_keep_dense` in tests.


def _i32(x: int):
    return np.int32(x - 0x1_0000_0000 if x >= 0x8000_0000 else x)


_SEED_B = _i32(0x9E3779B1)
_SEED_H = _i32(0x7F4A7C15)
_ROW_C = _i32(0x9E3779B9)
_COL_C = _i32(0x6C62272E)
_SIGN = _i32(0x8000_0000)


def _mix32(x):
    """splitmix32 finalizer (int32, wrapping multiplies, logical shifts)."""
    x = x ^ jax.lax.shift_right_logical(x, 16)
    x = x * _i32(0x7FEB352D)
    x = x ^ jax.lax.shift_right_logical(x, 15)
    x = x * _i32(0x846CA68B)
    x = x ^ jax.lax.shift_right_logical(x, 16)
    return x


def _keep_threshold(rate: float) -> np.int32:
    """Signed-int32 view of uint32 round((1-rate) * 2^32)."""
    t = int(round((1.0 - float(rate)) * 4294967296.0))
    t = min(max(t, 0), 4294967295)
    return _i32(t)


def dropout_keep(seed, b, h, rows, cols, rate: float):
    """Boolean keep-mask for attention cells.

    Args:
        seed: int32 scalar (traced).
        b, h: int32 scalars (batch / head index).
        rows, cols: broadcast-compatible int32 arrays of global q / kv
            indices.
        rate: static drop probability in (0, 1).
    Returns:
        bool array, True = keep. P(keep) = 1 - rate.
    """
    hb = _mix32(seed + b * _SEED_B + h * _SEED_H)
    x = _mix32(rows * _ROW_C + hb)
    x = _mix32(x + cols * _COL_C)
    thresh = _keep_threshold(rate)
    # unsigned x < thresh, computed in signed int32 by flipping sign bits
    return (x ^ _SIGN) < (thresh ^ _SIGN)


def dropout_keep_dense(seed, B: int, H: int, n_rows: int, n_cols: int,
                       rate: float):
    """[B, H, n_rows, n_cols] keep-mask identical to the kernels' — the
    dense-path oracle for parity tests."""
    b = jnp.arange(B, dtype=jnp.int32)[:, None, None, None]
    h = jnp.arange(H, dtype=jnp.int32)[None, :, None, None]
    rows = jnp.arange(n_rows, dtype=jnp.int32)[None, None, :, None]
    cols = jnp.arange(n_cols, dtype=jnp.int32)[None, None, None, :]
    return dropout_keep(seed, b, h, rows, cols, rate)


# ════════════════════════════════════════════════════════════════════════
# Kernel 1: fused Toeplitz-masked linear attention (KERPLE dense path)
# ════════════════════════════════════════════════════════════════════════

def _masked_linear_kernel(q_ref, k_ref, v_ref, t_ref, o_ref, d_ref,
                          acc_ref, den_ref, *, n_kv_tiles: int):
    """One (b, h, iq, jk) cell: accumulate w = (q k^T) * T into out/den."""
    jk = pl.program_id(3)

    @pl.when(jk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        den_ref[...] = jnp.zeros_like(den_ref)

    q = q_ref[0, 0]  # [bq, F]
    k = k_ref[0, 0]  # [bk, F]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    w = s * t_ref[0]  # Toeplitz mask (zero-padded -> exact zeros)
    # second-stage matmul at the input dtype (fp32 accumulate): no-op for
    # fp32 inputs, full MXU rate for bf16 — the numerator and denominator
    # both divide by the same den so the ~0.4% bf16 rounding is relative
    acc_ref[...] += jnp.dot(
        w.astype(v_ref.dtype), v_ref[0, 0], preferred_element_type=jnp.float32
    )
    den_ref[...] += jnp.sum(w, axis=1, keepdims=True)

    @pl.when(jk == n_kv_tiles - 1)
    def _store():
        o_ref[0, 0] = (acc_ref[...] / (den_ref[...] + EPS)).astype(o_ref.dtype)
        d_ref[0, 0] = den_ref[...]  # residual for the fused backward


def _masked_linear_fwd_impl(q_prime, k_prime, v, T, *, block_q,
                            block_kv, interpret: bool):
    B, H, N, F = q_prime.shape
    D = v.shape[-1]
    if block_q is None or block_kv is None:
        dq_, dkv_ = masked_linear_default_blocks(N)
        block_q = block_q or dq_
        block_kv = block_kv or dkv_
    # Q and KV axes pad independently to their own block (see the flash
    # kernel): padded phi(k) rows are zero so they contribute exact zeros;
    # padded q rows are sliced away.
    Nq = _round_up(N, block_q)
    Nkv = _round_up(N, block_kv)
    Fp = _round_up(F, LANES)
    Dp = _round_up(D, LANES)

    qp = _pad_axis(_pad_axis(q_prime, 2, Nq), 3, Fp)
    kp = _pad_axis(_pad_axis(k_prime, 2, Nkv), 3, Fp)
    vp = _pad_axis(_pad_axis(v, 2, Nkv), 3, Dp)
    Tp = _pad_axis(_pad_axis(T, 1, Nq), 2, Nkv)  # [H, Nq, Nkv]

    n_q_tiles = Nq // block_q
    n_kv_tiles = Nkv // block_kv

    grid = (B, H, n_q_tiles, n_kv_tiles)
    out, den = pl.pallas_call(
        functools.partial(_masked_linear_kernel, n_kv_tiles=n_kv_tiles),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Nq, Dp), v.dtype),
            jax.ShapeDtypeStruct((B, H, Nq, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, Fp), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_kv, Fp), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_kv, Dp), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, block_q, block_kv), lambda b, h, i, j: (h, i, j)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, Dp), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, j: (b, h, i, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, Dp), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ] if _HAVE_PLTPU else [],
        compiler_params=(
            pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary"),
            )
            if _HAVE_PLTPU and not interpret
            else None
        ),
        interpret=interpret,
    )(qp, kp, vp, Tp)
    return out[:, :, :N, :D], den[:, :, :N, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_masked_linear_attention(q_prime, k_prime, v, T,
                                  block_q=None, block_kv=None,
                                  interpret: bool = False):
    """out_i = sum_j T[i,j] (phi(q_i).phi(k_j)) v_j / sum_j T[i,j] (phi..)

    Args:
        q_prime, k_prime: [B, H, N, F] non-negative features.
        v: [B, H, N, D].
        T: [H, N, N] positive Toeplitz matrix (exp of KERPLE biases).
        block_q, block_kv: tile sizes (multiples of 128); None picks
            masked_linear_default_blocks(N).
        interpret: run in Pallas interpret mode (CPU tests).
    Returns:
        [B, H, N, D].
    """
    out, _ = _masked_linear_fwd_impl(
        q_prime, k_prime, v, T,
        block_q=block_q, block_kv=block_kv, interpret=interpret,
    )
    return out


def _fml_fwd(q_prime, k_prime, v, T, block_q, block_kv, interpret):
    out, den = _masked_linear_fwd_impl(
        q_prime, k_prime, v, T,
        block_q=block_q, block_kv=block_kv, interpret=interpret,
    )
    return out, (q_prime, k_prime, v, T, den, out)


# Backward strategy. 'jnp_residual' computes the explicit VJP formulas in
# XLA from saved (den, out) residuals — measured fastest at ViT head dims
# (D=16, F=44), where Pallas tile padding to 128 lanes multiplies the
# backward's matmul work ~3-8x across its three kernels. 'pallas' switches
# to the fully-fused masked_linear_bwd kernels (wins when D,F ~ 128).
# 'auto' keeps jnp_residual while its ~5 live [B,H,N,N] fp32 temps fit the
# KERPLE byte budget and switches to the fused kernels past it — the
# regime where the jnp backward simply OOMs (long-N KERPLE, the same wall
# attention_core's dense path hits).
MASKED_LINEAR_BWD_MODE = "auto"


def _masked_linear_bwd_wants_pallas(b: int, h: int, n: int) -> bool:
    from ..attention_core import KERPLE_DENSE_MEMORY_BUDGET

    bts = 5 * b * h * n * n * 4
    # symbolic batch (jax.export) -> inconclusive compare; keep the
    # measured-default jnp residual backward there
    return isinstance(bts, int) and bts > KERPLE_DENSE_MEMORY_BUDGET


def _masked_linear_bwd_jnp(q_prime, k_prime, v, T, den, out, g):
    """Explicit VJP from residuals — shared formula in attention_core
    (also the dense path's custom_vjp backward)."""
    from ..attention_core import masked_linear_vjp_residual

    return masked_linear_vjp_residual(q_prime, k_prime, v, T, den, out, g)


def _fml_bwd(block_q, block_kv, interpret, residuals, g):
    q_prime, k_prime, v, T, den, out = residuals
    mode = MASKED_LINEAR_BWD_MODE
    if mode == "auto":
        b, h, n = q_prime.shape[0], q_prime.shape[1], q_prime.shape[2]
        mode = ("pallas" if _masked_linear_bwd_wants_pallas(b, h, n)
                else "jnp_residual")
    if mode == "pallas":
        from .masked_linear_bwd import masked_linear_bwd

        return masked_linear_bwd(
            q_prime, k_prime, v, T, den, out, g,
            block_q=block_q, block_kv=block_kv, interpret=interpret,
        )
    return _masked_linear_bwd_jnp(q_prime, k_prime, v, T, den, out, g)


fused_masked_linear_attention.defvjp(_fml_fwd, _fml_bwd)


# ════════════════════════════════════════════════════════════════════════
# Kernel 2: flash softmax attention
# ════════════════════════════════════════════════════════════════════════

def _flash_kernel(*refs, scale: float, n_kv_tiles: int, block_q: int,
                  block_kv: int, seq_len: int, has_mask: bool,
                  dropout_rate: float):
    it = iter(refs)
    q_ref, k_ref, v_ref = next(it), next(it), next(it)
    mask_ref = next(it) if has_mask else None
    seed_ref = next(it) if dropout_rate > 0 else None
    o_ref, lse_ref = next(it), next(it)
    m_ref, l_ref, acc_ref = next(it), next(it), next(it)

    jk = pl.program_id(3)

    @pl.when(jk == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]  # [bq, Dp]
    k = k_ref[0, 0]  # [bk, Dp]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [bq, bk]

    # mask padded kv columns (beyond the true sequence length)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + jk * block_kv
    s = jnp.where(col < seq_len, s, MASK_VALUE)
    if has_mask:
        # user mask tile: zeros are masked out (softmax.py:106-110). The
        # finite MASK_VALUE (not -inf) keeps the online recurrence NaN-free
        # when a leading tile is fully masked: its poisoned l/acc are
        # annihilated by alpha = exp(MASK_VALUE - m_real) = 0 as soon as a
        # live tile arrives. (A row masked EVERYWHERE degenerates to a
        # uniform average over the last tile instead of the dense path's
        # NaN row — both are user error.)
        s = jnp.where(mask_ref[0, 0] == 0, MASK_VALUE, s)

    m_prev = m_ref[...]  # [bq, 1]
    l_prev = l_ref[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)  # [bq, bk]
    # the normaliser uses UNdropped p: dropout applies to the softmax
    # probabilities (post-normalisation in the dense formulation), which
    # in online form means scaling only the value-side accumulation
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_ref[...] = m_next
    l_ref[...] = l_next

    if dropout_rate > 0:
        b, h, iq = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        rows = (jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
                + iq * block_q)
        keep = dropout_keep(seed_ref[0, 0], b, h, rows, col, dropout_rate)
        p_acc = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
    else:
        p_acc = p

    # P rides the MXU at the INPUT dtype (fp32 accumulate): softmax
    # probabilities are in [0, 1] where bf16 carries ~3 decimal digits —
    # the standard flash-attention P cast. For fp32 inputs the cast is a
    # no-op; for bf16 it doubles the P.V matmul's MXU rate.
    acc_ref[...] = acc_ref[...] * alpha + jnp.dot(
        p_acc.astype(v_ref.dtype), v_ref[0, 0],
        preferred_element_type=jnp.float32,
    )

    @pl.when(jk == n_kv_tiles - 1)
    def _store():
        l = l_ref[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)
        # Row log-sum-exp residual for the tiled backward: softmax
        # probabilities rebuild as exp(s - lse) without re-running the
        # online max/normaliser recurrence.
        m = m_ref[...]
        lse_ref[0, 0] = jnp.where(
            l == 0.0, MASK_VALUE, m + jnp.log(jnp.maximum(l, 1e-37))
        )


def canonical_mask(mask, B: int, H: int):
    """[B, N, N] / [B, 1, N, N] / [B, H, N, N] -> ([B, Hm, N, N], Hm)."""
    if mask.ndim == 3:
        mask = mask[:, None]
    Hm = mask.shape[1]
    if Hm not in (1, H):
        raise ValueError(f"mask head dim must be 1 or {H}, got {Hm}")
    if mask.shape[0] != B:
        raise ValueError(f"mask batch dim must be {B}, got {mask.shape[0]}")
    return mask, Hm


def _seed_operand(dropout_seed):
    """Canonicalise the dropout seed to an int32 [1, 1] kernel operand."""
    seed = jnp.asarray(dropout_seed)
    if seed.dtype == jnp.uint32:
        seed = jax.lax.bitcast_convert_type(seed, jnp.int32)
    return seed.astype(jnp.int32).reshape(1, 1)


def _flash_fwd_impl(q, k, v, mask, dropout_seed, *, scale: float,
                    dropout_rate: float, block_q, block_kv,
                    interpret: bool):
    B, H, N, D = q.shape
    if block_q is None or block_kv is None:
        dq_, dkv_ = flash_default_blocks(N)
        block_q = block_q or dq_
        block_kv = block_kv or dkv_
    # Pad the Q and KV axes independently to their own block size — padding
    # both to the blocks' LCM multiplies the wasted tile area when the
    # blocks are unequal. Padded KV columns are masked in-kernel; padded Q
    # rows produce garbage rows that are sliced away below.
    Nq = _round_up(N, block_q)
    Nkv = _round_up(N, block_kv)
    Dp = _round_up(D, LANES)

    qp = _pad_axis(_pad_axis(q, 2, Nq), 3, Dp)
    kp = _pad_axis(_pad_axis(k, 2, Nkv), 3, Dp)
    vp = _pad_axis(_pad_axis(v, 2, Nkv), 3, Dp)

    n_q_tiles = Nq // block_q
    n_kv_tiles = Nkv // block_kv
    grid = (B, H, n_q_tiles, n_kv_tiles)

    operands = [qp, kp, vp]
    in_specs = [
        pl.BlockSpec((1, 1, block_q, Dp), lambda b, h, i, j: (b, h, i, 0)),
        pl.BlockSpec((1, 1, block_kv, Dp), lambda b, h, i, j: (b, h, j, 0)),
        pl.BlockSpec((1, 1, block_kv, Dp), lambda b, h, i, j: (b, h, j, 0)),
    ]
    if mask is not None:
        maskc, Hm = canonical_mask(mask, B, H)
        # zero-padding = masked; padded kv columns are re-masked by the
        # seq_len guard anyway and padded q rows are sliced away
        maskp = _pad_axis(_pad_axis(maskc, 2, Nq), 3, Nkv)
        operands.append(maskp)
        if Hm == 1:
            in_specs.append(pl.BlockSpec(
                (1, 1, block_q, block_kv), lambda b, h, i, j: (b, 0, i, j)))
        else:
            in_specs.append(pl.BlockSpec(
                (1, 1, block_q, block_kv), lambda b, h, i, j: (b, h, i, j)))
    if dropout_rate > 0:
        operands.append(_seed_operand(dropout_seed))
        in_specs.append(pl.BlockSpec((1, 1), lambda b, h, i, j: (0, 0)))

    out, lse = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, n_kv_tiles=n_kv_tiles,
            block_q=block_q, block_kv=block_kv, seq_len=N,
            has_mask=mask is not None, dropout_rate=dropout_rate,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Nq, Dp), v.dtype),
            jax.ShapeDtypeStruct((B, H, Nq, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, block_q, Dp), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, j: (b, h, i, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, Dp), jnp.float32),
        ] if _HAVE_PLTPU else [],
        compiler_params=(
            pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary"),
            )
            if _HAVE_PLTPU and not interpret
            else None
        ),
        interpret=interpret,
    )(*operands)
    return out[:, :, :N, :D], lse[:, :, :N, 0]


def _flash_reference(q, k, v, scale):
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 8))
def flash_softmax_attention(q, k, v, scale: float, block_q=None,
                            block_kv=None, interpret: bool = False,
                            mask=None, dropout_rate: float = 0.0,
                            dropout_seed=None):
    """softmax(q k^T * scale) v without materialising the scores in HBM.

    Supports the full reference softmax contract at any N (VERDICT r3 #2;
    reference softmax.py:100-115): an additive-style attention mask (zeros
    masked out) and attention-probability dropout, both handled INSIDE the
    tiled kernels — dropout masks rebuild from a counter-based hash of the
    global cell coordinates (`dropout_keep`), so nothing quadratic in N
    touches HBM in either direction.

    Args:
        q, k, v: [B, H, N, D].
        block_q, block_kv: tile sizes (multiples of 128); None picks the
            measured `flash_default_blocks(N)` policy.
        mask: optional [B, N, N] / [B, 1, N, N] / [B, H, N, N]; zeros are
            masked out.
        dropout_rate: static attention-probability drop rate.
        dropout_seed: int32/uint32 scalar (traced ok); required when
            dropout_rate > 0.
    Returns:
        [B, H, N, D].
    """
    if dropout_rate > 0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    out, _ = _flash_fwd_impl(q, k, v, mask, dropout_seed, scale=scale,
                             dropout_rate=dropout_rate, block_q=block_q,
                             block_kv=block_kv, interpret=interpret)
    return out


# Backward strategy: 'pallas' (default) runs the tiled dq/dkv-split kernels
# in flash_bwd.py — nothing quadratic in N touches HBM, matching the
# forward's memory story. 'jnp_recompute' rebuilds dense attention in XLA
# (the pre-r2 behaviour; kept as a debugging oracle — dropout-free only).
FLASH_BWD_MODE = "pallas"


def _flash_fwd(q, k, v, scale, block_q, block_kv, interpret, mask,
               dropout_rate, dropout_seed):
    out, lse = _flash_fwd_impl(q, k, v, mask, dropout_seed, scale=scale,
                               dropout_rate=dropout_rate, block_q=block_q,
                               block_kv=block_kv, interpret=interpret)
    return out, (q, k, v, out, lse, mask, dropout_seed)


def _zero_cotangent(x):
    """Zero cotangent for a possibly-integer primal (float0 for ints)."""
    if x is None:
        return None
    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact):
        return jnp.zeros_like(x)
    return np.zeros(jnp.shape(x), dtype=jax.dtypes.float0)


def _flash_bwd(scale, block_q, block_kv, interpret, dropout_rate,
               residuals, g):
    q, k, v, out, lse, mask, dropout_seed = residuals
    if FLASH_BWD_MODE == "pallas" or mask is not None or dropout_rate > 0:
        from .flash_bwd import flash_attention_bwd

        dq, dk, dv = flash_attention_bwd(
            q, k, v, out, lse, g, scale=scale,
            block_q=block_q, block_kv=block_kv, interpret=interpret,
            mask=mask, dropout_rate=dropout_rate, dropout_seed=dropout_seed,
        )
    else:
        _, vjp = jax.vjp(
            lambda q, k, v: _flash_reference(q, k, v, scale), q, k, v)
        dq, dk, dv = vjp(g)
    # the mask is a constraint, not a differentiable input
    return dq, dk, dv, _zero_cotangent(mask), _zero_cotangent(dropout_seed)


flash_softmax_attention.defvjp(_flash_fwd, _flash_bwd)
