"""Coeffs-native Toeplitz-masked linear attention (Pallas TPU).

The round-3 KERPLE Pallas route (attention_kernels.py::
fused_masked_linear_attention + masked_linear_bwd.py) still materialised
the Toeplitz matrix T = gather(coeffs) at [H, N, N] fp32 in HBM — twice per
training step (T forward, T + dT backward), ~0.8 GB per block at ViT-B
N=4097 — plus an XLA gather pass to build it and a diagonal-segment-sum
pass to map dT back to dcoeffs (VERDICT r3 weak #3 / next #5).

These kernels never form T. A (block_q, block_kv) tile of a Toeplitz
matrix is a function of a CONTIGUOUS window of the coefficient vector:

    T[i, j] = c[j - i + N - 1]
    tile(iq, jk)[a, b] = w[b - a + bq - 1],
    w = c_buf[base : base + bq + bkv],  base = jk*bkv - iq*bq + Nq - bq

so each grid cell loads a [bq + bkv] window (16 KB at 512-blocks, vs the
1 MB T tile it replaces) and builds the tile IN REGISTERS with one
strided roll (`pltpu.roll(stride=1)`: row a rotates by a — each row of
the broadcast window slides into diagonal alignment). The backward folds
the dT -> dcoeffs diagonal reduction the same way in reverse: row-reverse
the accumulated dW*A tile (one anti-identity matmul at store time — the
inverse-direction rolls Mosaic would need are unlowered, see
`_diag_fold_rev`), stride-1-roll so diagonals become columns, sum over
rows, and emit per-tile window gradients that a tiny XLA epilogue
scatter-adds into dcoeffs. HBM traffic
for the positional bias drops from O(H*N^2) to O(H*N) per step in both
directions.

Padding story (same contract as the T-based kernels): the coefficient
buffer is laid out for the PADDED geometry — c_buf[h, (Nq-N) + t] =
coeffs[h, t], zeros elsewhere, length Nq + Nkv (lane-aligned) — so padded
q rows / kv columns read exact zeros through the same window arithmetic,
and every window [base, base + bq + bkv) is in-bounds by construction
(base is a multiple of 128 because block sizes are).

Reference: models/rpe/kerple.py:99-344 (the math), SURVEY.md §7 hard-part
1 (the memory goal).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAVE_PLTPU = False

from .attention_kernels import (
    EPS,
    LANES,
    _pad_axis,
    _round_up,
)


def coeffs_default_blocks(n: int) -> tuple:
    """(block_q, block_kv) policy for the coeffs-native kernels.

    The T-based kernels pinned (512, 512) because each grid cell also
    streamed a [bq, bkv] fp32 T tile (1 MB at 512-blocks) and bigger KV
    blocks made that traffic regress. Here the tile is a [bq+bkv]
    coefficient window (16 KB), so the trade re-measured differently:
    at ViT-B long-N (B=4 H=12 N=4097 F=266 D=64 bf16, chained
    value-fetch) (512, 768) is best end-to-end — 8.5 ms fwd /
    44.3 ms fwd+bwd (62.7 / 42.1 TFLOP/s) vs (512, 512)'s 8.7 / 47.4 —
    and pads N=4097 to the same 4608 on both axes
    (results/coeffs_tune_r4.json)."""
    np128 = _round_up(max(n, 1), LANES)
    return min(512, np128), min(768, np128)


def _dims(interpret):
    if _HAVE_PLTPU and not interpret:
        return pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        )
    return None


def _toeplitz_tile(w, block_q: int, block_kv: int):
    """[bq, bkv] Toeplitz tile from a [1, bq+bkv] coeff window.

    tile[a, b] = w[b - a + bq - 1]: broadcast the window to bq rows and
    rotate row a right by (a + 1 + (W - bq)) mod W — one hardware
    sublane-strided rotate; the needed index b - a + bq - 1 always lands
    in [0, bq + bkv - 2], so the rotation never wraps meaningful data.
    """
    W = block_q + block_kv
    x = jnp.broadcast_to(w, (block_q, W))
    rolled = pltpu.roll(x, W - block_q + 1, 1, stride=1, stride_axis=0)
    return rolled[:, :block_kv]


def _diag_fold_rev(tile_rev, block_q: int, block_kv: int):
    """[1, bq+bkv] per-diagonal sums of a ROW-REVERSED [bq, bkv] tile —
    the transpose of `_toeplitz_tile`: with tile_rev[a, b] =
    tile[bq-1-a, b], out[m] = sum_{a',b : b-a'+bq-1 = m} tile[a', b].

    The natural formulation rotates row a LEFT by a (stride -1 ≡ W-1 mod
    W), but Mosaic only lowers small non-negative strides ("max shift in
    a vreg larger than the vreg's width" for stride W-1, and
    "stride must be non-negative" for -1; in-kernel `rev` is also
    unlowered). Row reversal flips the sign: on tile_rev the same
    diagonal alignment is stride +1 with zero base shift, so the caller
    reverses the tile's rows in-register (one anti-identity matmul at
    store time — see `_dc_kernel`). Wrapped lanes land in the zero
    padding for every m, so one row-reduction yields the window sums.
    """
    W = block_q + block_kv
    y = jnp.pad(tile_rev, ((0, 0), (0, W - block_kv)))
    rolled = pltpu.roll(y, 0, 1, stride=1, stride_axis=0)
    return jnp.sum(rolled, axis=0, keepdims=True)


def _coeff_buffer(coeffs, n: int, nq: int, nkv: int):
    """[H, 2N-1] coeffs -> [H, 1, round_up(Nq+Nkv, 128)] padded-geometry
    buffer: c_buf[h, 0, (Nq - N) + t] = coeffs[h, t].

    The singleton middle axis exists for the TPU lowering: a block's last
    two dims must be (divisible by 8, divisible by 128) OR equal the array
    dims, so the per-head window block is (1, 1, L) with 1 == dim 1."""
    H = coeffs.shape[0]
    cbuf = _round_up(nq + nkv, LANES)
    buf = jnp.zeros((H, 1, cbuf), coeffs.dtype)
    return jax.lax.dynamic_update_slice(buf, coeffs[:, None, :], (0, 0, nq - n))


# ─── forward ─────────────────────────────────────────────────────────────

def _fwd_kernel(q_ref, k_ref, v_ref, c_ref, o_ref, d_ref, acc_ref, den_ref,
                *, n_kv_tiles: int, block_q: int, block_kv: int, nq: int):
    iq, jk = pl.program_id(2), pl.program_id(3)

    @pl.when(jk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        den_ref[...] = jnp.zeros_like(den_ref)

    base = pl.multiple_of(
        jk * block_kv - iq * block_q + nq - block_q, LANES)
    w = c_ref[0, :, pl.ds(base, block_q + block_kv)]  # [1, W]
    t = _toeplitz_tile(w, block_q, block_kv)  # [bq, bkv]

    q = q_ref[0, 0]  # [bq, F]
    k = k_ref[0, 0]  # [bk, F]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    wgt = s * t
    # second-stage matmuls run at the INPUT dtype (fp32 accumulate): a
    # no-op for fp32 inputs, double MXU rate for bf16; numerator and
    # denominator divide out so the ~0.4% bf16 rounding stays relative
    acc_ref[...] += jnp.dot(
        wgt.astype(v_ref.dtype), v_ref[0, 0],
        preferred_element_type=jnp.float32,
    )
    den_ref[...] += jnp.sum(wgt, axis=1, keepdims=True)

    @pl.when(jk == n_kv_tiles - 1)
    def _store():
        o_ref[0, 0] = (acc_ref[...] / (den_ref[...] + EPS)).astype(o_ref.dtype)
        d_ref[0, 0] = den_ref[...]


def _fwd_impl(q_prime, k_prime, v, coeffs, *, block_q, block_kv, interpret):
    B, H, N, F = q_prime.shape
    D = v.shape[-1]
    if block_q is None or block_kv is None:
        dq_, dkv_ = coeffs_default_blocks(N)
        block_q = block_q or dq_
        block_kv = block_kv or dkv_
    Nq = _round_up(N, block_q)
    Nkv = _round_up(N, block_kv)
    Fp = _round_up(F, LANES)
    Dp = _round_up(D, LANES)

    qp = _pad_axis(_pad_axis(q_prime, 2, Nq), 3, Fp)
    kp = _pad_axis(_pad_axis(k_prime, 2, Nkv), 3, Fp)
    vp = _pad_axis(_pad_axis(v, 2, Nkv), 3, Dp)
    cbuf = _coeff_buffer(coeffs.astype(jnp.float32), N, Nq, Nkv)

    n_q = Nq // block_q
    n_kv = Nkv // block_kv
    out, den = pl.pallas_call(
        functools.partial(
            _fwd_kernel, n_kv_tiles=n_kv, block_q=block_q,
            block_kv=block_kv, nq=Nq,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Nq, Dp), v.dtype),
            jax.ShapeDtypeStruct((B, H, Nq, 1), jnp.float32),
        ),
        grid=(B, H, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, Fp), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_kv, Fp), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_kv, Dp), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, cbuf.shape[2]),
                         lambda b, h, i, j: (h, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, Dp), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, j: (b, h, i, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, Dp), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ] if _HAVE_PLTPU else [],
        compiler_params=_dims(interpret),
        interpret=interpret,
    )(qp, kp, vp, cbuf)
    return out[:, :, :N, :D], den[:, :, :N, 0]


# ─── backward P1: dq' ────────────────────────────────────────────────────

def _dq_kernel(gn_ref, s_ref, v_ref, k_ref, c_ref, dq_ref, acc_ref,
               *, n_kv_tiles: int, block_q: int, block_kv: int, nq: int):
    iq, jk = pl.program_id(2), pl.program_id(3)

    @pl.when(jk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    base = pl.multiple_of(
        jk * block_kv - iq * block_q + nq - block_q, LANES)
    w = c_ref[0, :, pl.ds(base, block_q + block_kv)]  # [1, W]
    t = _toeplitz_tile(w, block_q, block_kv)

    m = jax.lax.dot_general(
        gn_ref[0, 0], v_ref[0, 0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dA = (m - s_ref[0, 0]) * t
    # input-dtype matmul, fp32 accumulate (see the forward kernel's note)
    acc_ref[...] += jnp.dot(
        dA.astype(k_ref.dtype), k_ref[0, 0],
        preferred_element_type=jnp.float32,
    )

    @pl.when(jk == n_kv_tiles - 1)
    def _store():
        dq_ref[0, 0] = acc_ref[...].astype(dq_ref.dtype)


# ─── backward P2: dk', dv ────────────────────────────────────────────────

def _dkv_kernel(gn_ref, s_ref, v_ref, q_ref, k_ref, c_ref,
                dk_ref, dv_ref, dk_acc, dv_acc,
                *, n_q_tiles: int, block_q: int, block_kv: int, nq: int):
    jk, iq = pl.program_id(2), pl.program_id(3)

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    base = pl.multiple_of(
        jk * block_kv - iq * block_q + nq - block_q, LANES)
    w = c_ref[0, :, pl.ds(base, block_q + block_kv)]  # [1, W]
    t_T = _toeplitz_tile(w, block_q, block_kv).T  # [bk, bq]

    gn = gn_ref[0, 0]
    v = v_ref[0, 0]
    q = q_ref[0, 0]
    k = k_ref[0, 0]

    m_T = jax.lax.dot_general(
        v, gn, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s_row = s_ref[0, 0].reshape(1, -1)
    dA_T = (m_T - s_row) * t_T
    # input-dtype matmuls, fp32 accumulate (see the forward kernel's note)
    dk_acc[...] += jnp.dot(dA_T.astype(q.dtype), q,
                           preferred_element_type=jnp.float32)

    A_T = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dv_acc[...] += jnp.dot((A_T * t_T).astype(gn.dtype), gn,
                           preferred_element_type=jnp.float32)

    @pl.when(iq == n_q_tiles - 1)
    def _store():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


# ─── backward P3: dcoeffs windows (dT never formed) ─────────────────────

def _dc_kernel(gn_ref, s_ref, v_ref, q_ref, k_ref, dw_ref, acc_ref,
               *, n_batch: int, block_q: int, block_kv: int):
    """Per-tile dcoeffs windows: accumulate the dW*A tile over the batch,
    then fold its diagonals into a [1, W] window gradient at the last
    batch step. `_diag_fold_rev` needs the tile's rows REVERSED; the
    reversal happens here, in-register, as one anti-identity matmul
    (J @ acc, J[r, c] = [r + c == bq-1]) on the accumulated tile — only
    on the store step, so its FLOPs amortise over the batch (~bq/(B*Fp)
    of the tile's matmul work) and no operand needs a flipped HBM copy
    (a whole-axis jnp.flip of q/gn per layer measured as the difference
    between fitting and OOM at ViT-B N=1025 B=16)."""
    b = pl.program_id(3)

    @pl.when(b == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    gn = gn_ref[0, 0]
    m = jax.lax.dot_general(
        gn, v_ref[0, 0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    A = jax.lax.dot_general(
        q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[...] += (m - s_ref[0, 0]) * A  # dW * A tile

    @pl.when(b == n_batch - 1)
    def _store():
        r = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_q), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_q), 1)
        J = (r + c == block_q - 1).astype(jnp.float32)
        # HIGHEST: the MXU's default bf16 input truncation would round
        # the accumulated tile (measured 3e-3 rel error on dcoeffs);
        # J is a permutation so the fp32 3-pass keeps the fold exact
        acc_rev = jnp.dot(J, acc_ref[...],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        dw_ref[0, 0, 0] = _diag_fold_rev(acc_rev, block_q, block_kv)


def _scatter_windows(windows, n: int, nq: int, nkv: int,
                     block_q: int, block_kv: int):
    """[H, n_q, n_kv, bq+bkv] per-tile window grads -> [H, 2N-1] dcoeffs.

    A lax.scan of dynamic-slice adds over the n_q*n_kv tiles (tiny:
    window width elements each) — the XLA epilogue replacing the old
    [H, Nq, Nkv] dT materialisation + toeplitz_diag_sums pass.
    """
    H, n_q, n_kv, W = windows.shape
    cbuf = _round_up(nq + nkv, LANES)
    flat = windows.reshape(H, n_q * n_kv, W)
    iqs = jnp.repeat(jnp.arange(n_q), n_kv)
    jks = jnp.tile(jnp.arange(n_kv), n_q)
    bases = jks * block_kv - iqs * block_q + nq - block_q  # [n_q*n_kv]

    def step(buf, inp):
        win, base = inp
        cur = jax.lax.dynamic_slice(buf, (0, base), (H, W))
        return jax.lax.dynamic_update_slice(buf, cur + win, (0, base)), None

    buf0 = jnp.zeros((H, cbuf + W), jnp.float32)
    buf, _ = jax.lax.scan(step, buf0, (jnp.moveaxis(flat, 1, 0), bases))
    return jax.lax.dynamic_slice(buf, (0, nq - n), (H, 2 * n - 1))


def _bwd_impl(q_prime, k_prime, v, coeffs, den, out, g, *,
              block_q, block_kv, interpret):
    B, H, N, F = q_prime.shape
    D = v.shape[-1]
    if block_q is None or block_kv is None:
        dq_, dkv_ = coeffs_default_blocks(N)
        block_q = block_q or dq_
        block_kv = block_kv or dkv_
    Nq = _round_up(N, block_q)
    Nkv = _round_up(N, block_kv)
    Fp = _round_up(F, LANES)
    Dp = _round_up(D, LANES)
    W = block_q + block_kv

    # gn at the cotangent dtype (fp32 gn would force every gn-operand
    # matmul in P1/P2/P3 to fp32 MXU rate); s stays fp32 — elementwise only
    gn = (g / (den[..., None] + EPS)).astype(g.dtype)
    s = jnp.sum(g * out, axis=-1) / (den + EPS)

    qp = _pad_axis(_pad_axis(q_prime, 2, Nq), 3, Fp)
    kp = _pad_axis(_pad_axis(k_prime, 2, Nkv), 3, Fp)
    vp = _pad_axis(_pad_axis(v, 2, Nkv), 3, Dp)
    gnp = _pad_axis(_pad_axis(gn, 2, Nq), 3, Dp)
    sp = _pad_axis(s, 2, Nq)[..., None]
    cbuf = _coeff_buffer(coeffs.astype(jnp.float32), N, Nq, Nkv)

    n_q = Nq // block_q
    n_kv = Nkv // block_kv
    scr = (lambda *a: pltpu.VMEM(*a)) if _HAVE_PLTPU else None
    cspec = pl.BlockSpec((1, 1, cbuf.shape[2]),
                         lambda b, h, i, j: (h, 0, 0))

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, n_kv_tiles=n_kv, block_q=block_q,
                          block_kv=block_kv, nq=Nq),
        out_shape=jax.ShapeDtypeStruct((B, H, Nq, Fp), q_prime.dtype),
        grid=(B, H, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, Dp), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_kv, Dp), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_kv, Fp), lambda b, h, i, j: (b, h, j, 0)),
            cspec,
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, Fp),
                               lambda b, h, i, j: (b, h, i, 0)),
        scratch_shapes=[scr((block_q, Fp), jnp.float32)] if scr else [],
        compiler_params=_dims(interpret),
        interpret=interpret,
    )(gnp, sp, vp, kp, cbuf)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, n_q_tiles=n_q, block_q=block_q,
                          block_kv=block_kv, nq=Nq),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Nkv, Fp), k_prime.dtype),
            jax.ShapeDtypeStruct((B, H, Nkv, Dp), v.dtype),
        ),
        grid=(B, H, n_kv, n_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, Dp), lambda b, h, j, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, j, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_kv, Dp), lambda b, h, j, i: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_q, Fp), lambda b, h, j, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_kv, Fp), lambda b, h, j, i: (b, h, j, 0)),
            pl.BlockSpec((1, 1, cbuf.shape[2]),
                         lambda b, h, j, i: (h, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_kv, Fp), lambda b, h, j, i: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_kv, Dp), lambda b, h, j, i: (b, h, j, 0)),
        ),
        scratch_shapes=[
            scr((block_kv, Fp), jnp.float32),
            scr((block_kv, Dp), jnp.float32),
        ] if scr else [],
        compiler_params=_dims(interpret),
        interpret=interpret,
    )(gnp, sp, vp, qp, kp, cbuf)

    # P3: per-tile dcoeffs windows — [H, n_q, n_kv, W] instead of the old
    # [H, Nq, Nkv] dT (e.g. 3 MB vs 775 MB at ViT-B N=4097, 512-blocks).
    # out is [H, n_q, n_kv, 1, W]: the singleton 4th axis makes the
    # block's last-two dims (1, W) with 1 == the array dim (TPU lowering
    # rule).
    windows = pl.pallas_call(
        functools.partial(_dc_kernel, n_batch=B, block_q=block_q,
                          block_kv=block_kv),
        out_shape=jax.ShapeDtypeStruct((H, n_q, n_kv, 1, W), jnp.float32),
        grid=(H, n_q, n_kv, B),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, Dp), lambda h, i, j, b: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda h, i, j, b: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_kv, Dp), lambda h, i, j, b: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_q, Fp), lambda h, i, j, b: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_kv, Fp), lambda h, i, j, b: (b, h, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, 1, W),
                               lambda h, i, j, b: (h, i, j, 0, 0)),
        scratch_shapes=[scr((block_q, block_kv), jnp.float32)] if scr else [],
        compiler_params=_dims(interpret),
        interpret=interpret,
    )(gnp, sp, vp, qp, kp)
    windows = windows.reshape(H, n_q, n_kv, W)

    dcoeffs = _scatter_windows(windows, N, Nq, Nkv, block_q, block_kv)
    return (
        dq[:, :, :N, :F],
        dk[:, :, :N, :F],
        dv[:, :, :N, :D],
        dcoeffs.astype(coeffs.dtype),
    )


# ─── fused-phi forward (SURVEY §7 step 8(b) / VERDICT r4 #2) ─────────────
#
# phi computed IN-KERNEL from the raw [B,H,N,D] q/k tiles, so the
# [B,H,N,Fp] q'/k' tensors never roundtrip HBM in the forward. The q-side
# phi is computed once per (b, h, iq) into VMEM scratch (jk == 0) and
# reused across the KV sweep; the k-side phi is recomputed per grid cell
# (bk*D*F ≈ +9% of the cell's matmul flops, plus the exp transcendentals)
# — the structural price of fusion, and the reason this path must win a
# model-level A/B before becoming the dispatch default.

def _phi_tile(x, omega, feature_kind: str, m_real: int, f_real: int,
              n_valid=None, row0=None, block_rows: int = 0):
    """phi of one [rows, Dp] tile against [Dp, Fp] omega, fp32.

    Padded feature lanes (>= f_real) are masked to zero so they add
    nothing to s = phi_q phi_k^T; padded/overhang KV rows (>= n_valid,
    when given) are zeroed so they add nothing to acc/den — phi+ of an
    all-zero row is exp(0)/sqrt(m) != 0, unlike the XLA-side path where
    zero-padding happened AFTER phi."""
    u = jnp.dot(x, omega.astype(x.dtype), preferred_element_type=jnp.float32)
    lanes = jax.lax.broadcasted_iota(jnp.int32, u.shape, 1)
    lane_ok = lanes < f_real
    if feature_kind == "relu":
        phi = jnp.where(lane_ok, jnp.maximum(u, 0.0), 0.0)
        phi = phi * (1.0 / (m_real ** 0.5))
    else:  # favor_plus
        u_m = jnp.where(lane_ok, u, -jnp.inf)
        u_max = jnp.max(u_m, axis=1, keepdims=True)
        x32 = x.astype(jnp.float32)
        norm_half = jnp.sum(x32 * x32, axis=1, keepdims=True) * 0.5
        phi = jnp.exp(u - u_max - norm_half) * (1.0 / (m_real ** 0.5))
        phi = jnp.where(lane_ok, phi, 0.0)
    if n_valid is not None:
        rows = (jax.lax.broadcasted_iota(jnp.int32, u.shape, 0) + row0)
        phi = jnp.where(rows < n_valid, phi, 0.0)
    return phi


def _fused_phi_fwd_kernel(q_ref, k_ref, v_ref, om_ref, c_ref, o_ref, d_ref,
                          phiq_ref, acc_ref, den_ref, *, n_kv_tiles: int,
                          block_q: int, block_kv: int, nq: int, n: int,
                          feature_kind: str, m_real: int, f_real: int):
    iq, jk = pl.program_id(2), pl.program_id(3)

    @pl.when(jk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        den_ref[...] = jnp.zeros_like(den_ref)
        # q-side phi once per (b, h, iq); padded q rows yield garbage
        # sliced away by the caller, so no row mask needed
        phiq_ref[...] = _phi_tile(q_ref[0, 0], om_ref[0], feature_kind,
                                  m_real, f_real)

    base = pl.multiple_of(
        jk * block_kv - iq * block_q + nq - block_q, LANES)
    w = c_ref[0, :, pl.ds(base, block_q + block_kv)]  # [1, W]
    t = _toeplitz_tile(w, block_q, block_kv)  # [bq, bkv]

    phik = _phi_tile(k_ref[0, 0], om_ref[0], feature_kind, m_real, f_real,
                     n_valid=n, row0=jk * block_kv)
    # s at the input dtype (full MXU rate), fp32 accumulate — matches the
    # XLA-phi path where the model's q'/k' are cast to the compute dtype
    dt = q_ref.dtype
    s = jax.lax.dot_general(
        phiq_ref[...].astype(dt), phik.astype(dt),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    wgt = s * t
    acc_ref[...] += jnp.dot(
        wgt.astype(v_ref.dtype), v_ref[0, 0],
        preferred_element_type=jnp.float32,
    )
    den_ref[...] += jnp.sum(wgt, axis=1, keepdims=True)

    @pl.when(jk == n_kv_tiles - 1)
    def _store():
        o_ref[0, 0] = (acc_ref[...] / (den_ref[...] + EPS)).astype(o_ref.dtype)
        d_ref[0, 0] = den_ref[...]


def _fused_phi_fwd_impl(q, k, v, omega, coeffs, *, feature_kind: str,
                        block_q, block_kv, interpret):
    B, H, N, D = q.shape
    F = omega.shape[-1]
    Dv = v.shape[-1]
    if block_q is None or block_kv is None:
        dq_, dkv_ = coeffs_default_blocks(N)
        block_q = block_q or dq_
        block_kv = block_kv or dkv_
    Nq = _round_up(N, block_q)
    Nkv = _round_up(N, block_kv)
    Dp = _round_up(D, LANES)
    Fp = _round_up(F, LANES)
    Dvp = _round_up(Dv, LANES)

    qp = _pad_axis(_pad_axis(q, 2, Nq), 3, Dp)
    kp = _pad_axis(_pad_axis(k, 2, Nkv), 3, Dp)
    vp = _pad_axis(_pad_axis(v, 2, Nkv), 3, Dvp)
    omp = _pad_axis(_pad_axis(omega.astype(jnp.float32), 1, Dp), 2, Fp)
    cbuf = _coeff_buffer(coeffs.astype(jnp.float32), N, Nq, Nkv)

    n_q = Nq // block_q
    n_kv = Nkv // block_kv
    out, den = pl.pallas_call(
        functools.partial(
            _fused_phi_fwd_kernel, n_kv_tiles=n_kv, block_q=block_q,
            block_kv=block_kv, nq=Nq, n=N, feature_kind=feature_kind,
            m_real=F, f_real=F,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Nq, Dvp), v.dtype),
            jax.ShapeDtypeStruct((B, H, Nq, 1), jnp.float32),
        ),
        grid=(B, H, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, Dp), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_kv, Dp), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_kv, Dvp), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, Dp, Fp), lambda b, h, i, j: (h, 0, 0)),
            pl.BlockSpec((1, 1, cbuf.shape[2]),
                         lambda b, h, i, j: (h, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, Dvp), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, j: (b, h, i, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, Fp), jnp.float32),
            pltpu.VMEM((block_q, Dvp), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ] if _HAVE_PLTPU else [],
        compiler_params=_dims(interpret),
        interpret=interpret,
    )(qp, kp, vp, omp, cbuf)
    return out[:, :, :N, :Dv], den[:, :, :N, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def kerple_attention_fused_phi(q, k, v, omega, coeffs,
                               feature_kind: str = "favor_plus",
                               block_q=None, block_kv=None,
                               interpret: bool = False):
    """KERPLE attention with the feature map fused into the forward kernel:

        out_i = sum_j c[j-i+N-1] (phi(q_i).phi(k_j)) v_j / (den_i + eps)

    computed from the RAW (already scaled/normalised) q/k — phi never
    materialises in HBM on the forward pass (SURVEY §7 step 8(b)).

    The backward recomputes phi(q)/phi(k) once in XLA and runs the
    production P1/P2/P3 coeffs kernels, then pulls dq'/dk' back through
    phi's VJP — identical gradient math to the unfused path.

    Args:
        q, k: [B, H, N, D] post L2-normalisation (KERPLE contract).
        v: [B, H, N, Dv].
        omega: [H, D, F] random feature matrix.
        coeffs: [H, 2N-1] positive Toeplitz coefficients.
        feature_kind: 'favor_plus' | 'relu'.
    Returns:
        [B, H, N, Dv].
    """
    out, _ = _fused_phi_fwd_impl(q, k, v, omega, coeffs,
                                 feature_kind=feature_kind,
                                 block_q=block_q, block_kv=block_kv,
                                 interpret=interpret)
    return out


def _phi_xla(x, omega, feature_kind: str):
    from ..feature_maps import phi_positive, phi_relu

    return (phi_relu if feature_kind == "relu" else phi_positive)(x, omega)


def _kafp_fwd(q, k, v, omega, coeffs, feature_kind, block_q, block_kv,
              interpret):
    out, den = _fused_phi_fwd_impl(q, k, v, omega, coeffs,
                                   feature_kind=feature_kind,
                                   block_q=block_q, block_kv=block_kv,
                                   interpret=interpret)
    return out, (q, k, v, omega, coeffs, den, out)


def _kafp_bwd(feature_kind, block_q, block_kv, interpret, residuals, g):
    q, k, v, omega, coeffs, den, out = residuals
    q_prime, vjp_q = jax.vjp(lambda x: _phi_xla(x, omega, feature_kind), q)
    k_prime, vjp_k = jax.vjp(lambda x: _phi_xla(x, omega, feature_kind), k)
    dqp, dkp, dv, dcoeffs = _bwd_impl(
        q_prime, k_prime, v, coeffs, den, out, g,
        block_q=block_q, block_kv=block_kv, interpret=interpret)
    (dq,) = vjp_q(dqp.astype(q_prime.dtype))
    (dk,) = vjp_k(dkp.astype(k_prime.dtype))
    # omega is a non-trainable buffer in the model ('constants'), but the
    # VJP must still be complete: d(x@omega) flows to omega too
    _, vjp_om_q = jax.vjp(lambda om: _phi_xla(q, om, feature_kind), omega)
    _, vjp_om_k = jax.vjp(lambda om: _phi_xla(k, om, feature_kind), omega)
    dom = vjp_om_q(dqp.astype(q_prime.dtype))[0] + \
        vjp_om_k(dkp.astype(k_prime.dtype))[0]
    return dq, dk, dv, dom, dcoeffs


kerple_attention_fused_phi.defvjp(_kafp_fwd, _kafp_bwd)


# ─── public op ───────────────────────────────────────────────────────────

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def masked_linear_attention_coeffs(q_prime, k_prime, v, coeffs,
                                   block_q=None, block_kv=None,
                                   interpret: bool = False):
    """KERPLE attention straight from the coefficient vector:

        out_i = sum_j c[j-i+N-1] (phi(q_i).phi(k_j)) v_j
              / (sum_j c[j-i+N-1] (phi(q_i).phi(k_j)) + eps)

    Args:
        q_prime, k_prime: [B, H, N, F] non-negative features.
        v: [B, H, N, D].
        coeffs: [H, 2N-1] positive Toeplitz coefficients exp(rel_pos_bias)
            (reference: kerple.py:157-159).
        block_q, block_kv: tile sizes (multiples of 128); None picks
            masked_linear_default_blocks(N).
    Returns:
        [B, H, N, D]. Differentiable in q', k', v AND coeffs — the VJP
        runs the fused P1/P2/P3 kernels; no [H, N, N] tensor exists in
        either direction.
    """
    out, _ = _fwd_impl(q_prime, k_prime, v, coeffs,
                       block_q=block_q, block_kv=block_kv,
                       interpret=interpret)
    return out


def _mlc_fwd(q_prime, k_prime, v, coeffs, block_q, block_kv, interpret):
    out, den = _fwd_impl(q_prime, k_prime, v, coeffs,
                         block_q=block_q, block_kv=block_kv,
                         interpret=interpret)
    return out, (q_prime, k_prime, v, coeffs, den, out)


def _mlc_bwd(block_q, block_kv, interpret, residuals, g):
    q_prime, k_prime, v, coeffs, den, out = residuals
    return _bwd_impl(q_prime, k_prime, v, coeffs, den, out, g,
                     block_q=block_q, block_kv=block_kv,
                     interpret=interpret)


masked_linear_attention_coeffs.defvjp(_mlc_fwd, _mlc_bwd)
