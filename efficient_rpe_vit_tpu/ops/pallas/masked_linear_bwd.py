"""Fused backward kernels for Toeplitz-masked linear attention.

Forward (see attention_kernels.py):
    A = phi(q) phi(k)^T ;  W = A * T ;  num = W v ;  den = W 1
    out = num / (den + eps)

Backward, with residuals (q', k', v, T, den, out) and cotangent g:
    gn_i  = g_i / den_i                       [B,H,N,D]   (precomputed)
    s_i   = (g_i . out_i) / den_i             [B,H,N]     (precomputed)
    dW_ij = gn_i . v_j - s_i
    dA_ij = dW_ij * T_ij        dT_ij = sum_b dW_ij * A_ij
    dq'_i = sum_j dA_ij k'_j    dk'_j = sum_i dA_ij q'_i
    dv_j  = sum_i (A_ij T_ij) gn_i

Three kernels, one per reduction direction (the flash-backward dkv/dq
split, §7 of the attention guide):
    P1: dq'  — grid (B, H, Iq, Jk), accumulate over Jk.
    P2: dk', dv — grid (B, H, Jk, Iq), accumulate over Iq.
    P3: dT   — grid (H, Iq, Jk, B), accumulate over batch (innermost).

Every [N, N] quantity (A, W, dW, dA) lives only as a VMEM tile; nothing
quadratic in N touches HBM — the jnp recompute-VJP this replaces
materialised several [B,H,N,N] fp32 tensors per step.
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


def _dims(interpret):
    if _HAVE_PLTPU and not interpret:
        return pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        )
    return None


# ─── P1: dq' ────────────────────────────────────────────────────────────

def _dq_kernel(gn_ref, s_ref, v_ref, k_ref, t_ref, dq_ref, acc_ref,
               *, n_kv_tiles: int):
    jk = pl.program_id(3)

    @pl.when(jk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    gn = gn_ref[0, 0]          # [bq, D]
    v = v_ref[0, 0]            # [bk, D]
    m = jax.lax.dot_general(   # gn @ v^T : [bq, bk]
        gn, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dA = (m - s_ref[0, 0]) * t_ref[0]  # s: [bq, 1] broadcasts over columns
    # second-stage matmul at the input dtype (fp32 accumulate): no-op for
    # fp32 inputs, double MXU rate for bf16
    acc_ref[...] += jnp.dot(
        dA.astype(k_ref.dtype), k_ref[0, 0],
        preferred_element_type=jnp.float32,
    )  # [bq, F]

    @pl.when(jk == n_kv_tiles - 1)
    def _store():
        dq_ref[0, 0] = acc_ref[...].astype(dq_ref.dtype)


# ─── P2: dk', dv ────────────────────────────────────────────────────────

def _dkv_kernel(gn_ref, s_ref, v_ref, q_ref, k_ref, t_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *, n_q_tiles: int):
    iq = pl.program_id(3)

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    gn = gn_ref[0, 0]          # [bq, D]
    v = v_ref[0, 0]            # [bk, D]
    q = q_ref[0, 0]            # [bq, F]
    k = k_ref[0, 0]            # [bk, F]
    t_T = t_ref[0].T           # [bk, bq] (T tile loaded as [bq, bk])

    # dA^T = ((gn v^T - s) * T)^T = (v gn^T - s^T) * T^T : [bk, bq]
    m_T = jax.lax.dot_general(
        v, gn, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s_row = s_ref[0, 0].reshape(1, -1)  # [1, bq] broadcast over rows
    dA_T = (m_T - s_row) * t_T
    # input-dtype matmuls, fp32 accumulate (see _dq_kernel's note)
    dk_acc[...] += jnp.dot(dA_T.astype(q.dtype), q,
                           preferred_element_type=jnp.float32)

    # W^T = (k q^T) * T^T ; dv += W^T gn : [bk, D]
    A_T = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dv_acc[...] += jnp.dot(
        (A_T * t_T).astype(gn.dtype), gn, preferred_element_type=jnp.float32
    )

    @pl.when(iq == n_q_tiles - 1)
    def _store():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


# ─── P3: dT ─────────────────────────────────────────────────────────────

def _dt_kernel(gn_ref, s_ref, v_ref, q_ref, k_ref, dt_ref, acc_ref,
               *, n_batch: int):
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
    acc_ref[...] += (m - s_ref[0, 0]) * A

    @pl.when(b == n_batch - 1)
    def _store():
        dt_ref[0] = acc_ref[...].astype(dt_ref.dtype)


# ─── launcher ───────────────────────────────────────────────────────────

def masked_linear_bwd(q_prime, k_prime, v, T, den, out, g, *,
                      block_q=None, block_kv=None,
                      interpret: bool = False):
    """Fused VJP for fused_masked_linear_attention.

    Args:
        q_prime, k_prime: [B, H, N, F]; v: [B, H, N, D]; T: [H, N, N].
        den: [B, H, N] forward row-normaliser (+eps applied by caller's
            convention: this receives den WITHOUT eps; eps is added here).
        out: [B, H, N, D] forward output.
        g: [B, H, N, D] cotangent.
        block_q, block_kv: tile sizes; None picks
            masked_linear_default_blocks(N).
    Returns:
        (dq_prime, dk_prime, dv, dT).
    """
    from .attention_kernels import (
        EPS, LANES, _pad_axis, _round_up, masked_linear_default_blocks,
    )

    B, H, N, F = q_prime.shape
    D = v.shape[-1]
    if block_q is None or block_kv is None:
        dq_, dkv_ = masked_linear_default_blocks(N)
        block_q = block_q or dq_
        block_kv = block_kv or dkv_
    # Q and KV axes pad independently to their own block (see the flash
    # kernel). Padded Q rows: g rows are zero -> gn = 0, s = 0 -> dA = 0,
    # so they contribute nothing to dk'/dv/dT; padded KV rows: phi(k)/v
    # rows are zero and the padded T columns are zero, so dq'/dT get exact
    # zero contributions. Padded dq'/dk'/dv rows and dT rows/cols are
    # sliced away below.
    Nq = _round_up(N, block_q)
    Nkv = _round_up(N, block_kv)
    Fp = _round_up(F, LANES)
    Dp = _round_up(D, LANES)

    # gn at the cotangent dtype: den is fp32 so the quotient upcasts, and
    # an fp32 gn would drag every gn-operand matmul in P1/P2/P3 down to
    # fp32 MXU rate; s stays fp32 (a [B,H,N] elementwise operand, not a
    # matmul input)
    gn = (g / (den[..., None] + EPS)).astype(g.dtype)
    s = jnp.sum(g * out, axis=-1) / (den + EPS)  # [B, H, N]

    qp = _pad_axis(_pad_axis(q_prime, 2, Nq), 3, Fp)
    kp = _pad_axis(_pad_axis(k_prime, 2, Nkv), 3, Fp)
    vp = _pad_axis(_pad_axis(v, 2, Nkv), 3, Dp)
    gnp = _pad_axis(_pad_axis(gn, 2, Nq), 3, Dp)
    sp = _pad_axis(s, 2, Nq)[..., None]  # [B, H, Nq, 1]
    Tp = _pad_axis(_pad_axis(T, 1, Nq), 2, Nkv)

    n_q = Nq // block_q
    n_kv = Nkv // block_kv
    scr = (lambda *a: pltpu.VMEM(*a)) if _HAVE_PLTPU else None

    # P1: dq'
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, n_kv_tiles=n_kv),
        out_shape=jax.ShapeDtypeStruct((B, H, Nq, Fp), q_prime.dtype),
        grid=(B, H, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, Dp), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_kv, Dp), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_kv, Fp), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, block_q, block_kv), lambda b, h, i, j: (h, i, j)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, Fp),
                               lambda b, h, i, j: (b, h, i, 0)),
        scratch_shapes=[scr((block_q, Fp), jnp.float32)] if scr else [],
        compiler_params=_dims(interpret),
        interpret=interpret,
    )(gnp, sp, vp, kp, Tp)

    # P2: dk', dv
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, n_q_tiles=n_q),
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
            pl.BlockSpec((1, block_q, block_kv), lambda b, h, j, i: (h, i, j)),
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
    )(gnp, sp, vp, qp, kp, Tp)

    # P3: dT (batch innermost, accumulated into the same [bq, bk] block)
    dT = pl.pallas_call(
        functools.partial(_dt_kernel, n_batch=B),
        out_shape=jax.ShapeDtypeStruct((H, Nq, Nkv), T.dtype),
        grid=(H, n_q, n_kv, B),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, Dp), lambda h, i, j, b: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda h, i, j, b: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_kv, Dp), lambda h, i, j, b: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_q, Fp), lambda h, i, j, b: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_kv, Fp), lambda h, i, j, b: (b, h, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, block_kv),
                               lambda h, i, j, b: (h, i, j)),
        scratch_shapes=[scr((block_q, block_kv), jnp.float32)] if scr else [],
        compiler_params=_dims(interpret),
        interpret=interpret,
    )(gnp, sp, vp, qp, kp)

    return (
        dq[:, :, :N, :F],
        dk[:, :, :N, :F],
        dv[:, :, :N, :D],
        dT[:, :N, :N],
    )
