"""Tiled backward kernels for flash softmax attention.

Forward (see attention_kernels.py): S = scale * q k^T ; P = softmax(S) ;
O = P V, computed with an online max/normaliser so the [N, N] scores never
leave VMEM. The forward saves per-row log-sum-exp lse_i = m_i + log(l_i),
from which any P tile rebuilds as exp(scale * q_i.k_j - lse_i) without
re-running the recurrence.

Backward, with residuals (q, k, v, out, lse) and cotangent g
(the standard flash-attention VJP, e.g. Dao 2022 §B):

    delta_i = g_i . out_i                       [B,H,N]   (precomputed)
    P_ij    = exp(scale * q_i.k_j - lse_i)
    dP_ij   = g_i . v_j
    dS_ij   = P_ij * (dP_ij - delta_i)
    dq_i    = scale * sum_j dS_ij k_j
    dk_j    = scale * sum_i dS_ij q_i
    dv_j    = sum_i P_ij g_i

Two kernels, one per reduction direction (the dq/dkv split used by
masked_linear_bwd.py): P1 accumulates dq over KV tiles, P2 accumulates
(dk, dv) over Q tiles. Every [N, N] quantity (P, dP, dS) lives only as a
VMEM tile.

Padding: padded KV columns are re-masked to MASK_VALUE in P1 exactly as the
forward did, making their P (hence dq contribution) exactly zero. Padded Q
rows need no masking anywhere — their g rows are zero-padded, so delta = 0,
dP = 0, dS = 0 and they contribute nothing to dk/dv; their own dq rows are
sliced away.
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


# ─── P1: dq ─────────────────────────────────────────────────────────────

def _flash_dq_kernel(*refs, scale: float, n_kv_tiles: int, block_q: int,
                     block_kv: int, seq_len: int, has_mask: bool,
                     dropout_rate: float):
    it = iter(refs)
    q_ref, k_ref, v_ref, g_ref = next(it), next(it), next(it), next(it)
    lse_ref, delta_ref = next(it), next(it)
    mask_ref = next(it) if has_mask else None
    seed_ref = next(it) if dropout_rate > 0 else None
    dq_ref, acc_ref = next(it), next(it)

    jk = pl.program_id(3)

    @pl.when(jk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]            # [bq, D]
    k = k_ref[0, 0]            # [bk, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                  # [bq, bk]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + jk * block_kv
    s = jnp.where(col < seq_len, s, -jnp.inf)
    if has_mask:
        # -inf (not MASK_VALUE) here: p = exp(-inf - lse) is exactly 0 for
        # any finite-or-MASK_VALUE lse, killing masked cells' gradients
        s = jnp.where(mask_ref[0, 0] == 0, -jnp.inf, s)
    p = jnp.exp(s - lse_ref[0, 0])          # lse: [bq, 1]

    dp = jax.lax.dot_general(               # g @ v^T : [bq, bk]
        g_ref[0, 0], v_ref[0, 0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if dropout_rate > 0:
        from .attention_kernels import dropout_keep

        b, h, iq = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        rows = (jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
                + iq * block_q)
        keep = dropout_keep(seed_ref[0, 0], b, h, rows, col, dropout_rate)
        # dP = (g v^T) ⊙ M / keep_prob; the delta_i = g.out rowsum identity
        # survives dropout (out itself is the dropped sum)
        dp = jnp.where(keep, dp * (1.0 / (1.0 - dropout_rate)), 0.0)
    ds = p * (dp - delta_ref[0, 0])         # delta: [bq, 1]
    acc_ref[...] += jnp.dot(ds, k.astype(jnp.float32),
                            preferred_element_type=jnp.float32)

    @pl.when(jk == n_kv_tiles - 1)
    def _store():
        dq_ref[0, 0] = (acc_ref[...] * scale).astype(dq_ref.dtype)


# ─── P2: dk, dv ─────────────────────────────────────────────────────────

def _flash_dkv_kernel(*refs, scale: float, n_q_tiles: int, block_q: int,
                      block_kv: int, has_mask: bool, dropout_rate: float):
    it = iter(refs)
    q_ref, k_ref, v_ref, g_ref = next(it), next(it), next(it), next(it)
    lse_ref, delta_ref = next(it), next(it)
    mask_ref = next(it) if has_mask else None
    seed_ref = next(it) if dropout_rate > 0 else None
    dk_ref, dv_ref = next(it), next(it)
    dk_acc, dv_acc = next(it), next(it)

    iq = pl.program_id(3)

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0, 0]            # [bq, D]
    k = k_ref[0, 0]            # [bk, D]
    g = g_ref[0, 0]            # [bq, D]
    s_T = jax.lax.dot_general(  # k @ q^T : [bk, bq]
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if has_mask:
        s_T = jnp.where(mask_ref[0, 0].T == 0, -jnp.inf, s_T)
    lse_row = lse_ref[0, 0].reshape(1, -1)      # [1, bq]
    p_T = jnp.exp(s_T - lse_row)

    if dropout_rate > 0:
        from .attention_kernels import dropout_keep

        b, h, jk = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        # transposed tile: dim 0 is the kv index, dim 1 the q index
        rows = (jax.lax.broadcasted_iota(jnp.int32, s_T.shape, 1)
                + iq * block_q)
        cols = (jax.lax.broadcasted_iota(jnp.int32, s_T.shape, 0)
                + jk * block_kv)
        keep_T = dropout_keep(seed_ref[0, 0], b, h, rows, cols, dropout_rate)
        inv_keep = 1.0 / (1.0 - dropout_rate)
        p_T_eff = jnp.where(keep_T, p_T * inv_keep, 0.0)
    else:
        keep_T, inv_keep, p_T_eff = None, 1.0, p_T

    # dv_j = sum_i M_ij P_ij g_i / keep_prob — the dropped probabilities
    dv_acc[...] += jnp.dot(p_T_eff, g.astype(jnp.float32),
                           preferred_element_type=jnp.float32)

    dp_T = jax.lax.dot_general(  # v @ g^T : [bk, bq]
        v_ref[0, 0], g, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if dropout_rate > 0:
        dp_T = jnp.where(keep_T, dp_T * inv_keep, 0.0)
    delta_row = delta_ref[0, 0].reshape(1, -1)  # [1, bq]
    # dS uses the UNdropped P (softmax VJP) with the dropped dP
    ds_T = p_T * (dp_T - delta_row)
    dk_acc[...] += jnp.dot(ds_T, q.astype(jnp.float32),
                           preferred_element_type=jnp.float32)

    @pl.when(iq == n_q_tiles - 1)
    def _store():
        dk_ref[0, 0] = (dk_acc[...] * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


# ─── launcher ───────────────────────────────────────────────────────────

def flash_attention_bwd(q, k, v, out, lse, g, *, scale: float,
                        block_q=None, block_kv=None,
                        interpret: bool = False, mask=None,
                        dropout_rate: float = 0.0, dropout_seed=None):
    """Tiled VJP for flash_softmax_attention.

    Args:
        q, k, v: [B, H, N, D] forward inputs.
        out: [B, H, N, D] forward output.
        lse: [B, H, N] forward row log-sum-exp (fp32).
        g: [B, H, N, D] cotangent.
        block_q, block_kv: tile sizes; None picks flash_default_blocks(N).
        mask: optional [B, N, N] / [B, 1|H, N, N]; zeros masked out — must
            match the forward's mask.
        dropout_rate, dropout_seed: the forward's dropout parameters; the
            per-cell keep masks rebuild from the same coordinate hash.
    Returns:
        (dq, dk, dv).
    """
    from .attention_kernels import (
        LANES, _pad_axis, _round_up, _seed_operand, canonical_mask,
        flash_default_blocks,
    )

    B, H, N, D = q.shape
    if block_q is None or block_kv is None:
        dq_, dkv_ = flash_default_blocks(N)
        block_q = block_q or dq_
        block_kv = block_kv or dkv_
    # Q and KV axes pad independently to their own block (see the forward).
    # Padded Q rows carry zero g (hence zero delta/dP/dS) and contribute
    # nothing to dk/dv; padded KV columns are re-masked in the dq kernel.
    Nq = _round_up(N, block_q)
    Nkv = _round_up(N, block_kv)
    Dp = _round_up(D, LANES)

    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)

    qp = _pad_axis(_pad_axis(q, 2, Nq), 3, Dp)
    kp = _pad_axis(_pad_axis(k, 2, Nkv), 3, Dp)
    vp = _pad_axis(_pad_axis(v, 2, Nkv), 3, Dp)
    gp = _pad_axis(_pad_axis(g, 2, Nq), 3, Dp)
    lsep = _pad_axis(lse, 2, Nq)[..., None]      # [B, H, Nq, 1]
    deltap = _pad_axis(delta, 2, Nq)[..., None]  # [B, H, Nq, 1]

    n_q = Nq // block_q
    n_kv = Nkv // block_kv
    scr = (lambda *a: pltpu.VMEM(*a)) if _HAVE_PLTPU else None

    has_mask = mask is not None
    extra_operands = []
    # mask block spec factories for the two grid layouts; the tile is
    # always loaded [bq, bk] (the dkv kernel transposes in-register)
    if has_mask:
        maskc, Hm = canonical_mask(mask, B, H)
        maskp = _pad_axis(_pad_axis(maskc, 2, Nq), 3, Nkv)
        extra_operands.append(maskp)

        def mask_spec_dq():
            if Hm == 1:
                return pl.BlockSpec((1, 1, block_q, block_kv),
                                    lambda b, h, i, j: (b, 0, i, j))
            return pl.BlockSpec((1, 1, block_q, block_kv),
                                lambda b, h, i, j: (b, h, i, j))

        def mask_spec_dkv():
            if Hm == 1:
                return pl.BlockSpec((1, 1, block_q, block_kv),
                                    lambda b, h, j, i: (b, 0, i, j))
            return pl.BlockSpec((1, 1, block_q, block_kv),
                                lambda b, h, j, i: (b, h, i, j))
    if dropout_rate > 0:
        extra_operands.append(_seed_operand(dropout_seed))
        seed_spec = pl.BlockSpec((1, 1), lambda b, h, x, y: (0, 0))

    # P1: dq — accumulate over KV tiles.
    dq_specs = [
        pl.BlockSpec((1, 1, block_q, Dp), lambda b, h, i, j: (b, h, i, 0)),
        pl.BlockSpec((1, 1, block_kv, Dp), lambda b, h, i, j: (b, h, j, 0)),
        pl.BlockSpec((1, 1, block_kv, Dp), lambda b, h, i, j: (b, h, j, 0)),
        pl.BlockSpec((1, 1, block_q, Dp), lambda b, h, i, j: (b, h, i, 0)),
        pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, j: (b, h, i, 0)),
        pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, j: (b, h, i, 0)),
    ]
    if has_mask:
        dq_specs.append(mask_spec_dq())
    if dropout_rate > 0:
        dq_specs.append(seed_spec)
    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, scale=scale, n_kv_tiles=n_kv,
                          block_q=block_q, block_kv=block_kv, seq_len=N,
                          has_mask=has_mask, dropout_rate=dropout_rate),
        out_shape=jax.ShapeDtypeStruct((B, H, Nq, Dp), q.dtype),
        grid=(B, H, n_q, n_kv),
        in_specs=dq_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, Dp),
                               lambda b, h, i, j: (b, h, i, 0)),
        scratch_shapes=[scr((block_q, Dp), jnp.float32)] if scr else [],
        compiler_params=_dims(interpret),
        interpret=interpret,
    )(qp, kp, vp, gp, lsep, deltap, *extra_operands)

    # P2: dk, dv — accumulate over Q tiles.
    dkv_specs = [
        pl.BlockSpec((1, 1, block_q, Dp), lambda b, h, j, i: (b, h, i, 0)),
        pl.BlockSpec((1, 1, block_kv, Dp), lambda b, h, j, i: (b, h, j, 0)),
        pl.BlockSpec((1, 1, block_kv, Dp), lambda b, h, j, i: (b, h, j, 0)),
        pl.BlockSpec((1, 1, block_q, Dp), lambda b, h, j, i: (b, h, i, 0)),
        pl.BlockSpec((1, 1, block_q, 1), lambda b, h, j, i: (b, h, i, 0)),
        pl.BlockSpec((1, 1, block_q, 1), lambda b, h, j, i: (b, h, i, 0)),
    ]
    if has_mask:
        dkv_specs.append(mask_spec_dkv())
    if dropout_rate > 0:
        dkv_specs.append(seed_spec)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkv_kernel, scale=scale, n_q_tiles=n_q,
                          block_q=block_q, block_kv=block_kv,
                          has_mask=has_mask, dropout_rate=dropout_rate),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Nkv, Dp), k.dtype),
            jax.ShapeDtypeStruct((B, H, Nkv, Dp), v.dtype),
        ),
        grid=(B, H, n_kv, n_q),
        in_specs=dkv_specs,
        out_specs=(
            pl.BlockSpec((1, 1, block_kv, Dp), lambda b, h, j, i: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_kv, Dp), lambda b, h, j, i: (b, h, j, 0)),
        ),
        scratch_shapes=[
            scr((block_kv, Dp), jnp.float32),
            scr((block_kv, Dp), jnp.float32),
        ] if scr else [],
        compiler_params=_dims(interpret),
        interpret=interpret,
    )(qp, kp, vp, gp, lsep, deltap, *extra_operands)

    return dq[:, :, :N, :D], dk[:, :, :N, :D], dv[:, :, :N, :D]
