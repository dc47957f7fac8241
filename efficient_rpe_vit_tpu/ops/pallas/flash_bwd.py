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

Two strategies share the formulas:

  * Fused single pass (default where the dq scratch fits VMEM): one grid
    (B, H, KV-tiles, Q-tiles) computes S and dP once per tile pair and
    produces all three gradients — 5 MXU ops per tile pair (S, dP, dv,
    dq, dk) and one load of q/k/v/g. dk/dv accumulate in per-tile scratch
    over the inner Q axis; dq accumulates into a full-row [Nq, D] fp32
    scratch (block_q-aligned dynamic-slice updates) flushed once per
    (b, h) — 2.4 MB at N=4K, the reason this path is VMEM-gated.
  * dq/dkv two-pass split (fallback, any N): P1 accumulates dq over KV
    tiles, P2 accumulates (dk, dv) over Q tiles. Each pass rebuilds S
    (and dP), totalling 7 MXU ops per tile pair and two loads of
    q/k/v/g — ~1.3x slower measured, but per-tile VMEM only.

Every [N, N] quantity (P, dP, dS) lives only as a VMEM tile in both.

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
    # second-stage matmuls run at the INPUT dtype (fp32 accumulate): a
    # no-op for fp32 inputs, double MXU rate for bf16 — the standard
    # flash-attention dS/P cast (dS is O(p), already bf16-noise-dominated
    # by the bf16 q/k/v/g operands feeding it)
    acc_ref[...] += jnp.dot(ds.astype(k.dtype), k,
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
    # (input-dtype matmul, fp32 accumulate: see the dq kernel's note)
    dv_acc[...] += jnp.dot(p_T_eff.astype(g.dtype), g,
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
    dk_acc[...] += jnp.dot(ds_T.astype(q.dtype), q,
                           preferred_element_type=jnp.float32)

    @pl.when(iq == n_q_tiles - 1)
    def _store():
        dk_ref[0, 0] = (dk_acc[...] * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


# ─── fused single-pass kernel ───────────────────────────────────────────

def _flash_bwd_fused_kernel(*refs, scale: float, n_q_tiles: int,
                            n_kv_tiles: int, block_q: int, block_kv: int,
                            seq_len: int, has_mask: bool,
                            dropout_rate: float):
    """One (b, h, jk, iq) cell: S and dP built once, all three grads fed.

    Grid order (KV outer, Q inner): dk/dv for KV tile jk accumulate in
    per-tile scratch across the inner Q sweep and store at iq == n_q-1;
    dq contributions land in a full-row [Nq, D] fp32 scratch at offset
    iq*block_q and flush once per (b, h) at the final cell. Both reduction
    axes are declared "arbitrary" so Mosaic keeps the sweep sequential.
    """
    it = iter(refs)
    q_ref, k_ref, v_ref, g_ref = next(it), next(it), next(it), next(it)
    lse_ref, delta_ref = next(it), next(it)
    mask_ref = next(it) if has_mask else None
    seed_ref = next(it) if dropout_rate > 0 else None
    dq_ref, dk_ref, dv_ref = next(it), next(it), next(it)
    dq_scr, dk_acc, dv_acc = next(it), next(it), next(it)

    jk = pl.program_id(2)
    iq = pl.program_id(3)

    @pl.when(jnp.logical_and(jk == 0, iq == 0))
    def _init_dq():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    @pl.when(iq == 0)
    def _init_kv():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0, 0]            # [bq, D]
    k = k_ref[0, 0]            # [bk, D]
    g = g_ref[0, 0]            # [bq, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                  # [bq, bk]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + jk * block_kv
    # -inf exactly as the dq kernel: p = exp(-inf - lse) == 0 kills padded
    # KV columns' and masked cells' gradients for any finite/MASK_VALUE lse
    s = jnp.where(col < seq_len, s, -jnp.inf)
    if has_mask:
        s = jnp.where(mask_ref[0, 0] == 0, -jnp.inf, s)
    p = jnp.exp(s - lse_ref[0, 0])          # lse: [bq, 1]

    dp = jax.lax.dot_general(               # g @ v^T : [bq, bk]
        g, v_ref[0, 0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if dropout_rate > 0:
        from .attention_kernels import dropout_keep

        b, h = pl.program_id(0), pl.program_id(1)
        rows = (jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
                + iq * block_q)
        keep = dropout_keep(seed_ref[0, 0], b, h, rows, col, dropout_rate)
        inv_keep = 1.0 / (1.0 - dropout_rate)
        # dv sums the DROPPED probabilities; dS pairs the UNdropped P
        # (softmax VJP) with the dropped dP — same split as the two-pass
        p_eff = jnp.where(keep, p * inv_keep, 0.0)
        dp = jnp.where(keep, dp * inv_keep, 0.0)
    else:
        p_eff = p

    # dv_j += P^T g : contract the shared q-rows axis -> [bk, D]
    # (input-dtype matmuls, fp32 accumulate: see the dq kernel's note)
    dv_acc[...] += jax.lax.dot_general(
        p_eff.astype(g.dtype), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - delta_ref[0, 0])).astype(q.dtype)  # delta: [bq, 1]
    # dk_j += dS^T q
    dk_acc[...] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dq_i += dS k, into the full-row scratch at this Q tile's offset
    row0 = iq * block_q
    dq_scr[pl.ds(row0, block_q), :] += jnp.dot(
        ds, k, preferred_element_type=jnp.float32)

    @pl.when(iq == n_q_tiles - 1)
    def _store_kv():
        dk_ref[0, 0] = (dk_acc[...] * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)

    @pl.when(jnp.logical_and(jk == n_kv_tiles - 1, iq == n_q_tiles - 1))
    def _store_dq():
        dq_ref[0, 0] = (dq_scr[...] * scale).astype(dq_ref.dtype)


# The fused path holds dq for ALL Q rows of one (b, h) in fp32 VMEM
# ([Nq, 128] after lane padding). Budget chosen well under the ~16 MB/core
# VMEM so tiles + double buffers + Mosaic temporaries still fit: 4 MB
# covers N up to ~8K at D<=128; past it the two-pass split takes over.
FUSED_DQ_VMEM_BUDGET = 4 * 1024 * 1024


def flash_bwd_default_blocks(n: int):
    """Backward-specific (block_q, block_kv) policy.

    The backward's five-matmul tile body prefers a smaller KV block than
    the forward's two-matmul one (more VMEM pressure per tile, more
    accumulator traffic): measured at B=4 H=12 N=4097 D=64 bf16 (fused,
    chained x10) — (512,768) 9.29 ms / 55.5 TFLOP/s vs (512,1024)
    10.10 / 51.1 and (512,512) 9.81; the split backward orders the same
    way (12.55 vs 13.62 / 13.02). Forward keeps flash_default_blocks."""
    from .attention_kernels import LANES, _round_up

    np128 = _round_up(max(n, 1), LANES)
    return min(512, np128), min(768, np128)


def _fused_eligible(Nq: int, Dp: int) -> bool:
    return Nq * Dp * 4 <= FUSED_DQ_VMEM_BUDGET


# ─── launcher ───────────────────────────────────────────────────────────

def flash_attention_bwd(q, k, v, out, lse, g, *, scale: float,
                        block_q=None, block_kv=None,
                        interpret: bool = False, mask=None,
                        dropout_rate: float = 0.0, dropout_seed=None,
                        fused=None):
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
        fused: True forces the fused single-pass kernel, False the
            dq/dkv two-pass split, None (default) picks fused while its
            full-row dq scratch fits `FUSED_DQ_VMEM_BUDGET`.
    Returns:
        (dq, dk, dv).
    """
    from .attention_kernels import (
        LANES, _pad_axis, _round_up, _seed_operand, canonical_mask,
    )

    B, H, N, D = q.shape
    if block_q is None or block_kv is None:
        dq_, dkv_ = flash_bwd_default_blocks(N)
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

    if fused is None:
        fused = _fused_eligible(Nq, Dp)
    if fused:
        # Fused single pass: grid (B, H, KV-tiles, Q-tiles), everything in
        # [bq, bk] orientation (the mask tile layout matches mask_spec_dkv).
        fused_specs = [
            pl.BlockSpec((1, 1, block_q, Dp), lambda b, h, j, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_kv, Dp), lambda b, h, j, i: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_kv, Dp), lambda b, h, j, i: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_q, Dp), lambda b, h, j, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, j, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, j, i: (b, h, i, 0)),
        ]
        if has_mask:
            fused_specs.append(mask_spec_dkv())
        if dropout_rate > 0:
            fused_specs.append(seed_spec)
        dims = None
        if _HAVE_PLTPU and not interpret:
            dims = pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary",
                                     "arbitrary"),
            )
        dq, dk, dv = pl.pallas_call(
            functools.partial(
                _flash_bwd_fused_kernel, scale=scale, n_q_tiles=n_q,
                n_kv_tiles=n_kv, block_q=block_q, block_kv=block_kv,
                seq_len=N, has_mask=has_mask, dropout_rate=dropout_rate),
            out_shape=(
                jax.ShapeDtypeStruct((B, H, Nq, Dp), q.dtype),
                jax.ShapeDtypeStruct((B, H, Nkv, Dp), k.dtype),
                jax.ShapeDtypeStruct((B, H, Nkv, Dp), v.dtype),
            ),
            grid=(B, H, n_kv, n_q),
            in_specs=fused_specs,
            out_specs=(
                pl.BlockSpec((1, 1, Nq, Dp), lambda b, h, j, i: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, block_kv, Dp),
                             lambda b, h, j, i: (b, h, j, 0)),
                pl.BlockSpec((1, 1, block_kv, Dp),
                             lambda b, h, j, i: (b, h, j, 0)),
            ),
            scratch_shapes=[
                scr((Nq, Dp), jnp.float32),
                scr((block_kv, Dp), jnp.float32),
                scr((block_kv, Dp), jnp.float32),
            ] if scr else [],
            compiler_params=dims,
            interpret=interpret,
        )(qp, kp, vp, gp, lsep, deltap, *extra_operands)
        return dq[:, :, :N, :D], dk[:, :, :N, :D], dv[:, :, :N, :D]

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
