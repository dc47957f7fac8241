"""Attention compute cores — pure functions on [B, H, N, D] arrays.

Three mechanisms, matching the reference's math exactly:
  * softmax O(N^2)   (reference: models/attention/softmax.py:100-115),
  * linear  O(N)     two-einsum kernelised attention
                     (reference: favor_plus.py:247-260 / relu.py:245-258),
  * KERPLE  O(N log N) linear attention with a Toeplitz relative-position
                     bias inside the kernelised sum
                     (reference: favor_plus.py:221-244 + rpe/kerple.py:99-344).

TPU-first KERPLE design. The reference materialises the outer-product tensor
A1 in [B, H, N, F, D] before the FFT (kerple.py:252-256) — the #1 memory
hazard flagged in SURVEY.md §7. We use the algebraic identity

    num[i]  = sum_f q'[i,f] * (T @ (k' ⊗ v))[i,f,:]
            = sum_j T[i,j] * (q' k'^T)[i,j] * v[j]        (exactly equal)
    den[i]  = sum_j T[i,j] * (q' k'^T)[i,j]

so for moderate N the whole thing is two MXU matmuls plus an elementwise
Toeplitz mask — no [B,H,N,F,D] tensor, no FFT, no complex numbers. For long
sequences (N >= DENSE_CROSSOVER) we keep the O(N log N) FFT path but stream
it per head-dim block so peak memory is [B, H, N, F, block] instead of
[B, H, N, F, D].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .fft_toeplitz import toeplitz_from_coeffs, toeplitz_matmul_fft

EPS = 1e-6  # denominator stabiliser (reference: favor_plus.py:260)

# KERPLE dense-vs-FFT dispatch. Round-2 value-fetch A/B on a real v5e
# (experiments/crossover_ab.py, B=8 H=2 F=44 D=16 bf16, chained, median of
# 3 — full table in docs/BENCHMARKING.md): the dense masked-matmul path
# wins at EVERY measured N, both directions, by growing margins:
#   N=197:  fwd 1.78 vs 2.27 ms,   grad 0.94 vs 3.76 ms
#   N=1024: fwd 2.92 vs 25.2 ms,   grad 3.02 vs 47.9 ms
#   N=4096: fwd 48.5 vs 405 ms,    grad 51.7 vs 763 ms   (dense vs fft)
# O(N^2)-on-MXU beats O(N log N)-in-XLA-FFT throughout the practical
# range; the FFT path's complex twiddle work and [B,H,N,F*block]
# intermediates never pay for themselves. The crossover is therefore
# MEMORY-bound, not time-bound: switch to FFT only where the dense path's
# [B,H,N,N] fp32 tensors would strain HBM. The residual backward holds ~5
# such tensors live (A, M, dW, dA, A*T), so the guard is on total bytes —
# a function of B and H as well as N (review finding: an N-only threshold
# OOMs at training batches, e.g. B=256 H=2 N=1024 is ~8.6 GB per tensor).
KERPLE_DENSE_CROSSOVER_N = 8192           # hard N cap for the dense path
KERPLE_DENSE_MEMORY_BUDGET = 8 * 1024**3  # ~half of v5e HBM for the 5 temps
# Pallas masked-linear kernel: below the byte budget the dense path keeps
# winning AT THE MODEL LEVEL (round-2 two-level re-measurement,
# value-fetch protocol): isolated, the fused Pallas forward + residual
# backward beat dense at every tested shape (experiments/pallas_ab.py:
# 2.83-3.40 ms vs 3.04-5.83 ms at the bench shape), but in the full train
# step dense is 2x faster (same-process interleaved A/B: 37-38k img/s
# dense vs 18.3k pallas) because XLA fuses the dense einsums with the
# surrounding feature-map / projection ops while the Pallas custom call is
# a fusion and layout barrier. Lesson recorded in docs/BENCHMARKING.md:
# kernel wins must be validated at the model level before touching
# dispatch (experiments/kerple_pallas_ab.py re-asks this at ViT-B dims
# with the round-3 tuned blocks). PAST the byte budget, `auto` routes to
# the Pallas kernel (round 3) — there dense cannot run at all and the
# tuned kernel is ~2,000x the streamed-FFT fallback at ViT-B N=4097; the
# fused Pallas backward (masked_linear_bwd.py) likewise takes over from
# the jnp residual backward exactly past the same budget
# (MASKED_LINEAR_BWD_MODE = "auto").
#
# Flash softmax kernel: the round-2 A/B (fixed 128x128 blocks) had XLA
# dense winning every N >= 512, so dispatch was memory-only. Round-3 block
# tuning (experiments/flash_tune.py, flash_default_blocks) reversed that:
# isolated flash now beats XLA dense at every N >= 1024 in both directions
# (experiments/flash_ab.py, B=8 H=4 D=64 bf16: fwd 2.65 vs 6.71 ms, grad
# 8.73 vs 23.15 ms at N=4096). Per the round-2 lesson (kernel wins must
# survive the model level — the Pallas call is a fusion barrier), the
# threshold is set from FULL ViT-Base train-step A/Bs, not the isolated
# kernel. The round-4 fused single-pass backward (1.35x faster than the
# two-pass split) moved the boundary DOWN from round 3's 1025..2026
# bracket (dense won N=1025 by 9% then): re-bracketed with the fused
# backward live (experiments/flash_crossover.py,
# results/flash_crossover_r4_mid.json), dense wins N=577 by 2.0%
# (180.1 vs 176.6 img/s) while flash wins N=785 by 5.3% (121.6 vs 115.5)
# and N=1025 by 5.8% (79.7 vs 75.3), so the crossover sits in (577, 785);
# 768 splits the bracket lane-aligned. Past that, flash's advantage
# grows with N (docs/BENCHMARKING.md round-3/4 tables).
#
# The dispatch stays MEMORY-aware as well, mirroring the KERPLE byte
# guard: the dense path's fwd+bwd holds ~3 live [B,H,N,N] fp32 temps
# (scores, probabilities, probability-cotangent), and past the HBM budget
# XLA simply OOMs (measured: B=8 H=8 N=4096 bf16 fails to compile,
# experiments/scaling_ab.py / README scaling table) while the flash
# kernel — whose fwd AND tiled bwd keep nothing quadratic in HBM — keeps
# running regardless of batch.
FLASH_MIN_N = 768  # model-level time crossover (r4 fused bwd: bracketed 577..785)
SOFTMAX_DENSE_MEMORY_BUDGET = 8 * 1024**3  # ~half of v5e HBM for the 3 temps


def _concrete_bytes(x, default: int) -> int:
    """Byte counts built from shapes are plain ints except under
    jax.export shape polymorphism (symbolic batch), where comparing them
    is inconclusive; those traces are serving exports at modest batch, so
    fall back to `default` (below-budget) there."""
    return x if isinstance(x, int) else default


def softmax_needs_flash(b: int, h: int, n: int) -> bool:
    """True when the dense softmax path's ~3 live [B,H,N,N] fp32
    temporaries would bust the HBM budget (or N crosses the opt-in
    FLASH_MIN_N override) — the regime where only the flash kernel runs."""
    dense_bytes = _concrete_bytes(3 * b * h * n * n * 4, 0)
    return n >= FLASH_MIN_N or dense_bytes > SOFTMAX_DENSE_MEMORY_BUDGET


def _pallas_ok() -> bool:
    from .pallas import pallas_available

    return pallas_available()


def softmax_attention(q, k, v, scale, mask=None, return_attention: bool = False,
                      dropout_rate: float = 0.0, dropout_rng=None):
    """softmax(q k^T * scale) v.

    Args:
        q, k, v: [B, H, N, D].
        scale: scalar (typically head_dim ** -0.5).
        mask: optional [B, N, N] or [B, 1, N, N]; zeros are masked out
            (reference: softmax.py:106-110).
        dropout_rate: attention-probability drop rate (the reference's
            attn_dropout, softmax.py:112); 0 disables.
        dropout_rng: jax PRNG key, required when dropout_rate > 0.
    Returns:
        [B, H, N, D], and the [B, H, N, N] probabilities if return_attention.

    Dispatch: the dense XLA path wins below the model-level crossover
    (FLASH_MIN_N) and the HBM budget; past either, the flash Pallas kernel
    takes over — including with a mask and/or dropout, which it handles
    in-kernel (round-4: previously those pinned the dense path, leaving
    reference-default long-N training with no memory-safe route).
    return_attention inherently materialises [B, H, N, N], so past the
    budget it is refused loudly instead of letting XLA OOM at compile.
    """
    needs_flash = softmax_needs_flash(q.shape[0], q.shape[1], q.shape[2])
    # Pallas grids must be static: under jax.export shape polymorphism
    # (symbolic batch) the flash kernel cannot trace at all, so serving
    # exports take the dense path regardless of N — the artifact's serve
    # batch is modest (same assumption as _concrete_bytes), and a working
    # dense program beats a trace-time crash.
    concrete_batch = isinstance(q.shape[0], int)
    if (needs_flash and concrete_batch and not return_attention
            and _pallas_ok()):
        from .pallas import flash_softmax_attention

        seed = (
            jax.random.bits(dropout_rng, (), "uint32")
            if dropout_rate > 0 else None
        )
        return flash_softmax_attention(
            q, k, v, scale, mask=mask,
            dropout_rate=float(dropout_rate), dropout_seed=seed,
        )
    if return_attention and _dense_softmax_busts_budget(q):
        raise NotImplementedError(
            "return_attention materialises the [B, H, N, N] probability "
            f"matrix, which exceeds the HBM budget at this shape "
            f"{tuple(q.shape)}; drop return_attention (the flash kernel "
            "path) or shrink batch/sequence."
        )

    attn = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        if mask.ndim == 3:
            mask = mask[:, None]
        attn = jnp.where(mask == 0, -jnp.inf, attn)
    attn = jax.nn.softmax(attn, axis=-1)
    if dropout_rate > 0:
        keep = jax.random.bernoulli(
            dropout_rng, 1.0 - dropout_rate, attn.shape
        )
        attn = jnp.where(keep, attn / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum(
        "bhnm,bhmd->bhnd", attn.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
    if return_attention:
        return out, attn
    return out


def _dense_softmax_busts_budget(q) -> bool:
    b, h, n = q.shape[0], q.shape[1], q.shape[2]
    dense_bytes = _concrete_bytes(3 * b * h * n * n * 4, 0)
    return dense_bytes > SOFTMAX_DENSE_MEMORY_BUDGET


def linear_attention(q_prime, k_prime, v):
    """O(N) kernelised attention: out_i = phi(q_i) (sum_j phi(k_j)^T v_j)
    normalised by phi(q_i) (sum_j phi(k_j)).

    (reference: favor_plus.py:247-260)

    Args:
        q_prime, k_prime: [B, H, N, F] non-negative features.
        v: [B, H, N, D].
    Returns:
        [B, H, N, D].
    """
    kv = jnp.einsum(
        "bhnf,bhnd->bhfd", k_prime, v, preferred_element_type=jnp.float32
    )
    num = jnp.einsum(
        "bhnf,bhfd->bhnd", q_prime, kv, preferred_element_type=jnp.float32
    )
    k_sum = jnp.sum(k_prime, axis=2)  # [B, H, F]
    den = jnp.einsum(
        "bhnf,bhf->bhn", q_prime, k_sum, preferred_element_type=jnp.float32
    )
    return (num / (den[..., None] + EPS)).astype(v.dtype)


def kerple_linear_attention(q_prime, k_prime, v, coeffs, method: str = "auto",
                            fft_block: int = 16):
    """KERPLE attention: out_i = phi(q_i) D1_i / (phi(q_i) D2_i + eps) where
    D1 = T @ [phi(k_j)^T v_j]_j and D2 = T @ phi(K)^T, T[i,j] = exp(b_{j-i})
    (Luo et al. 2021 Alg. 1; reference: kerple.py:99-344, favor_plus.py:221-244).

    Args:
        q_prime, k_prime: [B, H, N, F].
        v: [B, H, N, D].
        coeffs: [H, 2N-1] positive Toeplitz coefficients c = exp(rel_pos_bias).
        method: 'auto' | 'dense' | 'fft'. 'auto' chooses dense (masked
            matmul, exact same result) unless N exceeds
            KERPLE_DENSE_CROSSOVER_N or the dense path's ~5 live [B,H,N,N]
            fp32 temporaries would exceed KERPLE_DENSE_MEMORY_BUDGET.
        fft_block: head_dim streaming block for the FFT path's memory cap.
    Returns:
        [B, H, N, D].
    """
    b, h, n = q_prime.shape[0], q_prime.shape[1], q_prime.shape[2]
    if method == "auto":
        # ~5 live [B,H,N,N] fp32 temps (symbolic batch -> treat as small)
        dense_bytes = _concrete_bytes(5 * b * h * n * n * 4, 0)
        if (n < KERPLE_DENSE_CROSSOVER_N
                and dense_bytes <= KERPLE_DENSE_MEMORY_BUDGET):
            method = "dense"
        elif not isinstance(b, int):
            # symbolic batch (jax.export) past the dense wall: Pallas
            # grids must be static, so exports fall back to the FFT path
            # (traces fine with symbolic leading dims)
            method = "fft"
        elif _pallas_ok():
            # Past the dense wall the fused Pallas kernel is the fast
            # path: since round 4 its fwd AND bwd build Toeplitz tiles
            # in-kernel from coefficient windows (masked_linear_coeffs),
            # so NOTHING quadratic in N exists in HBM at any shape,
            # while staying on the MXU — where the streamed-FFT path
            # lost to dense by 28-266x at every measured shape
            # (docs/BENCHMARKING.md). FFT remains the non-TPU fallback.
            method = "pallas"
        else:
            method = "fft"
    if method == "pallas":
        return _kerple_pallas(q_prime, k_prime, v, coeffs)
    if method == "dense":
        return _kerple_dense(q_prime, k_prime, v, coeffs)
    if method == "fft":
        return _kerple_fft(q_prime, k_prime, v, coeffs, fft_block)
    raise ValueError(f"unknown method {method!r}")


def _kerple_pallas(q_prime, k_prime, v, coeffs, interpret: bool = False):
    """Long-N KERPLE on the coeffs-native Pallas kernels
    (ops/pallas/masked_linear_coeffs.py, round 4): Toeplitz tiles are
    built IN-KERNEL from per-tile coefficient windows and the dcoeffs
    diagonal reduction is folded into the backward, so the [H, N, N]
    T/dT tensors (and round 3's anti-hoisting optimization_barrier
    against XLA pre-materialising 12 blocks' worth of them) are gone —
    positional-bias HBM traffic is O(H*N) per step in both directions."""
    from .pallas import masked_linear_attention_coeffs

    return masked_linear_attention_coeffs(
        q_prime, k_prime, v, coeffs, interpret=interpret
    )


def masked_linear_vjp_residual(q_prime, k_prime, v, T, den, out, g):
    """Explicit VJP of Toeplitz-masked linear attention from saved
    (den, out) residuals — no forward-graph recompute:
        dW = (gn v^T - s), dA = dW*T, dT = sum_b dW*A,
        dq' = dA k', dk' = dA^T q', dv = W^T gn.
    Measured 2-3x cheaper than XLA autodiff's recompute backward at the
    bench shape (experiments/pallas_ab.py; docs/BENCHMARKING.md). Shared by
    the dense custom_vjp below and the Pallas kernel's 'jnp_residual' mode.
    """
    # every matmul operand rides the INPUT dtype (fp32 accumulate via
    # preferred_element_type): a no-op under fp32 compute; under bf16 the
    # old fp32 gn/dA operands silently ran all five backward einsums at
    # half MXU rate — at ViT-B N=197 (the compute-bound bench row) this
    # backward is the step's largest matmul block
    gn = (g / (den[..., None] + EPS)).astype(g.dtype)
    s = jnp.sum(g * out, axis=-1) / (den + EPS)  # [B,H,N]
    A = jnp.einsum("bhif,bhjf->bhij", q_prime, k_prime,
                   preferred_element_type=jnp.float32)
    M = jnp.einsum("bhid,bhjd->bhij", gn, v,
                   preferred_element_type=jnp.float32)
    dW = M - s[..., None]
    dA = (dW * T[None]).astype(q_prime.dtype)
    dT = jnp.sum(dW * A, axis=0)  # [H,N,N]  (elementwise, stays fp32)
    dq = jnp.einsum("bhij,bhjf->bhif", dA, k_prime,
                    preferred_element_type=jnp.float32).astype(q_prime.dtype)
    dk = jnp.einsum("bhij,bhif->bhjf", dA, q_prime,
                    preferred_element_type=jnp.float32).astype(k_prime.dtype)
    dv = jnp.einsum("bhij,bhid->bhjd", (A * T[None]).astype(gn.dtype), gn,
                    preferred_element_type=jnp.float32).astype(v.dtype)
    return dq, dk, dv, dT.astype(T.dtype)


def _kerple_dense_core_fwd_impl(q_prime, k_prime, v, T):
    A = jnp.einsum(
        "bhif,bhjf->bhij", q_prime, k_prime, preferred_element_type=jnp.float32
    )
    W = A * T[None]
    num = jnp.einsum(
        "bhij,bhjd->bhid", W.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    den = jnp.sum(W, axis=-1)  # [B, H, N]
    return (num / (den[..., None] + EPS)).astype(v.dtype), den


@jax.custom_vjp
def _kerple_dense_core(q_prime, k_prime, v, T):
    out, _ = _kerple_dense_core_fwd_impl(q_prime, k_prime, v, T)
    return out


def _kdc_fwd(q_prime, k_prime, v, T):
    out, den = _kerple_dense_core_fwd_impl(q_prime, k_prime, v, T)
    return out, (q_prime, k_prime, v, T, den, out)


def _kdc_bwd(residuals, g):
    return masked_linear_vjp_residual(*residuals, g)


_kerple_dense_core.defvjp(_kdc_fwd, _kdc_bwd)


def _kerple_dense(q_prime, k_prime, v, coeffs):
    """Exact O(N^2) MXU path via W = (q' k'^T) ⊙ T; out = W v / W 1.

    Backward uses the explicit residual-formula VJP (custom_vjp above) —
    autodiff handles only the coeffs -> T Toeplitz gather."""
    n = q_prime.shape[2]
    T = toeplitz_from_coeffs(coeffs, n)  # [H, N, N]
    return _kerple_dense_core(q_prime, k_prime, v, T)


# Per-block byte cap for the FFT path's streamed [B,H,N,F*fft_block]
# intermediate. The FFT doubles it (complex) and pads N to 2^k, so 1 GiB
# here is ~4-6 GiB live in the FFT — small enough to compile at ViT-Base
# long-N shapes (B=4 H=12 N=4097 F=266 failed to compile at the old fixed
# fft_block=16, ~3.3 GiB per block pre-FFT).
KERPLE_FFT_BLOCK_BUDGET = 1 * 1024**3


def _kerple_fft(q_prime, k_prime, v, coeffs, fft_block: int):
    """O(N log N) path. D2 in one FFT; D1 streamed over head_dim blocks via
    lax.scan so peak extra memory is [B, H, N, F, fft_block]. The block
    size adapts downward so the streamed intermediate stays under
    KERPLE_FFT_BLOCK_BUDGET."""
    B, H, N, F = q_prime.shape
    D = v.shape[-1]

    bytes_per_lane = B * H * N * F * 4
    if isinstance(bytes_per_lane, int):
        max_block = max(1, int(KERPLE_FFT_BLOCK_BUDGET // max(1, bytes_per_lane)))
    else:
        # symbolic batch (jax.export): keep the requested block
        max_block = fft_block
    if fft_block > max_block:
        # largest divisor of D not exceeding max_block keeps the reshape
        # exact (D % fft_block == 0 below falls back to D otherwise)
        fft_block = max(
            (d for d in range(1, max_block + 1) if D % d == 0), default=1
        )

    # Denominator: D2 = T @ phi(K) -> [B, H, N, F]
    D2 = toeplitz_matmul_fft(coeffs, k_prime)
    den = jnp.einsum(
        "bhnf,bhnf->bhn", q_prime, D2, preferred_element_type=jnp.float32
    )

    # Numerator streamed over head_dim blocks.
    if D % fft_block != 0:
        fft_block = D  # fall back to single block for awkward dims
    n_blocks = D // fft_block
    v_blocks = jnp.moveaxis(
        v.reshape(B, H, N, n_blocks, fft_block), 3, 0
    )  # [n_blocks, B, H, N, fft_block]

    def block_step(carry, v_blk):
        # A1_blk[b,h,n,f,d'] = k'[b,h,n,f] * v_blk[b,h,n,d']
        A1 = (k_prime[..., :, None] * v_blk[..., None, :]).reshape(
            B, H, N, F * v_blk.shape[-1]
        )
        D1 = toeplitz_matmul_fft(coeffs, A1).reshape(
            B, H, N, F, v_blk.shape[-1]
        )
        num_blk = jnp.einsum(
            "bhnf,bhnfd->bhnd", q_prime, D1, preferred_element_type=jnp.float32
        )
        return carry, num_blk

    _, num_blocks = jax.lax.scan(block_step, 0, v_blocks)
    num = jnp.moveaxis(num_blocks, 0, 3).reshape(B, H, N, D)
    return (num / (den[..., None] + EPS)).astype(v.dtype)
