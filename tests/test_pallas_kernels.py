"""Pallas kernels vs jnp oracles (interpret mode on CPU).

The naive-oracle gating pattern from the reference's FFT tests
(SURVEY.md §4) applied to the fused TPU kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_rpe_vit_tpu.ops.attention_core import _kerple_dense, softmax_attention
from efficient_rpe_vit_tpu.ops.fft_toeplitz import toeplitz_from_coeffs
from efficient_rpe_vit_tpu.ops.pallas import (
    flash_softmax_attention,
    fused_masked_linear_attention,
)


@pytest.fixture
def kerple_inputs(rng):
    B, H, N, F, D = 2, 2, 197, 44, 16
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    qp = jnp.abs(jax.random.normal(k1, (B, H, N, F))) * 0.1
    kp = jnp.abs(jax.random.normal(k2, (B, H, N, F))) * 0.1
    v = jax.random.normal(k3, (B, H, N, D))
    coeffs = jnp.exp(jax.random.normal(k4, (H, 2 * N - 1)) * 0.02)
    return qp, kp, v, coeffs


def test_masked_linear_matches_oracle(kerple_inputs):
    qp, kp, v, coeffs = kerple_inputs
    N = qp.shape[2]
    T = toeplitz_from_coeffs(coeffs, N)
    got = fused_masked_linear_attention(qp, kp, v, T, 128, 128, True)
    want = _kerple_dense(qp, kp, v, coeffs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)


def test_masked_linear_small_seq(rng):
    """seq 17 (MNIST patch-7 config) — heavy padding path."""
    B, H, N, F, D = 3, 2, 17, 44, 16
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    qp = jnp.abs(jax.random.normal(k1, (B, H, N, F))) * 0.2
    kp = jnp.abs(jax.random.normal(k2, (B, H, N, F))) * 0.2
    v = jax.random.normal(k3, (B, H, N, D))
    coeffs = jnp.exp(jax.random.normal(k4, (H, 2 * N - 1)) * 0.02)
    T = toeplitz_from_coeffs(coeffs, N)
    got = fused_masked_linear_attention(qp, kp, v, T, 128, 128, True)
    want = _kerple_dense(qp, kp, v, coeffs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)


def test_masked_linear_gradients_match(kerple_inputs):
    """custom_vjp backward == direct jnp gradients."""
    qp, kp, v, coeffs = kerple_inputs
    qp, kp, v = qp[:1, :1, :33], kp[:1, :1, :33], v[:1, :1, :33]
    N = qp.shape[2]
    T = toeplitz_from_coeffs(coeffs[:1, : 2 * N - 1], N)

    def loss_pallas(qp, kp, v, T):
        return jnp.sum(
            fused_masked_linear_attention(qp, kp, v, T, 128, 128, True) ** 2
        )

    def loss_ref(qp, kp, v, T):
        A = jnp.einsum("bhif,bhjf->bhij", qp, kp)
        w = A * T[None]
        num = jnp.einsum("bhij,bhjd->bhid", w, v)
        den = jnp.sum(w, -1)
        return jnp.sum((num / (den[..., None] + 1e-6)) ** 2)

    g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(qp, kp, v, T)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(qp, kp, v, T)
    for a, b in zip(g_pallas, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("N", [17, 128, 197])
def test_flash_matches_reference(rng, N):
    B, H, D = 2, 2, 16
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (B, H, N, D))
    k = jax.random.normal(k2, (B, H, N, D))
    v = jax.random.normal(k3, (B, H, N, D))
    scale = D ** -0.5
    got = flash_softmax_attention(q, k, v, scale, 128, 128, True)
    want = softmax_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)


def test_flash_gradients_match(rng):
    B, H, N, D = 1, 2, 33, 16
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (B, H, N, D))
    k = jax.random.normal(k2, (B, H, N, D))
    v = jax.random.normal(k3, (B, H, N, D))
    scale = D ** -0.5

    def loss_pallas(q, k, v):
        return jnp.sum(flash_softmax_attention(q, k, v, scale, 128, 128, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(softmax_attention(q, k, v, scale) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("N", [17, 384])
def test_flash_gradients_multi_tile_and_padding(rng, N):
    """Tiled Pallas backward across multiple q/kv tiles (N=384) and the
    heavy-padding regime (N=17) — no [B,H,N,N] tensor in either direction."""
    B, H, D = 1, 2, 16
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (B, H, N, D)) * 1.5
    k = jax.random.normal(k2, (B, H, N, D)) * 1.5
    v = jax.random.normal(k3, (B, H, N, D))
    scale = D ** -0.5

    def loss_pallas(q, k, v):
        return jnp.sum(flash_softmax_attention(q, k, v, scale, 128, 128, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(softmax_attention(q, k, v, scale) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_flash_bwd_modes_agree(rng):
    """The tiled Pallas backward == the dense jnp recompute backward."""
    from efficient_rpe_vit_tpu.ops.pallas import attention_kernels as ak

    B, H, N, D = 2, 2, 64, 16
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (B, H, N, D))
    k = jax.random.normal(k2, (B, H, N, D))
    v = jax.random.normal(k3, (B, H, N, D))

    def loss(q, k, v):
        return jnp.sum(flash_softmax_attention(q, k, v, 0.25, 128, 128, True) ** 2)

    old = ak.FLASH_BWD_MODE
    try:
        ak.FLASH_BWD_MODE = "pallas"
        gp = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        ak.FLASH_BWD_MODE = "jnp_recompute"
        gr = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    finally:
        ak.FLASH_BWD_MODE = old
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_flash_long_sequence_multi_tile(rng):
    """Multiple q AND kv tiles (online-softmax correction across tiles)."""
    B, H, N, D = 1, 1, 384, 16
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (B, H, N, D)) * 2.0
    k = jax.random.normal(k2, (B, H, N, D)) * 2.0
    v = jax.random.normal(k3, (B, H, N, D))
    got = flash_softmax_attention(q, k, v, 0.25, 128, 128, True)
    want = softmax_attention(q, k, v, 0.25)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("bq,bkv", [(192, 128), (128, 192)])
@pytest.mark.slow
def test_flash_unequal_block_sizes(rng, bq, bkv):
    """Unequal block sizes must not truncate tiling (review finding: padding
    to max(block_q, block_kv) skipped part of the sequence when the smaller
    block's tile count didn't cover it)."""
    B, H, N, D = 1, 2, 190, 16
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (B, H, N, D))
    k = jax.random.normal(k2, (B, H, N, D))
    v = jax.random.normal(k3, (B, H, N, D))
    scale = D ** -0.5
    got = flash_softmax_attention(q, k, v, scale, bq, bkv, True)
    want = softmax_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)

    gp = jax.grad(lambda q, k, v: jnp.sum(
        flash_softmax_attention(q, k, v, scale, bq, bkv, True) ** 2
    ), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(
        softmax_attention(q, k, v, scale) ** 2
    ), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("bq,bkv", [(256, 128), (None, None)])
def test_masked_linear_unequal_blocks_and_policy(kerple_inputs, bq, bkv):
    """Independent q/kv padding + the None-default block policy on the
    masked-linear kernel, forward AND the fully-fused Pallas backward."""
    from efficient_rpe_vit_tpu.ops.pallas import attention_kernels as ak

    qp, kp, v, coeffs = kerple_inputs
    N = qp.shape[2]
    T = toeplitz_from_coeffs(coeffs, N)
    want = _kerple_dense(qp, kp, v, coeffs)
    got = fused_masked_linear_attention(qp, kp, v, T, bq, bkv, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)

    old = ak.MASKED_LINEAR_BWD_MODE
    try:
        ak.MASKED_LINEAR_BWD_MODE = "pallas"
        gp = jax.grad(lambda qp, kp, v, T: jnp.sum(
            fused_masked_linear_attention(qp, kp, v, T, bq, bkv, True) ** 2
        ), argnums=(0, 1, 2, 3))(qp, kp, v, T)
    finally:
        ak.MASKED_LINEAR_BWD_MODE = old
    gr = jax.grad(lambda qp, kp, v: jnp.sum(
        _kerple_dense(qp, kp, v, coeffs) ** 2
    ), argnums=(0, 1, 2))(qp, kp, v)
    for a, b in zip(gp[:3], gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_masked_linear_bwd_auto_mode():
    """'auto' keeps the measured-fastest jnp residual backward below the
    KERPLE byte budget and switches to the fused Pallas kernels exactly
    where the jnp backward's [B,H,N,N] temps would OOM."""
    from efficient_rpe_vit_tpu.ops.pallas.attention_kernels import (
        _masked_linear_bwd_wants_pallas,
    )

    assert not _masked_linear_bwd_wants_pallas(2, 2, 197)   # test shape
    assert not _masked_linear_bwd_wants_pallas(256, 2, 197)  # bench shape
    assert _masked_linear_bwd_wants_pallas(4, 12, 4097)      # ViT-B long-N


@pytest.mark.slow
def test_kerple_pallas_coeffs_level_vjp(kerple_inputs, rng):
    """The long-N route (round 4: coeffs-native kernels — Toeplitz tiles
    built in-kernel, dcoeffs diagonal reduction folded into the backward,
    no [H,N,N] tensor anywhere) matches the dense oracle, including
    dcoeffs."""
    from efficient_rpe_vit_tpu.ops import attention_core as ac

    qp, kp, v, coeffs = kerple_inputs
    g = jax.random.normal(rng, v.shape)
    out = ac._kerple_pallas(qp, kp, v, coeffs, True)
    want = _kerple_dense(qp, kp, v, coeffs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-3, atol=2e-4)
    gp = jax.grad(lambda qp, kp, v, c: jnp.vdot(
        ac._kerple_pallas(qp, kp, v, c, True), g),
        argnums=(0, 1, 2, 3))(qp, kp, v, coeffs)
    gd = jax.grad(lambda qp, kp, v, c: jnp.vdot(
        _kerple_dense(qp, kp, v, c), g),
        argnums=(0, 1, 2, 3))(qp, kp, v, coeffs)
    for a, b in zip(gp, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_kerple_auto_prefers_pallas_past_wall(monkeypatch):
    """Past the dense memory wall, 'auto' routes to the fused Pallas
    kernel whenever Pallas is available — at ANY N since round 4 (the
    coeffs-native kernels keep nothing quadratic in HBM, so the old
    T/dT byte guard is gone); FFT only without Pallas."""
    from efficient_rpe_vit_tpu.ops import attention_core as ac

    chosen = {}

    def fake_pallas(qp, kp, v, coeffs):
        chosen["method"] = "pallas"
        return v

    monkeypatch.setattr(ac, "_pallas_ok", lambda: True)
    monkeypatch.setattr(ac, "_kerple_fft",
                        lambda *a, **k: chosen.setdefault("method", "fft") and a[2])
    monkeypatch.setattr(ac, "_kerple_pallas", fake_pallas)

    B, H, N, F, D = 4, 12, 4097, 8, 4  # past the 8 GiB dense wall
    qp = jnp.zeros((B, H, N, F))
    v = jnp.zeros((B, H, N, D))
    coeffs = jnp.ones((H, 2 * N - 1))
    ac.kerple_linear_attention(qp, qp, v, coeffs, method="auto")
    assert chosen["method"] == "pallas"

    # even at huge N (the old [H,N,N] T/dT guard would have forced FFT)
    chosen.clear()
    N2 = 16384
    qp2 = jnp.zeros((1, 12, N2, F))
    v2 = jnp.zeros((1, 12, N2, D))
    coeffs2 = jnp.ones((12, 2 * N2 - 1))
    ac.kerple_linear_attention(qp2, qp2, v2, coeffs2, method="auto")
    assert chosen["method"] == "pallas"

    # without Pallas the long-N fallback is still the streamed FFT
    chosen.clear()
    monkeypatch.setattr(ac, "_pallas_ok", lambda: False)
    monkeypatch.setattr(
        ac, "_kerple_fft",
        lambda qp, kp, v, coeffs, blk: chosen.setdefault("method", "fft") or v,
    )
    ac.kerple_linear_attention(qp2, qp2, v2, coeffs2, method="auto")
    assert chosen["method"] == "fft"


def test_flash_default_block_policy(rng):
    """block_q/block_kv=None resolve through flash_default_blocks: clamped
    to the padded sequence for short N, large tiles for long N, and the
    resolved kernel still matches the dense oracle."""
    from efficient_rpe_vit_tpu.ops.pallas.attention_kernels import (
        flash_default_blocks,
    )

    assert flash_default_blocks(17) == (128, 128)
    assert flash_default_blocks(197) == (256, 256)
    bq, bkv = flash_default_blocks(4097)
    assert bq >= 512 and bkv >= 512  # grid-overhead regime uses big tiles

    B, H, N, D = 1, 2, 197, 16
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (B, H, N, D))
    k = jax.random.normal(k2, (B, H, N, D))
    v = jax.random.normal(k3, (B, H, N, D))
    scale = D ** -0.5
    got = flash_softmax_attention(q, k, v, scale, None, None, True)
    want = softmax_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)


def test_kerple_auto_respects_memory_budget():
    """'auto' must route training-scale batches to the FFT path before the
    dense [B,H,N,N] temporaries exceed the memory budget (review finding:
    an N-only threshold OOMs at B=256, N=1024)."""
    from efficient_rpe_vit_tpu.ops import attention_core as ac

    small = jnp.zeros((8, 2, 512, 4))
    big = jnp.zeros((256, 2, 1024, 4))
    # peek at the dispatch by checking the byte guard directly
    def chosen(x):
        b, h, n = x.shape[0], x.shape[1], x.shape[2]
        dense_bytes = 5 * b * h * n * n * 4
        return ("dense" if n < ac.KERPLE_DENSE_CROSSOVER_N
                and dense_bytes <= ac.KERPLE_DENSE_MEMORY_BUDGET else "fft")
    assert chosen(small) == "dense"
    assert chosen(big) == "fft"


# ═══ round 4: mask + attention-probability dropout in the flash path ════

def _dense_hash_dropout_oracle(q, k, v, scale, seed, rate, mask=None):
    """Dense softmax attention applying the SAME position-hashed dropout
    mask the flash kernels regenerate in-kernel — the exact-parity oracle
    (the keep decision is a pure function of (seed, b, h, i, j))."""
    from efficient_rpe_vit_tpu.ops.pallas.attention_kernels import (
        dropout_keep_dense,
    )

    B, H, N, _ = q.shape
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
    if mask is not None:
        m = mask if mask.ndim == 4 else mask[:, None]
        attn = jnp.where(m == 0, -jnp.inf, attn)
    p = jax.nn.softmax(attn, axis=-1)
    if rate > 0:
        keep = dropout_keep_dense(seed, B, H, N, N, rate)
        p = jnp.where(keep, p / (1.0 - rate), 0.0)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


@pytest.mark.parametrize("mask_shape", ["bnn", "b1nn", "bhnn"])
def test_flash_mask_matches_dense(rng, mask_shape):
    B, H, N, D = 2, 2, 197, 16
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    q = jax.random.normal(k1, (B, H, N, D))
    k = jax.random.normal(k2, (B, H, N, D))
    v = jax.random.normal(k3, (B, H, N, D))
    shape = {"bnn": (B, N, N), "b1nn": (B, 1, N, N),
             "bhnn": (B, H, N, N)}[mask_shape]
    # keep the diagonal so no row is fully masked
    mask = (jax.random.uniform(k4, shape) > 0.4).astype(jnp.float32)
    eye = jnp.eye(N)[(None,) * (len(shape) - 2)]
    mask = jnp.maximum(mask, eye)
    scale = D ** -0.5
    got = flash_softmax_attention(q, k, v, scale, 128, 128, True, mask)
    want = _dense_hash_dropout_oracle(q, k, v, scale, None, 0.0, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)


def test_flash_mask_gradients_match(rng):
    B, H, N, D = 1, 2, 150, 16
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    q = jax.random.normal(k1, (B, H, N, D))
    k = jax.random.normal(k2, (B, H, N, D))
    v = jax.random.normal(k3, (B, H, N, D))
    mask = (jax.random.uniform(k4, (B, 1, N, N)) > 0.3).astype(jnp.float32)
    mask = jnp.maximum(mask, jnp.eye(N)[None, None])
    scale = D ** -0.5

    def loss_pallas(q, k, v):
        return jnp.sum(
            flash_softmax_attention(q, k, v, scale, 128, 128, True, mask) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(
            _dense_hash_dropout_oracle(q, k, v, scale, None, 0.0, mask) ** 2
        )

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("N", [64, 197])
def test_flash_dropout_matches_hash_oracle(rng, N):
    """Flash dropout == dense attention with the identical regenerated
    keep-mask: exact parity, not just statistics."""
    B, H, D, rate = 2, 2, 16, 0.1
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (B, H, N, D))
    k = jax.random.normal(k2, (B, H, N, D))
    v = jax.random.normal(k3, (B, H, N, D))
    seed = jnp.int32(12345)
    scale = D ** -0.5
    got = flash_softmax_attention(
        q, k, v, scale, 128, 128, True, None, rate, seed)
    want = _dense_hash_dropout_oracle(q, k, v, scale, seed, rate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)


def test_flash_dropout_tiling_invariance(rng):
    """The keep decision hashes GLOBAL coordinates: different tile sizes
    produce bit-identical dropout patterns."""
    B, H, N, D, rate = 1, 2, 200, 16, 0.25
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (B, H, N, D))
    k = jax.random.normal(k2, (B, H, N, D))
    v = jax.random.normal(k3, (B, H, N, D))
    seed = jnp.int32(7)
    a = flash_softmax_attention(q, k, v, 0.25, 128, 128, True, None, rate, seed)
    b = flash_softmax_attention(q, k, v, 0.25, 256, 128, True, None, rate, seed)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def test_flash_dropout_gradients_match(rng):
    B, H, N, D, rate = 1, 2, 150, 16, 0.1
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (B, H, N, D))
    k = jax.random.normal(k2, (B, H, N, D))
    v = jax.random.normal(k3, (B, H, N, D))
    seed = jnp.int32(99)
    scale = D ** -0.5

    def loss_pallas(q, k, v):
        return jnp.sum(flash_softmax_attention(
            q, k, v, scale, 128, 128, True, None, rate, seed) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(
            _dense_hash_dropout_oracle(q, k, v, scale, seed, rate) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_flash_mask_and_dropout_combined(rng):
    B, H, N, D, rate = 1, 2, 130, 16, 0.15
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    q = jax.random.normal(k1, (B, H, N, D))
    k = jax.random.normal(k2, (B, H, N, D))
    v = jax.random.normal(k3, (B, H, N, D))
    mask = (jax.random.uniform(k4, (B, 1, N, N)) > 0.3).astype(jnp.float32)
    mask = jnp.maximum(mask, jnp.eye(N)[None, None])
    seed = jnp.int32(2024)
    scale = D ** -0.5

    def loss_pallas(q, k, v):
        return jnp.sum(flash_softmax_attention(
            q, k, v, scale, 128, 128, True, mask, rate, seed) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(
            _dense_hash_dropout_oracle(q, k, v, scale, seed, rate, mask) ** 2)

    np.testing.assert_allclose(
        np.asarray(loss_pallas(q, k, v)), np.asarray(loss_ref(q, k, v)),
        rtol=2e-3)
    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_dropout_hash_statistics():
    """Keep fraction ~= 1 - rate; masks differ across seeds/heads/rows."""
    from efficient_rpe_vit_tpu.ops.pallas.attention_kernels import (
        dropout_keep_dense,
    )

    for rate in (0.1, 0.5):
        keep = dropout_keep_dense(jnp.int32(3), 2, 2, 128, 128, rate)
        frac = float(jnp.mean(keep.astype(jnp.float32)))
        assert abs(frac - (1.0 - rate)) < 0.01, (rate, frac)
    a = dropout_keep_dense(jnp.int32(3), 1, 1, 64, 64, 0.5)
    b = dropout_keep_dense(jnp.int32(4), 1, 1, 64, 64, 0.5)
    assert bool(jnp.any(a != b))
    # deterministic given the seed
    c = dropout_keep_dense(jnp.int32(3), 1, 1, 64, 64, 0.5)
    assert bool(jnp.all(a == c))
    # rows and heads decorrelate
    full = dropout_keep_dense(jnp.int32(3), 1, 2, 64, 64, 0.5)
    assert bool(jnp.any(full[0, 0] != full[0, 1]))
    assert bool(jnp.any(full[0, 0, 0] != full[0, 0, 1]))


# ─── fused single-pass flash backward (round 4) ─────────────────────────
# One kernel produces dq/dk/dv from a single build of S and dP (5 MXU ops
# per tile pair vs the two-pass split's 7). Auto-gated on the full-row dq
# scratch budget; both strategies must agree with each other and the dense
# oracle under every feature combination.

def _flash_bwd_grads(q, k, v, scale, fused, mask=None, rate=0.0, seed=None):
    from efficient_rpe_vit_tpu.ops.pallas.flash_bwd import flash_attention_bwd
    from efficient_rpe_vit_tpu.ops.pallas.attention_kernels import (
        _flash_fwd_impl,
    )

    out, lse = _flash_fwd_impl(q, k, v, mask, seed, scale=scale,
                               dropout_rate=rate, block_q=128, block_kv=128,
                               interpret=True)
    g = jnp.ones_like(out)
    return flash_attention_bwd(
        q, k, v, out, lse, g, scale=scale, block_q=128, block_kv=128,
        interpret=True, mask=mask, dropout_rate=rate, dropout_seed=seed,
        fused=fused)


@pytest.mark.parametrize("N", [17, 150, 384])
def test_flash_bwd_fused_matches_two_pass(rng, N):
    B, H, D = 1, 2, 16
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (B, H, N, D)) * 1.5
    k = jax.random.normal(k2, (B, H, N, D)) * 1.5
    v = jax.random.normal(k3, (B, H, N, D))
    gf = _flash_bwd_grads(q, k, v, D ** -0.5, fused=True)
    gs = _flash_bwd_grads(q, k, v, D ** -0.5, fused=False)
    for a, b in zip(gf, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_flash_bwd_fused_mask_dropout(rng):
    """Fused == two-pass under mask + dropout (the reference-default
    training regime the fused path must serve at long N)."""
    B, H, N, D, rate = 1, 2, 150, 16, 0.15
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    q = jax.random.normal(k1, (B, H, N, D))
    k = jax.random.normal(k2, (B, H, N, D))
    v = jax.random.normal(k3, (B, H, N, D))
    mask = (jax.random.uniform(k4, (B, 1, N, N)) > 0.3).astype(jnp.float32)
    mask = jnp.maximum(mask, jnp.eye(N)[None, None])
    seed = jnp.int32(7)
    gf = _flash_bwd_grads(q, k, v, D ** -0.5, True, mask, rate, seed)
    gs = _flash_bwd_grads(q, k, v, D ** -0.5, False, mask, rate, seed)
    for a, b in zip(gf, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_flash_bwd_fused_unequal_blocks(rng):
    """Unequal q/kv blocks: the fused kernel's full-row dq scratch indexes
    by iq*block_q while dk/dv tiles follow block_kv."""
    from efficient_rpe_vit_tpu.ops.pallas.flash_bwd import flash_attention_bwd
    from efficient_rpe_vit_tpu.ops.pallas.attention_kernels import (
        _flash_fwd_impl,
    )

    B, H, N, D = 1, 2, 190, 16
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (B, H, N, D))
    k = jax.random.normal(k2, (B, H, N, D))
    v = jax.random.normal(k3, (B, H, N, D))
    scale = D ** -0.5
    for bq, bkv in [(192, 128), (128, 192)]:
        out, lse = _flash_fwd_impl(q, k, v, None, None, scale=scale,
                                   dropout_rate=0.0, block_q=bq,
                                   block_kv=bkv, interpret=True)
        g = jnp.ones_like(out)
        gf = flash_attention_bwd(q, k, v, out, lse, g, scale=scale,
                                 block_q=bq, block_kv=bkv, interpret=True,
                                 fused=True)
        gs = flash_attention_bwd(q, k, v, out, lse, g, scale=scale,
                                 block_q=bq, block_kv=bkv, interpret=True,
                                 fused=False)
        for a, b in zip(gf, gs):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


def test_flash_bwd_fused_auto_gate():
    """The auto gate: fused while the [Nq, 128] fp32 dq scratch fits the
    VMEM budget, two-pass past it."""
    from efficient_rpe_vit_tpu.ops.pallas.flash_bwd import (
        FUSED_DQ_VMEM_BUDGET, _fused_eligible,
    )

    assert _fused_eligible(4608, 128)        # ViT-B N=4097 flagship shape
    assert not _fused_eligible(16384, 128)   # past the scratch budget
    assert FUSED_DQ_VMEM_BUDGET <= 8 * 1024 * 1024  # stays well under VMEM


# ─── coeffs-native masked-linear kernels (round 4) ──────────────────────
# Toeplitz tiles built in-kernel from coefficient windows via strided
# rolls; dcoeffs folded into the backward. Gated against the dense oracle
# like everything else.

def test_coeffs_kernel_matches_oracle(kerple_inputs):
    from efficient_rpe_vit_tpu.ops.pallas import (
        masked_linear_attention_coeffs,
    )

    qp, kp, v, coeffs = kerple_inputs
    got = masked_linear_attention_coeffs(qp, kp, v, coeffs, 128, 128, True)
    want = _kerple_dense(qp, kp, v, coeffs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("bq,bkv", [(128, 256), (256, 128)])
def test_coeffs_kernel_unequal_blocks(kerple_inputs, bq, bkv):
    """Unequal q/kv tiles exercise the window arithmetic (base =
    jk*bkv - iq*bq + Nq - bq) off the square-block diagonal."""
    from efficient_rpe_vit_tpu.ops.pallas import (
        masked_linear_attention_coeffs,
    )

    qp, kp, v, coeffs = kerple_inputs
    got = masked_linear_attention_coeffs(qp, kp, v, coeffs, bq, bkv, True)
    want = _kerple_dense(qp, kp, v, coeffs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)


def test_coeffs_kernel_small_seq(rng):
    """seq 17 (MNIST config) — heavy padding; padded rows/columns must
    read exact zeros through the padded-geometry coefficient buffer."""
    from efficient_rpe_vit_tpu.ops.pallas import (
        masked_linear_attention_coeffs,
    )

    B, H, N, F, D = 3, 2, 17, 44, 16
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    qp = jnp.abs(jax.random.normal(k1, (B, H, N, F))) * 0.2
    kp = jnp.abs(jax.random.normal(k2, (B, H, N, F))) * 0.2
    v = jax.random.normal(k3, (B, H, N, D))
    coeffs = jnp.exp(jax.random.normal(k4, (H, 2 * N - 1)) * 0.02)
    got = masked_linear_attention_coeffs(qp, kp, v, coeffs, 128, 128, True)
    want = _kerple_dense(qp, kp, v, coeffs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)


def test_coeffs_kernel_gradients_match(kerple_inputs, rng):
    """Fused P1/P2/P3 backward (incl. the in-kernel dT->dcoeffs diagonal
    fold + scatter epilogue) == dense-oracle gradients, multi-tile."""
    from efficient_rpe_vit_tpu.ops.pallas import (
        masked_linear_attention_coeffs,
    )

    qp, kp, v, coeffs = kerple_inputs
    g = jax.random.normal(rng, v.shape)
    gp = jax.grad(lambda qp, kp, v, c: jnp.vdot(
        masked_linear_attention_coeffs(qp, kp, v, c, 128, 128, True), g),
        argnums=(0, 1, 2, 3))(qp, kp, v, coeffs)
    gd = jax.grad(lambda qp, kp, v, c: jnp.vdot(
        _kerple_dense(qp, kp, v, c), g),
        argnums=(0, 1, 2, 3))(qp, kp, v, coeffs)
    for a, b in zip(gp, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_coeffs_kernel_gradients_unequal_blocks(kerple_inputs, rng):
    from efficient_rpe_vit_tpu.ops.pallas import (
        masked_linear_attention_coeffs,
    )

    qp, kp, v, coeffs = kerple_inputs
    g = jax.random.normal(rng, v.shape)
    gp = jax.grad(lambda qp, kp, v, c: jnp.vdot(
        masked_linear_attention_coeffs(qp, kp, v, c, 128, 256, True), g),
        argnums=(0, 1, 2, 3))(qp, kp, v, coeffs)
    gd = jax.grad(lambda qp, kp, v, c: jnp.vdot(
        _kerple_dense(qp, kp, v, c), g),
        argnums=(0, 1, 2, 3))(qp, kp, v, coeffs)
    for a, b in zip(gp, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


# ─── fused-phi forward (round 5: SURVEY §7 step 8(b) / VERDICT r4 #2) ───

@pytest.fixture
def fused_phi_inputs(rng):
    B, H, N, D, F = 2, 2, 197, 16, 44
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    q = jax.random.normal(k1, (B, H, N, D))
    k = jax.random.normal(k2, (B, H, N, D))
    # KERPLE contract: q/k are L2-normalised before phi
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    k = k / jnp.linalg.norm(k, axis=-1, keepdims=True)
    v = jax.random.normal(k3, (B, H, N, D))
    from efficient_rpe_vit_tpu.ops.feature_maps import (
        orthogonal_gaussian_features,
    )
    omega = orthogonal_gaussian_features(k4, H, D, F)
    coeffs = jnp.exp(jax.random.normal(k5, (H, 2 * N - 1)) * 0.02)
    return q, k, v, omega, coeffs


@pytest.mark.parametrize("kind", ["favor_plus", "relu"])
def test_fused_phi_forward_matches_unfused(fused_phi_inputs, kind):
    """In-kernel phi (q-side cached in scratch, k-side per cell, padded
    feature lanes AND padded/overhang KV rows masked in-register) == the
    XLA phi + coeffs-kernel composition."""
    from efficient_rpe_vit_tpu.ops.feature_maps import (
        phi_positive, phi_relu,
    )
    from efficient_rpe_vit_tpu.ops.pallas import (
        kerple_attention_fused_phi, masked_linear_attention_coeffs,
    )

    q, k, v, omega, coeffs = fused_phi_inputs
    phi = phi_relu if kind == "relu" else phi_positive
    want = masked_linear_attention_coeffs(
        phi(q, omega), phi(k, omega), v, coeffs, 128, 128, True)
    got = kerple_attention_fused_phi(q, k, v, omega, coeffs, kind,
                                     128, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("kind", ["favor_plus", "relu"])
def test_fused_phi_gradients_match_unfused(fused_phi_inputs, kind):
    """The fused op's VJP (XLA phi recompute -> P1/P2/P3 kernels -> phi
    VJP pullback) == autodiff through the unfused composition, for
    q, k, v, omega AND coeffs."""
    from efficient_rpe_vit_tpu.ops.feature_maps import (
        phi_positive, phi_relu,
    )
    from efficient_rpe_vit_tpu.ops.pallas import (
        kerple_attention_fused_phi, masked_linear_attention_coeffs,
    )

    q, k, v, omega, coeffs = fused_phi_inputs
    phi = phi_relu if kind == "relu" else phi_positive
    g = jax.random.normal(jax.random.PRNGKey(5), v.shape)

    gf = jax.grad(lambda *a: jnp.vdot(
        kerple_attention_fused_phi(*a, kind, 128, 128, True), g),
        argnums=(0, 1, 2, 3, 4))(q, k, v, omega, coeffs)
    gu = jax.grad(lambda q, k, v, om, c: jnp.vdot(
        masked_linear_attention_coeffs(
            phi(q, om), phi(k, om), v, c, 128, 128, True), g),
        argnums=(0, 1, 2, 3, 4))(q, k, v, omega, coeffs)
    for name, a, b in zip(["dq", "dk", "dv", "domega", "dcoeffs"], gf, gu):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-3, atol=3e-4,
            err_msg=name)


def test_fused_phi_unequal_blocks(fused_phi_inputs):
    from efficient_rpe_vit_tpu.ops.feature_maps import phi_positive
    from efficient_rpe_vit_tpu.ops.pallas import (
        kerple_attention_fused_phi, masked_linear_attention_coeffs,
    )

    q, k, v, omega, coeffs = fused_phi_inputs
    want = masked_linear_attention_coeffs(
        phi_positive(q, omega), phi_positive(k, omega), v, coeffs,
        128, 256, True)
    got = kerple_attention_fused_phi(q, k, v, omega, coeffs, "favor_plus",
                                     128, 256, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)


def test_fused_phi_model_matches_unfused(rng):
    """Model-level: attention_config={'fused_phi': True} computes the same
    logits as the standard XLA-phi + kerple path (same params/rng)."""
    from efficient_rpe_vit_tpu.configs import mnist_config
    from efficient_rpe_vit_tpu.models import create_model

    cfg = mnist_config(dropout=0.0)
    m_ref = create_model("performer_favor_most_general", cfg)
    m_fused = create_model("performer_favor_most_general", cfg,
                           attention_config={"fused_phi": True})
    x = jax.random.normal(rng, (2, 28, 28, 1))
    v_ref = m_ref.init({"params": jax.random.PRNGKey(0)}, x,
                       deterministic=True)
    out_ref = m_ref.apply(v_ref, x, deterministic=True)
    out_fused = m_fused.apply(v_ref, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=2e-3, atol=2e-3)


# ─── circulant rotation kernel (round 5) ────────────────────────────────

@pytest.fixture
def circ_rot_inputs(rng):
    B, H, N, D = 2, 3, 190, 16
    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (B, H, N, D))
    theta = jax.random.normal(k2, (H, N, D // 2 + 1)) * 0.3
    return x, jnp.cos(theta), jnp.sin(theta)


def _circ_rot_xla(x, ct, st):
    """The XLA DFT-matmul formulation (rotations.py fallback) as oracle."""
    from efficient_rpe_vit_tpu.ops.rotations import _rdft_matrices

    C_f, S_f, C_b, S_b = _rdft_matrices(x.shape[-1])
    x32 = x.astype(jnp.float32)
    x_re = x32 @ C_f
    x_im = -(x32 @ S_f)
    y_re = ct[None] * x_re - st[None] * x_im
    y_im = st[None] * x_re + ct[None] * x_im
    return (y_re @ C_b - y_im @ S_b).astype(x.dtype)


def test_circulant_rotate_kernel_matches_xla(circ_rot_inputs):
    from efficient_rpe_vit_tpu.ops.pallas.rotation_kernels import (
        circulant_rotate,
    )

    x, ct, st = circ_rot_inputs
    got = circulant_rotate(x, ct, st, 64, True)
    want = _circ_rot_xla(x, ct, st)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_circulant_rotate_kernel_gradients(circ_rot_inputs, rng):
    """Custom VJP (dx = reverse rotation; dct/dst = spectral products
    accumulated over batch) == autodiff through the XLA oracle."""
    from efficient_rpe_vit_tpu.ops.pallas.rotation_kernels import (
        circulant_rotate,
    )

    x, ct, st = circ_rot_inputs
    g = jax.random.normal(rng, x.shape)
    gk = jax.grad(lambda x, ct, st: jnp.vdot(
        circulant_rotate(x, ct, st, 64, True), g),
        argnums=(0, 1, 2))(x, ct, st)
    gx = jax.grad(lambda x, ct, st: jnp.vdot(
        _circ_rot_xla(x, ct, st), g),
        argnums=(0, 1, 2))(x, ct, st)
    for name, a, b in zip(["dx", "dct", "dst"], gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_circulant_rotate_kernel_keep_cls(circ_rot_inputs, rng):
    """In-kernel CLS passthrough (keep_cls=True) == the caller-side
    jnp.where over the rotated tensor, for the output and all grads."""
    from efficient_rpe_vit_tpu.ops.pallas.rotation_kernels import (
        circulant_rotate,
    )

    x, ct, st = circ_rot_inputs
    g = jax.random.normal(rng, x.shape)

    def oracle(x, ct, st):
        rot = _circ_rot_xla(x, ct, st)
        is_cls = (jnp.arange(x.shape[2]) == 0)[None, None, :, None]
        return jnp.where(is_cls, x, rot)

    got = circulant_rotate(x, ct, st, 64, True, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle(x, ct, st)),
                               rtol=1e-4, atol=1e-5)
    gk = jax.grad(lambda x, ct, st: jnp.vdot(
        circulant_rotate(x, ct, st, 64, True, True), g),
        argnums=(0, 1, 2))(x, ct, st)
    gx = jax.grad(lambda x, ct, st: jnp.vdot(oracle(x, ct, st), g),
                  argnums=(0, 1, 2))(x, ct, st)
    for name, a, b in zip(["dx", "dct", "dst"], gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_circulant_rotate_kernel_small_and_odd_shapes(rng):
    """Heavy padding (N=17) and a head_dim whose K pads differently."""
    from efficient_rpe_vit_tpu.ops.pallas.rotation_kernels import (
        circulant_rotate,
    )

    for (B, H, N, D) in [(1, 2, 17, 16), (3, 1, 65, 64)]:
        k1, k2 = jax.random.split(jax.random.fold_in(rng, N))
        x = jax.random.normal(k1, (B, H, N, D))
        theta = jax.random.normal(k2, (H, N, D // 2 + 1)) * 0.3
        ct, st = jnp.cos(theta), jnp.sin(theta)
        got = circulant_rotate(x, ct, st, 128, True)
        want = _circ_rot_xla(x, ct, st)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)
