"""RoPE and Circulant-STRING rotation contracts.

Ports the reference's test_circulant_string.py core assertions (eigenvalues
purely imaginary, eigenvalue formula, CLS exclusion, norm preservation, 2D
grid layout) and RoPE relative-position invariance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_rpe_vit_tpu.ops import (
    apply_rope,
    circulant_eigenvalues,
    apply_circulant_rotation,
    grid_positions_2d,
    rope_tables,
)
from efficient_rpe_vit_tpu.ops.rotations import apply_circulant_string


# --------------------------------------------------------------- RoPE -----

def test_rope_shapes(rng):
    B, H, N, D = 2, 2, 17, 16
    cos, sin = rope_tables(N, D)
    k1, k2 = jax.random.split(rng)
    q = jax.random.normal(k1, (B, H, N, D))
    k = jax.random.normal(k2, (B, H, N, D))
    q_r, k_r = apply_rope(q, k, cos, sin)
    assert q_r.shape == q.shape and k_r.shape == k.shape


def test_rope_position_zero_identity(rng):
    """Position 0 has angle 0 -> identity rotation."""
    cos, sin = rope_tables(8, 16)
    q = jax.random.normal(rng, (1, 1, 8, 16))
    q_r, _ = apply_rope(q, q, cos, sin)
    np.testing.assert_allclose(q_r[:, :, 0], q[:, :, 0], atol=1e-6)


def test_rope_norm_preservation(rng):
    """Rotations preserve vector norms exactly."""
    cos, sin = rope_tables(17, 16)
    q = jax.random.normal(rng, (2, 2, 17, 16))
    q_r, _ = apply_rope(q, q, cos, sin)
    np.testing.assert_allclose(
        jnp.linalg.norm(q_r, axis=-1), jnp.linalg.norm(q, axis=-1), rtol=1e-5
    )


def test_rope_relative_invariance(rng):
    """q_i . k_j depends only on j - i after RoPE (the defining property)."""
    N, D = 12, 16
    cos, sin = rope_tables(N, D)
    k1, k2 = jax.random.split(rng)
    # constant q and k across positions isolates the positional factor
    q = jnp.broadcast_to(jax.random.normal(k1, (1, 1, 1, D)), (1, 1, N, D))
    k = jnp.broadcast_to(jax.random.normal(k2, (1, 1, 1, D)), (1, 1, N, D))
    q_r, k_r = apply_rope(q, k, cos, sin)
    dots = np.asarray(jnp.einsum("bhnd,bhmd->bhnm", q_r, k_r))[0, 0]
    for off in (1, 3, 5):
        vals = [dots[i, i + off] for i in range(N - off)]
        np.testing.assert_allclose(vals, vals[0], rtol=1e-4, atol=1e-5)


# ------------------------------------------------- Circulant-STRING -------

@pytest.fixture
def circ_setup(rng):
    """ViT-Base scale, like the reference tests (test_circulant_string.py:30-43)."""
    heads, coord_dim, head_dim = 12, 2, 64
    n_tokens = 197  # 196 patches + CLS
    k1, k2 = jax.random.split(rng)
    coeffs = jax.random.normal(k1, (heads, coord_dim, head_dim)) * 0.01
    x = jax.random.normal(k2, (2, heads, n_tokens, head_dim))
    positions = grid_positions_2d(n_tokens - 1)
    return coeffs, x, positions


def test_eigenvalues_purely_imaginary(circ_setup):
    coeffs, _, _ = circ_setup
    eig = circulant_eigenvalues(coeffs)
    np.testing.assert_allclose(np.asarray(eig.real), 0.0, atol=1e-6)


def test_eigenvalue_formula(circ_setup):
    """lambda_L = 2i * Im(FFT(c)) (reference: test_circulant_string.py:76-94)."""
    coeffs, _, _ = circ_setup
    eig = circulant_eigenvalues(coeffs)
    want = 2j * jnp.imag(jnp.fft.fft(coeffs, axis=-1))
    np.testing.assert_allclose(np.asarray(eig), np.asarray(want), atol=1e-5)


def test_cls_unchanged_patches_changed(circ_setup):
    coeffs, x, positions = circ_setup
    q_r, k_r = apply_circulant_string(x, x, positions, coeffs)
    np.testing.assert_allclose(q_r[:, :, 0], x[:, :, 0], atol=1e-6)
    np.testing.assert_allclose(k_r[:, :, 0], x[:, :, 0], atol=1e-6)
    # patch tokens (beyond position (0,0)) must change
    assert float(jnp.abs(q_r[:, :, 2:] - x[:, :, 2:]).max()) > 1e-4


def test_position_origin_identity(circ_setup):
    """Patch at grid position (0, 0) gets mu = 0 -> identity rotation.

    Identity up to the real-DFT matmul roundtrip error (~D*eps*|x| ≈ 1e-5
    at D=64 in fp32 — the rotation is two [*,D]@[D,K] contractions each
    way, not an exact passthrough)."""
    coeffs, x, positions = circ_setup
    q_r, _ = apply_circulant_string(x, x, positions, coeffs)
    np.testing.assert_allclose(q_r[:, :, 1], x[:, :, 1], atol=5e-5)


def test_norm_preservation(circ_setup):
    """Rotation is orthogonal -> norms preserved within 10%
    (reference: test_circulant_string.py:129-153; exact up to fp error)."""
    coeffs, x, positions = circ_setup
    rot = apply_circulant_rotation(x[:, :, 1:], positions, coeffs)
    np.testing.assert_allclose(
        jnp.linalg.norm(rot, axis=-1),
        jnp.linalg.norm(x[:, :, 1:], axis=-1),
        rtol=1e-4,
    )


def test_grid_layout():
    """Row-major (x, y) integer grid (reference: test_circulant_string.py:194-239)."""
    pos = grid_positions_2d(16)
    assert pos.shape == (16, 2)
    np.testing.assert_allclose(pos[0], [0, 0])
    np.testing.assert_allclose(pos[1], [1, 0])   # x advances first
    np.testing.assert_allclose(pos[4], [0, 1])   # then y
    np.testing.assert_allclose(pos[15], [3, 3])
    assert pos.min() == 0 and pos.max() == 3


def test_grid_rejects_non_square():
    with pytest.raises(ValueError):
        grid_positions_2d(15)


def test_cls_only_edge_case(rng):
    """Sequence with only CLS passes through (reference: :282-299)."""
    coeffs = jax.random.normal(rng, (2, 2, 16)) * 0.01
    x = jax.random.normal(rng, (1, 2, 1, 16))
    q_r, k_r = apply_circulant_string(x, x, grid_positions_2d(0), coeffs)
    np.testing.assert_allclose(q_r, x)
    np.testing.assert_allclose(k_r, x)


def test_relative_invariance_translation(rng):
    """Rotations commute; scores depend only on relative grid offset
    (reference: test_circulant_string.py:456-486 smoke)."""
    heads, head_dim = 2, 16
    coeffs = jax.random.normal(rng, (heads, 2, head_dim)) * 0.05
    k1, k2 = jax.random.split(rng)
    q = jnp.broadcast_to(jax.random.normal(k1, (1, heads, 1, head_dim)), (1, heads, 3, head_dim))
    k = jnp.broadcast_to(jax.random.normal(k2, (1, heads, 1, head_dim)), (1, heads, 3, head_dim))
    # positions p, p+delta at two different absolute locations
    pos_a = jnp.array([[0.0, 0.0], [2.0, 1.0], [5.0, 5.0]])
    pos_b = pos_a + jnp.array([[3.0, 2.0]])
    qa = apply_circulant_rotation(q, pos_a, coeffs)
    ka = apply_circulant_rotation(k, pos_a, coeffs)
    qb = apply_circulant_rotation(q, pos_b, coeffs)
    kb = apply_circulant_rotation(k, pos_b, coeffs)
    dots_a = jnp.einsum("bhnd,bhmd->bhnm", qa, ka)
    dots_b = jnp.einsum("bhnd,bhmd->bhnm", qb, kb)
    np.testing.assert_allclose(np.asarray(dots_a), np.asarray(dots_b), atol=1e-4)


def test_gradients_through_rotation(rng):
    """Attention-style q.k loss has nonzero grads to coeffs (a plain sum has
    zero grad by skew-symmetry — documented in the reference tests :155-192)."""
    heads, head_dim, n = 2, 16, 9
    coeffs = jax.random.normal(rng, (heads, 2, head_dim)) * 0.01
    k1, k2 = jax.random.split(rng)
    q = jax.random.normal(k1, (1, heads, n, head_dim))
    k = jax.random.normal(k2, (1, heads, n, head_dim))
    pos = grid_positions_2d(n)

    def loss(c):
        qr = apply_circulant_rotation(q, pos, c)
        kr = apply_circulant_rotation(k, pos, c)
        return jnp.sum(jnp.einsum("bhnd,bhmd->bhnm", qr, kr) ** 2)

    g = jax.grad(loss)(coeffs)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).max()) > 1e-8


def test_rotation_kernel_dispatch_tristate(monkeypatch):
    """USE_PALLAS_ROTATION policy: "auto" follows the consumer hint
    (kernel only when the rotated q/k feed a Pallas custom call);
    True/False force either arm (the A/B harness contract)."""
    from efficient_rpe_vit_tpu.ops import rotations

    monkeypatch.setattr(rotations, "USE_PALLAS_ROTATION", "auto")
    assert rotations.rotation_kernel_enabled(True) is True
    assert rotations.rotation_kernel_enabled(False) is False
    monkeypatch.setattr(rotations, "USE_PALLAS_ROTATION", True)
    assert rotations.rotation_kernel_enabled(False) is True
    monkeypatch.setattr(rotations, "USE_PALLAS_ROTATION", False)
    assert rotations.rotation_kernel_enabled(True) is False


def test_chain_input_dtype_fp32_noop(rng, monkeypatch):
    """CHAIN_INPUT_DTYPE only changes bf16 intermediates: under fp32
    inputs both arms produce bit-identical rotations."""
    from efficient_rpe_vit_tpu.ops import rotations

    heads, head_dim, n = 2, 16, 9
    coeffs = jax.random.normal(rng, (heads, 2, head_dim)) * 0.01
    x = jax.random.normal(rng, (1, heads, n, head_dim))
    pos = grid_positions_2d(n)
    monkeypatch.setattr(rotations, "CHAIN_INPUT_DTYPE", True)
    a = rotations.apply_circulant_rotation(x, pos, coeffs)
    monkeypatch.setattr(rotations, "CHAIN_INPUT_DTYPE", False)
    b = rotations.apply_circulant_rotation(x, pos, coeffs)
    assert a.dtype == b.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
