"""Block-circulant STRING (real implementation of the optimisation both
the reference and the paper leave as a sweep/stub)."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_rpe_vit_tpu.configs import mnist_config
from efficient_rpe_vit_tpu.models import create_model
from efficient_rpe_vit_tpu.ops.rotations import (
    apply_block_circulant_rotation,
    apply_circulant_rotation,
    grid_positions_2d,
)


def test_blocksize_equal_headdim_matches_full(rng):
    """One block of size D == the full-dimension circulant rotation."""
    H, C, D, N = 2, 2, 16, 9
    k1, k2 = jax.random.split(rng)
    coeffs = jax.random.normal(k1, (H, C, D)) * 0.02
    x = jax.random.normal(k2, (2, H, N, D))
    pos = grid_positions_2d(N)
    full = apply_circulant_rotation(x, pos, coeffs)
    blocked = apply_block_circulant_rotation(
        x, pos, coeffs.reshape(H, C, 1, D)
    )
    np.testing.assert_allclose(np.asarray(full), np.asarray(blocked),
                               rtol=1e-5, atol=1e-6)


def test_block_rotation_norm_preserved(rng):
    H, C, D, bs, N = 2, 2, 16, 4, 16
    k1, k2 = jax.random.split(rng)
    coeffs = jax.random.normal(k1, (H, C, D // bs, bs)) * 0.05
    x = jax.random.normal(k2, (2, H, N, D))
    pos = grid_positions_2d(N)
    rot = apply_block_circulant_rotation(x, pos, coeffs)
    np.testing.assert_allclose(
        jnp.linalg.norm(rot, axis=-1), jnp.linalg.norm(x, axis=-1), rtol=1e-4
    )
    # origin patch (0,0) is unrotated
    np.testing.assert_allclose(rot[:, :, 0], x[:, :, 0], atol=1e-5)


def test_block_shape_mismatch_rejected(rng):
    coeffs = jax.random.normal(rng, (2, 2, 3, 4))  # 12 != 16
    x = jax.random.normal(rng, (1, 2, 4, 16))
    with pytest.raises(ValueError, match="head_dim"):
        apply_block_circulant_rotation(x, grid_positions_2d(4), coeffs)


def test_model_with_block_circulant(rng):
    """Full variant with enable_block_circulant: same param COUNT as the
    full-dimension circulant, blocked param SHAPE, trains/runs."""
    cfg = mnist_config()
    model = create_model(
        "performer_favor_circulant", cfg,
        rpe_config={"block_size": 4, "enable_block_circulant": True},
    )
    x = jax.random.normal(rng, (2, 28, 28, 1))
    variables = model.init({"params": rng}, x, deterministic=True)
    coeffs = variables["params"]["block_0"]["rpe"]["circulant_coeffs"]
    assert coeffs.shape == (2, 2, 4, 4)  # [heads, coord, nb, bs]
    assert coeffs.size == 2 * 2 * 16  # same count as full-dimension
    out = model.apply(variables, x, deterministic=True)
    assert out.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(out)))
    # gradients reach the blocked coefficients
    g = jax.grad(lambda p: jnp.sum(model.apply(
        {**variables, "params": p}, x, deterministic=True) ** 2
    ))(variables["params"])
    assert float(jnp.abs(g["block_0"]["rpe"]["circulant_coeffs"]).max()) > 0


def test_bare_block_size_keeps_reference_fallback(rng):
    """Without enable_block_circulant, block_size warns and falls back —
    reference-compatible behaviour (circulant_string.py:127-144)."""
    cfg = mnist_config()
    model = create_model("performer_favor_circulant", cfg,
                         rpe_config={"block_size": 4})
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        variables = model.init({"params": rng},
                               jnp.zeros((1, 28, 28, 1)),
                               deterministic=True)
    assert any("block-circulant" in str(x.message).lower()
               or "block_size" in str(x.message) for x in w)
    coeffs = variables["params"]["block_0"]["rpe"]["circulant_coeffs"]
    assert coeffs.shape == (2, 2, 16)  # full-dimension fallback
