"""Axial 2D RoPE (new capability, no reference counterpart)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_rpe_vit_tpu.configs import mnist_config
from efficient_rpe_vit_tpu.models import create_model
from efficient_rpe_vit_tpu.ops.rotations import (
    apply_rope_2d,
    grid_positions_2d,
    rope_2d_tables,
)


def test_tables_shape():
    cos, sin = rope_2d_tables(16, 16)
    assert cos.shape == (16, 8) and sin.shape == (16, 8)
    with pytest.raises(ValueError, match="head_dim"):
        rope_2d_tables(16, 18)


def test_cls_excluded_norm_preserved(rng):
    B, H, N, D = 2, 2, 17, 16
    cos, sin = rope_2d_tables(N - 1, D)
    q = jax.random.normal(rng, (B, H, N, D))
    q_r, k_r = apply_rope_2d(q, q, cos, sin)
    np.testing.assert_allclose(q_r[:, :, 0], q[:, :, 0], atol=1e-7)
    np.testing.assert_allclose(
        jnp.linalg.norm(q_r, axis=-1), jnp.linalg.norm(q, axis=-1), rtol=1e-5
    )


def test_2d_relative_invariance(rng):
    """Scores depend only on the 2D grid OFFSET, not absolute position —
    the property the reference's 1D RoPE lacks on images."""
    D = 16
    N = 16  # 4x4 grid
    cos, sin = rope_2d_tables(N, D)
    k1, k2 = jax.random.split(rng)
    q = jnp.broadcast_to(jax.random.normal(k1, (1, 1, 1, D)), (1, 1, N + 1, D))
    k = jnp.broadcast_to(jax.random.normal(k2, (1, 1, 1, D)), (1, 1, N + 1, D))
    q_r, k_r = apply_rope_2d(q, k, cos, sin)
    dots = np.asarray(jnp.einsum("bhnd,bhmd->bhnm", q_r, k_r))[0, 0]
    pos = grid_positions_2d(N)
    # same (dx, dy)=(1, 0) offset at different absolute positions
    pairs_right = [(1 + i * 4 + j, 1 + i * 4 + j + 1)
                   for i in range(4) for j in range(3)]
    vals = [dots[a, b] for a, b in pairs_right]
    np.testing.assert_allclose(vals, vals[0], rtol=1e-4)
    # same (0, 1) offset
    pairs_down = [(1 + i * 4 + j, 1 + (i + 1) * 4 + j)
                  for i in range(3) for j in range(4)]
    vals = [dots[a, b] for a, b in pairs_down]
    np.testing.assert_allclose(vals, vals[0], rtol=1e-4)
    # 1D-index-adjacent but grid-wrapped pairs must NOT equal the in-row ones
    wrap = dots[1 + 3, 1 + 4]  # (3,0) -> (0,1): 1D-adjacent, 2D-distant
    in_row = vals[0]
    assert abs(wrap - dots[pairs_right[0][0], pairs_right[0][1]]) > 1e-6 or \
        abs(wrap - in_row) > 1e-6


@pytest.mark.parametrize("attention", ["softmax", "favor_plus", "relu"])
def test_rope2d_variants_build_and_run(rng, attention):
    cfg = mnist_config()
    name = {"softmax": "softmax_rope_2d", "favor_plus": "favor_plus_rope_2d",
            "relu": "relu_rope_2d"}[attention]
    model = create_model(name, cfg)
    assert model.rpe_type == "rope_2d"
    x = jax.random.normal(rng, (2, 28, 28, 1))
    variables = model.init({"params": rng}, x, deterministic=True)
    out = model.apply(variables, x, deterministic=True)
    assert out.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_rope2d_differs_from_1d(rng):
    cfg = mnist_config()
    m1 = create_model("baseline_rope", cfg)
    m2 = create_model("softmax_rope_2d", cfg)
    x = jax.random.normal(rng, (2, 28, 28, 1))
    v1 = m1.init({"params": rng}, x, deterministic=True)
    v2 = m2.init({"params": rng}, x, deterministic=True)
    o1 = m1.apply(v1, x, deterministic=True)
    o2 = m2.apply(v2, x, deterministic=True)
    assert float(jnp.abs(o1 - o2).max()) > 1e-5
