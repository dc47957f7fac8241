"""bfloat16 compute-dtype policy: params fp32, activations bf16, softmax /
normaliser statistics fp32 — outputs close to the fp32 path and trainable."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_rpe_vit_tpu.configs import mnist_config
from efficient_rpe_vit_tpu.models import create_model
from efficient_rpe_vit_tpu.train import create_train_state, make_train_step


@pytest.mark.parametrize(
    "variant", ["baseline", "performer_favor_most_general",
                "performer_relu_circulant"]
)
def test_bf16_forward_close_to_fp32(rng, variant):
    cfg32 = mnist_config()
    cfg16 = mnist_config(compute_dtype="bfloat16")
    m32 = create_model(variant, cfg32)
    m16 = create_model(variant, cfg16)
    x = jax.random.normal(rng, (4, 28, 28, 1))
    v = m32.init({"params": rng}, x, deterministic=True)
    out32 = m32.apply(v, x, deterministic=True)
    out16 = m16.apply(v, x, deterministic=True)  # same params (fp32 tree)
    assert out16.dtype == jnp.float32  # head runs in fp32
    assert bool(jnp.all(jnp.isfinite(out16)))
    # bf16 has ~3 decimal digits; logits are O(1)
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               atol=0.15, rtol=0.15)


def test_bf16_params_stay_fp32(rng):
    cfg = mnist_config(compute_dtype="bfloat16")
    model = create_model("performer_favor", cfg)
    v = model.init({"params": rng}, jnp.zeros((2, 28, 28, 1)))
    leaves = jax.tree_util.tree_leaves(v["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)


def test_bf16_trains(rng):
    cfg = mnist_config(compute_dtype="bfloat16")
    model = create_model("performer_favor_most_general", cfg)
    state = create_train_state(model, cfg, rng, jnp.zeros((2, 28, 28, 1)))
    step = make_train_step(model)
    x = jax.random.normal(rng, (8, 28, 28, 1))
    y = jnp.arange(8) % 10
    losses = []
    for i in range(5):
        state, loss, _ = step(state, x, y, jax.random.fold_in(rng, i))
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # overfitting a fixed batch
