"""Soft-MoE MLP + expert parallelism (8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_rpe_vit_tpu.configs import mnist_config
from efficient_rpe_vit_tpu.models import create_model
from efficient_rpe_vit_tpu.parallel import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 simulated devices"
)


def _models(rng, expert_mesh=None, num_experts=4):
    cfg = mnist_config(dropout=0.0)
    kwargs = {"mlp_type": "moe", "num_experts": num_experts}
    if expert_mesh is not None:
        kwargs.update(expert_mesh=expert_mesh, expert_axis="expert")
    model = create_model("performer_favor", cfg, mlp_config=kwargs)
    x = jax.random.normal(rng, (4, 28, 28, 1))
    return model, x


def test_moe_model_builds_and_is_mixture(rng):
    """MoE block params carry stacked experts + a router; output is finite
    and differs from the dense-MLP model."""
    model, x = _models(rng)
    variables = model.init({"params": rng}, x, deterministic=True)
    mlp = variables["params"]["block_0"]["mlp"]
    assert mlp["w1"].shape[0] == 4  # stacked experts
    assert "router" in mlp
    out = model.apply(variables, x, deterministic=True)
    assert out.shape == (4, 10) and bool(jnp.all(jnp.isfinite(out)))

    dense = create_model("performer_favor", mnist_config(dropout=0.0))
    dv = dense.init({"params": rng}, x, deterministic=True)
    assert "w1" not in dv["params"]["block_0"]["mlp"]


def test_expert_parallel_matches_single_device(rng):
    """EP-sharded soft-MoE == unsharded: logits and parameter grads."""
    mesh = make_mesh(n_model=4, axis_names=("data", "expert"))
    model_ep, x = _models(rng, expert_mesh=mesh)
    model_sd, _ = _models(rng)
    variables = model_sd.init({"params": rng}, x, deterministic=True)

    apply_sd = jax.jit(lambda v, x: model_sd.apply(v, x, deterministic=True))
    apply_ep = jax.jit(lambda v, x: model_ep.apply(v, x, deterministic=True))
    np.testing.assert_allclose(
        np.asarray(apply_ep(variables, x)),
        np.asarray(apply_sd(variables, x)), rtol=1e-5, atol=1e-5,
    )

    consts = {k: v for k, v in variables.items() if k != "params"}

    def grad_of(model):
        def f(p):
            return jnp.sum(model.apply({**consts, "params": p}, x,
                                       deterministic=True) ** 2)
        return jax.jit(jax.grad(f))(variables["params"])

    g_sd = grad_of(model_sd)
    g_ep = grad_of(model_ep)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g_sd),
                            jax.tree_util.tree_leaves(g_ep)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5, err_msg=str(path))


def test_moe_trains(rng):
    """A full train step through the MoE model: finite loss, router and
    expert weights both receive gradient."""
    from efficient_rpe_vit_tpu.train import create_train_state, make_train_step

    cfg = mnist_config(dropout=0.1)
    model = create_model("performer_favor", cfg,
                         mlp_config={"mlp_type": "moe", "num_experts": 4})
    state = create_train_state(model, cfg, rng, jnp.zeros((2, 28, 28, 1)),
                               steps_per_epoch=10)
    step = make_train_step(model, donate=False)
    images = jax.random.normal(rng, (16, 28, 28, 1))
    labels = jnp.arange(16) % 10
    r0 = state.params["block_0"]["mlp"]["router"]["kernel"]
    w0 = state.params["block_0"]["mlp"]["w1"]
    state, loss, _ = step(state, images, labels, rng)
    assert bool(jnp.isfinite(loss))
    assert float(jnp.abs(
        state.params["block_0"]["mlp"]["router"]["kernel"] - r0).max()) > 0
    assert float(jnp.abs(state.params["block_0"]["mlp"]["w1"] - w0).max()) > 0
