"""Model-level contracts: shapes, param counts, gradient flow, RPE effects.

Ports the reference's model-level assertions: param-count anchors
(SURVEY.md §2 fidelity anchors), forward shapes for MNIST/CIFAR, batch-size
robustness (test_performer.py:298-306), RPE-changes-output
(test_kerple.py:244-258, test_performer.py:627-656), and the
softmax+KERPLE rejection (test_kerple.py:260-274).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_rpe_vit_tpu.configs import cifar10_config, mnist_config
from efficient_rpe_vit_tpu.models import (
    create_model,
    get_model_info,
    list_available_models,
)
from efficient_rpe_vit_tpu.models.factory import count_parameters

WORKING_VARIANTS = [
    "baseline",
    "baseline_circulant",
    "baseline_rope",
    "performer_favor",
    "performer_favor_most_general",
    "performer_favor_circulant",
    "performer_favor_rope",
    "performer_relu",
    "performer_relu_most_general",
    "performer_relu_circulant",
    "performer_relu_rope",
]


def _init(model, cfg, rng, batch=2):
    m = cfg.model
    x = jnp.zeros((batch, m.image_size, m.image_size, m.in_channels))
    variables = model.init({"params": rng}, x, deterministic=True)
    return variables, x


def test_list_available_models():
    names = list_available_models()
    assert len(names) == 14  # 12 combinations + 2 aliases
    for v in WORKING_VARIANTS:
        assert v in names


def test_get_model_info():
    info = get_model_info("performer_favor_most_general")
    assert info["attention_type"] == "favor_plus"
    assert info["rpe_type"] == "most_general"
    assert info["attention_complexity"] == "O(N)"
    assert get_model_info("baseline")["attention_complexity"] == "O(N²)"
    with pytest.raises(ValueError):
        get_model_info("nonexistent")


def test_softmax_kerple_rejected():
    with pytest.raises(NotImplementedError, match="kernelized attention"):
        create_model("baseline_most_general", mnist_config())


def test_unknown_model_rejected():
    with pytest.raises(ValueError, match="Unknown model"):
        create_model("bogus_model_name", mnist_config())


@pytest.mark.parametrize("variant", WORKING_VARIANTS)
def test_forward_shapes_mnist(rng, variant):
    cfg = mnist_config()
    model = create_model(variant, cfg)
    variables, x = _init(model, cfg, rng)
    logits = model.apply(variables, x, deterministic=True)
    assert logits.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(logits)))


@pytest.mark.parametrize("variant", ["baseline", "performer_favor_most_general"])
def test_forward_shapes_cifar(rng, variant):
    cfg = cifar10_config()
    model = create_model(variant, cfg)
    variables, x = _init(model, cfg, rng)
    logits = model.apply(variables, x, deterministic=True)
    assert logits.shape == (2, 10)


def test_param_count_anchors(rng):
    """MNIST anchors from SURVEY.md §2: KERPLE adds heads*(2*17-1)=66
    params/block; Circulant adds heads*2*head_dim=64 params/block; RoPE adds 0."""
    cfg = mnist_config()
    counts = {}
    for variant in [
        "performer_favor",
        "performer_favor_most_general",
        "performer_favor_circulant",
        "performer_favor_rope",
    ]:
        model = create_model(variant, cfg)
        variables, _ = _init(model, cfg, rng)
        counts[variant] = count_parameters(variables["params"])["total"]
    depth = cfg.model.depth
    assert counts["performer_favor_most_general"] - counts["performer_favor"] == 66 * depth
    assert counts["performer_favor_circulant"] - counts["performer_favor"] == 64 * depth
    assert counts["performer_favor_rope"] == counts["performer_favor"]


def test_param_count_bounds(rng):
    """10k-1M bound (reference: test_performer.py:282-296)."""
    cfg = mnist_config()
    model = create_model("performer_favor", cfg)
    variables, _ = _init(model, cfg, rng)
    n = count_parameters(variables["params"])["total"]
    assert 10_000 < n < 1_000_000


def test_kerple_param_shape(rng):
    cfg = mnist_config()
    model = create_model("performer_favor_most_general", cfg)
    variables, _ = _init(model, cfg, rng)
    bias = variables["params"]["block_0"]["rpe"]["rel_pos_bias"]
    assert bias.shape == (2, 2 * 17 - 1)  # [heads, 2n-1]


def test_circulant_param_shape(rng):
    cfg = mnist_config()
    model = create_model("performer_favor_circulant", cfg)
    variables, _ = _init(model, cfg, rng)
    coeffs = variables["params"]["block_0"]["rpe"]["circulant_coeffs"]
    assert coeffs.shape == (2, 2, 16)  # [heads, coord_dim, head_dim]


@pytest.mark.parametrize("batch", [1, 4, 16])
def test_batch_sizes(rng, batch):
    cfg = mnist_config()
    model = create_model("performer_favor", cfg)
    variables, _ = _init(model, cfg, rng, batch=batch)
    x = jax.random.normal(rng, (batch, 28, 28, 1))
    assert model.apply(variables, x, deterministic=True).shape == (batch, 10)


@pytest.mark.parametrize(
    "variant",
    ["performer_favor_rope", "performer_favor_most_general",
     "performer_favor_circulant"],
)
def test_rpe_changes_output(rng, variant):
    """RPE must alter the computation vs the plain mechanism
    (reference: test_performer.py:627-656, test_kerple.py:244-258)."""
    cfg = mnist_config()
    base = create_model("performer_favor", cfg)
    rped = create_model(variant, cfg)
    x = jax.random.normal(rng, (2, 28, 28, 1))
    v_base, _ = _init(base, cfg, rng)
    v_rpe, _ = _init(rped, cfg, rng)
    out_base = base.apply(v_base, x, deterministic=True)
    out_rpe = rped.apply(v_rpe, x, deterministic=True)
    assert float(jnp.abs(out_base - out_rpe).max()) > 1e-5


def test_gradient_flow_all_params(rng):
    """Every leaf gets a finite gradient, incl. rel_pos_bias
    (reference: test_kerple.py:164-179, 276-296)."""
    cfg = mnist_config()
    model = create_model("performer_favor_most_general", cfg)
    variables, _ = _init(model, cfg, rng)
    x = jax.random.normal(rng, (2, 28, 28, 1))
    y = jnp.array([3, 7])

    def loss(params):
        logits = model.apply(
            {**variables, "params": params}, x, deterministic=True
        )
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(logp[jnp.arange(2), y])

    grads = jax.grad(loss)(variables["params"])
    leaves, _ = jax.tree_util.tree_flatten(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    bias_grad = grads["block_0"]["rpe"]["rel_pos_bias"]
    assert float(jnp.abs(bias_grad).max()) > 0


def test_dropout_stochasticity(rng):
    """Dropout changes outputs across rng keys in training mode, and is a
    no-op in deterministic mode."""
    cfg = mnist_config()
    model = create_model("baseline", cfg)
    variables, _ = _init(model, cfg, rng)
    x = jax.random.normal(rng, (2, 28, 28, 1))
    d1 = model.apply(variables, x, deterministic=True)
    d2 = model.apply(variables, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2))
    t1 = model.apply(variables, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    t2 = model.apply(variables, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert float(jnp.abs(t1 - t2).max()) > 1e-6


def test_return_attention(rng):
    """Softmax supports return_attention; accessible via module methods."""
    from efficient_rpe_vit_tpu.models import SoftmaxAttention

    attn = SoftmaxAttention(dim=32, heads=2, dropout=0.0)
    x = jax.random.normal(rng, (2, 17, 32))
    variables = attn.init({"params": rng}, x)
    out, weights = attn.apply(variables, x, return_attention=True)
    assert out.shape == (2, 17, 32)
    assert weights.shape == (2, 2, 17, 17)
    # rows sum to 1
    np.testing.assert_allclose(
        np.asarray(jnp.sum(weights, -1)), 1.0, rtol=1e-5
    )


def test_linear_attention_rejects_return_attention(rng):
    from efficient_rpe_vit_tpu.models import FavorPlusAttention

    attn = FavorPlusAttention(dim=32, heads=2)
    x = jax.random.normal(rng, (2, 17, 32))
    variables = attn.init({"params": rng}, x)
    with pytest.raises(NotImplementedError, match="attention matrices"):
        attn.apply(variables, x, return_attention=True)


def test_jit_compilation(rng):
    """The full forward jits (static shapes, no data-dependent control flow)."""
    cfg = mnist_config()
    model = create_model("performer_favor_most_general", cfg)
    variables, _ = _init(model, cfg, rng)
    x = jax.random.normal(rng, (4, 28, 28, 1))
    f = jax.jit(lambda v, x: model.apply(v, x, deterministic=True))
    out = f(variables, x)
    assert out.shape == (4, 10)


def test_feature_redraw(rng):
    """feature_redraw_interval=1 redraws omega every training call
    (reference: favor_plus.py:167-171)."""
    from efficient_rpe_vit_tpu.models import FavorPlusAttention

    attn = FavorPlusAttention(dim=32, heads=2, feature_redraw_interval=1)
    x = jax.random.normal(rng, (2, 17, 32))
    variables = attn.init({"params": rng}, x, deterministic=True)
    omega0 = variables["constants"]["omega"]
    _, updates = attn.apply(
        variables, x, deterministic=False,
        rngs={"dropout": rng, "features": jax.random.PRNGKey(5)},
        mutable=["constants", "state"],
    )
    omega1 = updates["constants"]["omega"]
    assert float(jnp.abs(omega1 - omega0).max()) > 1e-3
    assert int(updates["state"]["redraw_counter"]) == 1
    # deterministic mode never redraws
    out2 = attn.apply(variables, x, deterministic=True)
    assert out2.shape == (2, 17, 32)


def test_feature_redraw_qr_only_under_cond(rng):
    """Off-interval training steps must not pay the blockwise QR: the
    redraw runs under lax.cond, so the qr primitive appears only inside a
    cond branch of the traced step, never unconditionally (a jnp.where
    would run the QR and materialise both omegas every step —
    VERDICT r2 weak #6)."""
    from efficient_rpe_vit_tpu.models import FavorPlusAttention

    attn = FavorPlusAttention(dim=32, heads=2, feature_redraw_interval=4)
    x = jnp.zeros((2, 17, 32))
    variables = attn.init({"params": rng}, x, deterministic=True)

    def step(v, x):
        return attn.apply(
            v, x, deterministic=False,
            rngs={"dropout": rng, "features": rng},
            mutable=["constants", "state"],
        )

    closed = jax.make_jaxpr(step)(variables, x)

    def subjaxprs(val):
        if isinstance(val, jax.extend.core.ClosedJaxpr):
            yield val.jaxpr
        elif isinstance(val, jax.extend.core.Jaxpr):
            yield val
        elif isinstance(val, (tuple, list)):
            for v in val:
                yield from subjaxprs(v)

    qr_prims = {"qr", "geqrf", "householder_product"}
    hits = []

    def walk(jx, in_cond):
        for eqn in jx.eqns:
            name = eqn.primitive.name
            if name in qr_prims:
                hits.append(in_cond)
            child = in_cond or name == "cond"
            for val in eqn.params.values():
                for sub in subjaxprs(val):
                    walk(sub, child)

    walk(closed.jaxpr, False)
    assert hits, "expected a QR in the redraw-enabled step"
    assert all(hits), "QR found outside lax.cond — off-interval steps pay it"


def test_vit_attention_maps(rng):
    """Working attention-map extraction (upgrade over the reference's
    raising stub, base_vit.py:255-263)."""
    cfg = mnist_config()
    model = create_model("baseline", cfg)
    x = jax.random.normal(rng, (2, 28, 28, 1))
    variables = model.init({"params": rng}, x, deterministic=True)
    logits, maps = model.apply(variables, x, deterministic=True,
                               return_attention=True)
    assert logits.shape == (2, 10)
    assert len(maps) == cfg.model.depth
    assert maps[0].shape == (2, 2, 17, 17)
    np.testing.assert_allclose(np.asarray(jnp.sum(maps[0], -1)), 1.0,
                               rtol=1e-5)
    # linear attention still rejects
    m2 = create_model("performer_favor", cfg)
    v2 = m2.init({"params": rng}, x, deterministic=True)
    with pytest.raises(NotImplementedError):
        m2.apply(v2, x, deterministic=True, return_attention=True)


def test_remat_matches_plain(rng):
    """Activation checkpointing (ViT.remat) changes memory, not numerics:
    identical logits AND parameter gradients on shared weights."""
    cfg = mnist_config(dropout=0.0)
    model = create_model("performer_favor_most_general", cfg)
    model_r = create_model("performer_favor_most_general", cfg, remat=True)
    x = jax.random.normal(rng, (4, 28, 28, 1))
    variables = model.init({"params": rng}, x, deterministic=True)
    consts = {k: v for k, v in variables.items() if k != "params"}

    out = jax.jit(lambda v, x: model.apply(v, x, deterministic=True))(
        variables, x)
    out_r = jax.jit(lambda v, x: model_r.apply(v, x, deterministic=True))(
        variables, x)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out),
                               rtol=1e-6, atol=1e-6)

    def loss(m):
        return jax.jit(jax.grad(lambda p: jnp.sum(
            m.apply({**consts, "params": p}, x, deterministic=True) ** 2)))

    g = loss(model)(variables["params"])
    g_r = loss(model_r)(variables["params"])
    # recompute-in-backward reassociates float sums: grads agree to ~1e-4
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g),
                            jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5, err_msg=str(path))
