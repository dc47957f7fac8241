"""Multi-device sharding tests on the 8-device CPU simulation
(SURVEY.md §4: XLA host-platform device-count simulation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from efficient_rpe_vit_tpu.configs import mnist_config
from efficient_rpe_vit_tpu.models import create_model
from efficient_rpe_vit_tpu.parallel import (
    create_sharded_train_state,
    make_mesh,
    make_parallel_train_step,
    make_param_specs,
)
from efficient_rpe_vit_tpu.train import make_train_step, create_train_state

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 simulated devices"
)


def test_make_mesh_shapes():
    mesh = make_mesh()  # pure DP
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh = make_mesh(n_model=2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    with pytest.raises(ValueError):
        make_mesh(n_data=3, n_model=2)


def test_param_specs_tp_rules(rng):
    cfg = mnist_config()
    model = create_model("performer_favor_most_general", cfg)
    variables = model.init({"params": rng}, jnp.zeros((2, 28, 28, 1)))
    mesh = make_mesh(n_model=2)
    specs = make_param_specs(variables["params"], mesh)
    blk = specs["block_0"]
    assert blk["attention"]["qkv"]["kernel"] == P(None, "model")
    assert blk["attention"]["proj"]["kernel"] == P("model", None)
    assert blk["mlp"]["fc1"]["kernel"] == P(None, "model")
    assert blk["mlp"]["fc2"]["kernel"] == P("model", None)
    assert blk["rpe"]["rel_pos_bias"] == P("model", None)  # heads=2 divides
    assert specs["pos_embedding"] == P()  # replicated


@pytest.mark.parametrize("n_model", [1, 2])
@pytest.mark.parametrize(
    "variant", ["baseline", "performer_favor_most_general", "performer_relu_circulant"]
)
def test_parallel_step_runs(rng, variant, n_model):
    """The sharded train step compiles and executes for DP and DP+TP meshes."""
    cfg = mnist_config()
    model = create_model(variant, cfg)
    mesh = make_mesh(n_model=n_model)
    sample = jnp.zeros((2, 28, 28, 1))
    state, specs = create_sharded_train_state(model, cfg, rng, sample, mesh)
    step = make_parallel_train_step(model, mesh, specs, donate=False)
    B = 16  # divisible by data axis (8 or 4)
    images = jax.random.normal(rng, (B, 28, 28, 1))
    labels = jnp.arange(B) % 10
    new_state, loss, correct = step(state, images, labels, rng)
    assert jnp.isfinite(loss)
    assert 0 <= int(correct) <= B
    assert int(new_state.step) == 1


def test_parallel_matches_single_device(rng):
    """DP across 8 devices computes the same update as single-device (full
    batch), since gradients are averaged identically."""
    cfg = mnist_config()
    model = create_model("baseline", cfg)
    sample = jnp.zeros((2, 28, 28, 1))

    # single-device reference
    state_1 = create_train_state(model, cfg, rng, sample, steps_per_epoch=10)
    step_1 = make_train_step(model)

    mesh = make_mesh()  # 8-way DP
    state_8, specs = create_sharded_train_state(
        model, cfg, rng, sample, mesh, steps_per_epoch=10
    )
    step_8 = make_parallel_train_step(model, mesh, specs, donate=False)

    B = 32
    images = jax.random.normal(jax.random.fold_in(rng, 1), (B, 28, 28, 1))
    labels = jnp.arange(B) % 10
    key = jax.random.PRNGKey(99)

    # dropout must be off for exact comparison -> use deterministic path via
    # eval-style loss: easiest is dropout=0 config
    cfg0 = mnist_config(dropout=0.0)
    model0 = create_model("baseline", cfg0)
    state_1 = create_train_state(model0, cfg0, rng, sample, steps_per_epoch=10)
    step_1 = make_train_step(model0)
    state_8, specs = create_sharded_train_state(
        model0, cfg0, rng, sample, mesh, steps_per_epoch=10
    )
    step_8 = make_parallel_train_step(model0, mesh, specs, donate=False)

    s1, loss1, c1 = step_1(state_1, images, labels, key)
    s8, loss8, c8 = step_8(state_8, images, labels, key)
    assert abs(float(loss1) - float(loss8)) < 1e-5
    assert int(c1) == int(c8)
    l1 = jax.tree_util.tree_leaves(s1.params)[0]
    l8 = jax.tree_util.tree_leaves(s8.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l8), atol=1e-5)


def test_parallel_epoch(rng):
    from efficient_rpe_vit_tpu.data import DeviceDataset
    from efficient_rpe_vit_tpu.parallel import parallel_train_epoch

    cfg = mnist_config(batch_size=16)
    model = create_model("baseline", cfg)
    mesh = make_mesh()
    imgs = np.random.default_rng(0).integers(0, 256, (64, 28, 28, 1), dtype=np.uint8)
    labels = np.arange(64) % 10
    ds = DeviceDataset(imgs, labels, (0.13,), (0.31,), 16,
                       shuffle=True, drop_last=True)
    sample = jnp.zeros((2, 28, 28, 1))
    state, specs = create_sharded_train_state(model, cfg, rng, sample, mesh)
    step = make_parallel_train_step(model, mesh, specs, donate=False)
    state, metrics = parallel_train_epoch(state, step, ds, rng, mesh)
    assert metrics["samples"] == 64
    assert np.isfinite(metrics["loss"])


def test_seq_parallel_linear_attention_exact(rng):
    """Context-parallel linear attention == single-device oracle (the kv
    summary is a psum — exact, not approximate)."""
    from efficient_rpe_vit_tpu.ops import (
        linear_attention, orthogonal_gaussian_features, phi_positive,
    )
    from efficient_rpe_vit_tpu.parallel.seq_parallel import (
        seq_parallel_linear_attention,
    )

    B, H, N, D = 2, 2, 64, 16
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    q = jax.random.normal(k1, (B, H, N, D)) * 0.5
    k = jax.random.normal(k2, (B, H, N, D)) * 0.5
    v = jax.random.normal(k3, (B, H, N, D))
    omega = orthogonal_gaussian_features(k4, H, D, 44)
    qp, kp = phi_positive(q, omega), phi_positive(k, omega)

    want = linear_attention(qp, kp, v)
    mesh = make_mesh()  # 8-way over 'data'
    got = seq_parallel_linear_attention(qp, kp, v, mesh, axis="data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)

    # N not divisible by the axis size: handled by sequence padding
    got = seq_parallel_linear_attention(qp[:, :, :30], kp[:, :, :30],
                                        v[:, :, :30], mesh)
    want = linear_attention(qp[:, :, :30], kp[:, :, :30], v[:, :, :30])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_ring_kerple_attention_exact(rng):
    """Ring KERPLE over 8 shards == single-device dense oracle."""
    from efficient_rpe_vit_tpu.ops import kerple_linear_attention
    from efficient_rpe_vit_tpu.parallel.seq_parallel import (
        ring_kerple_attention,
    )

    B, H, N, F, D = 2, 2, 64, 12, 16
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    qp = jnp.abs(jax.random.normal(k1, (B, H, N, F))) * 0.2
    kp = jnp.abs(jax.random.normal(k2, (B, H, N, F))) * 0.2
    v = jax.random.normal(k3, (B, H, N, D))
    coeffs = jnp.exp(jax.random.normal(k4, (H, 2 * N - 1)) * 0.05)

    want = kerple_linear_attention(qp, kp, v, coeffs, method="dense")
    mesh = make_mesh()
    got = ring_kerple_attention(qp, kp, v, coeffs, mesh, axis="data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_ring_softmax_attention_exact(rng):
    """Ring softmax over 8 shards == single-device softmax attention (the
    online-softmax correction across devices is exact)."""
    from efficient_rpe_vit_tpu.ops import softmax_attention
    from efficient_rpe_vit_tpu.parallel import ring_softmax_attention

    B, H, N, D = 2, 2, 64, 16
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (B, H, N, D)) * 2.0  # large scale stresses m/l
    k = jax.random.normal(k2, (B, H, N, D)) * 2.0
    v = jax.random.normal(k3, (B, H, N, D))
    scale = D ** -0.5
    want = softmax_attention(q, k, v, scale)
    mesh = make_mesh()
    got = ring_softmax_attention(q, k, v, scale, mesh, axis="data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_seq_parallel_ops_differentiable(rng):
    """Gradients flow through psum/ppermute shard_map bodies (needed if a
    training step ever runs context-parallel)."""
    from efficient_rpe_vit_tpu.ops import kerple_linear_attention, linear_attention
    from efficient_rpe_vit_tpu.parallel import (
        ring_kerple_attention, seq_parallel_linear_attention,
    )

    B, H, N, F, D = 1, 2, 32, 8, 16
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    qp = jnp.abs(jax.random.normal(k1, (B, H, N, F))) * 0.2
    kp = jnp.abs(jax.random.normal(k2, (B, H, N, F))) * 0.2
    v = jax.random.normal(k3, (B, H, N, D))
    coeffs = jnp.exp(jax.random.normal(k4, (H, 2 * N - 1)) * 0.05)
    mesh = make_mesh()

    g_par = jax.grad(lambda qp: jnp.sum(
        seq_parallel_linear_attention(qp, kp, v, mesh) ** 2))(qp)
    g_ref = jax.grad(lambda qp: jnp.sum(
        linear_attention(qp, kp, v) ** 2))(qp)
    np.testing.assert_allclose(np.asarray(g_par), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-4)

    g_ring = jax.grad(lambda c: jnp.sum(
        ring_kerple_attention(qp, kp, v, c, mesh) ** 2))(coeffs)
    g_ring_ref = jax.grad(lambda c: jnp.sum(
        kerple_linear_attention(qp, kp, v, c, method="dense") ** 2))(coeffs)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_ring_ref),
                               rtol=2e-3, atol=2e-4)


def test_parallel_step_with_feature_redraw(rng):
    """The SHARDED train step supports feature redraw (review finding: it
    previously crashed for any model with feature_redraw_interval set)."""
    cfg = mnist_config()
    model = create_model(
        "performer_favor", cfg,
        attention_config={"feature_redraw_interval": 1},
    )
    mesh = make_mesh()
    sample = jnp.zeros((2, 28, 28, 1))
    state, specs = create_sharded_train_state(model, cfg, rng, sample, mesh)
    assert state.mutable_state is not None
    step = make_parallel_train_step(model, mesh, specs, donate=False)
    omega0 = state.constants["block_0"]["attention"]["omega"]
    images = jax.random.normal(rng, (16, 28, 28, 1))
    labels = jnp.arange(16) % 10
    state, loss, _ = step(state, images, labels, rng)
    assert jnp.isfinite(loss)
    omega1 = state.constants["block_0"]["attention"]["omega"]
    assert float(jnp.abs(omega1 - omega0).max()) > 1e-3  # redraw happened


def test_tp_shards_omega(rng):
    """Constants follow the same sharding rules as params: omega is
    head-split across 'model' (review finding: the rule was dead code)."""
    from efficient_rpe_vit_tpu.parallel.train_parallel import _state_specs
    from efficient_rpe_vit_tpu.train import create_train_state

    cfg = mnist_config()
    model = create_model("performer_favor", cfg)
    state = create_train_state(model, cfg, rng, jnp.zeros((2, 28, 28, 1)))
    mesh = make_mesh(n_model=2)
    specs = _state_specs(state, mesh)
    assert specs.constants["block_0"]["attention"]["omega"] == P(
        "model", None, None
    )


def test_opt_state_specs_path_based(rng):
    """Optimizer moments get their OWN parameter's spec even when two
    params share a shape with different shardings (VERDICT r2 weak #7:
    the old first-seen-wins shape heuristic silently mis-sharded one)."""
    import optax

    from efficient_rpe_vit_tpu.parallel.train_parallel import _state_specs
    from efficient_rpe_vit_tpu.train.training import TrainState

    # same [4, 4] shape; qkv kernels column-split, proj kernels row-split
    params = {
        "a": {"qkv": {"kernel": jnp.ones((4, 4))}},
        "b": {"proj": {"kernel": jnp.ones((4, 4))}},
    }
    tx = optax.adam(1e-3)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params), tx=tx,
    )
    mesh = make_mesh(n_model=2)
    specs = _state_specs(state, mesh)
    assert specs.params["a"]["qkv"]["kernel"] == P(None, "model")
    assert specs.params["b"]["proj"]["kernel"] == P("model", None)
    for moment in (specs.opt_state[0].mu, specs.opt_state[0].nu):
        assert moment["a"]["qkv"]["kernel"] == P(None, "model")
        assert moment["b"]["proj"]["kernel"] == P("model", None)
    assert specs.opt_state[0].count == P()


# ─── context parallelism wired into the MODEL (VERDICT r1 #4) ────────────

@pytest.mark.parametrize(
    "variant",
    ["baseline", "performer_favor", "performer_favor_most_general"],
)
def test_context_parallel_model_matches_single_device(rng, variant):
    """A model built with seq_mesh produces the same logits AND parameter
    gradients as the single-device model on identical weights — covering
    ring softmax, psum linear, and ring KERPLE attention respectively.
    Seq len 17 is NOT divisible by the axis (padding path exercised)."""
    cfg = mnist_config(dropout=0.0)
    mesh = make_mesh(n_model=2, axis_names=("data", "seq"))
    model_cp = create_model(
        variant, cfg,
        attention_config={"seq_mesh": mesh, "seq_axis": "seq"},
    )
    model_sd = create_model(variant, cfg)
    x = jax.random.normal(rng, (4, 28, 28, 1))
    variables = model_sd.init({"params": rng}, x, deterministic=True)

    # jit both paths: the CP model's shard_map emits device-committed
    # arrays, so eager mixing with replicated residuals is ill-defined —
    # and every real caller (train step) is jitted anyway.
    apply_sd = jax.jit(lambda v, x: model_sd.apply(v, x, deterministic=True))
    apply_cp = jax.jit(lambda v, x: model_cp.apply(v, x, deterministic=True))
    logits_sd = apply_sd(variables, x)
    logits_cp = apply_cp(variables, x)
    np.testing.assert_allclose(np.asarray(logits_cp), np.asarray(logits_sd),
                               rtol=1e-5, atol=1e-5)

    def loss(model):
        def f(params):
            v = dict(variables)
            v["params"] = params
            return jnp.sum(model.apply(v, x, deterministic=True) ** 2)
        return jax.jit(jax.grad(f))

    g_sd = loss(model_sd)(variables["params"])
    g_cp = loss(model_cp)(variables["params"])
    flat_sd = jax.tree_util.tree_leaves_with_path(g_sd)
    flat_cp = jax.tree_util.tree_leaves(g_cp)
    for (path, a), b in zip(flat_sd, flat_cp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=1e-5,
            err_msg=str(path),
        )


@pytest.mark.slow
def test_context_parallel_train_step(rng):
    """Hybrid DP x CP: batch sharded over 'data', sequence sharded over
    'seq' inside the attention core, one full jitted train step."""
    cfg = mnist_config(dropout=0.1)
    mesh = make_mesh(n_model=2, axis_names=("data", "seq"))
    model = create_model(
        "performer_favor_most_general", cfg,
        attention_config={"seq_mesh": mesh, "seq_axis": "seq"},
    )
    sample = jnp.zeros((2, 28, 28, 1))
    state, specs = create_sharded_train_state(model, cfg, rng, sample, mesh)
    step = make_parallel_train_step(model, mesh, specs, donate=False)
    images = jax.random.normal(rng, (8, 28, 28, 1))
    labels = jnp.arange(8) % 10
    state, loss, correct = step(state, images, labels, rng)
    assert jnp.isfinite(loss)


@pytest.mark.slow
def test_seq_parallel_ops_pad_arbitrary_length(rng):
    """Seq-parallel wrappers accept N not divisible by the axis size."""
    from efficient_rpe_vit_tpu.ops.attention_core import (
        kerple_linear_attention, linear_attention, softmax_attention,
    )
    from efficient_rpe_vit_tpu.parallel import (
        ring_kerple_attention, ring_softmax_attention,
        seq_parallel_linear_attention,
    )

    mesh = make_mesh()  # 8-way
    B, H, N, F, D = 2, 2, 19, 12, 16  # 19 % 8 != 0
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    qp = jnp.abs(jax.random.normal(k1, (B, H, N, F))) * 0.2
    kp = jnp.abs(jax.random.normal(k2, (B, H, N, F))) * 0.2
    v = jax.random.normal(k3, (B, H, N, D))
    coeffs = jnp.exp(jax.random.normal(k4, (H, 2 * N - 1)) * 0.05)

    got = seq_parallel_linear_attention(qp, kp, v, mesh, axis="data")
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(linear_attention(qp, kp, v)),
                               rtol=2e-5, atol=2e-6)

    got = ring_kerple_attention(qp, kp, v, coeffs, mesh, axis="data")
    want = kerple_linear_attention(qp, kp, v, coeffs, method="dense")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)

    q = jax.random.normal(k1, (B, H, N, D))
    k = jax.random.normal(k2, (B, H, N, D))
    got = ring_softmax_attention(q, k, v, D ** -0.5, mesh, axis="data")
    want = softmax_attention(q, k, v, D ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_three_axis_dp_tp_cp_train_step(rng):
    """DP x TP x CP on one 2x2x2 mesh: batch over 'data', Megatron kernel
    splits over 'model', sequence over 'seq' inside the attention core —
    one jitted train step, finite loss, params update."""
    from jax.sharding import Mesh

    cfg = mnist_config(dropout=0.1)
    devices = jax.devices()[:8]
    mesh = Mesh(np.asarray(devices).reshape(2, 2, 2),
                ("data", "model", "seq"))
    model = create_model(
        "performer_favor_most_general", cfg,
        attention_config={"seq_mesh": mesh, "seq_axis": "seq"},
    )
    sample = jnp.zeros((2, 28, 28, 1))
    state, specs = create_sharded_train_state(model, cfg, rng, sample, mesh)
    step = make_parallel_train_step(model, mesh, specs, donate=False)
    images = jax.random.normal(rng, (8, 28, 28, 1))
    labels = jnp.arange(8) % 10
    p0 = state.params["block_0"]["attention"]["qkv"]["kernel"]
    state, loss, correct = step(state, images, labels, rng)
    assert jnp.isfinite(loss)
    p1 = state.params["block_0"]["attention"]["qkv"]["kernel"]
    assert float(jnp.abs(jnp.asarray(p1) - jnp.asarray(p0)).max()) > 0


def test_sharded_state_tracks_ema():
    """EMA shadows ride the mesh with the params' own specs and update
    inside the sharded step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from efficient_rpe_vit_tpu.configs import mnist_config
    from efficient_rpe_vit_tpu.models import create_model
    from efficient_rpe_vit_tpu.parallel import (
        create_sharded_train_state,
        make_parallel_train_step,
    )

    cfg = mnist_config(dropout=0.0)
    model = create_model("performer_favor", cfg)
    rng = jax.random.PRNGKey(0)
    mesh8 = make_mesh(n_model=2)
    state, specs = create_sharded_train_state(
        model, cfg, rng, jnp.zeros((2, 28, 28, 1)), mesh8,
        steps_per_epoch=10, ema_decay=0.9)
    assert specs.ema_params is not None
    # shadow sharded exactly like its param
    for p, e in zip(jax.tree_util.tree_leaves(specs.params),
                    jax.tree_util.tree_leaves(specs.ema_params)):
        assert p == e
    step = make_parallel_train_step(model, mesh8, specs, donate=False)
    x = jax.random.normal(rng, (8, 28, 28, 1))
    y = jnp.arange(8) % 10
    new_state, loss, _ = step(state, x, y, rng)
    assert bool(jnp.isfinite(loss))
    expect = jax.tree_util.tree_map(
        lambda e, p: 0.9 * e + 0.1 * p, state.ema_params, new_state.params)
    for a, b in zip(jax.tree_util.tree_leaves(expect),
                    jax.tree_util.tree_leaves(new_state.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_parallel_grad_accum_matches_plain():
    """DP x microbatch accumulation: the sharded accumulated step produces
    the same update as the sharded unaccumulated step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from efficient_rpe_vit_tpu.configs import mnist_config
    from efficient_rpe_vit_tpu.models import create_model
    from efficient_rpe_vit_tpu.parallel import (
        create_sharded_train_state,
        make_parallel_train_step,
    )

    cfg = mnist_config(dropout=0.0)
    model = create_model("performer_favor", cfg)
    rng = jax.random.PRNGKey(0)
    mesh = make_mesh()  # 8-way DP
    state, specs = create_sharded_train_state(
        model, cfg, rng, jnp.zeros((2, 28, 28, 1)), mesh, steps_per_epoch=10)
    x = jax.random.normal(rng, (16, 28, 28, 1))
    y = jnp.arange(16) % 10
    s1, l1, c1 = make_parallel_train_step(model, mesh, specs,
                                          donate=False)(state, x, y, rng)
    s2, l2, c2 = make_parallel_train_step(
        model, mesh, specs, donate=False, grad_accum=2)(state, x, y, rng)
    assert float(l1) == pytest.approx(float(l2), abs=1e-5)
    assert int(c1) == int(c2)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_parallel_multi_step_matches_sequential(rng):
    """make_parallel_multi_step(K) on a DPxTP mesh == K sequential sharded
    steps with fold_in(key, i) keys — same params, losses, corrects."""
    from efficient_rpe_vit_tpu.parallel import make_parallel_multi_step

    cfg = mnist_config(dropout=0.0)
    model = create_model("performer_favor_most_general", cfg)
    mesh = make_mesh(n_model=2)
    sample = jnp.zeros((2, 28, 28, 1))
    state, specs = create_sharded_train_state(model, cfg, rng, sample, mesh)
    step = make_parallel_train_step(model, mesh, specs, donate=False)
    multi = make_parallel_multi_step(model, mesh, specs, donate=False)

    K, B = 3, 8
    xs = jax.random.normal(rng, (K, B, 28, 28, 1))
    ys = (jnp.arange(K * B) % 10).reshape(K, B)

    seq_state = state
    seq_losses = []
    for i in range(K):
        key = jax.random.fold_in(rng, i)
        seq_state, loss, _ = step(seq_state, xs[i], ys[i], key)
        seq_losses.append(float(loss))

    fused_state, losses, corrects = multi(state, xs, ys, rng)
    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(seq_state.params),
                    jax.tree_util.tree_leaves(fused_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # outputs keep their mesh shardings
    leaf = jax.tree_util.tree_leaves(fused_state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_parallel_epoch_fused_matches_plain(rng):
    """parallel_train_epoch with fused chunks == the per-batch sharded
    loop (deterministic model), including the buffered tail."""
    from efficient_rpe_vit_tpu.data import DeviceDataset
    from efficient_rpe_vit_tpu.parallel import (
        make_parallel_multi_step,
        parallel_train_epoch,
    )

    cfg = mnist_config(dropout=0.0)
    model = create_model("baseline", cfg)
    mesh = make_mesh()  # pure DP over 8 devices
    sample = jnp.zeros((2, 28, 28, 1))
    state, specs = create_sharded_train_state(model, cfg, rng, sample, mesh)
    step = make_parallel_train_step(model, mesh, specs, donate=False)
    multi = make_parallel_multi_step(model, mesh, specs, donate=False)

    rngd = np.random.default_rng(0)
    imgs = rngd.integers(0, 256, (96, 28, 28, 1), dtype=np.uint8)
    labels = rngd.integers(0, 10, 96)
    ds = DeviceDataset(imgs, labels, (0.1307,), (0.3081,), 16,
                       shuffle=False, drop_last=True, seed=0)

    s_plain, m_plain = parallel_train_epoch(state, step, ds, rng, mesh)
    s_fused, m_fused = parallel_train_epoch(state, step, ds, rng, mesh,
                                            multi_step=multi, fused_steps=4)
    assert m_fused["samples"] == m_plain["samples"] == 96
    assert m_fused["loss"] == pytest.approx(m_plain["loss"], abs=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_plain.params),
                    jax.tree_util.tree_leaves(s_fused.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fsdp_shards_params_and_matches_replicated(rng):
    """FSDP (VERDICT r4 #6): create_sharded_train_state(fsdp=True) scatters
    params + Adam moments over 'data' — per-device param bytes shrink
    ~n_data-fold for the shardable leaves — and the train step computes the
    SAME update as replicated-DP (XLA inserts the all-gathers /
    reduce-scatters from the annotations; the math is unchanged)."""
    cfg = mnist_config(dropout=0.0)
    model = create_model("baseline", cfg)
    sample = jnp.zeros((2, 28, 28, 1))
    mesh = make_mesh()  # 8-way over 'data'

    state_r, specs_r = create_sharded_train_state(
        model, cfg, rng, sample, mesh)
    state_f, specs_f = create_sharded_train_state(
        model, cfg, rng, sample, mesh, fsdp=True)

    # every dim-divisible leaf carries 'data' somewhere in its spec, and
    # its per-device shard holds 1/8 of the elements
    n_data = mesh.shape["data"]
    n_sharded = 0
    for spec, leaf in zip(jax.tree_util.tree_leaves(
                              specs_f.params,
                              is_leaf=lambda x: isinstance(x, P)),
                          jax.tree_util.tree_leaves(state_f.params)):
        if "data" in tuple(spec):
            n_sharded += 1
            shard = leaf.addressable_shards[0].data
            assert shard.size * n_data == leaf.size
    assert n_sharded >= 4  # qkv/proj/fc1/fc2 kernels at minimum

    # total per-device param bytes shrink vs replicated
    def device0_bytes(state):
        return sum(
            l.addressable_shards[0].data.size * l.dtype.itemsize
            for l in jax.tree_util.tree_leaves(state.params))
    assert device0_bytes(state_f) < 0.5 * device0_bytes(state_r)

    # adam moments mirror the param specs (so they scatter too)
    mu_leaves = jax.tree_util.tree_leaves(state_f.opt_state)
    big = max(mu_leaves, key=lambda l: getattr(l, "size", 0))
    assert big.addressable_shards[0].data.size * n_data == big.size

    # identical update vs replicated DP
    step_r = make_parallel_train_step(model, mesh, specs_r, donate=False)
    step_f = make_parallel_train_step(model, mesh, specs_f, donate=False)
    B = 32
    images = jax.random.normal(jax.random.fold_in(rng, 1), (B, 28, 28, 1))
    labels = jnp.arange(B) % 10
    key = jax.random.PRNGKey(7)
    sr, lr, cr = step_r(state_r, images, labels, key)
    sf, lf, cf = step_f(state_f, images, labels, key)
    assert abs(float(lr) - float(lf)) < 1e-5
    assert int(cr) == int(cf)
    for a, b in zip(jax.tree_util.tree_leaves(sr.params),
                    jax.tree_util.tree_leaves(sf.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fsdp_composes_with_tp(rng):
    """FSDP x TP: on a 4x2 (data, model) mesh a column kernel ends up
    P('data', 'model') — scattered on BOTH axes — and the step still runs."""
    cfg = mnist_config(dropout=0.0)
    model = create_model("performer_favor", cfg)
    sample = jnp.zeros((2, 28, 28, 1))
    mesh = make_mesh(n_model=2)
    state, specs = create_sharded_train_state(
        model, cfg, rng, sample, mesh, fsdp=True)
    qkv_spec = specs.params["block_0"]["attention"]["qkv"]["kernel"]
    assert tuple(qkv_spec) == ("data", "model")
    step = make_parallel_train_step(model, mesh, specs, donate=False)
    images = jax.random.normal(jax.random.fold_in(rng, 2), (16, 28, 28, 1))
    labels = jnp.arange(16) % 10
    s2, loss, correct = step(state, images, labels, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
