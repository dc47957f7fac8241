"""AOT serving exports (efficient_rpe_vit_tpu.serve).

The artifact contract: weight-embedded StableHLO via jax.export with a
SYMBOLIC batch dimension — deserializable and callable without the model
zoo, matching the live model's logits exactly, at any batch size, and
lowerable for platforms the exporting host doesn't have (cpu host ->
tpu artifact). No reference analogue: the reference's deployment story is
a torch state_dict that needs the whole Python class tree to reload
(reference: experiments/utils/training.py:373-413).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_rpe_vit_tpu.configs import mnist_config
from efficient_rpe_vit_tpu.models import create_model
from efficient_rpe_vit_tpu.serve import load_exported, save_exported


def _build(variant):
    cfg = mnist_config()
    model = create_model(variant, cfg)
    m = cfg.model
    x = jnp.zeros((2, m.image_size, m.image_size, m.in_channels))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x,
                           deterministic=True)
    return cfg, model, variables


@pytest.mark.parametrize("variant", [
    "baseline",                      # softmax, abs-pos only
    "baseline_circulant",            # FFT rotation RPE
    "performer_favor_most_general",  # FAVOR+ + KERPLE (flagship)
    "performer_relu_most_general",   # ReLU kernel + KERPLE
])
def test_export_roundtrip_batch_polymorphic(tmp_path, variant):
    """One artifact serves any batch size with exact logits."""
    cfg, model, variables = _build(variant)
    m = cfg.model
    path = str(tmp_path / "model.hlo")
    save_exported(path, model, variables,
                  image_size=m.image_size, in_channels=m.in_channels,
                  metadata={"model_name": variant})
    fn, meta = load_exported(path)
    assert meta["metadata"]["model_name"] == variant
    for batch in (2, 5):
        x = jax.random.normal(
            jax.random.PRNGKey(batch),
            (batch, m.image_size, m.image_size, m.in_channels))
        ref = model.apply(variables, x, deterministic=True)
        got = fn(x)
        assert got.shape == (batch, m.num_classes)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_export_multi_platform(tmp_path):
    """A CPU host can lower for TPU serving; the artifact records the
    platform list and still runs on the platforms it was lowered for."""
    cfg, model, variables = _build("performer_favor")
    m = cfg.model
    path = str(tmp_path / "model.hlo")
    save_exported(path, model, variables,
                  image_size=m.image_size, in_channels=m.in_channels,
                  platforms=("cpu", "tpu"))
    fn, meta = load_exported(path)
    assert meta["platforms"] == ["cpu", "tpu"]
    x = jnp.zeros((3, m.image_size, m.image_size, m.in_channels))
    assert fn(x).shape == (3, m.num_classes)


def test_export_meta_sidecar(tmp_path):
    cfg, model, variables = _build("baseline")
    m = cfg.model
    path = str(tmp_path / "model.hlo")
    save_exported(path, model, variables,
                  image_size=m.image_size, in_channels=m.in_channels,
                  metadata={"model_name": "baseline", "dataset": "mnist"})
    meta = json.load(open(path + ".meta.json"))
    assert meta["format"] == "jax.export.stablehlo"
    assert meta["input_shape"] == ["b", m.image_size, m.image_size,
                                   m.in_channels]
    assert meta["out_avals"][0]["shape"][-1] == str(m.num_classes)


def test_export_cli_from_checkpoint(tmp_path, rng):
    """export.py end-to-end: checkpoint -> artifact -> validated reload."""
    from efficient_rpe_vit_tpu.train import create_train_state
    from efficient_rpe_vit_tpu.train.checkpoint import save_checkpoint
    from experiments.export import main as export_main

    cfg = mnist_config()
    model = create_model("performer_favor", cfg)
    state = create_train_state(model, cfg, rng, jnp.zeros((2, 28, 28, 1)))
    ckpt = str(tmp_path / "ck.msgpack")
    save_checkpoint(ckpt, state, epoch=0,
                    metadata={"model_name": "performer_favor",
                              "dataset": "mnist"})

    out = str(tmp_path / "model.hlo")
    export_main(["--checkpoint", ckpt, "--out", out, "--validate", "--cpu"])

    fn, meta = load_exported(out)
    assert meta["metadata"]["model_name"] == "performer_favor"
    assert meta["metadata"]["from_checkpoint"] is True
    x = jnp.zeros((4, 28, 28, 1))
    assert fn(x).shape == (4, 10)


def test_export_bf16_weights(tmp_path):
    """weights_dtype=bfloat16 halves the artifact and moves logits only by
    rounding; predictions are unchanged on well-separated logits."""
    cfg, model, variables = _build("performer_favor")
    m = cfg.model
    p32 = str(tmp_path / "fp32.hlo")
    p16 = str(tmp_path / "bf16.hlo")
    save_exported(p32, model, variables,
                  image_size=m.image_size, in_channels=m.in_channels)
    save_exported(p16, model, variables,
                  image_size=m.image_size, in_channels=m.in_channels,
                  weights_dtype=jnp.bfloat16)
    import os

    # constants dominate small models less than params; still expect a
    # clearly smaller artifact
    assert os.path.getsize(p16) < 0.75 * os.path.getsize(p32)
    fn32, _ = load_exported(p32)
    fn16, meta16 = load_exported(p16)
    assert meta16["weights_dtype"] == "bfloat16"
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (4, m.image_size, m.image_size, m.in_channels))
    l32, l16 = np.asarray(fn32(x)), np.asarray(fn16(x))
    np.testing.assert_allclose(l16, l32, atol=5e-2)


def test_export_bf16_weights_from_numpy_leaves(tmp_path):
    """Checkpoint restore yields NUMPY leaves; the bf16 cast must still
    shrink the artifact. Regression: numpy ml_dtypes bf16 constants were
    promoted back to fp32 at trace time, silently undoing the cast (the
    CLI --weights-dtype bfloat16 path always exports from a restored
    checkpoint, i.e. numpy leaves)."""
    cfg, model, variables = _build("performer_favor")
    m = cfg.model
    variables_np = jax.tree_util.tree_map(np.asarray, variables)
    p32 = str(tmp_path / "fp32.hlo")
    p16 = str(tmp_path / "bf16.hlo")
    save_exported(p32, model, variables_np,
                  image_size=m.image_size, in_channels=m.in_channels)
    save_exported(p16, model, variables_np,
                  image_size=m.image_size, in_channels=m.in_channels,
                  weights_dtype=jnp.bfloat16)
    assert os.path.getsize(p16) < 0.75 * os.path.getsize(p32)
    fn16, meta16 = load_exported(p16)
    assert meta16["weights_dtype"] == "bfloat16"
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (4, m.image_size, m.image_size, m.in_channels))
    ref = model.apply(variables, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(fn16(x)), np.asarray(ref),
                               atol=5e-2)


def test_export_int8_weights(tmp_path):
    """weights_dtype='int8': weight-only per-channel quantization shrinks
    the artifact ~4x vs fp32 and keeps top-1 predictions; the FAVOR+
    random-feature constants are NOT quantized (they define the kernel
    estimator, not trained weights)."""
    cfg, model, variables = _build("performer_favor")
    m = cfg.model
    p32 = str(tmp_path / "fp32.hlo")
    p8 = str(tmp_path / "int8.hlo")
    save_exported(p32, model, variables,
                  image_size=m.image_size, in_channels=m.in_channels)
    save_exported(p8, model, variables,
                  image_size=m.image_size, in_channels=m.in_channels,
                  weights_dtype="int8")
    # the 4x applies to the quantized leaves; at dim-32 scale the artifact
    # floor is the unquantized fp32 constants (FAVOR+ omega), bias/norm
    # vectors, per-channel scales, and StableHLO overhead — measured 0.52x
    assert os.path.getsize(p8) < 0.6 * os.path.getsize(p32)
    fn32, _ = load_exported(p32)
    fn8, meta8 = load_exported(p8)
    assert meta8["weights_dtype"] == "int8"
    assert "per-output-channel" in meta8["quantization"]
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (16, m.image_size, m.image_size, m.in_channels))
    l32, l8 = np.asarray(fn32(x)), np.asarray(fn8(x))
    # logits move by quantization error but stay close in absolute terms
    # at this scale, and the argmax is unchanged
    assert np.max(np.abs(l8 - l32)) < 0.25
    assert (l8.argmax(-1) == l32.argmax(-1)).all()


def test_export_cli_int8_validate(tmp_path, rng):
    """export.py --weights-dtype int8 --validate gates on top-1 agreement."""
    from efficient_rpe_vit_tpu.train import create_train_state
    from efficient_rpe_vit_tpu.train.checkpoint import save_checkpoint
    from experiments.export import main as export_main

    cfg = mnist_config()
    model = create_model("baseline", cfg)
    state = create_train_state(model, cfg, rng, jnp.zeros((2, 28, 28, 1)))
    ckpt = str(tmp_path / "ck.msgpack")
    save_checkpoint(ckpt, state, epoch=0,
                    metadata={"model_name": "baseline", "dataset": "mnist"})
    out = str(tmp_path / "model_int8.hlo")
    export_main(["--checkpoint", ckpt, "--out", out,
                 "--weights-dtype", "int8", "--validate", "--cpu"])
    fn, meta = load_exported(out)
    assert meta["weights_dtype"] == "int8"
    assert fn(jnp.zeros((3, 28, 28, 1))).shape == (3, 10)


def test_predict_cli_from_artifact(tmp_path, rng):
    """predict.py serves an exported artifact: npy classification and a
    test-split evaluation, using only the sidecar for preprocessing."""
    from efficient_rpe_vit_tpu.train import create_train_state
    from efficient_rpe_vit_tpu.train.checkpoint import save_checkpoint
    from experiments.export import main as export_main
    from experiments.predict import main as predict_main

    cfg = mnist_config()
    model = create_model("baseline", cfg)
    state = create_train_state(model, cfg, rng, jnp.zeros((2, 28, 28, 1)))
    ckpt = str(tmp_path / "ck.msgpack")
    save_checkpoint(ckpt, state, epoch=0,
                    metadata={"model_name": "baseline", "dataset": "mnist"})
    art = str(tmp_path / "model.hlo")
    export_main(["--checkpoint", ckpt, "--out", art, "--cpu"])

    x = (np.random.default_rng(0).integers(0, 255, (4, 28, 28))
         .astype(np.uint8))
    np.save(tmp_path / "digits.npy", x)
    out = str(tmp_path / "preds.json")
    preds = predict_main([
        "--artifact", art, "--input", str(tmp_path / "digits.npy"),
        "--output", out, "--cpu",
    ])
    assert preds.shape == (4,)
    data = json.load(open(out))
    assert len(data["predictions"]) == 4

    # artifact predictions == checkpoint predictions
    preds_ck = predict_main([
        "--checkpoint", ckpt, "--input", str(tmp_path / "digits.npy"),
        "--cpu",
    ])
    np.testing.assert_array_equal(preds, preds_ck)

    # split evaluation runs from the artifact alone
    result = predict_main(["--artifact", art, "--cpu"])
    assert result["samples"] > 0

    import pytest as _pytest

    with _pytest.raises(SystemExit, match="exactly one"):
        predict_main(["--cpu"])


def test_export_and_predict_serve_ema_shadow(tmp_path, rng):
    """A checkpoint trained with --ema-decay records it in metadata; both
    predict.py and export.py rebuild the EMA template and serve the
    SHADOW, not the live params."""
    from efficient_rpe_vit_tpu.train import create_train_state, make_train_step
    from efficient_rpe_vit_tpu.train.checkpoint import save_checkpoint
    from experiments.export import main as export_main
    from experiments.predict import main as predict_main

    cfg = mnist_config(dropout=0.0)
    model = create_model("baseline", cfg)
    state = create_train_state(model, cfg, rng, jnp.zeros((2, 28, 28, 1)),
                               ema_decay=0.9)
    step = make_train_step(model)
    for i in range(3):
        state, _, _ = step(state, jax.random.normal(rng, (8, 28, 28, 1)),
                           jnp.arange(8) % 10, jax.random.fold_in(rng, i))
    ckpt = str(tmp_path / "ck.msgpack")
    save_checkpoint(ckpt, state, epoch=0,
                    metadata={"model_name": "baseline", "dataset": "mnist",
                              "ema_decay": 0.9})

    x = (np.random.default_rng(0).integers(0, 255, (6, 28, 28))
         .astype(np.uint8))
    np.save(tmp_path / "digits.npy", x)

    preds = predict_main(["--checkpoint", ckpt, "--input",
                          str(tmp_path / "digits.npy"), "--cpu"])

    art = str(tmp_path / "model.hlo")
    export_main(["--checkpoint", ckpt, "--out", art, "--cpu"])
    preds_art = predict_main(["--artifact", art, "--input",
                              str(tmp_path / "digits.npy"), "--cpu"])
    np.testing.assert_array_equal(preds, preds_art)

    # and the served logits really are the shadow's, not the live params'
    from efficient_rpe_vit_tpu.serve import load_exported

    fn, _ = load_exported(art)
    xn = (np.asarray(x, np.float32)[..., None] / 255.0 - 0.1307) / 0.3081
    got = np.asarray(fn(jnp.asarray(xn)))
    ema_logits = np.asarray(model.apply(
        {"params": state.ema_params}, jnp.asarray(xn), deterministic=True))
    live_logits = np.asarray(model.apply(
        {"params": state.params}, jnp.asarray(xn), deterministic=True))
    np.testing.assert_allclose(got, ema_logits, atol=2e-5)
    assert np.abs(got - live_logits).max() > 1e-4


@pytest.mark.slow
def test_export_rebuilds_moe_and_num_features(tmp_path):
    """Checkpoints record MoE shape and feature count; export rebuilds the
    exact architecture (a mismatched template fails loudly otherwise)."""
    import runpy  # noqa: F401  (train CLI invoked in-process below)

    from experiments.export import main as export_main
    from experiments.predict import main as predict_main
    from experiments.train import main as train_main

    out = str(tmp_path)
    train_main([
        "--model", "performer_favor", "--dataset", "mnist", "--epochs", "1",
        "--mlp-type", "moe", "--num-experts", "2", "--num-features", "32",
        "--batch-size", "64", "--cpu", "--quiet", "--output-dir", out,
        "--save-model",
    ])
    ckpt = os.path.join(out, "performer_favor_mnist_best.msgpack")
    assert os.path.exists(ckpt)
    meta = json.load(open(ckpt + ".meta.json"))["metadata"]
    assert meta["mlp_type"] == "moe" and meta["num_experts"] == 2
    assert meta["num_features"] == "32"

    art = os.path.join(out, "model.hlo")
    export_main(["--checkpoint", ckpt, "--out", art, "--validate", "--cpu"])

    x = (np.random.default_rng(0).integers(0, 255, (4, 28, 28))
         .astype(np.uint8))
    np.save(tmp_path / "digits.npy", x)
    preds_ck = predict_main(["--checkpoint", ckpt, "--input",
                             str(tmp_path / "digits.npy"), "--cpu"])
    preds_art = predict_main(["--artifact", art, "--input",
                              str(tmp_path / "digits.npy"), "--cpu"])
    np.testing.assert_array_equal(preds_ck, preds_art)


def test_export_roundtrip_cifar_config(tmp_path):
    """3-channel, patch-8 CIFAR geometry exports and serves batch-
    polymorphically too (the channel-ordering-sensitive path)."""
    from efficient_rpe_vit_tpu.configs import cifar10_config

    cfg = cifar10_config()
    model = create_model("performer_favor_most_general", cfg)
    m = cfg.model
    x = jnp.zeros((2, m.image_size, m.image_size, m.in_channels))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x,
                           deterministic=True)
    path = str(tmp_path / "model.hlo")
    save_exported(path, model, variables,
                  image_size=m.image_size, in_channels=m.in_channels)
    fn, _ = load_exported(path)
    for batch in (2, 3):
        xb = jax.random.normal(
            jax.random.PRNGKey(batch),
            (batch, m.image_size, m.image_size, m.in_channels))
        ref = model.apply(variables, xb, deterministic=True)
        np.testing.assert_allclose(np.asarray(fn(xb)), np.asarray(ref),
                                   atol=3e-5, rtol=3e-5)


def test_export_symbolic_batch_stays_off_pallas(tmp_path, monkeypatch):
    """A symbolic-batch export trace must NEVER reach a Pallas kernel:
    Pallas grids are static, so on a TPU host exporting a model whose N
    crosses FLASH_MIN_N (768 since round 4) would crash at trace time if
    the dispatch didn't check batch concreteness. Simulate the TPU
    condition on CPU by forcing _pallas_ok() True and FLASH_MIN_N below
    this model's N=17: the concrete-batch guard must route the export
    trace to the dense path (any flash attempt would raise inside
    flash_softmax_attention on a symbolic grid)."""
    from efficient_rpe_vit_tpu.ops import attention_core

    cfg, model, variables = _build("baseline")
    m = cfg.model
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (3, m.image_size, m.image_size, m.in_channels))
    # reference logits computed BEFORE the fake-TPU patch (a concrete
    # CPU run with _pallas_ok forced True would itself hit the
    # no-Pallas-on-CPU error — only the symbolic export trace is under
    # test here)
    ref = model.apply(variables, x, deterministic=True)

    monkeypatch.setattr(attention_core, "_pallas_ok", lambda: True)
    monkeypatch.setattr(attention_core, "FLASH_MIN_N", 16)

    path = str(tmp_path / "model.hlo")
    save_exported(path, model, variables,
                  image_size=m.image_size, in_channels=m.in_channels)
    fn, _ = load_exported(path)
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_kerple_auto_symbolic_batch_past_wall_uses_fft():
    """KERPLE 'auto' with a symbolic batch past the dense wall must pick
    the FFT path (Pallas can't trace a symbolic grid; dense would exceed
    the byte budget only for concrete shapes anyway). Checked at the
    dispatch level with jax.export symbolic dims."""
    from jax import export as jax_export

    from efficient_rpe_vit_tpu.ops import attention_core

    (b,) = jax_export.symbolic_shape("b")
    n = attention_core.KERPLE_DENSE_CROSSOVER_N  # past the hard N cap
    captured = {}

    def fake_fft(q, k, v, coeffs, fft_block):
        captured["method"] = "fft"
        return v

    def fake_pallas(q, k, v, coeffs, interpret=False):
        captured["method"] = "pallas"
        return v

    old_fft, old_pallas = attention_core._kerple_fft, attention_core._kerple_pallas
    attention_core._kerple_fft = fake_fft
    attention_core._kerple_pallas = fake_pallas
    try:
        q = jax.ShapeDtypeStruct((b, 2, n, 8), jnp.float32)
        # abstract trace only — enough to exercise the dispatch branch
        jax.eval_shape(
            lambda qq: attention_core.kerple_linear_attention(
                qq, qq, qq, jnp.ones((2, 2 * n - 1)), method="auto"),
            q,
        )
    finally:
        attention_core._kerple_fft = old_fft
        attention_core._kerple_pallas = old_pallas
    assert captured["method"] == "fft"
