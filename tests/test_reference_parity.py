"""Cross-framework logit parity against the PyTorch reference.

Builds the reference's torch model (imported from /root/reference, CPU),
copies its weights into our flax params, and compares logits on the same
inputs. This is the strongest fidelity gate (SURVEY.md §7 stage-2/5): it
catches any architectural or math divergence that unit tests can't.

Skipped automatically when torch or the reference checkout is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(REFERENCE):
    pytest.skip("reference checkout unavailable", allow_module_level=True)

if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

import jax
import jax.numpy as jnp

from efficient_rpe_vit_tpu.configs import cifar10_config, mnist_config
from efficient_rpe_vit_tpu.models import create_model


def _build_reference_model(name, dataset="mnist"):
    from configs.datasets.cifar10 import CIFAR10_CONFIG  # reference import
    from configs.datasets.mnist import MNIST_CONFIG
    from models.factory import create_model as ref_create_model

    torch.manual_seed(0)
    cfg = MNIST_CONFIG if dataset == "mnist" else CIFAR10_CONFIG
    model = ref_create_model(name, cfg)
    model.eval()
    return model


# (our config constructor, image size, channels) per dataset — CIFAR-10
# exercises the 3-channel patch-8 (C,p,p) patchify path under imported
# reference weights (reference: configs/datasets/cifar10.py:14-40 feeding
# base_vit.py:188-196), where a channel-ordering bug would hide.
DATASETS = {
    "mnist": (mnist_config, 28, 1),
    "cifar10": (cifar10_config, 32, 3),
}


from efficient_rpe_vit_tpu.utils.import_torch import import_reference_model


def _collect_state_dict(ref_model):
    """state_dict + the omega buffers (registered buffers ARE in
    state_dict; this is here to make the dependency explicit)."""
    return ref_model.state_dict()


PARITY_VARIANTS = [
    ("baseline", 2e-5),
    ("baseline_rope", 2e-5),
    ("baseline_circulant", 5e-5),
    ("performer_favor", 5e-5),
    ("performer_favor_rope", 5e-5),
    ("performer_favor_circulant", 5e-5),
    ("performer_favor_most_general", 5e-4),  # FFT vs masked-matmul path
    ("performer_relu", 5e-5),
    ("performer_relu_rope", 5e-5),
    ("performer_relu_circulant", 5e-5),
    ("performer_relu_most_general", 5e-4),
]


def _check_logit_parity(variant, atol, dataset):
    ref_model = _build_reference_model(variant, dataset)

    make_cfg, size, channels = DATASETS[dataset]
    cfg = make_cfg()
    model = create_model(variant, cfg)
    rng = jax.random.PRNGKey(0)
    x_np = np.random.default_rng(0).normal(
        size=(4, size, size, channels)
    ).astype(np.float32)
    variables = model.init({"params": rng}, jnp.asarray(x_np),
                           deterministic=True)
    variables = import_reference_model(ref_model, variables)

    ours = np.asarray(
        model.apply(variables, jnp.asarray(x_np), deterministic=True)
    )
    with torch.no_grad():
        theirs = ref_model(
            torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=atol, rtol=1e-3)


# Fast tier: two representatives — the vanilla softmax path and the flagship
# FAVOR+ + KERPLE path (covers patchify/embed/head plus the FFT-Toeplitz
# attention math). The full 22-case matrix runs in the slow tier.
@pytest.mark.parametrize(
    "variant,atol",
    [("baseline", 2e-5), ("performer_favor_most_general", 5e-4)],
)
def test_logit_parity_fast(variant, atol):
    _check_logit_parity(variant, atol, "mnist")


@pytest.mark.slow
@pytest.mark.parametrize("dataset", ["mnist", "cifar10"])
@pytest.mark.parametrize("variant,atol", PARITY_VARIANTS)
def test_logit_parity(variant, atol, dataset):
    _check_logit_parity(variant, atol, dataset)


@pytest.mark.slow
def test_gradient_parity_kerple():
    """Cross-framework GRADIENT parity (VERDICT r2 missing #3): one full
    backward of the flagship variant (FAVOR+ + KERPLE) under identical
    weights — pins the custom-VJP KERPLE backward
    (ops/attention_core.py::masked_linear_vjp_residual) to torch autograd
    through the reference's FFT path (kerple.py:99-344)."""
    import torch.nn.functional as F

    variant = "performer_favor_most_general"
    ref_model = _build_reference_model(variant, "mnist")

    cfg = mnist_config()
    model = create_model(variant, cfg)
    rng = jax.random.PRNGKey(0)
    gen = np.random.default_rng(1)
    x_np = gen.normal(size=(8, 28, 28, 1)).astype(np.float32)
    y_np = (np.arange(8) % 10).astype(np.int64)
    variables = model.init({"params": rng}, jnp.asarray(x_np),
                           deterministic=True)
    variables = import_reference_model(ref_model, variables)
    consts = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(params):
        logits = model.apply({**consts, "params": params},
                             jnp.asarray(x_np), deterministic=True)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(
            logp, jnp.asarray(y_np)[:, None], axis=1))

    g = jax.grad(loss_fn)(variables["params"])

    # torch: same CE loss; eval() keeps dropout off while grads still flow
    logits_t = ref_model(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    loss_t = F.cross_entropy(logits_t, torch.from_numpy(y_np))
    loss_t.backward()
    ref_grads = {n: p.grad.detach().numpy()
                 for n, p in ref_model.named_parameters()
                 if p.grad is not None}

    # leaves spanning every layer type; torch Linear weights transpose
    pairs = [
        (g["patch_embedding"]["kernel"].T, "patch_embedding.weight"),
        (g["cls_token"], "cls_token"),
        (g["pos_embedding"], "pos_embedding"),
        (g["block_0"]["attention"]["qkv"]["kernel"].T,
         "transformer_blocks.0.attention.qkv.weight"),
        (g["block_0"]["attention"]["proj"]["kernel"].T,
         "transformer_blocks.0.attention.proj.weight"),
        (g["block_0"]["rpe"]["rel_pos_bias"],
         "transformer_blocks.0.rpe.rel_pos_bias"),
        (g["block_2"]["rpe"]["rel_pos_bias"],
         "transformer_blocks.2.rpe.rel_pos_bias"),
        (g["block_1"]["mlp"]["fc1"]["kernel"].T,
         "transformer_blocks.1.mlp.0.weight"),
        (g["block_0"]["norm1"]["scale"],
         "transformer_blocks.0.norm1.weight"),
        (g["head"]["kernel"].T, "mlp_head.1.weight"),
    ]
    assert float(loss_t) == pytest.approx(float(loss_fn(variables["params"])),
                                          rel=1e-4)
    for ours, name in pairs:
        theirs = ref_grads[name]
        scale = max(float(np.abs(theirs).max()), 1e-8)
        np.testing.assert_allclose(
            np.asarray(ours), theirs, rtol=2e-3, atol=2e-3 * scale,
            err_msg=name,
        )
