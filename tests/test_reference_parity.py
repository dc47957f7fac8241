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

from efficient_rpe_vit_tpu.configs import mnist_config
from efficient_rpe_vit_tpu.models import create_model


def _build_reference_model(name):
    from configs.datasets.mnist import MNIST_CONFIG  # reference import
    from models.factory import create_model as ref_create_model

    torch.manual_seed(0)
    model = ref_create_model(name, MNIST_CONFIG)
    model.eval()
    return model


def _torch_params_to_flax(ref_model, flax_params):
    """Copy reference torch weights into a same-shape flax params tree."""
    import copy

    p = copy.deepcopy(jax.tree_util.tree_map(np.asarray, flax_params))
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    p["patch_embedding"]["kernel"] = sd["patch_embedding.weight"].T
    p["patch_embedding"]["bias"] = sd["patch_embedding.bias"]
    p["cls_token"] = sd["cls_token"]
    p["pos_embedding"] = sd["pos_embedding"]
    p["head_norm"]["scale"] = sd["mlp_head.0.weight"]
    p["head_norm"]["bias"] = sd["mlp_head.0.bias"]
    p["head"]["kernel"] = sd["mlp_head.1.weight"].T
    p["head"]["bias"] = sd["mlp_head.1.bias"]

    n_blocks = len(ref_model.transformer_blocks)
    for i in range(n_blocks):
        blk = p[f"block_{i}"]
        pre = f"transformer_blocks.{i}."
        blk["norm1"]["scale"] = sd[pre + "norm1.weight"]
        blk["norm1"]["bias"] = sd[pre + "norm1.bias"]
        blk["norm2"]["scale"] = sd[pre + "norm2.weight"]
        blk["norm2"]["bias"] = sd[pre + "norm2.bias"]
        blk["attention"]["qkv"]["kernel"] = sd[pre + "attention.qkv.weight"].T
        if pre + "attention.qkv.bias" in sd:
            blk["attention"]["qkv"]["bias"] = sd[pre + "attention.qkv.bias"]
        blk["attention"]["proj"]["kernel"] = sd[pre + "attention.proj.weight"].T
        blk["attention"]["proj"]["bias"] = sd[pre + "attention.proj.bias"]
        blk["mlp"]["fc1"]["kernel"] = sd[pre + "mlp.0.weight"].T
        blk["mlp"]["fc1"]["bias"] = sd[pre + "mlp.0.bias"]
        blk["mlp"]["fc2"]["kernel"] = sd[pre + "mlp.3.weight"].T
        blk["mlp"]["fc2"]["bias"] = sd[pre + "mlp.3.bias"]
        if pre + "rpe.rel_pos_bias" in sd:
            blk["rpe"]["rel_pos_bias"] = sd[pre + "rpe.rel_pos_bias"]
        if pre + "rpe.circulant_coeffs" in sd:
            blk["rpe"]["circulant_coeffs"] = sd[pre + "rpe.circulant_coeffs"]
    return jax.tree_util.tree_map(jnp.asarray, p)


def _copy_omega(ref_model, variables):
    """Copy the reference's random-feature buffers into flax 'constants'."""
    import copy

    consts = copy.deepcopy(
        jax.tree_util.tree_map(np.asarray, variables["constants"])
    )
    for i, blk in enumerate(ref_model.transformer_blocks):
        omega = blk.attention.omega.detach().numpy()
        consts[f"block_{i}"]["attention"]["omega"] = omega
    return jax.tree_util.tree_map(jnp.asarray, consts)


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


@pytest.mark.parametrize("variant,atol", PARITY_VARIANTS)
def test_logit_parity(variant, atol):
    ref_model = _build_reference_model(variant)

    cfg = mnist_config()
    model = create_model(variant, cfg)
    rng = jax.random.PRNGKey(0)
    x_np = np.random.default_rng(0).normal(size=(4, 28, 28, 1)).astype(np.float32)
    variables = model.init({"params": rng}, jnp.asarray(x_np),
                           deterministic=True)
    variables = dict(variables)
    variables["params"] = _torch_params_to_flax(ref_model, variables["params"])
    if "constants" in variables:
        variables["constants"] = _copy_omega(ref_model, variables)

    ours = np.asarray(
        model.apply(variables, jnp.asarray(x_np), deterministic=True)
    )
    with torch.no_grad():
        theirs = ref_model(
            torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=atol, rtol=1e-3)
