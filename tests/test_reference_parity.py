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


@pytest.mark.parametrize("variant,atol", PARITY_VARIANTS)
def test_logit_parity(variant, atol):
    ref_model = _build_reference_model(variant)

    cfg = mnist_config()
    model = create_model(variant, cfg)
    rng = jax.random.PRNGKey(0)
    x_np = np.random.default_rng(0).normal(size=(4, 28, 28, 1)).astype(np.float32)
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
