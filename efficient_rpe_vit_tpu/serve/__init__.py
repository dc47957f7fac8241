"""Serving: ahead-of-time export of trained models (SURVEY §5 "deployment").

The reference's only deployment artifact is a torch checkpoint that needs
the full model zoo + Python class tree to reload (reference:
experiments/utils/training.py:373-413 `save_checkpoint`, which pickles
`model.state_dict()` and is consumed by re-instantiating the factory). The
TPU-native equivalent is an **ahead-of-time compiled artifact**: trace the
jitted forward once, embed the trained weights as constants, serialize the
StableHLO (jax.export), and serve it from any process — no flax, no model
code, no factory, no retracing. The batch dimension is exported
symbolically, so ONE artifact serves every batch size; the platform list
is recorded in the artifact and checked at load time, so a CPU host can
export for TPU serving.
"""

from .export import (
    export_forward,
    load_exported,
    save_exported,
)

__all__ = ["export_forward", "save_exported", "load_exported"]
