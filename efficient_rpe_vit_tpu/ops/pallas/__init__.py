"""Pallas TPU kernels — the fused hot paths (SURVEY.md §7 stage 8).

Every kernel is gated against its jnp reference in ops/attention_core.py
(the naive-oracle test pattern, SURVEY.md §4) and runs in interpret mode on
CPU for tests.
"""

from .attention_kernels import (
    flash_softmax_attention,
    fused_masked_linear_attention,
    pallas_available,
)
from .masked_linear_coeffs import (
    kerple_attention_fused_phi,
    masked_linear_attention_coeffs,
)

__all__ = [
    "flash_softmax_attention",
    "fused_masked_linear_attention",
    "kerple_attention_fused_phi",
    "masked_linear_attention_coeffs",
    "pallas_available",
]
