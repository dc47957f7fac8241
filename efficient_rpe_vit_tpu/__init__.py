"""efficient_rpe_vit_tpu — a TPU-native JAX framework for RPE × attention research.

A from-scratch rebuild (jit/pjit + Pallas + XLA FFT) of the capabilities of the
reference framework `alemassaad/efficient-rpe-vit` (PyTorch, single device):
three attention mechanisms (softmax O(N^2), FAVOR+ O(N), ReLU-linear O(N))
composed with four positional treatments (none, RoPE, KERPLE FFT-bias,
Circulant-STRING FFT-rotation) into 11 model variants, plus a full training /
evaluation / benchmarking / visualization stack and a new first-class
parallelism layer (mesh + sharded train steps) that the reference lacks.

Design stance (TPU-first):
  * functional compute cores in `ops/` — pure jnp/Pallas functions, statically
    dispatched per variant (each variant compiles to its own fused XLA program;
    the reference's runtime isinstance dispatch becomes trace-time selection),
  * flax.linen modules in `models/` as thin parameter containers,
  * explicit PRNG-key threading everywhere (no global seeds),
  * `jax.sharding.Mesh` + NamedSharding data/tensor parallelism in `parallel/`.
"""

from .version import __version__

__all__ = ["__version__"]
