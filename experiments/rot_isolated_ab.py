#!/usr/bin/env python
"""Isolated A/B: circulant rotation kernel vs XLA DFT chain at the ViT-B
long-N shape — with the CHAINED-IN-JIT protocol.

Single-call timings through the TPU tunnel sit on a ~1.5 ms dispatch
floor (measure it: a tiny x+1 jit times identically to a 50 MB kernel),
so sub-millisecond ops are invisible to per-call loops even with the
value-fetch barrier. This harness chains K=16 data-dependent rotations
inside ONE jit (fori_loop), so per-rotation cost = (call - floor)/K with
the floor amortised 16x. Lesson recorded in docs/BENCHMARKING.md
("chained-in-jit protocol", round 5).

Measured 2026-08-20 at [4,12,4097,64] bf16 (keep-CLS included):
    dispatch floor          ~1.5  ms/call
    XLA chain               0.28  ms/rotation   (fwd)
    Pallas kernel (rewrite) 0.54  ms/rotation   (fwd)
— isolated, XLA wins (its fp32 DFT matmuls run at bf16 MXU rate and the
elementwise epilogues fuse); at the MODEL level the kernel still wins
+4.5% for baseline_circulant because it chains layout-compatibly into
the flash custom call (results/rotation_kernel_ab_r5c.json), hence the
consumer-aware "auto" dispatch in ops/rotations.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from efficient_rpe_vit_tpu.ops.rotations import (
    _circulant_theta,
    _rdft_matrices,
    grid_positions_2d,
)
from efficient_rpe_vit_tpu.ops.pallas.rotation_kernels import circulant_rotate

B, H, N, D = 4, 12, 4097, 64
K = 16
REPS = 20


def fetch(out):
    """Value-fetch barrier (docs/BENCHMARKING.md rule 6): in-order device
    execution means fetching the LAST output forces the whole queue."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf[:1, :1].astype(jnp.float32)))


def timed(fn, *args):
    fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    print(f"backend={jax.default_backend()}  [{B},{H},{N},{D}] bf16, "
          f"K={K} chained rotations per call")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, H, N, D), jnp.bfloat16)
    pos = grid_positions_2d(N - 1)
    pos_all = np.concatenate([np.zeros((1, 2), np.float32), pos])
    coeffs = jax.random.normal(jax.random.PRNGKey(1), (H, 2, D)) * 0.01
    theta = _circulant_theta(pos_all, coeffs, D)
    ct, st = jnp.cos(theta), jnp.sin(theta)

    tiny = jnp.ones((8, 128), jnp.float32)
    floor = timed(jax.jit(lambda t: t + 1), tiny)
    print(f"dispatch floor (tiny add): {floor:7.3f} ms/call")

    @jax.jit
    def chain_kernel(x, ct, st):
        def body(i, y):
            return circulant_rotate(y, ct, st, 1024, False, True)

        return jax.lax.fori_loop(0, K, body, x)

    C_f, S_f, C_b, S_b = _rdft_matrices(D)
    ct33 = ct[None, :, :, : D // 2 + 1]
    st33 = st[None, :, :, : D // 2 + 1]

    def xla_rot(y):
        y32 = y.astype(jnp.float32)
        x_re = y32 @ C_f
        x_im = -(y32 @ S_f)
        y_re = ct33 * x_re - st33 * x_im
        y_im = st33 * x_re + ct33 * x_im
        out = (y_re @ C_b - y_im @ S_b).astype(y.dtype)
        is_cls = (jnp.arange(y.shape[2]) == 0)[None, None, :, None]
        return jnp.where(is_cls, y, out)

    @jax.jit
    def chain_xla(x):
        return jax.lax.fori_loop(0, K, lambda i, y: xla_rot(y), x)

    tk = timed(chain_kernel, x, ct, st)
    tx = timed(chain_xla, x)
    print(f"kernel: {tk:7.3f} ms/call -> {(tk - floor) / K:.4f} ms/rotation")
    print(f"xla   : {tx:7.3f} ms/call -> {(tx - floor) / K:.4f} ms/rotation")


if __name__ == "__main__":
    main()
