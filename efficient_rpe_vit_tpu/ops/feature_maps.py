"""Random-feature maps for linear attention (FAVOR+ and ReLU-Performer).

Semantics follow the reference:
  * positive random features phi+(x) = exp(x@Omega - max - ||x||^2/2)/sqrt(m)
    (reference: models/attention/favor_plus.py:112-140),
  * ReLU features phi(x) = relu(x@Omega)/sqrt(m)
    (reference: models/attention/relu.py:116-138),
  * per-head orthogonal Omega via blockwise QR, scaled by sqrt(head_dim)
    (reference: favor_plus.py:83-110).

TPU-first notes: Omega generation is an explicit `jax.random` function of a
key (the reference mutates torch global RNG); everything is batched over the
heads axis in one QR call instead of a Python loop; the feature projection is
a single einsum that lands on the MXU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def default_num_features(head_dim: int) -> int:
    """Performer-paper default m = floor(d_h * ln d_h)
    (reference: favor_plus.py:50-53)."""
    return int(head_dim * math.log(head_dim))


def mxu_num_features(head_dim: int) -> int:
    """Lane-aligned feature count (`num_features='mxu'`).

    The feature axis is the minor-most (lane) dimension of every phi
    matmul, and the MXU pads it to a multiple of 128. The paper default
    m = floor(d_h ln d_h) therefore buys NOTHING between lane multiples:
    at d_h=16, m=44 and m=128 take identical matmul time (the padding is
    free estimator capacity — take it); at d_h=64, m=266 pads to 384
    (1.44x wasted lanes) while m=256 is exact. Policy: round the paper
    default to the nearest multiple of 128, never below 128."""
    return max(128, 128 * round(default_num_features(head_dim) / 128))


def gaussian_features(key, heads: int, head_dim: int, num_features: int):
    """i.i.d. N(0,1) feature matrix, shape [heads, head_dim, num_features]."""
    return jax.random.normal(key, (heads, head_dim, num_features))


def orthogonal_gaussian_features(key, heads: int, head_dim: int, num_features: int):
    """Blockwise-orthogonal random features, shape [heads, head_dim, m].

    Draws ceil(m / d) Gaussian d×d blocks per head, orthonormalises each with
    QR, concatenates columns, truncates to m, scales by sqrt(d) so row norms
    match the Gaussian case in expectation (reference: favor_plus.py:89-110).
    """
    num_blocks = -(-num_features // head_dim)  # ceil
    g = jax.random.normal(key, (heads, num_blocks, head_dim, head_dim))
    q, _ = jnp.linalg.qr(g)  # batched QR over [heads, blocks]
    # [heads, blocks, d, d] -> [heads, d, blocks*d]: omega[h, i, b*d+j] = q[h, b, i, j]
    omega = jnp.transpose(q, (0, 2, 1, 3)).reshape(
        heads, head_dim, num_blocks * head_dim
    )
    omega = omega[:, :, :num_features]
    return omega * math.sqrt(head_dim)


def phi_positive(x, omega):
    """Positive random features for the softmax kernel (FAVOR+).

    phi+(x) = exp(x@Omega - rowmax(x@Omega) - ||x||^2 / 2) / sqrt(m)

    The row-max subtraction is a stop-gradient stabiliser, matching the
    reference's `.detach()` placement (favor_plus.py:130-132). Guarantees
    strictly positive features -> unbiased softmax-kernel estimator.

    Args:
        x: [B, H, N, D] queries or keys (already scaled by d^-1/4).
        omega: [H, D, M] random feature matrix.
    Returns:
        [B, H, N, M] positive features.
    """
    m = omega.shape[-1]
    proj = jnp.einsum("bhnd,hdf->bhnf", x, omega, preferred_element_type=jnp.float32)
    proj_max = jax.lax.stop_gradient(jnp.max(proj, axis=-1, keepdims=True))
    x_norm_sq_half = jnp.sum(jnp.square(x), axis=-1, keepdims=True) / 2.0
    phi = jnp.exp(proj - proj_max - x_norm_sq_half) / math.sqrt(m)
    return phi.astype(x.dtype)


def phi_hyperbolic(x, omega):
    """Positive hyperbolic random features (Performer paper, Lemma 1):

    phi_hyp(x) = exp(-||x||^2/2) / sqrt(2m) * [exp(x@W); exp(-x@W)]

    Uses both signs of each projection — an antithetic-variates pair that
    halves estimator variance relative to phi+ at the same m (the feature
    dimension doubles to 2m). Not present in the reference; provided as the
    `favor_hyper` attention option.

    Args:
        x: [B, H, N, D].
        omega: [H, D, M].
    Returns:
        [B, H, N, 2M] positive features.
    """
    m = omega.shape[-1]
    proj = jnp.einsum("bhnd,hdf->bhnf", x, omega, preferred_element_type=jnp.float32)
    stab = jax.lax.stop_gradient(
        jnp.max(jnp.abs(proj), axis=-1, keepdims=True)
    )
    x_norm_sq_half = jnp.sum(jnp.square(x), axis=-1, keepdims=True) / 2.0
    pos = jnp.exp(proj - stab - x_norm_sq_half)
    neg = jnp.exp(-proj - stab - x_norm_sq_half)
    phi = jnp.concatenate([pos, neg], axis=-1) / math.sqrt(2 * m)
    return phi.astype(x.dtype)


def phi_relu(x, omega):
    """ReLU random features phi(x) = relu(x@Omega)/sqrt(m)
    (reference: relu.py:116-138). Naturally stable — no exp/max tricks.

    Args:
        x: [B, H, N, D].
        omega: [H, D, M].
    Returns:
        [B, H, N, M] non-negative features.
    """
    m = omega.shape[-1]
    proj = jnp.einsum("bhnd,hdf->bhnf", x, omega, preferred_element_type=jnp.float32)
    return (jax.nn.relu(proj) / math.sqrt(m)).astype(x.dtype)
