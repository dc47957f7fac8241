"""Toeplitz × matrix products: O(n log n) XLA-FFT path and an MXU dense path.

Semantics match the reference's `fft_toeplitz_matmul`
(reference: models/rpe/fft_utils.py:17-258): coefficients are ordered
``[c_{-(n-1)}, ..., c_{-1}, c_0, c_1, ..., c_{n-1}]`` and the Toeplitz matrix
is ``T[i, j] = c[(j - i) + (n - 1)]``.

TPU-first differences from the reference:
  * fully vectorised over arbitrary leading (batch/head) dims — the
    reference loops over heads in Python (fft_utils.py:73-80); here a single
    broadcasted XLA FFT covers all of them,
  * a **dense MXU path** (`toeplitz_matmul_dense`): at ViT-scale sequence
    lengths (n = 17) an n×n matmul on the 128×128 systolic array is far
    faster than an FFT round-trip on the VPU. `toeplitz_matmul` picks the
    path statically from the trace-time shape,
  * real-valued throughout the public API; complex lives only inside the FFT.
"""

from __future__ import annotations

import jax.numpy as jnp

# Raw T @ x dispatch window, measured on a real v5e with value-fetch
# chained A/Bs (experiments/crossover_ab.py, [8,2,N,44] bf16; full table
# in docs/BENCHMARKING.md): FFT wins only in a middle window —
#   N=197: dense 0.76 vs fft 0.49 ms   N=256: 0.71 vs 0.42   (fft wins)
#   N=512: 0.74 vs 0.87                N=4096: 35.3 vs 38.1  (dense wins)
# Below ~128 the dense work is a couple of MXU tiles and FFT setup
# dominates; above ~512 the FFT's complex VPU passes lose to the MXU's
# raw matmul rate. 'auto' therefore uses FFT for FFT_MIN_N <= n <
# FFT_MAX_N and dense elsewhere — but only for SMALL trailing dims:
# re-measured at ViT-Base dims ([2,12,N,266] bf16, D=64, round 3), dense
# wins at every N including the window (N=197: 1.22 vs 1.80 ms), because
# the per-lane FFT twiddle work scales with d while the MXU eats the
# added columns for free. FFT_MAX_D gates the window to the regime where
# it was actually measured to win.
FFT_MIN_N = 128
FFT_MAX_N = 512
FFT_MAX_D = 128  # FFT window applies only when x's last dim is below this
# Back-compat alias (old single-sided rule's name; tests/docs reference it)
DENSE_CROSSOVER_N = FFT_MIN_N


def _seq_len_from_coeffs(c) -> int:
    m = c.shape[-1]
    if m % 2 != 1:
        raise ValueError(f"coefficient length must be odd (2n-1), got {m}")
    return (m + 1) // 2


def toeplitz_from_coeffs(c, n: int | None = None):
    """Materialise T[..., i, j] = c[..., (j - i) + (n-1)].

    Args:
        c: [..., 2n-1] coefficients.
    Returns:
        [..., n, n] Toeplitz matrix.
    """
    if n is None:
        n = _seq_len_from_coeffs(c)
    idx = (jnp.arange(n)[None, :] - jnp.arange(n)[:, None]) + (n - 1)  # [n, n]
    return jnp.take(c, idx, axis=-1)


def toeplitz_matmul_dense(c, x):
    """Dense MXU path: materialise T (n×n) and matmul.

    Args:
        c: [..., 2n-1] coefficients (leading dims broadcast against x's).
        x: [..., n, d].
    Returns:
        [..., n, d] = T @ x, computed in fp32 on the MXU.
    """
    n = x.shape[-2]
    T = toeplitz_from_coeffs(c, n)
    return jnp.einsum(
        "...ij,...jd->...id", T, x, preferred_element_type=jnp.float32
    ).astype(x.dtype)


def toeplitz_matmul_fft(c, x):
    """O(n log n) path via circulant embedding + XLA FFT.

    The (2n-1)-circulant whose first column is
    ``[c_0, c_{-1}, ..., c_{-(n-1)}, c_{n-1}, ..., c_1]`` agrees with T on its
    leading n×n block (reference: fft_utils.py:142-146, 225-229). Multiply in
    the frequency domain, keep the first n rows, take the real part.

    Args:
        c: [..., 2n-1] coefficients (leading dims broadcast against x's).
        x: [..., n, d].
    Returns:
        [..., n, d] real.
    """
    n = x.shape[-2]
    if c.shape[-1] != 2 * n - 1:
        raise ValueError(
            f"coefficient length {c.shape[-1]} != 2n-1 for n={n}"
        )
    col = jnp.concatenate(
        [
            c[..., n - 1 : n],                      # c_0
            jnp.flip(c[..., : n - 1], axis=-1),      # c_{-1} .. c_{-(n-1)}
            jnp.flip(c[..., n:], axis=-1),           # c_{n-1} .. c_1
        ],
        axis=-1,
    )  # [..., 2n-1]
    m = 2 * n - 1
    c_fft = jnp.fft.fft(col, axis=-1)  # [..., m] complex
    pad = [(0, 0)] * (x.ndim - 2) + [(0, n - 1), (0, 0)]
    x_pad = jnp.pad(x, pad)
    x_fft = jnp.fft.fft(x_pad, axis=-2)  # [..., m, d]
    y = jnp.fft.ifft(c_fft[..., :, None] * x_fft, axis=-2)
    return y[..., :n, :].real.astype(x.dtype)


def toeplitz_matmul(c, x, method: str = "auto"):
    """Toeplitz(c) @ x with static path selection.

    Args:
        c: [..., 2n-1] coefficients.
        x: [..., n, d] (also accepts [..., n], treated as d=1).
        method: 'auto' | 'fft' | 'dense'. 'auto' picks fft only in the
            measured [FFT_MIN_N, FFT_MAX_N) window (trace-time static
            shape), dense elsewhere.
    """
    squeeze = x.ndim == c.ndim  # vector input [..., n]
    if squeeze:
        x = x[..., None]
    n = x.shape[-2]
    if c.shape[-1] != 2 * n - 1:
        raise ValueError(
            f"coefficient length {c.shape[-1]} != 2n-1={2 * n - 1} for n={n}"
        )
    if method == "auto":
        method = (
            "fft"
            if FFT_MIN_N <= n < FFT_MAX_N and x.shape[-1] < FFT_MAX_D
            else "dense"
        )
    if method == "dense":
        y = toeplitz_matmul_dense(c, x)
    elif method == "fft":
        y = toeplitz_matmul_fft(c, x)
    else:
        raise ValueError(f"unknown method {method!r}")
    return y[..., 0] if squeeze else y


def naive_toeplitz_matmul(c, x):
    """O(n^2) oracle used by tests (reference: fft_utils.py:295-308)."""
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    n = x.shape[-2]
    T = toeplitz_from_coeffs(c, n)
    y = T @ x
    return y[..., 0] if squeeze else y
