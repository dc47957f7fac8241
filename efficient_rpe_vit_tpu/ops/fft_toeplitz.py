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

import jax
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

    Row i is the contiguous window c[(n-1-i) : (2n-1-i)], so T builds as n
    vmapped dynamic-slices (a contiguous-window gather) per leading batch.
    Chosen over the two alternatives by on-chip measurement at
    [12, 2*4097-1] (experiments note, docs/BENCHMARKING.md): a 2D-index
    `jnp.take` lowers to a [n*n, heads] gather whose minor heads dim pads
    to 128 lanes (9.7 GB temp, 67.7 ms) and a broadcast+pad+reshape
    pipeline relayouts ~1.5 GB flats (8.1 GB temp, 145 ms); the window
    form runs in 40.6 ms with ZERO temp bytes.

    Args:
        c: [..., 2n-1] coefficients.
    Returns:
        [..., n, n] Toeplitz matrix.
    """
    if n is None:
        n = _seq_len_from_coeffs(c)
    lead = c.shape[:-1]
    m = c.shape[-1]  # 2n - 1

    # Rows are gathered in groups of G: one dynamic-slice window of
    # n + G - 1 covers G consecutive rows, whose individual rows are then
    # static in-window slices — G-fold fewer DMA descriptors than one
    # slice per row (the gather is latency-, not bandwidth-, bound).
    G = 8
    ng = -(-n // G) * G  # rows padded up to a group multiple
    # group g covers rows i = Gg..Gg+G-1; its window starts at
    # (n-1) - (Gg+G-1) in c, which goes negative for padded rows -> front
    # pad c so every start is >= 0.
    front = ng - n + G - 1
    starts = (n - 1 + front) - (G * jnp.arange(ng // G) + G - 1)

    def per_vector(cv):
        cpad = jnp.pad(cv, (front, G - 1))

        def group(s):
            w = jax.lax.dynamic_slice(cpad, (s,), (n + G - 1,))
            return jnp.stack(
                [jax.lax.slice(w, (G - 1 - r,), (G - 1 - r + n,))
                 for r in range(G)]
            )

        return jax.vmap(group)(starts).reshape(ng, n)[:n]

    if not lead:
        return per_vector(c)
    flat = c.reshape(-1, m)
    return jax.vmap(per_vector)(flat).reshape(*lead, n, n)


def toeplitz_diag_sums(x):
    """Sum each Toeplitz diagonal: out[..., d] = sum_{j-i+n-1 = d} x[..., i, j].

    This is exactly the VJP of `toeplitz_from_coeffs` (dcoeffs from dT).
    Row i contributes x[i, :] at offset n-1-i of the output, so the sum is
    a hierarchical reduction: combine every G consecutive rows with STATIC
    relative shifts (pad-and-add), which multiplies the inter-row stride
    by G per level — log_G(n) levels of vectorised adds, no gather, no
    scatter, no reshuffle. The two rejected alternatives both fell over at
    n=4097: XLA's take-transpose scatter materialised a layout-padded
    [n*n, heads] temp (8 GB), and a flatten+reshape pipeline relayouts
    ~1.5 GB flats per call.

    Args:
        x: [..., n, n].
    Returns:
        [..., 2n-1] diagonal sums, indexed by d = (j - i) + (n - 1).
    """
    n = x.shape[-1]
    lead = x.shape[:-2]
    G = 8

    def reduce_one(M):
        R, W, s = M.shape[0], M.shape[1], 1
        while R > 1:
            P = (-R) % G
            if P:
                # zero rows pad at the FRONT: row r keeps offset (R-1-r)s
                M = jnp.pad(M, ((P, 0), (0, 0)))
                R += P
            Wn = W + (G - 1) * s
            Mg = M.reshape(R // G, G, W)
            acc = jnp.zeros((R // G, Wn), M.dtype)
            for u in range(G):  # static in-group shift (G-1-u)*s
                off = (G - 1 - u) * s
                acc = acc.at[:, off:off + W].add(Mg[:, u, :])
            M, R, W, s = acc, R // G, Wn, G * s
        return M[0, : 2 * n - 1]

    flat = x.reshape(-1, n, n)
    return jax.vmap(reduce_one)(flat).reshape(*lead, 2 * n - 1)


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
