"""FFT Toeplitz correctness contract.

Ports the reference's TestFFTToeplitzMultiplication strategy
(reference: test_kerple.py:23-93): FFT path vs naive O(n^2) oracle, shape
handling, Toeplitz structure, and gradient flow through the FFT.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_rpe_vit_tpu.ops import (
    naive_toeplitz_matmul,
    toeplitz_from_coeffs,
    toeplitz_matmul,
    toeplitz_matmul_dense,
    toeplitz_matmul_fft,
)

RTOL = 1e-4
ATOL = 1e-5


@pytest.mark.parametrize("n,d", [(4, 8), (16, 3), (17, 16), (32, 44), (7, 1)])
def test_fft_matches_naive(rng, n, d):
    kc, kx = jax.random.split(rng)
    c = jax.random.normal(kc, (2 * n - 1,))
    x = jax.random.normal(kx, (n, d))
    got = toeplitz_matmul_fft(c, x)
    want = naive_toeplitz_matmul(c, x)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("n,d", [(8, 4), (17, 16)])
def test_dense_matches_naive(rng, n, d):
    kc, kx = jax.random.split(rng)
    c = jax.random.normal(kc, (2 * n - 1,))
    x = jax.random.normal(kx, (n, d))
    np.testing.assert_allclose(
        toeplitz_matmul_dense(c, x), naive_toeplitz_matmul(c, x),
        rtol=RTOL, atol=ATOL,
    )


def test_batched_multihead(rng):
    """[H, 2n-1] coeffs broadcast against [B, H, n, d] inputs — the shape the
    KERPLE path uses (reference loops per head; here one vectorised call)."""
    B, H, n, d = 3, 2, 17, 5
    kc, kx = jax.random.split(rng)
    c = jax.random.normal(kc, (H, 2 * n - 1))
    x = jax.random.normal(kx, (B, H, n, d))
    got_fft = toeplitz_matmul_fft(c, x)
    got_dense = toeplitz_matmul_dense(c, x)
    want = np.stack(
        [
            np.stack(
                [np.asarray(naive_toeplitz_matmul(c[h], x[b, h])) for h in range(H)]
            )
            for b in range(B)
        ]
    )
    np.testing.assert_allclose(got_fft, want, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(got_dense, want, rtol=RTOL, atol=ATOL)


def test_vector_input(rng):
    n = 9
    kc, kx = jax.random.split(rng)
    c = jax.random.normal(kc, (2 * n - 1,))
    x = jax.random.normal(kx, (n,))
    got = toeplitz_matmul(c, x, method="fft")
    want = naive_toeplitz_matmul(c, x)
    assert got.shape == (n,)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_toeplitz_constant_diagonals(rng):
    """T[i, j] depends only on j - i (reference: test_kerple.py:64-78)."""
    n = 6
    c = jax.random.normal(rng, (2 * n - 1,))
    T = np.asarray(toeplitz_from_coeffs(c, n))
    for i in range(n):
        for j in range(n):
            np.testing.assert_allclose(T[i, j], np.asarray(c)[j - i + n - 1])


def test_known_matrix():
    """Anchor from the reference docstring (fft_utils.py:276-281)."""
    c = jnp.array([4.0, 3.0, 2.0, 1.0, 2.0, 3.0, 4.0])
    T = np.asarray(toeplitz_from_coeffs(c, 4))
    want = np.array(
        [[1, 2, 3, 4], [2, 1, 2, 3], [3, 2, 1, 2], [4, 3, 2, 1]], np.float32
    )
    np.testing.assert_allclose(T, want)


@pytest.mark.parametrize("method", ["fft", "dense"])
def test_gradients_flow(rng, method):
    """Gradients flow through both paths and match each other
    (reference: test_kerple.py:80-93)."""
    n, d = 12, 4
    kc, kx = jax.random.split(rng)
    c = jax.random.normal(kc, (2 * n - 1,))
    x = jax.random.normal(kx, (n, d))

    def loss(c, x, method):
        return jnp.sum(toeplitz_matmul(c, x, method=method) ** 2)

    gc, gx = jax.grad(loss, argnums=(0, 1))(c, x, method)
    gc_ref, gx_ref = jax.grad(loss, argnums=(0, 1))(c, x, "dense")
    assert jnp.all(jnp.isfinite(gc)) and jnp.all(jnp.isfinite(gx))
    np.testing.assert_allclose(gc, gc_ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(gx, gx_ref, rtol=1e-3, atol=1e-4)


def test_auto_dispatch(rng):
    n_small, n_big, d = 17, 200, 4
    for n in (n_small, n_big):
        kc, kx = jax.random.split(jax.random.fold_in(rng, n))
        c = jax.random.normal(kc, (2 * n - 1,))
        x = jax.random.normal(kx, (n, d))
        np.testing.assert_allclose(
            toeplitz_matmul(c, x, method="auto"),
            naive_toeplitz_matmul(c, x),
            rtol=RTOL, atol=1e-4,
        )


def test_fft_relative_error_small(rng):
    """FFT relative error < 1e-4 at n=32 (reference: test_kerple.py:452-466)."""
    n, d = 32, 8
    kc, kx = jax.random.split(rng)
    c = jnp.exp(jax.random.normal(kc, (2 * n - 1,)) * 0.02)  # KERPLE-like coeffs
    x = jax.random.normal(kx, (n, d))
    got = toeplitz_matmul_fft(c, x)
    want = naive_toeplitz_matmul(c, x)
    rel = jnp.linalg.norm(got - want) / jnp.linalg.norm(want)
    assert rel < 1e-4


def test_toeplitz_diag_sums_matches_gather_vjp(rng):
    """toeplitz_diag_sums IS the VJP of toeplitz_from_coeffs (dcoeffs from
    dT), reformulated as reverse+pad+reshape+sum because XLA's
    take-transpose scatter materialised an 8 GB layout-padded temp at
    ViT-B long-N shapes (the long-N KERPLE backward's memory blocker)."""
    from efficient_rpe_vit_tpu.ops.fft_toeplitz import toeplitz_diag_sums

    for shape in [(3, 9), (2, 2, 13), (12, 2 * 197 - 1)]:
        n = (shape[-1] + 1) // 2
        c = jax.random.normal(rng, shape)
        dT = jax.random.normal(jax.random.PRNGKey(1), shape[:-1] + (n, n))
        _, vjp = jax.vjp(lambda c: toeplitz_from_coeffs(c, n), c)
        (want,) = vjp(dT)
        got = toeplitz_diag_sums(dT)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n", [1, 2, 3, 7, 8, 9, 16, 17, 31])
def test_toeplitz_from_coeffs_group_boundaries(rng, n):
    """The grouped-window gather (G=8 rows per dynamic slice) must equal
    naive indexing at every n around the group boundaries."""
    from efficient_rpe_vit_tpu.ops.fft_toeplitz import toeplitz_from_coeffs

    c = jax.random.normal(rng, (3, 2 * n - 1))
    T = np.asarray(toeplitz_from_coeffs(c, n))
    idx = (np.arange(n)[None, :] - np.arange(n)[:, None]) + (n - 1)
    np.testing.assert_allclose(T, np.asarray(c)[:, idx], rtol=1e-6)


@pytest.mark.parametrize("n", [1, 2, 7, 8, 9, 17, 64, 65])
def test_toeplitz_diag_sums_group_boundaries(rng, n):
    """Hierarchical diagonal sums == dense per-diagonal sums at ns that
    exercise front-padding in every reduction level."""
    from efficient_rpe_vit_tpu.ops.fft_toeplitz import toeplitz_diag_sums

    x = jax.random.normal(rng, (2, n, n))
    got = np.asarray(toeplitz_diag_sums(x))
    xs = np.asarray(x)
    want = np.zeros((2, 2 * n - 1))
    for i in range(n):
        for j in range(n):
            want[:, (j - i) + n - 1] += xs[:, i, j]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
