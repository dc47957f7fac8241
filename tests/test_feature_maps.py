"""Random-feature map contracts (ports reference test_performer.py:29-121)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_rpe_vit_tpu.ops import (
    default_num_features,
    gaussian_features,
    orthogonal_gaussian_features,
    phi_positive,
    phi_relu,
)


def test_default_num_features():
    # head_dim 16 -> floor(16 * ln 16) = 44 (SURVEY.md §2 anchor)
    assert default_num_features(16) == 44
    assert default_num_features(64) == int(64 * math.log(64))


def test_orthogonality(rng):
    """Columns within each d-sized block are orthogonal with norm sqrt(d)
    (reference: test_performer.py:40-65)."""
    heads, d, m = 2, 16, 16
    omega = orthogonal_gaussian_features(rng, heads, d, m)
    assert omega.shape == (heads, d, m)
    for h in range(heads):
        gram = np.asarray(omega[h].T @ omega[h])
        np.testing.assert_allclose(gram, np.eye(m) * d, atol=1e-3)


def test_orthogonality_blockwise(rng):
    """m > d: each d-column block is internally orthogonal."""
    heads, d, m = 2, 16, 44
    omega = orthogonal_gaussian_features(rng, heads, d, m)
    assert omega.shape == (heads, d, m)
    blk = np.asarray(omega[0][:, :d])
    np.testing.assert_allclose(blk.T @ blk, np.eye(d) * d, atol=1e-3)


def test_iid_stats(rng):
    """i.i.d. features are ~N(0,1) (reference: test_performer.py:67-88)."""
    omega = gaussian_features(rng, 4, 32, 64)
    assert abs(float(jnp.mean(omega))) < 0.05
    assert abs(float(jnp.std(omega)) - 1.0) < 0.05


def test_phi_positive_is_positive(rng):
    """phi+ must be strictly positive (reference: test_performer.py:90-121)."""
    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (2, 2, 17, 16))
    omega = orthogonal_gaussian_features(k2, 2, 16, 44)
    phi = phi_positive(x, omega)
    assert phi.shape == (2, 2, 17, 44)
    assert bool(jnp.all(phi > 0))
    assert bool(jnp.all(jnp.isfinite(phi)))


@pytest.mark.parametrize("scale", [10.0, 0.01])
def test_phi_positive_stability(rng, scale):
    """No NaN/Inf at +-10x / 0.01x input scale (reference: test_performer.py:177-196)."""
    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (2, 2, 17, 16)) * scale
    omega = orthogonal_gaussian_features(k2, 2, 16, 44)
    phi = phi_positive(x, omega)
    assert bool(jnp.all(jnp.isfinite(phi)))


def test_phi_relu_nonneg_and_sparse(rng):
    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (2, 2, 17, 16))
    omega = orthogonal_gaussian_features(k2, 2, 16, 44)
    phi = phi_relu(x, omega)
    assert phi.shape == (2, 2, 17, 44)
    assert bool(jnp.all(phi >= 0))
    # ReLU zeroes roughly half the projections
    frac_zero = float(jnp.mean(phi == 0))
    assert 0.2 < frac_zero < 0.8


def test_phi_gradients(rng):
    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (1, 2, 8, 16))
    omega = orthogonal_gaussian_features(k2, 2, 16, 32)
    g = jax.grad(lambda x: jnp.sum(phi_positive(x, omega) ** 2))(x)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).max()) > 0


def test_softmax_kernel_approximation(rng):
    """phi+(q) . phi+(k) is an unbiased estimator of exp(q.k) after undoing
    the (known, deterministic) max-shift stabilisers:

        phi+(x) = exp(x@W - max(x@W) - ||x||^2/2)/sqrt(m)
        E[ m * exp(q@w) exp(k@w) ] = exp(||q+k||^2 / 2)
        => E[phi(q).phi(k)] * exp(Mq + Mk + (||q||^2+||k||^2)/2) = exp(q.k)
    """
    d, m = 16, 4096
    k1, k2, k3 = jax.random.split(rng, 3)
    # modest input norms: the estimator's relative variance grows like
    # exp(||q+k||^2)/m, so large inputs need astronomically many features
    q = jax.random.normal(k1, (1, 1, 4, d)) * 0.5 * (d ** -0.25)
    k = jax.random.normal(k2, (1, 1, 4, d)) * 0.5 * (d ** -0.25)
    # i.i.d. features: the unbiasedness proof needs chi-distributed row
    # norms. (Blockwise-QR orthogonal features as in the reference fix the
    # norm at sqrt(d) exactly — a known small bias both frameworks share.)
    omega = gaussian_features(k3, 1, d, m)
    exact = jnp.exp(jnp.einsum("bhnd,bhmd->bhnm", q, k))
    phi_q = phi_positive(q, omega)
    phi_k = phi_positive(k, omega)
    approx = jnp.einsum("bhnf,bhmf->bhnm", phi_q, phi_k)
    # undo the stabiliser max-shifts (the ||x||^2/2 terms are part of the
    # estimator itself: E[phi(q).phi(k)] = exp(-Mq-Mk) exp(q.k))
    mq = jnp.max(jnp.einsum("bhnd,hdf->bhnf", q, omega), -1)
    mk = jnp.max(jnp.einsum("bhnd,hdf->bhnf", k, omega), -1)
    corrected = approx * jnp.exp(mq[..., :, None] + mk[..., None, :])
    np.testing.assert_allclose(
        np.asarray(corrected), np.asarray(exact), rtol=0.15
    )


def test_phi_hyperbolic_variance_reduction(rng):
    """Empirical backing for the phi_hyperbolic docstring claim
    (ops/feature_maps.py): at the SAME number of random projections m, the
    antithetic +/- pairs cut the softmax-kernel estimator's variance well
    below phi+'s (Performer paper Lemma 1 predicts ~2x). Both estimators
    must also be unbiased for exp(x.y)."""
    # moderate scale: the exp-estimator's tails grow as exp(||x+y||^2), so
    # keep E||x||^2 ~ 1 or no sample count converges the moments
    D, m, K = 16, 16, 4096
    kx, ko = jax.random.split(rng)
    xy = jax.random.normal(kx, (1, 1, 2, D)) * 0.25
    true_k = float(jnp.exp(jnp.sum(xy[0, 0, 0] * xy[0, 0, 1])))

    # K independent iid feature draws, batched over the 'heads' axis
    omegas = jax.random.normal(ko, (K, D, m))
    xy_t = jnp.broadcast_to(xy, (1, K, 2, D))
    proj = jnp.einsum("bhnd,hdf->bhnf", xy_t, omegas)

    from efficient_rpe_vit_tpu.ops.feature_maps import phi_hyperbolic

    # invert each map's stop-gradient stabiliser so phi(x).phi(y) becomes
    # the raw unbiased kernel estimate (the 1/sqrt(m) factors already make
    # the feature dot product the mean over projections; the shifts cancel
    # in attention's num/den ratio but not in a bare dot product)
    p = phi_positive(xy_t, omegas)
    shift_p = jnp.max(proj, axis=-1)  # [1, K, 2]
    est_p = jnp.sum(p[0, :, 0] * p[0, :, 1], -1) * jnp.exp(
        shift_p[0, :, 0] + shift_p[0, :, 1]
    )
    h = phi_hyperbolic(xy_t, omegas)
    shift_h = jnp.max(jnp.abs(proj), axis=-1)
    est_h = jnp.sum(h[0, :, 0] * h[0, :, 1], -1) * jnp.exp(
        shift_h[0, :, 0] + shift_h[0, :, 1]
    )

    mean_p, mean_h = float(jnp.mean(est_p)), float(jnp.mean(est_h))
    var_p, var_h = float(jnp.var(est_p)), float(jnp.var(est_h))
    assert mean_p == pytest.approx(true_k, rel=0.1)  # unbiased (K=4096)
    assert mean_h == pytest.approx(true_k, rel=0.1)
    assert var_h < 0.75 * var_p, (
        f"phi_hyp variance {var_h:.4g} not < 0.75x phi+ variance {var_p:.4g}"
    )


def test_mxu_num_features_policy():
    """'mxu' rounds the paper default to the nearest 128 lane multiple,
    never below 128 (feature axis is minor-most in every phi matmul, so
    the MXU pads it to 128 anyway — padding is free estimator capacity)."""
    from efficient_rpe_vit_tpu.ops import mxu_num_features

    assert mxu_num_features(16) == 128  # paper 44 -> one full lane tile
    assert mxu_num_features(64) == 256  # paper 266 pads to 384; 256 exact
    assert mxu_num_features(32) == 128  # paper 110 -> 128
    assert mxu_num_features(4) == 128  # floor at one lane tile
    assert mxu_num_features(128) % 128 == 0


def test_mxu_num_features_threads_through_model():
    """num_features='mxu' reaches _KernelAttention.m and the drawn omega."""
    from efficient_rpe_vit_tpu.configs import mnist_config
    from efficient_rpe_vit_tpu.models.factory import create_model

    model = create_model(
        "performer_favor",
        mnist_config(),
        attention_config={"num_features": "mxu"},
        dim=32,
        depth=1,
        heads=2,
        mlp_dim=64,
    )
    x = jnp.zeros((2, 28, 28, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    omegas = [
        v
        for path, v in jax.tree_util.tree_flatten_with_path(variables)[0]
        if "omega" in jax.tree_util.keystr(path)
    ]
    assert omegas, "no omega collection found"
    # head_dim = 32/2 = 16 -> mxu policy gives 128 features
    assert all(o.shape[-1] == 128 for o in omegas)
    logits = model.apply(variables, x)
    assert logits.shape == (2, 10)
