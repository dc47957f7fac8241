"""Data pipeline contracts: raw parsers, fallbacks, device batching, aug."""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

from efficient_rpe_vit_tpu.configs import mnist_config
from efficient_rpe_vit_tpu.data import (
    DeviceDataset,
    get_dataloaders,
    get_sample_batch,
    load_dataset,
    normalize_images,
)
from efficient_rpe_vit_tpu.data.pipeline import augment_cifar, augment_mnist

import jax


def test_load_mnist_available():
    """In this environment only one MNIST split exists; the loader must
    degrade to a deterministic re-split (or synthetic) without crashing."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        data = load_dataset("mnist")
    assert data["train_images"].ndim == 4
    assert data["train_images"].shape[1:] == (28, 28, 1)
    assert data["train_images"].dtype == np.uint8
    assert len(data["train_images"]) == len(data["train_labels"])
    assert set(np.unique(data["test_labels"])) <= set(range(10))


def test_load_cifar10_fallback():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        data = load_dataset("cifar10")
    assert data["train_images"].shape[1:] == (32, 32, 3)


def test_unknown_dataset():
    with pytest.raises(ValueError, match="Unknown dataset"):
        load_dataset("imagenet")


def test_normalize():
    x = jnp.full((2, 4, 4, 1), 255, jnp.uint8)
    out = normalize_images(x, (0.5,), (0.5,))
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def test_device_dataset_iteration():
    imgs = np.random.default_rng(0).integers(0, 256, (100, 8, 8, 1), dtype=np.uint8)
    labels = np.arange(100) % 10
    ds = DeviceDataset(imgs, labels, (0.5,), (0.5,), batch_size=32,
                       shuffle=True, drop_last=True, seed=1)
    batches = list(ds)
    assert len(batches) == 3  # drop_last
    assert len(ds) == 3
    x, y = batches[0]
    assert x.shape == (32, 8, 8, 1) and x.dtype == jnp.float32
    assert y.shape == (32,) and y.dtype == jnp.int32


def test_device_dataset_keeps_remainder():
    imgs = np.zeros((10, 4, 4, 1), np.uint8)
    labels = np.zeros(10, np.int64)
    ds = DeviceDataset(imgs, labels, (0.0,), (1.0,), batch_size=4,
                       shuffle=False, drop_last=False)
    sizes = [x.shape[0] for x, _ in ds]
    assert sizes == [4, 4, 2]
    assert len(ds) == 3


def test_device_dataset_shuffle_reproducible():
    imgs = np.arange(20, dtype=np.uint8).reshape(20, 1, 1, 1).repeat(4, 1).repeat(4, 2)
    labels = np.arange(20)
    a = DeviceDataset(imgs, labels, (0.0,), (1.0,), 5, shuffle=True, seed=7)
    b = DeviceDataset(imgs, labels, (0.0,), (1.0,), 5, shuffle=True, seed=7)
    ya = np.concatenate([np.asarray(y) for _, y in a])
    yb = np.concatenate([np.asarray(y) for _, y in b])
    np.testing.assert_array_equal(ya, yb)
    assert not np.array_equal(ya, np.arange(20))  # actually shuffled


def test_get_dataloaders_and_sample_batch():
    cfg = mnist_config()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        train, test = get_dataloaders(cfg)
        images, labels = get_sample_batch(cfg)
    assert images.shape[1:] == (28, 28, 1)
    assert images.dtype == jnp.float32
    assert train.batch_size == cfg.train.batch_size


def test_augment_mnist_shapes():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (4, 28, 28, 1))
    out = augment_mnist(x, key)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    # rotation changes pixels
    assert float(jnp.abs(out - x).max()) > 1e-4


def test_augment_cifar_shapes():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (4, 32, 32, 3))
    out = augment_cifar(x, key)
    assert out.shape == x.shape


def test_augmented_loader_jits():
    cfg = mnist_config(augmentation=True)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        train, _ = get_dataloaders(cfg)
    x, y = next(iter(train))
    assert x.shape == (cfg.train.batch_size, 28, 28, 1)


def test_data_dir_honored(tmp_path):
    """DataConfig.data_dir is searched first, and an explicit data_dir
    disables the synthetic fallback (review finding)."""
    import os
    import shutil

    # stage a custom dir with the MNIST raw files that exist here
    raw = tmp_path / "MNIST" / "raw"
    raw.mkdir(parents=True)
    src = "/root/reference/data/MNIST/raw"
    if not os.path.isdir(src):
        pytest.skip("no raw files to stage")
    for f in os.listdir(src):
        shutil.copy(os.path.join(src, f), raw / f)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        data = load_dataset("mnist", data_dir=str(tmp_path))
    assert data["synthetic"] is False
    # explicit but EMPTY data_dir: no silent synthetic fallback
    empty = tmp_path / "empty"
    empty.mkdir()
    # note: default locations are still searched after data_dir, so use a
    # dataset that exists nowhere (cifar10 has no batches in this env)
    with pytest.raises(FileNotFoundError):
        load_dataset("cifar10", data_dir=str(empty))


def test_augment_fills_are_black_not_mean(rng_seed=0):
    """Augmentation runs on raw [0,1] pixels BEFORE normalisation, so
    rotation fill is black like torchvision's (review finding)."""
    import jax
    from efficient_rpe_vit_tpu.data.pipeline import _gather_batch

    # all-white images; big rotation would sweep in fill at corners —
    # emulate by checking the normalised value of a zero (black) pixel
    imgs = np.full((4, 28, 28, 1), 255, np.uint8)
    labels = np.zeros(4, np.int64)
    mean = jnp.asarray([0.1307]); std = jnp.asarray([0.3081])
    x, _ = _gather_batch(jnp.asarray(imgs), jnp.asarray(labels),
                         jnp.arange(4), mean, std, "mnist",
                         jax.random.PRNGKey(3))
    # the minimum pixel must approach the normalised BLACK value
    # (0 - mean)/std = -0.424, not stay at the normalised-mean 0.0
    black = float((0.0 - 0.1307) / 0.3081)
    assert float(x.min()) < black * 0.5  # corners swept toward black
