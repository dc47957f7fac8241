"""Device-resident data pipeline with on-device jit'd preprocessing.

TPU-first replacement for the reference's torch DataLoader + per-batch
`images.to(device)` transfers (reference: experiments/utils/training.py:54):
the whole dataset lives on device as uint8 once; each step gathers a batch
by index and normalises/augments *inside* the jitted program. Only a tiny
int32 index array crosses the host->device boundary per step.

Augmentations mirror the reference's torchvision transforms
(data/datasets.py:50-54, 89-94): MNIST RandomRotation(10 deg);
CIFAR RandomCrop(32, padding=4) + RandomHorizontalFlip.
"""

from __future__ import annotations

import functools
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def normalize_images(images_u8, mean, std):
    """uint8 NHWC -> float32 normalised: (x/255 - mean) / std."""
    x = images_u8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std


def _rotate_bilinear(img, angle):
    """Rotate one [H, W, C] image by `angle` radians about its centre with
    bilinear resampling (zero padding).

    TPU note: uses FLAT jnp.take gathers over the (H*W) axis — 2D advanced
    indexing under vmap lowers to a pathological gather on some TPU
    toolchains (observed: compile never finishes on a remote-compile
    backend), while a rank-1 take is the standard supported gather.
    """
    H, W, C = img.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    src_y = cos * (yy - cy) + sin * (xx - cx) + cy
    src_x = -sin * (yy - cy) + cos * (xx - cx) + cx
    y0 = jnp.floor(src_y).astype(jnp.int32)
    x0 = jnp.floor(src_x).astype(jnp.int32)
    wy = src_y - y0
    wx = src_x - x0

    # Gather-free formulation: build the [H*W, H*W] bilinear interpolation
    # matrix from one-hot comparisons and apply it as ONE matmul — gathers
    # (2D advanced indexing, flat takes, under vmap) all failed to compile
    # on the remote TPU toolchain, while this lowers to plain VPU compares
    # + an MXU matmul. At 28x28 the matrix is 784^2 fp32 = 2.5 MB.
    HW = H * W
    q_iota = jnp.arange(HW, dtype=jnp.int32)[None, :]  # [1, HW]

    def corner(yi, xi, w):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        idx = (jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)).reshape(-1)
        weight = jnp.where(valid, w, 0.0).reshape(-1)  # [HW]
        return (q_iota == idx[:, None]).astype(jnp.float32) * weight[:, None]

    Wmat = (
        corner(y0, x0, (1 - wy) * (1 - wx))
        + corner(y0, x0 + 1, (1 - wy) * wx)
        + corner(y0 + 1, x0, wy * (1 - wx))
        + corner(y0 + 1, x0 + 1, wy * wx)
    )  # [HW, HW]
    out = jnp.dot(Wmat, img.reshape(HW, C),
                  preferred_element_type=jnp.float32)
    return out.reshape(H, W, C)


def augment_mnist(images, key):
    """Random rotation in [-10, 10] degrees per image (float inputs)."""
    B = images.shape[0]
    angles = jax.random.uniform(
        key, (B,), minval=-10.0, maxval=10.0
    ) * (jnp.pi / 180.0)
    return jax.vmap(_rotate_bilinear)(images, angles)


def augment_cifar(images, key, pad: int = 4):
    """Random crop with `pad` reflection-free zero padding + random hflip."""
    B, H, W, C = images.shape
    kc, kf = jax.random.split(key)
    padded = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    offsets = jax.random.randint(kc, (B, 2), 0, 2 * pad + 1)

    def crop(img, off):
        return jax.lax.dynamic_slice(img, (off[0], off[1], 0), (H, W, C))

    cropped = jax.vmap(crop)(padded, offsets)
    flip = jax.random.bernoulli(kf, 0.5, (B,))
    flipped = jnp.where(flip[:, None, None, None], cropped[:, :, ::-1, :], cropped)
    return flipped


@functools.partial(jax.jit, static_argnames=("augment",))
def _gather_batch(images_u8, labels, idx, mean, std, augment: Optional[str], key):
    """On-device: gather batch rows, augment on RAW [0,1] pixels, then
    normalise — matching torchvision's transform-then-Normalize order, so
    rotation/crop fill pixels are black (raw 0), not the per-channel mean
    in normalised space."""
    batch = jnp.take(images_u8, idx, axis=0)
    y = jnp.take(labels, idx, axis=0)
    x = batch.astype(jnp.float32) / 255.0
    if augment == "mnist":
        x = augment_mnist(x, key)
    elif augment == "cifar":
        x = augment_cifar(x, key)
    x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    return x, y


class DeviceDataset:
    """Device-resident dataset with on-device batch assembly.

    Iterating yields (images [B, H, W, C] float32 normalised, labels [B]).
    Shuffling permutes a host-side index vector per epoch (numpy RNG seeded
    explicitly — reproducible like the reference's seeded DataLoader).
    """

    def __init__(self, images_u8: np.ndarray, labels: np.ndarray,
                 mean, std, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, augment: Optional[str] = None,
                 seed: int = 0, device=None, synthetic: bool = False):
        self.n = len(images_u8)
        # data provenance: True when the loader fell back to generated data
        # (threaded into result metadata so accuracies are never mistaken
        # for real-dataset numbers)
        self.synthetic = synthetic
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.augment = augment
        self._rng = np.random.default_rng(seed)
        self._aug_key = jax.random.PRNGKey(seed + 1)
        dev = device or jax.devices()[0]
        self.images = jax.device_put(jnp.asarray(images_u8), dev)
        self.labels = jax.device_put(jnp.asarray(labels.astype(np.int32)), dev)
        self.mean = jnp.asarray(np.broadcast_to(mean, (images_u8.shape[-1],)),
                                jnp.float32)
        self.std = jnp.asarray(np.broadcast_to(std, (images_u8.shape[-1],)),
                               jnp.float32)

    def __len__(self) -> int:
        if self.drop_last:
            return self.n // self.batch_size
        return -(-self.n // self.batch_size)

    @property
    def num_samples(self) -> int:
        return self.n

    def epoch_order(self) -> np.ndarray:
        """One epoch's sample order (a fresh permutation when shuffling —
        advances the same RNG stream the iterator uses). The gather-fused
        epoch driver (train/training.py) cuts this into [K, B] index
        chunks instead of iterating batches."""
        return (
            self._rng.permutation(self.n) if self.shuffle else np.arange(self.n)
        )

    def __iter__(self) -> Iterator[Tuple[jnp.ndarray, jnp.ndarray]]:
        order = self.epoch_order()
        bs = self.batch_size
        n_full = self.n // bs
        for b in range(n_full):
            idx = jnp.asarray(order[b * bs : (b + 1) * bs])
            self._aug_key, sub = jax.random.split(self._aug_key)
            yield _gather_batch(
                self.images, self.labels, idx, self.mean, self.std,
                self.augment, sub,
            )
        rem = self.n - n_full * bs
        if rem and not self.drop_last:
            idx = jnp.asarray(order[n_full * bs :])
            self._aug_key, sub = jax.random.split(self._aug_key)
            yield _gather_batch(
                self.images, self.labels, idx, self.mean, self.std,
                self.augment, sub,
            )
