from .io import read_idx_images, read_idx_labels, read_cifar10_batches
from .datasets import load_dataset, get_dataloaders, get_sample_batch, compute_dataset_stats, visualize_batch
from .pipeline import DeviceDataset, normalize_images, augment_mnist, augment_cifar

__all__ = [
    "read_idx_images",
    "read_idx_labels",
    "read_cifar10_batches",
    "load_dataset",
    "get_dataloaders",
    "get_sample_batch",
    "compute_dataset_stats",
    "visualize_batch",
    "DeviceDataset",
    "normalize_images",
    "augment_mnist",
    "augment_cifar",
]
