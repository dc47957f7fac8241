from .base import (
    ModelConfig,
    TrainConfig,
    DataConfig,
    ExperimentConfig,
    DEFAULT_ATTENTION_PARAMS,
    DEFAULT_RPE_PARAMS,
)
from .datasets import (
    mnist_config,
    cifar10_config,
    get_dataset_config,
    DATASET_CONFIGS,
    MNIST_CONFIG,
    CIFAR10_CONFIG,
)

__all__ = [
    "ModelConfig",
    "TrainConfig",
    "DataConfig",
    "ExperimentConfig",
    "DEFAULT_ATTENTION_PARAMS",
    "DEFAULT_RPE_PARAMS",
    "mnist_config",
    "cifar10_config",
    "get_dataset_config",
    "DATASET_CONFIGS",
    "MNIST_CONFIG",
    "CIFAR10_CONFIG",
]
