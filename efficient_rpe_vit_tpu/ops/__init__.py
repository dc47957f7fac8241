from .fft_toeplitz import (
    toeplitz_matmul,
    toeplitz_matmul_fft,
    toeplitz_matmul_dense,
    toeplitz_from_coeffs,
    naive_toeplitz_matmul,
)
from .feature_maps import (
    default_num_features,
    gaussian_features,
    mxu_num_features,
    orthogonal_gaussian_features,
    phi_positive,
    phi_relu,
)
from .rotations import (
    rope_tables,
    apply_rope,
    circulant_eigenvalues,
    apply_circulant_rotation,
    grid_positions_2d,
)
from .attention_core import (
    softmax_attention,
    linear_attention,
    kerple_linear_attention,
)

__all__ = [
    "toeplitz_matmul",
    "toeplitz_matmul_fft",
    "toeplitz_matmul_dense",
    "toeplitz_from_coeffs",
    "naive_toeplitz_matmul",
    "default_num_features",
    "gaussian_features",
    "mxu_num_features",
    "orthogonal_gaussian_features",
    "phi_positive",
    "phi_relu",
    "rope_tables",
    "apply_rope",
    "circulant_eigenvalues",
    "apply_circulant_rotation",
    "grid_positions_2d",
    "softmax_attention",
    "linear_attention",
    "kerple_linear_attention",
]
