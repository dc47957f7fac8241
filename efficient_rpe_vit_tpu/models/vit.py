"""Vision Transformer skeleton.

Mirrors the reference's BaseViT (models/core/base_vit.py:15-233):
reshape-based patchify, linear patch embedding, learned CLS token +
learned absolute positional embedding (always present, even with RPE),
depth x injected transformer blocks, LayerNorm + Linear head on the CLS
output. Init: Xavier-uniform Dense kernels / zero biases, N(0, 0.02) for
pos_embedding and cls_token (base_vit.py:152-166).

TPU-first notes: patchify is a pure reshape/transpose (layout-only, fused
by XLA into the embedding matmul); the whole forward is jit-compatible
with static shapes.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


def patchify(x, patch_size: int):
    """(B, H, W, C) NHWC images -> (B, num_patches, C*p*p) patches.

    Patch vector layout matches the reference's (C, p, p) ordering
    (base_vit.py:188-196) so checkpoints are interchangeable.
    """
    B, H, W, C = x.shape
    p = patch_size
    x = x.transpose(0, 3, 1, 2)  # NCHW, reference layout
    x = x.reshape(B, C, H // p, p, W // p, p)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (B, H/p, W/p, C, p, p)
    return x.reshape(B, (H // p) * (W // p), C * p * p)


class ViT(nn.Module):
    """Configurable-attention/RPE Vision Transformer.

    Input convention is NHWC (TPU-native layout). `create_model` in
    factory.py resolves variant names to (attention_type, rpe_type).
    """

    image_size: int
    in_channels: int
    patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    dropout: float = 0.1
    attention_type: str = "softmax"
    rpe_type: Optional[str] = None
    attention_kwargs: tuple = ()
    rpe_kwargs: tuple = ()
    mlp_type: str = "dense"
    mlp_kwargs: tuple = ()
    # compute dtype policy: activations/matmul inputs in this dtype, params
    # and softmax/normaliser statistics in fp32 (bfloat16 feeds the MXU at
    # full rate; accumulation stays fp32 via preferred_element_type)
    dtype: str = "float32"
    # activation checkpointing: rematerialise each block's activations in
    # the backward instead of keeping them live through the whole forward
    # — peak HBM drops from O(depth) to O(1) block activations at ~1/3
    # extra FLOPs (jax.checkpoint; the standard long-N / large-model
    # memory lever on TPU). No effect on numerics.
    remat: bool = False

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.patch_size * self.patch_size

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 return_attention: bool = False):
        """x: [B, H, W, C] float images -> [B, num_classes] logits.

        With return_attention=True also returns the per-block attention
        maps (softmax attention only) — a working version of the
        reference's `get_attention_maps` placeholder (base_vit.py:255-263).
        """
        from .layers import TransformerBlock

        B = x.shape[0]
        if x.shape[1:] != (self.image_size, self.image_size, self.in_channels):
            raise ValueError(
                f"expected input [B, {self.image_size}, {self.image_size}, "
                f"{self.in_channels}], got {x.shape}"
            )

        dtype = jnp.dtype(self.dtype)
        x = patchify(x, self.patch_size).astype(dtype)  # [B, P, patch_dim]
        x = nn.Dense(self.dim, name="patch_embedding", dtype=dtype,
                     kernel_init=nn.initializers.xavier_uniform())(x)

        cls = self.param(
            "cls_token", nn.initializers.normal(stddev=0.02), (1, 1, self.dim)
        ).astype(dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim)), x], axis=1)

        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=0.02),
            (1, self.num_patches + 1, self.dim),
        )
        x = x + pos.astype(dtype)

        block_cls = TransformerBlock
        if self.remat and not return_attention:
            # deterministic/return_attention are Python bools -> static
            # (arg 0 is the module instance in linen's remat convention)
            block_cls = nn.remat(TransformerBlock, static_argnums=(2, 3))

        attention_maps = []
        for i in range(self.depth):
            x = block_cls(
                dim=self.dim,
                heads=self.heads,
                mlp_dim=self.mlp_dim,
                num_patches=self.num_patches + 1,  # CLS included
                dropout=self.dropout,
                attention_type=self.attention_type,
                rpe_type=self.rpe_type,
                attention_kwargs=self.attention_kwargs,
                rpe_kwargs=self.rpe_kwargs,
                mlp_type=self.mlp_type,
                mlp_kwargs=self.mlp_kwargs,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, deterministic, return_attention)  # positional: remat's
            # static_argnums indexes positional call args
            if return_attention:
                x, weights = x
                attention_maps.append(weights)

        cls_out = x[:, 0].astype(jnp.float32)  # head in fp32
        cls_out = nn.LayerNorm(epsilon=1e-5, name="head_norm")(cls_out)
        logits = nn.Dense(self.num_classes, name="head",
                          kernel_init=nn.initializers.xavier_uniform())(cls_out)
        if return_attention:
            return logits, attention_maps
        return logits
