"""Shared neural building blocks (flax.linen), bfloat16-friendly.

All matmul-bearing layers take `dtype` (compute dtype, default bfloat16 on
TPU) with float32 params, the standard mixed-precision recipe: MXU throughput
doubles in bf16 while optimizer state stays fp32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class FeedForward(nn.Module):
    dim: int
    hidden_mult: int = 4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * self.hidden_mult, dtype=self.dtype)(x)
        h = nn.gelu(h)
        return nn.Dense(self.dim, dtype=self.dtype)(h)


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask=None):
        y = nn.LayerNorm(dtype=jnp.float32)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dtype=self.dtype,
            qkv_features=self.dim,
        )(y, y, mask=mask)
        x = x + y
        y = nn.LayerNorm(dtype=jnp.float32)(x)
        y = FeedForward(self.dim, dtype=self.dtype)(y)
        return x + y


class ConvPrenet(nn.Module):
    """1D conv stack over the token axis (Tacotron-style text prenet)."""

    dim: int
    kernel_size: int = 5
    layers: int = 3
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.layers):
            x = nn.Conv(self.dim, (self.kernel_size,), dtype=self.dtype)(x)
            x = nn.relu(nn.LayerNorm(dtype=jnp.float32)(x))
        return x


def sinusoidal_positions(length: int, dim: int, dtype=jnp.float32):
    pos = jnp.arange(length)[:, None].astype(jnp.float32)
    div = jnp.exp(
        jnp.arange(0, dim, 2).astype(jnp.float32)
        * (-jnp.log(10000.0) / dim)
    )
    pe = jnp.zeros((length, dim))
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe.astype(dtype)


def length_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """(B,) lengths -> (B, max_len) bool mask."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]
