"""Text encoder: embedding + conv prenet + transformer stack.

The reference repo contains no model code (SURVEY.md §0: the network lived in
the absent companion repo); this encoder is designed TPU-first — large fused
matmuls, static shapes, bf16 compute — to feed the lattice loss and the
decode kernels. Heads on top of the encoder supply exactly the per-position
class log-probs the reference decode ops consume:

  - duration_logits -> h (B, T, D) for the v2 step (src/v2.rs h input)
  - tone_logits     -> h (B, T, K) for the tone step (src/tone_latent.rs)
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ssnt_tts_tpu.models.layers import (
    ConvPrenet,
    TransformerBlock,
    length_mask,
    sinusoidal_positions,
)


class TextEncoder(nn.Module):
    vocab_size: int
    dim: int = 256
    num_layers: int = 4
    num_heads: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, tokens, lengths=None):
        B, T = tokens.shape
        x = nn.Embed(self.vocab_size, self.dim, dtype=self.dtype)(tokens)
        x = ConvPrenet(self.dim, dtype=self.dtype)(x)
        x = x + sinusoidal_positions(T, self.dim, self.dtype)[None]
        mask = None
        if lengths is not None:
            m = length_mask(lengths, T)
            mask = m[:, None, None, :] & m[:, None, :, None]
        for _ in range(self.num_layers):
            x = TransformerBlock(self.dim, self.num_heads, self.dtype)(
                x, mask=mask
            )
        x = nn.LayerNorm(dtype=jnp.float32)(x)
        return x.astype(jnp.float32)  # (B, T, dim)


class DurationHead(nn.Module):
    """Per-position duration-class log-probs for the v2 decoder/lattice."""

    duration_class_size: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, enc):
        h = nn.Dense(enc.shape[-1], dtype=self.dtype)(enc)
        h = nn.relu(h)
        logits = nn.Dense(self.duration_class_size, dtype=jnp.float32)(h)
        return nn.log_softmax(logits, axis=-1)


class ToneHead(nn.Module):
    """Per-position tone-class log-probs for the tone-latent decoder."""

    tone_class_size: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, enc):
        h = nn.Dense(enc.shape[-1], dtype=self.dtype)(enc)
        h = nn.relu(h)
        logits = nn.Dense(self.tone_class_size, dtype=jnp.float32)(h)
        return nn.log_softmax(logits, axis=-1)
