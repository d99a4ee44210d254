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


class ClassHead(nn.Module):
    """Per-position class head (duration or tone).

    `logits` exposes the pre-softmax scores so the AR head can add its
    per-beam correction before normalization; `__call__` keeps the
    per-position log-prob API used by the lattice NLL and the broadcast
    decode path. Setup-based so both can be used in one trace."""

    num_classes: int
    hidden_dim: int
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.h1 = nn.Dense(self.hidden_dim, dtype=self.dtype)
        self.out = nn.Dense(self.num_classes, dtype=jnp.float32)

    def logits(self, enc):
        return self.out(nn.relu(self.h1(enc)))

    def __call__(self, enc):
        return nn.log_softmax(self.logits(enc), axis=-1)


class ARClassCell(nn.Module):
    """Per-beam autoregressive class state (GRU over embedded class history).

    The reference's v2/tone ops take per-beam `h (B, W, D)` recomputed by the
    caller from each beam's AR state every step
    (ssnt-tts-tensorflow/src/ssnt_tts_v2_beam_search_decode_op.cc:29-50);
    this cell is the model-side source of that state: beams diverge through
    their own class histories, not just through constraint masks."""

    num_classes: int
    dim: int
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.embed = nn.Embed(self.num_classes, self.dim, dtype=self.dtype)
        self.enc_in = nn.Dense(self.dim, dtype=self.dtype)
        self.cell = nn.GRUCell(self.dim, dtype=self.dtype)
        self.out = nn.Dense(self.num_classes, dtype=jnp.float32)

    def step(self, state, enc_t, prev_class, base_logits):
        """One AR step. state (..., H); enc_t (..., Henc); prev_class (...,)
        i32; base_logits (..., D) from the per-position head.
        Returns (new_state, (..., D) log-probs)."""
        x = self.embed(prev_class) + self.enc_in(enc_t)
        new_state, out = self.cell(state, x)
        logits = base_logits + self.out(out)
        return new_state, nn.log_softmax(logits, axis=-1)

    @staticmethod
    def initial_state(batch_shape, dim):
        return jnp.zeros(tuple(batch_shape) + (dim,), jnp.float32)


def DurationHead(duration_class_size, hidden_dim, dtype=jnp.bfloat16):
    """Per-position duration-class head for the v2 decoder/lattice."""
    return ClassHead(duration_class_size, hidden_dim, dtype=dtype)


def ToneHead(tone_class_size, hidden_dim, dtype=jnp.bfloat16):
    """Per-position tone-class head for the tone-latent decoder."""
    return ClassHead(tone_class_size, hidden_dim, dtype=dtype)
