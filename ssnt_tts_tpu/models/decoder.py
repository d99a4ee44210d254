"""Mel decoder + lattice joint network (TPU-first factorized design).

The SSNT loss needs, for every lattice point (t, u):
  - transition log-probs log_emit/log_shift, time-major (U, B, T)
  - frame log-likelihood log p(y_u | t),     time-major (U, B, T)
(the layout the lattice kernels consume; the joints emit it directly).

A naive additive-tanh joint materializes a (B, T, U, H) tensor — HBM-hostile.
This module instead uses factorizations whose lattice-sized intermediates are
produced directly by MXU contractions:

  transition logits:  logit_k[t, u] = <p_k(enc_t), q_k(dec_u)> + b_k(t) + b_k(u)
      -> one (B, T, 2R) x (B, U, 2R) batched matmul.
  frame likelihood:   mel_pred[t, u] = a(enc_t) + b(dec_u), isotropic Gaussian
      -> log p = -0.5/sig^2 * (||c_u||^2 - 2 a_t . c_u + ||a_t||^2) + const
         with c_u = y_u - b_u: ONE (B, T, M) x (B, U, M) matmul plus rank-1
         broadcasts; the (B, T, U, M) prediction tensor never exists.

Each joint exposes both a full-lattice method (training) and a per-step
method (decode) sharing the same parameters, so beam decode scores are
consistent with the training loss.

The autoregressive state over mel frames is a GRU (teacher-forced scan during
training, stepped during decode).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class MelPrenet(nn.Module):
    dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, mel):
        h = nn.Dense(self.dim, dtype=self.dtype)(mel)
        h = nn.relu(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return nn.relu(h)


class ARDecoderCell(nn.Module):
    """GRU cell over generated mel frames; shared by training (scan over the
    teacher-forced sequence) and decode (stepped per output frame)."""

    dim: int
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.prenet = MelPrenet(self.dim, dtype=self.dtype)
        self.cell = nn.GRUCell(self.dim, dtype=self.dtype)

    def __call__(self, carry, mel_frame):
        x = self.prenet(mel_frame)
        new_carry, out = self.cell(carry, x)
        return new_carry, out.astype(jnp.float32)

    @staticmethod
    def initial_carry(batch: int, dim: int):
        return jnp.zeros((batch, dim), jnp.float32)


class TransitionJoint(nn.Module):
    """Factorized emit/shift logits; rank R keeps the bilinear interaction
    MXU-shaped. Normalized per lattice point.

    lattice_dtype is the storage dtype of the emitted (U, B, T) lattice
    (normalization always happens in f32): bf16 halves the lattice HBM
    traffic into the loss kernels (ModelConfig.lattice_dtype)."""

    rank: int = 64
    dtype: Any = jnp.bfloat16
    lattice_dtype: Any = jnp.float32
    lattice_domain: str = "log"  # "log": (le, ls); "exp": (E, S) probs

    def setup(self):
        self.enc_proj = nn.Dense(2 * self.rank, dtype=self.dtype)
        self.dec_pre = nn.Dense(self.rank, dtype=self.dtype)
        self.dec_proj = nn.Dense(2 * self.rank, dtype=self.dtype)
        self.enc_bias = nn.Dense(2, dtype=jnp.float32)
        self.dec_bias = nn.Dense(2, dtype=jnp.float32)

    def _factors(self, enc, dec):
        p = self.enc_proj(enc)  # (..., T, 2R)
        q = self.dec_proj(nn.tanh(self.dec_pre(dec)))  # (..., U, 2R)
        return p, q

    def __call__(self, enc, dec) -> Tuple[jax.Array, jax.Array]:
        """Full lattice, time-major: enc (B, T, H), dec (B, U, H) -> two
        (U, B, T) — the layout the lattice kernels consume, emitted directly
        by the MXU contraction (no full-lattice transpose ever exists)."""
        R = self.rank
        p, q = self._factors(enc, dec)
        B, T = p.shape[0], p.shape[1]
        U = q.shape[1]
        p = p.reshape(B, T, 2, R)
        q = q.reshape(B, U, 2, R)
        logits = jnp.einsum(
            "btkr,bukr->ubtk", p, q, preferred_element_type=jnp.float32
        )
        logits = (
            logits
            + self.enc_bias(enc)[None, :, :, :]
            + jnp.transpose(self.dec_bias(dec), (1, 0, 2))[:, :, None, :]
        )
        le, ls = logits[..., 0], logits[..., 1]
        norm = jnp.logaddexp(le, ls)
        out_dtype = jnp.dtype(self.lattice_dtype)
        if self.lattice_domain == "exp":
            # Probability-domain lattice (ssnt_loss_expin): the softmax
            # this head computes anyway, without the final log.
            return (
                jnp.exp(le - norm).astype(out_dtype),
                jnp.exp(ls - norm).astype(out_dtype),
            )
        return (le - norm).astype(out_dtype), (ls - norm).astype(out_dtype)

    def step(self, enc_t, dec_state) -> jax.Array:
        """Per-step decode scores: enc_t (B, W, H) gathered at each beam's
        source position, dec_state (B, W, H) -> (B, W, 2) log-probs — the
        `h` input of the v1 beam step (src/lib.rs:19-29)."""
        R = self.rank
        p, q = self._factors(enc_t, dec_state)
        p = p.reshape(*p.shape[:-1], 2, R)
        q = q.reshape(*q.shape[:-1], 2, R)
        logits = jnp.sum(p * q, axis=-1).astype(jnp.float32)
        logits = logits + self.enc_bias(enc_t) + self.dec_bias(dec_state)
        return nn.log_softmax(logits, axis=-1)


class FrameJoint(nn.Module):
    """Isotropic-Gaussian frame log-likelihood over the full lattice, and the
    matching decode-time point prediction a(enc_t)+b(dec_u)."""

    mel_dim: int
    dtype: Any = jnp.bfloat16
    lattice_dtype: Any = jnp.float32
    lattice_domain: str = "log"  # "exp": (F, mcol) instead of lf
    log_sigma_init: float = 0.0

    def setup(self):
        self.enc_mel = nn.Dense(self.mel_dim, dtype=self.dtype)
        self.dec_mel = nn.Dense(self.mel_dim, dtype=self.dtype)
        self.log_sigma = self.param(
            "log_sigma", lambda k: jnp.array(self.log_sigma_init, jnp.float32)
        )

    def __call__(self, enc, dec, mel_target, input_length=None) -> jax.Array:
        """Full lattice, time-major: -> (U, B, T) log-likelihoods."""
        M = self.mel_dim
        a = self.enc_mel(enc).astype(jnp.float32)  # (B, T, M)
        b = self.dec_mel(dec).astype(jnp.float32)  # (B, U, M)
        c = mel_target.astype(jnp.float32) - b
        inv_var = jnp.exp(-2.0 * self.log_sigma)
        cross = jnp.einsum(
            "btm,bum->ubt", a, c, preferred_element_type=jnp.float32
        )
        sq_c = jnp.transpose(jnp.sum(c * c, axis=-1))  # (U, B)
        sq_a = jnp.sum(a * a, axis=-1)  # (B, T)
        sq_err = sq_c[:, :, None] - 2.0 * cross + sq_a[None, :, :]
        const = -0.5 * M * (
            jnp.log(2.0 * jnp.pi) + 2.0 * self.log_sigma
        )
        out = -0.5 * inv_var * sq_err + const
        if self.lattice_domain == "exp":
            # Column-max-normalized likelihoods for ssnt_loss_expin:
            # F = exp(lf - max_t lf) in (0, 1] plus the (U, B) scalar.
            # The max runs over VALID t only (ADVICE r4): a padded
            # column's garbage likelihood exceeding the best valid cell
            # by > the ~87-nat f32 flush horizon would underflow every
            # valid F to 0 and collapse the example to the degenerate
            # NEG sentinel — a failure mode the log path doesn't have.
            if input_length is not None:
                T = out.shape[2]
                tmask = (
                    jnp.arange(T, dtype=jnp.int32)[None, None, :]
                    < input_length[None, :, None]
                )
                masked = jnp.where(tmask, out, -1e30)
                mcol = jnp.max(masked, axis=2)
                # Padded cells sit ABOVE mcol now — zero them instead of
                # letting exp overflow (the kernels mask by input_length,
                # but inf would poison any pre-mask arithmetic).
                F = jnp.where(
                    tmask, jnp.exp(out - mcol[:, :, None]), 0.0
                )
            else:
                mcol = jnp.max(out, axis=2)
                F = jnp.exp(out - mcol[:, :, None])
            return (
                F.astype(jnp.dtype(self.lattice_dtype)),
                mcol.astype(jnp.float32),
            )
        return out.astype(jnp.dtype(self.lattice_dtype))

    def predict(self, enc_t, dec_state) -> jax.Array:
        """Decode-time mel frame: (B, W, H) x2 -> (B, W, M)."""
        a = self.enc_mel(enc_t)
        b = self.dec_mel(dec_state)
        return (a + b).astype(jnp.float32)
