"""SSNTModel — the flagship end-to-end SSNT-TTS network.

Ties together (all TPU-first, all under one flax module so training and
decode share parameters):

  TextEncoder -> enc (B, T, H)
  ARDecoderCell (teacher-forced GRU scan over mel frames) -> dec (B, U, H)
  TransitionJoint / FrameJoint -> (U, B, T) time-major lattice quantities
  ops.lattice.ssnt_loss -> per-example NLL  (training)
  DurationHead / ToneHead -> per-position class log-probs consumed by the
    v2 / tone-latent beam steps (decode-time conditioning, reference h inputs)

The reference repo holds only the decode kernels (SURVEY.md §0); this model
supplies the L5 layer the reference assumed (the absent TF model repo),
re-designed for TPU: static shapes, scan-based AR state, matmul-factorized
lattice joints, bf16 compute.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ssnt_tts_tpu.models.decoder import (
    ARDecoderCell,
    FrameJoint,
    TransitionJoint,
)
from ssnt_tts_tpu.models.encoder import (
    ARClassCell,
    DurationHead,
    TextEncoder,
    ToneHead,
)
from ssnt_tts_tpu.models.layers import length_mask
from ssnt_tts_tpu.ops import lattice, lattice_pallas
from ssnt_tts_tpu.utils.config import ModelConfig


def _lattice_loss_fn(impl: str, lattice_dtype: str = "float32",
                     lattice_domain: str = "log"):
    """Loss impl in the framework-native time-major (U, B, T) layout (the
    joints emit it directly; no full-lattice transposes anywhere).

    lattice_dtype="bfloat16" + the Pallas backend selects the bf16-storage
    kernel variant (26 B/cell; ModelConfig.lattice_dtype docs). The XLA
    backend ignores it (canonicalization upcasts to f32).

    lattice_domain="exp": the returned fn takes the joints' exp-native
    quadruple (E, S, F, mcol) and runs ssnt_loss_expin (the
    transcendental-free Pallas path; interpret mode off-TPU). Under an
    active tshard_lattice context the inputs are log-ified and routed to
    the T-sharded loss (correctness over speed for the long-context
    escape hatch)."""
    if lattice_domain == "exp":
        # The expin kernel only exists as a Pallas TPU kernel; when the
        # resolved backend is XLA (impl="xla", or auto off-TPU) the
        # inputs are log-ified and routed to the XLA scan instead of
        # silently running the kernel in interpret mode — orders of
        # magnitude slower (ADVICE r4).
        exp_on_xla = impl == "xla" or (
            impl != "pallas"
            and not any(d.platform == "tpu" for d in jax.devices())
        )

        def dispatch_exp(E, S, F, mcol, input_length, output_length):
            from ssnt_tts_tpu.ops import lattice_sharded

            U, B, T = E.shape
            ts = lattice_sharded.active_tshard(U, B, T)
            if ts is not None or exp_on_xla:
                tiny = jnp.float32(1e-38)
                le = jnp.log(jnp.maximum(E.astype(jnp.float32), tiny))
                ls = jnp.log(jnp.maximum(S.astype(jnp.float32), tiny))
                lf = (
                    jnp.log(jnp.maximum(F.astype(jnp.float32), tiny))
                    + mcol[:, :, None]
                )
                if ts is not None:
                    mesh, axis = ts
                    return lattice_sharded.ssnt_loss_tsharded(
                        le, ls, lf, input_length, output_length,
                        mesh, axis=axis,
                    )
                return lattice.ssnt_loss(
                    le, ls, lf, input_length, output_length, layout="ubt"
                )
            return lattice_pallas.ssnt_loss_expin(
                E, S, F, mcol, input_length, output_length
            )

        dispatch_exp.base = (
            lattice.ssnt_loss if exp_on_xla
            else lattice_pallas.ssnt_loss_expin
        )
        return dispatch_exp

    if impl == "pallas":
        fn = lattice_pallas.ssnt_loss_pallas
    elif impl == "xla":
        fn = lattice.ssnt_loss
    # auto: Pallas kernels on TPU, XLA scan elsewhere (Pallas on CPU would
    # need interpret mode).
    elif any(d.platform == "tpu" for d in jax.devices()):
        fn = lattice_pallas.ssnt_loss_pallas
    else:
        fn = lattice.ssnt_loss
    kwargs = {"layout": "ubt"}
    if (
        fn is lattice_pallas.ssnt_loss_pallas
        and jnp.dtype(lattice_dtype) == jnp.bfloat16
    ):
        kwargs["variant"] = "bf16"
    base = functools.partial(fn, **kwargs)

    def dispatch(le, ls, lf, input_length, output_length):
        # Long-context path: under a tshard_lattice context (entered by
        # make_sharded_train_step when ModelConfig.lattice_tshard_min_cells
        # is set), lattices above the cell threshold shard their T axis
        # over the mesh with ring frontier exchange (ops/lattice_sharded).
        from ssnt_tts_tpu.ops import lattice_sharded

        U, B, T = le.shape
        ts = lattice_sharded.active_tshard(U, B, T)
        if ts is not None:
            mesh, axis = ts
            return lattice_sharded.ssnt_loss_tsharded(
                le.astype(jnp.float32), ls.astype(jnp.float32),
                lf.astype(jnp.float32), input_length, output_length,
                mesh, axis=axis,
            )
        return base(le, ls, lf, input_length, output_length)

    dispatch.base = base  # introspectable (tests check the variant)
    return dispatch


class SSNTModel(nn.Module):
    config: ModelConfig

    def setup(self):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        self.encoder = TextEncoder(
            vocab_size=cfg.vocab_size,
            dim=cfg.encoder_dim,
            num_layers=cfg.encoder_layers,
            num_heads=cfg.encoder_heads,
            dtype=dtype,
        )
        lattice_dtype = jnp.dtype(cfg.lattice_dtype)
        self.ar_cell = ARDecoderCell(cfg.decoder_dim, dtype=dtype)
        self.transition = TransitionJoint(
            rank=cfg.joint_rank, dtype=dtype, lattice_dtype=lattice_dtype,
            lattice_domain=cfg.lattice_domain,
        )
        self.frame = FrameJoint(
            mel_dim=cfg.mel_dim, dtype=dtype, lattice_dtype=lattice_dtype,
            lattice_domain=cfg.lattice_domain,
        )
        self.duration_head = DurationHead(
            cfg.duration_class_size, cfg.encoder_dim, dtype=dtype
        )
        self.tone_head = ToneHead(cfg.tone_class_size, cfg.encoder_dim,
                                  dtype=dtype)
        # Per-beam AR class state (reference production path feeds per-beam
        # h (B, W, D) to the v2/tone ops — SURVEY §3.1, VERDICT r1 #2).
        self.duration_ar = ARClassCell(
            cfg.duration_class_size, cfg.decoder_dim, dtype=dtype
        )
        self.tone_ar = ARClassCell(
            cfg.tone_class_size, cfg.decoder_dim, dtype=dtype
        )

    # ------------------------------------------------------------- pieces

    def encode(self, tokens, input_length=None):
        return self.encoder(tokens, input_length)

    def decoder_states(self, mel_target, *, chunk: int = 8):
        """Teacher-forced AR states: dec[u] summarizes frames < u.

        mel_target (B, U, M) -> (B, U, H); frame 0 sees a zero frame.

        Structure (VERDICT r3 #8): the scan runs over U/chunk outer steps
        whose body applies the cell to `chunk` frames inline, under
        nn.remat. A plain scan's TRANSPOSE is a length-U loop regardless
        of `unroll` (unroll shapes the primal loop only), so the
        teacher-forced GRU backward was U sequential thin iterations —
        the measured weak-scaling bottleneck (WEAKSCALE_TRIAGE_r03.json
        exp I: 0.44 partition efficiency). Chunk-remat makes the backward
        U/chunk iterations of fat recompute-then-differentiate work and
        stores only chunk-boundary carries instead of per-frame
        activations (less residual HBM traffic on real chips too).
        """
        B, U, M = mel_target.shape
        shifted = jnp.concatenate(
            [jnp.zeros((B, 1, M), mel_target.dtype), mel_target[:, :-1]],
            axis=1,
        )
        pad = (-U) % chunk
        if pad:
            shifted = jnp.concatenate(
                [shifted, jnp.zeros((B, pad, M), shifted.dtype)], axis=1
            )
        n = shifted.shape[1] // chunk
        xs = shifted.reshape(B, n, chunk, M)
        carry0 = ARDecoderCell.initial_carry(B, self.config.decoder_dim)

        def chunk_body(cell, c, x):
            outs = []
            for j in range(chunk):
                c, o = cell(c, x[:, j])
                outs.append(o)
            return c, jnp.stack(outs, axis=1)

        scan = nn.scan(
            nn.remat(chunk_body, prevent_cse=False),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        _, dec = scan(self.ar_cell, carry0, xs)
        dec = dec.reshape(B, n * chunk, -1)
        return dec[:, :U]

    def lattice_quantities(self, enc, dec, mel_target, input_length=None):
        """Time-major (U, B, T) lattice quantities (native kernel layout).

        lattice_domain="log": (log_emit, log_shift, log_frame).
        lattice_domain="exp": (E, S, F, mcol) — probabilities + the
        column-max scalars, consumed by ssnt_loss_expin. input_length
        restricts the exp path's column max to valid t (ADVICE r4: a
        padded column outscoring every valid cell by > the f32 flush
        horizon would NEG-collapse the example)."""
        a, b = self.transition(enc, dec)
        f = self.frame(enc, dec, mel_target, input_length)
        if self.config.lattice_domain == "exp":
            F, mcol = f
            return a, b, F, mcol
        return a, b, f

    # ------------------------------------------------------------ training

    def __call__(self, tokens, mel_target, input_length=None,
                 output_length=None):
        """Training forward: per-example SSNT NLL (B,)."""
        enc = self.encode(tokens, input_length)
        dec = self.decoder_states(mel_target)
        q = self.lattice_quantities(enc, dec, mel_target, input_length)
        loss_fn = _lattice_loss_fn(
            self.config.lattice_impl, self.config.lattice_dtype,
            self.config.lattice_domain,
        )
        return loss_fn(*q, input_length, output_length)

    def loss(self, tokens, mel_target, input_length=None, output_length=None,
             duration_target=None, tone_target=None):
        """Total training loss (scalar) + metrics dict.

        Auxiliary heads train from optional targets: durations (B, T) i32 and
        tones (B, T) i32, masked by input_length.
        """
        B, U, M = mel_target.shape
        T = tokens.shape[1]
        enc = self.encode(tokens, input_length)
        dec = self.decoder_states(mel_target)
        q = self.lattice_quantities(enc, dec, mel_target, input_length)
        loss_fn = _lattice_loss_fn(
            self.config.lattice_impl, self.config.lattice_dtype,
            self.config.lattice_domain,
        )
        nll = loss_fn(*q, input_length, output_length)
        if output_length is None:
            frames = jnp.full((B,), U, jnp.float32)
        else:
            frames = output_length.astype(jnp.float32)
        loss = jnp.mean(nll / jnp.maximum(frames, 1.0))
        metrics = {"nll_per_frame": loss}

        tmask = (
            length_mask(input_length, T)
            if input_length is not None
            else jnp.ones((B, T), bool)
        )
        denom = jnp.maximum(jnp.sum(tmask), 1)
        if duration_target is not None:
            # Teacher-forced AR CE — trains the same per-beam conditioning
            # parameters v2_duration_decode steps with.
            dlogp = self.duration_ar_log_probs(enc, duration_target)
            dur_nll = -jnp.take_along_axis(
                dlogp, duration_target[..., None], axis=-1
            )[..., 0]
            dur_loss = jnp.sum(jnp.where(tmask, dur_nll, 0.0)) / denom
            loss = loss + dur_loss
            metrics["duration_nll"] = dur_loss
        cfg = self.config
        if cfg.use_duration_lattice and output_length is not None:
            # Marginal likelihood over the v2 alignment space
            # (src/v2.rs:119-166): sum over all class sequences whose
            # durations total exactly output_length. Trains the per-position
            # head without needing duration targets (VERDICT r1 #5).
            dlogp_pos = self.duration_head(enc)  # (B, T, D)
            dur_lat_nll = lattice.ssnt_duration_loss(
                dlogp_pos, cfg.duration_table, input_length, output_length
            )
            frames_d = output_length.astype(jnp.float32)
            dur_lat = jnp.mean(dur_lat_nll / jnp.maximum(frames_d, 1.0))
            loss = loss + cfg.duration_lattice_weight * dur_lat
            metrics["duration_lattice_nll_per_frame"] = dur_lat
        if tone_target is not None:
            klogp = self.tone_ar_log_probs(enc, tone_target)  # (B, T, K)
            tone_nll = -jnp.take_along_axis(
                klogp, tone_target[..., None], axis=-1
            )[..., 0]
            tone_loss = jnp.sum(jnp.where(tmask, tone_nll, 0.0)) / denom
            loss = loss + tone_loss
            metrics["tone_nll"] = tone_loss
        metrics["loss"] = loss
        return loss, metrics

    # ------------------------------------------------------------- heads

    def duration_log_probs(self, tokens, input_length=None):
        """(B, T, D) per-position log-probs (non-AR; the duration-lattice
        NLL's input and the broadcast decode fallback)."""
        return self.duration_head(self.encode(tokens, input_length))

    def tone_log_probs(self, tokens, input_length=None):
        """(B, T, K) per-position log-probs."""
        return self.tone_head(self.encode(tokens, input_length))

    def _ar_class_log_probs(self, head, ar_cell, enc, classes):
        """Teacher-forced AR class log-probs: (B, T) target ids ->
        (B, T, D). Trains the same parameters the per-beam decode steps use,
        so decode-time h is consistent with training."""
        B, T, _ = enc.shape
        base = head.logits(enc)  # (B, T, D)
        prev = jnp.concatenate(
            [jnp.zeros((B, 1), classes.dtype), classes[:, :-1]], axis=1
        )

        def body(mod, state, xs):
            enc_t, prev_t, base_t = xs
            return ar_cell.step(state, enc_t, prev_t, base_t)

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        state0 = ARClassCell.initial_state((B,), self.config.decoder_dim)
        _, logp = scan(self, state0, (enc, prev, base))
        return logp

    def duration_ar_log_probs(self, enc, duration_classes):
        return self._ar_class_log_probs(
            self.duration_head, self.duration_ar, enc, duration_classes
        )

    def tone_ar_log_probs(self, enc, tone_classes):
        return self._ar_class_log_probs(
            self.tone_head, self.tone_ar, enc, tone_classes
        )

    def duration_decode_step(self, enc, beam_t, state, prev_class):
        """Per-beam v2 conditioning (reference h input, SURVEY §3.1).

        enc (B, T, H); beam_t (B, W) source positions; state (B, W, H');
        prev_class (B, W) previous predicted duration class.
        Returns (h (B, W, D) log-probs, new_state)."""
        return self._class_decode_step(
            self.duration_head, self.duration_ar, enc, beam_t, state,
            prev_class,
        )

    def tone_decode_step(self, enc, beam_t, state, prev_class):
        """Per-beam tone conditioning — (h (B, W, K), new_state)."""
        return self._class_decode_step(
            self.tone_head, self.tone_ar, enc, beam_t, state, prev_class
        )

    def _class_decode_step(self, head, ar_cell, enc, beam_t, state,
                           prev_class):
        B, T, _ = enc.shape
        W = beam_t.shape[1]
        enc_t = jnp.take_along_axis(
            enc, jnp.clip(beam_t, 0, T - 1)[..., None], axis=1
        )  # (B, W, H)
        base = head.logits(enc_t)  # (B, W, D)
        Hs = state.shape[-1]
        new_state, h = ar_cell.step(
            state.reshape(B * W, Hs),
            enc_t.reshape(B * W, -1),
            prev_class.reshape(B * W),
            base.reshape(B * W, -1),
        )
        return h.reshape(B, W, -1), new_state.reshape(B, W, Hs)

    # ------------------------------------------------------------- decode

    def synthesize_from_alignment(self, enc, source_indexes):
        """Generate mel frames attending through a decoded alignment map.

        Completes the v2 production path (SURVEY.md §3.3): after
        v2_duration_decode produces frame->source indices, the AR decoder
        walks the frames, attending to enc at each frame's source position.

        enc (B, T, H); source_indexes (B, U) i32 (out-of-range entries
        clipped — callers mask with the true output length).
        Returns mel (B, U, M).
        """
        B, T, H = enc.shape
        U = source_indexes.shape[1]
        src = jnp.clip(source_indexes, 0, T - 1)
        enc_path = jnp.take_along_axis(
            enc, src[..., None], axis=1
        )  # (B, U, H)
        carry0 = ARDecoderCell.initial_carry(B, self.config.decoder_dim)

        # nn.scan over frames: carry = (gru_state, prev_mel).
        def body(mod, carry, enc_t):
            gru_state, prev_mel = carry
            new_state, dec_out = mod.ar_cell(gru_state, prev_mel)
            mel = mod.frame.predict(enc_t, dec_out)
            return (new_state, mel), mel

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        init = (carry0, jnp.zeros((B, self.config.mel_dim), jnp.float32))
        _, mel = scan(self, init, enc_path)
        return mel

    def decode_step(self, enc, beam_t, dec_state, prev_mel):
        """One decode step for all beams of all utterances.

        enc (B, T, H); beam_t (B, W) current source positions;
        dec_state (B, W, H) GRU carries; prev_mel (B, W, M).
        Returns (h (B, W, 2) transition log-probs, new dec_state, mel (B,W,M))
        — h feeds ops.beam_v1.beam_search_step.
        """
        enc_t = jnp.take_along_axis(
            enc, beam_t[..., None], axis=1
        )  # (B, W, H)
        B, W, H = dec_state.shape
        flat_state, flat_out = self.ar_cell(
            dec_state.reshape(B * W, H), prev_mel.reshape(B * W, -1)
        )
        new_state = flat_state.reshape(B, W, H)
        dec_out = flat_out.reshape(B, W, -1)
        h = self.transition.step(enc_t, dec_out)
        mel = self.frame.predict(enc_t, dec_out)
        return h, new_state, mel
