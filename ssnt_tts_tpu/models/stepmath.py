"""Extracted-weight AR class-step math (the fused-decode contract).

The v2/tone decode scans condition each beam on its own class history via
ARClassCell + ClassHead (models/encoder.py). Round 5 fuses that model math
INTO the beam kernels (ops/beam_fused.py) to collapse the decode step's
~10 serial dispatches — the measured latency floor of the round-4 decode
paths (docs/DECODE_PROFILE.md, VERDICT r4 #1) — into one launch.

A Mosaic kernel cannot call flax modules, so this module defines the step
as pure functions over a flat tuple of weight arrays, replicating the flax
ops EXACTLY (same operand order, same bf16/f32 casts as nn.Dense/
nn.Embed/nn.GRUCell with dtype=bfloat16):

  - `extract_class_step_weights`: pull the needed leaves out of the flax
    param tree (duration_ar/duration_head or tone_ar/tone_head).
  - `gru_step` / `head_base` / `class_step_math`: the per-step math.
    `class_step_math(w, enc_t, state, prev_class)` is bit-equal to
    SSNTModel._class_decode_step on the same backend
    (tests/test_beam_fused.py asserts it).
  - `class_decode_paths`: the enc-side precompute. In the v2/tone scans
    every beam's source position is a deterministic function of the step
    index (v2: t = min(s, T-1); tone: t = min(s, min(T_b, T-1)); the
    beams only diverge in (u, class history)), so enc gathering + the
    enc-side matmuls (enc_in projection, head base logits) hoist out of
    the scan entirely into (T, B, ·) path arrays the kernel indexes by
    step via scalar prefetch.

Reference mapping: this replaces the caller-side h computation the
reference expected around its v2/tone ops (h (B, W, D) per-beam inputs,
ssnt-tts-tensorflow/src/ssnt_tts_v2_beam_search_decode_op.cc:29-50).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ClassStepWeights(NamedTuple):
    """Flat weights for one AR class head (duration or tone).

    Shapes: He = encoder dim, H = decoder dim, D = class count.
    GRU kernels are packed [r|z|n] along the output axis — column-wise
    packing is bitwise-identical to flax's separate per-gate Dense calls
    (each output column's dot product is independent).
    """

    embed: jax.Array      # (D, H) f32 class embedding table
    enc_in_k: jax.Array   # (He, H)
    enc_in_b: jax.Array   # (H,)
    wi: jax.Array         # (H, 3H) input kernel [ir|iz|in]
    bi: jax.Array         # (3H,) input bias [bir|biz|bin]
    wh: jax.Array         # (H, 3H) recurrent kernel [hr|hz|hn]
    bhn: jax.Array        # (H,) recurrent bias of the n gate
    out_k: jax.Array      # (H, D) f32 correction head
    out_b: jax.Array      # (D,)
    head_h1_k: jax.Array  # (He, Hh) ClassHead hidden
    head_h1_b: jax.Array  # (Hh,)
    head_out_k: jax.Array  # (Hh, D) f32
    head_out_b: jax.Array  # (D,)


def extract_class_step_weights(
    params, head_name: str, ar_name: str
) -> ClassStepWeights:
    """Pull the decode-step weights for one class head out of the flax
    variables dict (e.g. head_name="duration_head", ar_name="duration_ar";
    tone: "tone_head"/"tone_ar")."""
    p = params["params"]
    ar = p[ar_name]
    head = p[head_name]
    cell = ar["cell"]
    wi = jnp.concatenate(
        [cell["ir"]["kernel"], cell["iz"]["kernel"], cell["in"]["kernel"]],
        axis=1,
    )
    bi = jnp.concatenate(
        [cell["ir"]["bias"], cell["iz"]["bias"], cell["in"]["bias"]]
    )
    wh = jnp.concatenate(
        [cell["hr"]["kernel"], cell["hz"]["kernel"], cell["hn"]["kernel"]],
        axis=1,
    )
    return ClassStepWeights(
        embed=ar["embed"]["embedding"],
        enc_in_k=ar["enc_in"]["kernel"],
        enc_in_b=ar["enc_in"]["bias"],
        wi=wi,
        bi=bi,
        wh=wh,
        bhn=cell["hn"]["bias"],
        out_k=ar["out"]["kernel"],
        out_b=ar["out"]["bias"],
        head_h1_k=head["h1"]["kernel"],
        head_h1_b=head["h1"]["bias"],
        head_out_k=head["out"]["kernel"],
        head_out_b=head["out"]["bias"],
    )


def head_base(w: ClassStepWeights, enc, dtype=jnp.bfloat16) -> jax.Array:
    """ClassHead.logits replica: (..., He) f32 -> (..., D) f32.
    h1 is Dense(dtype=ModelConfig.dtype), out is Dense(f32)."""
    bf = jnp.dtype(dtype)
    # Dots accumulate f32 then round once to the compute dtype — the
    # same result XLA's native low-precision dot produces, and the only
    # form Mosaic accepts (32-bit acc required).
    h1 = (
        jnp.dot(enc.astype(bf), w.head_h1_k.astype(bf),
                preferred_element_type=jnp.float32).astype(bf)
        + w.head_h1_b.astype(bf)
    )
    h1 = jax.nn.relu(h1)
    return (
        jnp.dot(h1.astype(jnp.float32), w.head_out_k.astype(jnp.float32))
        + w.head_out_b.astype(jnp.float32)
    )


def enc_in_proj(w: ClassStepWeights, enc, dtype=jnp.bfloat16) -> jax.Array:
    """ARClassCell.enc_in replica: (..., He) f32 -> (..., H) dtype."""
    bf = jnp.dtype(dtype)
    return jnp.dot(
        enc.astype(bf), w.enc_in_k.astype(bf),
        preferred_element_type=jnp.float32,
    ).astype(bf) + w.enc_in_b.astype(bf)


def gru_step(wi, bi, wh, bhn, state_f32, x_dt):
    """flax nn.GRUCell(dtype=ModelConfig.dtype) replica with packed
    [r|z|n] kernels. The compute dtype is inferred from x_dt (the caller
    provides it in the model dtype).

    state_f32 (..., H) f32 carry; x_dt (..., H) input.
    Returns new_h (..., H) f32 (flax's mixed-precision promotion:
    (1-z)*n is in the compute dtype, z*h promotes to f32)."""
    bf = x_dt.dtype
    H = state_f32.shape[-1]
    gi = jnp.dot(
        x_dt, wi.astype(bf), preferred_element_type=jnp.float32
    ).astype(bf) + bi.astype(bf)
    gh = jnp.dot(
        state_f32.astype(bf), wh.astype(bf),
        preferred_element_type=jnp.float32,
    ).astype(bf)
    # Nonlinearities evaluate at f32 and round back to the compute dtype:
    # identical to flax for f32 models (the bit-exactness contract the
    # tests assert), <= 1 ulp from flax's native-bf16 logistic for bf16
    # models (tests/test_beam_fused.py::test_fused_v2_bf16_model), and —
    # the reason — Mosaic cannot lower logistic/tanh on bf16 vectors.
    f32 = jnp.float32
    sig = lambda p: jax.nn.sigmoid(p.astype(f32)).astype(bf)
    r = sig(gi[..., :H] + gh[..., :H])
    z = sig(gi[..., H:2 * H] + gh[..., H:2 * H])
    n = jnp.tanh(
        (gi[..., 2 * H:] + r * (gh[..., 2 * H:] + bhn.astype(bf)))
        .astype(f32)
    ).astype(bf)
    one = jnp.ones((), bf)
    return (one - z) * n + z * state_f32


def ar_correction(w: ClassStepWeights, new_h) -> jax.Array:
    """ARClassCell.out replica (Dense f32): (..., H) f32 -> (..., D)."""
    return jnp.dot(
        new_h.astype(jnp.float32), w.out_k.astype(jnp.float32)
    ) + w.out_b.astype(jnp.float32)


def class_step_math(w: ClassStepWeights, enc_t, state, prev_class,
                    dtype=jnp.bfloat16):
    """Full decode-step replica of SSNTModel._class_decode_step.

    enc_t (..., He) f32, state (..., H) f32, prev_class (...,) i32;
    dtype = ModelConfig.dtype (the flax modules' compute dtype).
    Returns (log_probs (..., D) f32, new_state (..., H) f32)."""
    bf = jnp.dtype(dtype)
    base = head_base(w, enc_t, bf)
    x = w.embed[prev_class].astype(bf) + enc_in_proj(w, enc_t, bf)
    new_h = gru_step(w.wi, w.bi, w.wh, w.bhn, state, x)
    logits = base + ar_correction(w, new_h)
    return jax.nn.log_softmax(logits, axis=-1), new_h


def class_decode_paths(
    w: ClassStepWeights, enc, input_length, *, kind: str,
    dtype=jnp.bfloat16,
):
    """Hoisted enc-side per-step inputs for the fused decode scan.

    enc (B, T, He) f32; input_length (B,) i32; kind "v2" or "tone".
    Returns (xin_path (T, B, H) in the model compute dtype,
    base_path (T, B, D) f32): row s
    holds enc_in(enc[t_s]) / head.logits(enc[t_s]) at the source position
    every beam provably occupies at scan step s (v2: min(s, T_b-1);
    tone: min(s, T_b); both clipped to T-1 exactly like
    SSNTModel._class_decode_step's jnp.clip)."""
    B, T, _ = enc.shape
    il = jnp.asarray(input_length, jnp.int32)
    xin_all = enc_in_proj(w, enc, dtype)   # (B, T, H) dtype
    base_all = head_base(w, enc, dtype)    # (B, T, D) f32
    s = jnp.arange(T, dtype=jnp.int32)[:, None]       # (T, 1)
    if kind == "v2":
        idx = jnp.minimum(s, il[None, :] - 1)
    elif kind == "tone":
        idx = jnp.minimum(s, il[None, :])
    else:
        raise ValueError(kind)
    idx = jnp.clip(idx, 0, T - 1)                      # (T, B)
    b_idx = jnp.arange(B, dtype=jnp.int32)[None, :]
    return xin_all[b_idx, idx], base_all[b_idx, idx]


# ---------------------------------------------------------------- v1 path

class V1StepWeights(NamedTuple):
    """Flat weights for the v1 mel-decode step (ARDecoderCell +
    TransitionJoint + FrameJoint decode sides). Enc-side projections
    (enc_proj / enc_bias / enc_mel) are separate: they hoist out of the
    scan into the packed enc path (v1_enc_pack)."""

    prenet_w1: jax.Array  # (M, H)
    prenet_b1: jax.Array
    prenet_w2: jax.Array  # (H, H)
    prenet_b2: jax.Array
    wi: jax.Array         # (H, 3H) GRU input kernel [r|z|n]
    bi: jax.Array
    wh: jax.Array         # (H, 3H) GRU recurrent kernel
    bhn: jax.Array
    dec_pre_k: jax.Array  # (H, R)
    dec_pre_b: jax.Array
    dec_proj_k: jax.Array  # (R, 2R)
    dec_proj_b: jax.Array
    dec_bias_k: jax.Array  # (H, 2) f32
    dec_bias_b: jax.Array
    dec_mel_k: jax.Array   # (H, M)
    dec_mel_b: jax.Array
    enc_proj_k: jax.Array  # (He, 2R)
    enc_proj_b: jax.Array
    enc_bias_k: jax.Array  # (He, 2) f32
    enc_bias_b: jax.Array
    enc_mel_k: jax.Array   # (He, M)
    enc_mel_b: jax.Array


def extract_v1_step_weights(params) -> V1StepWeights:
    p = params["params"]
    ar = p["ar_cell"]
    cell = ar["cell"]
    tr = p["transition"]
    fr = p["frame"]
    wi = jnp.concatenate(
        [cell["ir"]["kernel"], cell["iz"]["kernel"], cell["in"]["kernel"]],
        axis=1,
    )
    bi = jnp.concatenate(
        [cell["ir"]["bias"], cell["iz"]["bias"], cell["in"]["bias"]]
    )
    wh = jnp.concatenate(
        [cell["hr"]["kernel"], cell["hz"]["kernel"], cell["hn"]["kernel"]],
        axis=1,
    )
    return V1StepWeights(
        prenet_w1=ar["prenet"]["Dense_0"]["kernel"],
        prenet_b1=ar["prenet"]["Dense_0"]["bias"],
        prenet_w2=ar["prenet"]["Dense_1"]["kernel"],
        prenet_b2=ar["prenet"]["Dense_1"]["bias"],
        wi=wi, bi=bi, wh=wh, bhn=cell["hn"]["bias"],
        dec_pre_k=tr["dec_pre"]["kernel"],
        dec_pre_b=tr["dec_pre"]["bias"],
        dec_proj_k=tr["dec_proj"]["kernel"],
        dec_proj_b=tr["dec_proj"]["bias"],
        dec_bias_k=tr["dec_bias"]["kernel"],
        dec_bias_b=tr["dec_bias"]["bias"],
        dec_mel_k=fr["dec_mel"]["kernel"],
        dec_mel_b=fr["dec_mel"]["bias"],
        enc_proj_k=tr["enc_proj"]["kernel"],
        enc_proj_b=tr["enc_proj"]["bias"],
        enc_bias_k=tr["enc_bias"]["kernel"],
        enc_bias_b=tr["enc_bias"]["bias"],
        enc_mel_k=fr["enc_mel"]["kernel"],
        enc_mel_b=fr["enc_mel"]["bias"],
    )


def v1_enc_pack(w: V1StepWeights, enc, dtype=jnp.bfloat16):
    """Hoisted enc-side projections for the fused v1 decode, packed into
    ONE (B, T, 2R + 2 + M) f32 array so the per-step per-beam gather is
    a single take_along_axis: [enc_proj | enc_bias | enc_mel]. Values
    are the flax projections exactly (bf16 results stored as f32 pass
    through the round-trip unchanged)."""
    bf = jnp.dtype(dtype)
    f32 = jnp.float32
    p = (
        jnp.dot(enc.astype(bf), w.enc_proj_k.astype(bf),
                preferred_element_type=f32).astype(bf)
        + w.enc_proj_b.astype(bf)
    ).astype(f32)
    eb = jnp.dot(enc.astype(f32), w.enc_bias_k.astype(f32)) + (
        w.enc_bias_b.astype(f32)
    )
    em = (
        jnp.dot(enc.astype(bf), w.enc_mel_k.astype(bf),
                preferred_element_type=f32).astype(bf)
        + w.enc_mel_b.astype(bf)
    ).astype(f32)
    return jnp.concatenate([p, eb, em], axis=-1)


def v1_step_math(w: V1StepWeights, gath, state, prev_mel,
                 dtype=jnp.bfloat16, R2=None, M=None):
    """v1 decode-step replica over the packed gather rows.

    gath (N, 2R+2+M) f32 = v1_enc_pack gathered at each beam's t;
    state (N, H) f32 GRU carry; prev_mel (N, M) f32.
    Returns (h_e (N, 1), h_s (N, 1) transition log-probs, mel (N, M),
    new_state (N, H)) — replicating SSNTModel.decode_step (prenet ->
    GRU -> transition.step -> frame.predict) with the same casts.
    Nonlinearities evaluate at f32 (see gru_step note)."""
    bf = jnp.dtype(dtype)
    f32 = jnp.float32
    if R2 is None:
        R2 = w.enc_proj_k.shape[1]
    R = R2 // 2
    if M is None:
        M = w.enc_mel_k.shape[1]
    p = gath[:, :R2].astype(bf)
    eb = gath[:, R2:R2 + 2]
    em = gath[:, R2 + 2:].astype(bf)

    x = jnp.dot(prev_mel.astype(bf), w.prenet_w1.astype(bf),
                preferred_element_type=f32).astype(bf) + (
        w.prenet_b1.astype(bf))
    x = jax.nn.relu(x)
    x = jnp.dot(x, w.prenet_w2.astype(bf),
                preferred_element_type=f32).astype(bf) + (
        w.prenet_b2.astype(bf))
    x = jax.nn.relu(x)
    new_h = gru_step(w.wi, w.bi, w.wh, w.bhn, state, x)  # (N, H) f32
    dec_out = new_h.astype(f32)

    pre = jnp.dot(dec_out.astype(bf), w.dec_pre_k.astype(bf),
                  preferred_element_type=f32).astype(bf) + (
        w.dec_pre_b.astype(bf))
    pre = jnp.tanh(pre.astype(f32)).astype(bf)
    q = jnp.dot(pre, w.dec_proj_k.astype(bf),
                preferred_element_type=f32).astype(bf) + (
        w.dec_proj_b.astype(bf))
    prod = (p * q).astype(f32)  # (N, 2R); f32 accumulation of the
    # rank reduction (flax reduces in bf16; <= 1 ulp, f32-exact models
    # identical)
    le = jnp.sum(prod[:, :R], axis=1, keepdims=True)
    ls = jnp.sum(prod[:, R:], axis=1, keepdims=True)
    db = jnp.dot(dec_out, w.dec_bias_k.astype(f32)) + (
        w.dec_bias_b.astype(f32))
    le = le + eb[:, 0:1] + db[:, 0:1]
    ls = ls + eb[:, 1:2] + db[:, 1:2]
    # log_softmax over the two classes, associated exactly like
    # jax.nn.log_softmax: shifted - log(sum(exp(shifted))).
    mx = jnp.maximum(le, ls)
    she, shs = le - mx, ls - mx
    logS = jnp.log(jnp.exp(she) + jnp.exp(shs))
    b_mel = jnp.dot(dec_out.astype(bf), w.dec_mel_k.astype(bf),
                    preferred_element_type=f32).astype(bf) + (
        w.dec_mel_b.astype(bf))
    mel = (em + b_mel).astype(f32)
    return she - logS, shs - logS, mel, new_h
