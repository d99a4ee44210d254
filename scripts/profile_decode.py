"""Decode-step cost breakdown (VERDICT r2 #2: profile before attacking).

The tunneled backend can't stream device traces, so the breakdown is by
component ablation with the trustworthy slope timer (utils/timing.py): each
component of the v1 beam-decode scan step is chained alone in a fori_loop
and timed, so the numbers add up (approximately) to the full step.

Components per step (parallel/decode.py):
  model   : decode_step = AR GRU cell + transition joint + frame joint
  beam    : beam_v1 candidate build + select_beams (dedup + top_k)
  gather  : parent-pointer state reorders

Also attempts a jax.profiler trace via utils/profiling.trace (works on
local backends; on the axon tunnel it records host-side ops only).

Usage: python -u scripts/profile_decode.py [--trace DIR]
Writes a summary to stdout; commit the numbers into docs/DECODE_PROFILE.md.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from ssnt_tts_tpu.models import SSNTModel
from ssnt_tts_tpu.ops import beam_pallas, beam_v1
from ssnt_tts_tpu.parallel import decode as decode_lib
from ssnt_tts_tpu.parallel import train as train_lib
from ssnt_tts_tpu.utils.config import ModelConfig, TrainConfig
from ssnt_tts_tpu.utils.timing import bench_step

ap = argparse.ArgumentParser()
ap.add_argument("--trace", default=None)
ap.add_argument("--batch", type=int, default=32)
ap.add_argument("--beam", type=int, default=8)
args = ap.parse_args()

cfg = ModelConfig(
    vocab_size=128, mel_dim=80, encoder_dim=256, encoder_layers=2,
    encoder_heads=4, decoder_dim=256, joint_rank=64,
)
model = SSNTModel(cfg)
B, T, U, W = args.batch, 80, 400, args.beam
M, H = cfg.mel_dim, cfg.decoder_dim
rng = np.random.default_rng(0)
tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, T)), jnp.int32)
il = jnp.full((B,), T, jnp.int32)
batch = {
    "tokens": tokens,
    "mel": jnp.asarray(rng.normal(0, 1, (B, U, M)), jnp.float32),
    "input_length": il,
    "output_length": jnp.full((B,), U, jnp.int32),
}
state = train_lib.init_train_state(
    model, jax.random.PRNGKey(0), batch, TrainConfig(warmup_steps=2)
)
params = state.params
enc = jax.jit(
    lambda p: model.apply(p, tokens, il, method=model.encode)
)(params)

results = {}


def report(name, dt):
    results[name] = dt * 1e6
    print(f"{name:>12}: {dt*1e6:8.2f} us/step", flush=True)


# ---- full decode step (the scan body of beam_decode, verbatim carry) ----
# Single source of truth for the dispatch rule (ADVICE r3).
USE_PALLAS = decode_lib.resolve_use_pallas(None)
beam_step_fn = (
    beam_pallas.beam_search_step_batched
    if USE_PALLAS
    else beam_v1.beam_search_decode_batched
)


def full_step(carry):
    # Mirrors the production beam_decode scan body (parallel/decode.py).
    t, u, lp, fin, dec_state, prev_mel = carry
    h, new_state, mel = model.apply(
        params, enc, jnp.clip(t, 0, T - 1), dec_state, prev_mel,
        method=model.decode_step,
    )
    if USE_PALLAS:
        from ssnt_tts_tpu.ops import beam_pallas

        packed = jnp.concatenate(
            [new_state, mel, prev_mel,
             fin.astype(jnp.float32)[..., None],
             t.astype(jnp.float32)[..., None]],
            axis=-1,
        )
        (pred, lp2, nt, nu, nfin, branch, packed) = (
            beam_pallas.beam_search_step_reorder(
                h, lp, fin, t, u, il, packed
            )
        )
        new_state, mel, prev_mel_g = (
            packed[..., :H], packed[..., H:H + M], packed[..., H + M:-2]
        )
        fin_prev = packed[..., -2] != 0
    else:
        (pred, lp2, nt, nu, nfin, branch) = beam_step_fn(
            h, lp, fin, t, u, il
        )
        branch_i = branch[..., None].astype(jnp.int32)
        packed = jnp.concatenate([new_state, mel, prev_mel], axis=-1)
        packed = jnp.take_along_axis(packed, branch_i, axis=1)
        new_state, mel, prev_mel_g = (
            packed[..., :H], packed[..., H:H + M], packed[..., H + M:]
        )
        ints = jnp.stack([fin.astype(jnp.int32), t], axis=-1)
        ints = jnp.take_along_axis(ints, branch_i, axis=1)
        fin_prev = ints[..., 0].astype(bool)
    mel = jnp.where(nfin[..., None] & fin_prev[..., None], prev_mel_g, mel)
    return (nt, nu, lp2, nfin, new_state, mel)


carry0 = (
    jnp.zeros((B, W), jnp.int32),
    jnp.zeros((B, W), jnp.int32),
    jnp.zeros((B, W), jnp.float32),
    jnp.zeros((B, W), bool),
    jnp.zeros((B, W, H), jnp.float32),
    jnp.zeros((B, W, M), jnp.float32),
)
report("full", bench_step(full_step, carry0, n_lo=20, n_hi=100))


# ---- model only: AR cell + joints, no beam machinery ----
def model_step(carry):
    dec_state, prev_mel = carry
    t = jnp.zeros((B, W), jnp.int32)
    h, new_state, mel = model.apply(
        params, enc, t, dec_state, prev_mel, method=model.decode_step,
    )
    # Data dependency on h so nothing is DCE'd.
    return (new_state + h.sum(-1, keepdims=True) * 1e-20, mel)


report("model", bench_step(model_step, carry0[4:6], n_lo=20, n_hi=100))


# ---- beam only: candidate build + select, fixed h ----
h0 = jnp.asarray(rng.normal(0, 1, (B, W, 2)), jnp.float32)


def beam_step(carry):
    t, u, lp, fin = carry
    h = h0 + lp[..., None] * 1e-20  # depend on carry; no hoisting
    (pred, lp2, nt, nu, nfin, branch) = beam_step_fn(
        h, lp, fin, t, u, il
    )
    return (nt, nu, lp2 * 1e-6, nfin, )


report("beam", bench_step(beam_step, carry0[:4], n_lo=20, n_hi=100))


# ---- gathers only ----
def gather_step(carry):
    dec_state, prev_mel = carry
    branch = (
        jnp.zeros((B, W), jnp.int32)
        + (dec_state[:, :1, 0] * 0).astype(jnp.int32)
    )
    branch_i = branch[..., None]
    packed = jnp.concatenate([dec_state, prev_mel, prev_mel], axis=-1)
    packed = jnp.take_along_axis(packed, branch_i, axis=1)
    return (packed[..., :H], packed[..., H:H + M])


report("gather", bench_step(gather_step, carry0[4:6], n_lo=20, n_hi=100))

print()
other = results["full"] - sum(
    results[k] for k in ("model", "beam", "gather")
)
print(f"components sum: {sum(results[k] for k in ('model','beam','gather')):.2f} us; "
      f"unattributed (scan/carry overhead): {other:.2f} us", flush=True)

if args.trace:
    from ssnt_tts_tpu.utils import profiling

    run = jax.jit(lambda c: full_step(c))
    _ = jax.tree.leaves(run(carry0))[0]
    with profiling.trace(args.trace):
        np.asarray(jax.tree.leaves(run(carry0))[0][0, 0])
    print(f"trace written to {args.trace}", flush=True)
