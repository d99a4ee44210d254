"""Round-5 hardware probe: model-fused decode kernels (VERDICT r4 #1).

1. Equality on hardware, f32-dtype model: fused v2/tone decode vs the
   XLA scan. WHAT EXACT EQUALITY IS POSSIBLE: given identical h, the
   beam kernels are bit-exact vs the XLA step (probe_beam_pallas.py
   randomized trials + interpret-mode tests). The fused path computes h
   itself, and TPU XLA's default matmul precision truncates f32
   operands to bf16 per-dot, making h SHAPE-DEPENDENT: the (B, T)-path
   precompute and flax's (B, W) per-step dots legitimately differ by
   ~1e-2 (measured /tmp-probe r5; the same class of difference as an
   XLA fusion-heuristic change). Near-tie candidates can then flip and
   whole paths diverge. The meaningful hardware contracts checked here:
   aggregate decode outputs equal (output_length / total_duration /
   beam_emptied), prediction agreement rate ~> 90%, and the
   kernel-vs-same-formulation single-step h delta < 5e-2.
2. Timing at the bench shapes (B=32, T=80, U=400, W=8, D=10): fused scan
   vs the round-4 beam-kernel scan (both on the round-5 bitonic
   selection).

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/probe_fused.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


T0 = time.time()

from ssnt_tts_tpu.models import SSNTModel
from ssnt_tts_tpu.parallel import decode as decode_lib
from ssnt_tts_tpu.parallel import train as train_lib
from ssnt_tts_tpu.utils.config import ModelConfig, TrainConfig
from ssnt_tts_tpu.utils.timing import bench_step

cfg = ModelConfig(
    vocab_size=128, mel_dim=80, encoder_dim=256, encoder_layers=2,
    encoder_heads=4, decoder_dim=256, joint_rank=64,
)
model = SSNTModel(cfg)
rng = np.random.default_rng(0)
B, T, U, W = 32, 80, 400, 8
batch = {
    "tokens": jnp.asarray(rng.integers(1, cfg.vocab_size, (B, T)), jnp.int32),
    "mel": jnp.asarray(rng.normal(0, 1, (B, U, cfg.mel_dim)), jnp.float32),
    "input_length": jnp.full((B,), T, jnp.int32),
    "output_length": jnp.full((B,), U, jnp.int32),
}
log("init params...")
state = train_lib.init_train_state(
    model, jax.random.PRNGKey(0), batch, TrainConfig(warmup_steps=2)
)
params = state.params
dtab = jnp.arange(10, dtype=jnp.int32)

# ---- 1. hardware contracts on a small ragged case (f32 model) ----
cfg32 = ModelConfig(
    vocab_size=128, mel_dim=80, encoder_dim=256, encoder_layers=2,
    encoder_heads=4, decoder_dim=256, joint_rank=64, dtype="float32",
)
model32 = SSNTModel(cfg32)
Bs = 8
toks_s = batch["tokens"][:Bs, :40]
il_s = jnp.asarray([40, 30, 40, 17, 40, 25, 40, 33], jnp.int32)
ol_s = jnp.asarray([180, 140, 200, 80, 190, 120, 160, 150], jnp.int32)
batch_s = {
    "tokens": toks_s, "mel": batch["mel"][:Bs],
    "input_length": il_s, "output_length": ol_s,
}
state32 = train_lib.init_train_state(
    model32, jax.random.PRNGKey(0), batch_s, TrainConfig(warmup_steps=2)
)
p32 = state32.params
fail = []
log("contract: v2 fused vs XLA, f32 model (compiling)...")
kw = dict(beam_width=W, max_frames=U)
f = jax.jit(lambda p: decode_lib.v2_duration_decode(
    model32, p, toks_s, il_s, ol_s, dtab, fuse_model=True, **kw))
x = jax.jit(lambda p: decode_lib.v2_duration_decode(
    model32, p, toks_s, il_s, ol_s, dtab, fuse_model=False,
    use_pallas=False, **kw))
of, ox = jax.device_get((f(p32), x(p32)))
for k in ["output_length", "total_duration", "beam_emptied"]:
    same = bool(np.array_equal(of[k], ox[k]))
    log(f"  v2 {k}: {'EQUAL' if same else 'DIFFERS'}")
    if not same:
        fail.append(f"v2 aggregate {k}")
agree = float(np.mean(of["prediction"] == ox["prediction"]))
log(f"  v2 prediction agreement {agree:.3f} (tie-flips expected; "
    f"gate > 0.9)")
if agree < 0.9:
    fail.append("v2 prediction agreement")

log("contract: tone fused vs XLA, f32 model (compiling)...")
ft = jax.jit(lambda p: decode_lib.tone_decode(
    model32, p, toks_s, il_s, beam_width=W, fuse_model=True))
xt = jax.jit(lambda p: decode_lib.tone_decode(
    model32, p, toks_s, il_s, beam_width=W, fuse_model=False,
    use_pallas=False))
otf, otx = jax.device_get((ft(p32), xt(p32)))
agree = float(np.mean(otf["tones"] == otx["tones"]))
log(f"  tone agreement {agree:.3f} (gate > 0.9)")
if agree < 0.9:
    fail.append("tone agreement")

# ---- 2. timing at bench shapes ----
def chain_v2(fuse, use_pallas):
    def step(p):
        out = decode_lib.v2_duration_decode(
            model, p, batch["tokens"], batch["input_length"],
            batch["output_length"], dtab, beam_width=W, max_frames=U,
            fuse_model=fuse, use_pallas=use_pallas,
        )
        eps = out["log_prob"].ravel()[0] * 1e-20
        return jax.tree.map(lambda q: q + eps, p)
    return step


def chain_v1(fuse, use_pallas):
    def step(p):
        out = decode_lib.beam_decode(
            model, p, batch["tokens"], batch["input_length"],
            max_frames=U, beam_width=W, fuse_model=fuse,
            use_pallas=use_pallas,
        )
        eps = out["log_prob"].ravel()[0] * 1e-20
        return jax.tree.map(lambda q: q + eps, p)
    return step


def chain_tone(fuse, use_pallas):
    def step(p):
        out = decode_lib.tone_decode(
            model, p, batch["tokens"], batch["input_length"],
            beam_width=W, fuse_model=fuse, use_pallas=use_pallas,
        )
        eps = out["log_prob"].ravel()[0] * 1e-20
        return jax.tree.map(lambda q: q + eps, p)
    return step


for name, step, den in [
    ("v2 fused    ", chain_v2(True, None), T),
    ("v2 r4 kernel", chain_v2(False, True), T),
    ("tone fused    ", chain_tone(True, None), T),
    ("tone r4 kernel", chain_tone(False, True), T),
    ("v1 fused    ", chain_v1(True, None), U),
    ("v1 r4 kernel", chain_v1(False, True), U),
]:
    log(f"timing {name} (compiling)...")
    dt = bench_step(step, params, n_lo=2, n_hi=16)
    log(f"  {name}: {dt/den*1e6:8.2f} us/step   ({dt*1e3:.2f} ms/decode)")

log(f"done ({'ALL CONTRACTS PASS' if not fail else 'FAILED: ' + ', '.join(fail)})")
