"""Round-5 hardware probe: model-fused decode kernels (VERDICT r4 #1).

1. Equality on hardware: fused v2/tone decode vs the XLA scan on a small
   fixed case (discrete outputs exact, log-probs allclose).
2. Timing at the bench shapes (B=32, T=80, U=400, W=8, D=10): fused scan
   vs the round-4 beam-kernel scan vs pure-XLA.

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

# ---- 1. hardware equality on a small ragged case ----
Bs = 8
toks_s = batch["tokens"][:Bs, :40]
il_s = jnp.asarray([40, 30, 40, 17, 40, 25, 40, 33], jnp.int32)
ol_s = jnp.asarray([180, 140, 200, 80, 190, 120, 160, 150], jnp.int32)
log("equality: v2 fused vs XLA (compiling)...")
kw = dict(beam_width=W, max_frames=U)
f = jax.jit(lambda p: decode_lib.v2_duration_decode(
    model, p, toks_s, il_s, ol_s, dtab, fuse_model=True, **kw))
x = jax.jit(lambda p: decode_lib.v2_duration_decode(
    model, p, toks_s, il_s, ol_s, dtab, fuse_model=False,
    use_pallas=False, **kw))
of, ox = jax.device_get((f(params), x(params)))
for k in ["prediction", "beam_branch", "output_length", "total_duration",
          "beam_emptied", "is_finished"]:
    same = bool(np.array_equal(of[k], ox[k]))
    log(f"  v2 {k}: {'EQUAL' if same else 'DIFFERS'}")
    if not same and k == "prediction":
        nd = int(np.sum(of[k] != ox[k]))
        log(f"    ({nd}/{of[k].size} elements differ)")
lpd = float(np.max(np.abs(of["log_prob"] - ox["log_prob"])))
log(f"  v2 log_prob maxdiff {lpd:.2e}")

log("equality: tone fused vs XLA (compiling)...")
ft = jax.jit(lambda p: decode_lib.tone_decode(
    model, p, toks_s, il_s, beam_width=W, fuse_model=True))
xt = jax.jit(lambda p: decode_lib.tone_decode(
    model, p, toks_s, il_s, beam_width=W, fuse_model=False,
    use_pallas=False))
otf, otx = jax.device_get((ft(params), xt(params)))
for k in ["tones", "prediction", "beam_branch"]:
    same = bool(np.array_equal(otf[k], otx[k]))
    log(f"  tone {k}: {'EQUAL' if same else 'DIFFERS'}")
lpd = float(np.max(np.abs(otf["log_prob"] - otx["log_prob"])))
log(f"  tone log_prob maxdiff {lpd:.2e}")

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


def chain_tone(fuse, use_pallas):
    def step(p):
        out = decode_lib.tone_decode(
            model, p, batch["tokens"], batch["input_length"],
            beam_width=W, fuse_model=fuse, use_pallas=use_pallas,
        )
        eps = out["log_prob"].ravel()[0] * 1e-20
        return jax.tree.map(lambda q: q + eps, p)
    return step


for name, step in [
    ("v2 fused    ", chain_v2(True, None)),
    ("v2 r4 kernel", chain_v2(False, True)),
    ("tone fused    ", chain_tone(True, None)),
    ("tone r4 kernel", chain_tone(False, True)),
]:
    log(f"timing {name} (compiling)...")
    dt = bench_step(step, params, n_lo=2, n_hi=16)
    log(f"  {name}: {dt/T*1e6:8.2f} us/source-step   ({dt*1e3:.2f} ms/decode)")

log("done")
