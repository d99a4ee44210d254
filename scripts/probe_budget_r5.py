"""Round-5 decode budget primitives (bench.py cites these numbers).

The fused decode step is ONE kernel, so the r4 dispatch-latency budget
model no longer applies. The r5 budget prices the fused step as a sum of
separately-measured structural primitives:

  T_shell   trivial-body pallas call with the EXACT fused-v2 operand
            list (same shapes/dtypes/specs, outputs copied from inputs)
            — launch + operand/DMA machinery + nothing else.
  T_sort    the bitonic selection network alone at the path's L
            (chained micro-kernel; includes its own launch, subtracted
            via the 2-operand shell).
  T_model   GRU/head matmul flops at the measured bf16 matmul rate
            plus weight bytes at the measured HBM stream rate.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/probe_budget_r5.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssnt_tts_tpu.utils.timing import bench_step

T0 = time.time()


def log(m):
    print(f"[{time.time()-T0:6.1f}s] {m}", flush=True)


B, W, D, H = 32, 8, 10, 256
C = W * D
H3 = 3 * H

# ---- T_shell: trivial kernel, exact fused-v2 operand list ----
def shell_kernel(s_ref, xin_ref, base_ref, pc_ref, state_ref,
                 lp_ref, fin_ref, tot_ref, t_ref, u_ref, dtab_ref,
                 il_ref, ol_ref, emptied_ref,
                 embed_ref, wi_ref, bi_ref, wh_ref, bhn_ref, outk_ref,
                 outb_ref,
                 opred_ref, olp_ref, ont_ref, onu_ref, ofin_ref,
                 otot_ref, obr_ref, onsurv_ref, oemptied_ref, opc_ref,
                 ostate_ref, ostep_ref):
    z = t_ref[:]
    opred_ref[:] = z
    olp_ref[:] = lp_ref[:]
    ont_ref[:] = z
    onu_ref[:] = u_ref[:]
    ofin_ref[:] = fin_ref[:]
    otot_ref[:] = tot_ref[:]
    obr_ref[:] = z
    onsurv_ref[:] = il_ref[:]
    oemptied_ref[:] = emptied_ref[:]
    opc_ref[:] = pc_ref[:]
    ostate_ref[:] = state_ref[:]
    ostep_ref[:] = jnp.broadcast_to(s_ref[0, 0] + 1, (1, 1))


def run_shell():
    T = 80
    xin = jnp.zeros((T, B, H), jnp.bfloat16)
    base = jnp.zeros((T, B, D), jnp.float32)
    row = lambda w: pl.BlockSpec((B, 1, w), lambda i, sr: (0, 0, 0))
    sub = lambda n_, w: pl.BlockSpec((B, n_, w), lambda i, sr: (0, 0, 0))
    full2 = lambda a, b_: pl.BlockSpec((a, b_), lambda i, sr: (0, 0))
    path = lambda w: pl.BlockSpec((1, B, w), lambda i, sr: (sr[0, 0], 0, 0))
    in_specs = [path(H), path(D), sub(W, 1), sub(W, H), row(W), row(W),
                row(W), row(W), row(W),
                pl.BlockSpec((1, 1, C), lambda i, sr: (0, 0, 0)),
                row(1), row(1), row(1),
                full2(D, H), full2(H, H3), full2(1, H3), full2(H, H3),
                full2(1, H), full2(H, D), full2(1, D)]
    out_specs = [row(W)] * 7 + [row(1), row(1), sub(W, 1), sub(W, H),
                                pl.BlockSpec((1, 1), lambda i, sr: (0, 0))]
    out_shape = (
        [jax.ShapeDtypeStruct((B, 1, W), jnp.int32)] * 1
        + [jax.ShapeDtypeStruct((B, 1, W), jnp.float32)]
        + [jax.ShapeDtypeStruct((B, 1, W), jnp.int32)] * 5
        + [jax.ShapeDtypeStruct((B, 1, 1), jnp.int32)] * 2
        + [jax.ShapeDtypeStruct((B, W, 1), jnp.int32),
           jax.ShapeDtypeStruct((B, W, H), jnp.float32),
           jax.ShapeDtypeStruct((1, 1), jnp.int32)]
    )
    weights = (jnp.zeros((D, H), jnp.bfloat16),
               jnp.zeros((H, H3), jnp.bfloat16),
               jnp.zeros((1, H3), jnp.bfloat16),
               jnp.zeros((H, H3), jnp.bfloat16),
               jnp.zeros((1, H), jnp.bfloat16),
               jnp.zeros((H, D), jnp.float32),
               jnp.zeros((1, D), jnp.float32))
    dtab = jnp.zeros((1, 1, C), jnp.int32)

    def step(c):
        (s, lp, fin, tot, t, u, st, pc, emp) = c
        out = pl.pallas_call(
            shell_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=in_specs, out_specs=out_specs),
            out_shape=out_shape,
        )(s.reshape(1, 1), xin, base, pc, st, lp, fin, tot, t, u, dtab,
          fin[:, :, :1], fin[:, :, :1], emp, *weights)
        (pred, lp2, nt, nu, nfin, ntot, br, ns, emp2, pc2, st2, s2) = out
        return (s2 % 80, lp2, nfin, ntot, nt, nu, st2, pc2, emp2)

    c0 = (jnp.zeros((1, 1), jnp.int32), jnp.zeros((B, 1, W), jnp.float32),
          jnp.zeros((B, 1, W), jnp.int32), jnp.zeros((B, 1, W), jnp.int32),
          jnp.zeros((B, 1, W), jnp.int32), jnp.zeros((B, 1, W), jnp.int32),
          jnp.zeros((B, W, H), jnp.float32), jnp.zeros((B, W, 1), jnp.int32),
          jnp.zeros((B, 1, 1), jnp.int32))
    return bench_step(step, c0, n_lo=8, n_hi=128)


log("T_shell (trivial body, full fused-v2 operand list)...")
t_shell = run_shell()
log(f"T_shell = {t_shell*1e6:.2f} us")

# ---- T_sort: bitonic network alone (vs a 2-operand shell) ----
from ssnt_tts_tpu.ops.beam_pallas import _bitonic_sort_desc


def run_sort(L, npay, trivial):
    def kern(lp_ref, gen_ref, olp_ref, ogen_ref):
        lp, gen = lp_ref[:], gen_ref[:]
        if trivial:
            olp_ref[:] = lp
            ogen_ref[:] = gen
            return
        pays = [gen] + [gen + i for i in range(npay - 1)]
        lp2, pays = _bitonic_sort_desc(lp, pays)
        olp_ref[:] = lp2
        ogen_ref[:] = pays[0]

    def step(c):
        lp, gen = c
        out = pl.pallas_call(
            kern,
            out_shape=[jax.ShapeDtypeStruct((B, L), jnp.float32),
                       jax.ShapeDtypeStruct((B, L), jnp.int32)],
        )(lp, gen)
        return (out[0] * 1.0000001, out[1] % L)

    lp0 = jnp.asarray(np.random.default_rng(0).normal(0, 1, (B, L)),
                      jnp.float32)
    gen0 = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None], (B, L))
    return bench_step(step, (lp0, gen0), n_lo=8, n_hi=256)


for L in (16, 64, 128):
    t_triv = run_sort(L, 4, True)
    t_sort = run_sort(L, 4, False)
    log(f"T_sort L={L}: {(t_sort-t_triv)*1e6:.2f} us "
        f"(kernel {t_sort*1e6:.2f}, shell {t_triv*1e6:.2f})")

# ---- model terms (priced from measured rates) ----
flops = 2 * (B * W) * H * H3 * 2  # two GRU dots
bytes_w = (D * H + 2 * H * H3 + H3 + H) * 2 + (H * D + D) * 4
log(f"T_model: {flops/150e12*1e6:.2f} us MXU (at 150 Tflop/s bf16) + "
    f"{bytes_w/594e9*1e6:.2f} us weight DMA (at 594 GB/s) "
    f"[{bytes_w/1e6:.2f} MB]")
log("done")


# ---- T_noselect: the real fused v2 kernel with trivial selection ----
# (budget decomposition: budget = T_noselect + T_sort; the gap between
# that and the measured fused step is pure composition overhead.)
def run_fused(trivial):
    from ssnt_tts_tpu.models import SSNTModel, stepmath
    from ssnt_tts_tpu.ops import beam_fused
    from ssnt_tts_tpu.parallel import train as train_lib
    from ssnt_tts_tpu.utils.config import ModelConfig, TrainConfig

    beam_fused._TRIVIAL_SELECT = trivial
    cfg = ModelConfig(vocab_size=128, mel_dim=80, encoder_dim=256,
                      encoder_layers=2, encoder_heads=4, decoder_dim=256,
                      joint_rank=64)
    model = SSNTModel(cfg)
    rng = np.random.default_rng(0)
    T = 80
    batch = {
        "tokens": jnp.asarray(rng.integers(1, 128, (B, T)), jnp.int32),
        "mel": jnp.asarray(rng.normal(0, 1, (B, 400, 80)), jnp.float32),
        "input_length": jnp.full((B,), T, jnp.int32),
        "output_length": jnp.full((B,), 400, jnp.int32),
    }
    st0 = train_lib.init_train_state(
        model, jax.random.PRNGKey(0), batch, TrainConfig(warmup_steps=2))
    w = stepmath.extract_class_step_weights(
        st0.params, "duration_head", "duration_ar")
    fw = beam_fused.prepare_fused_weights(w, jnp.bfloat16)
    enc = jax.jit(lambda p: model.apply(
        p, batch["tokens"], batch["input_length"],
        method=model.encode))(st0.params)
    xin_path, base_path = jax.jit(
        lambda e: stepmath.class_decode_paths(
            w, e, batch["input_length"], kind="v2",
            dtype=jnp.bfloat16))(enc)
    dtab3 = jnp.tile(jnp.arange(D, dtype=jnp.int32), W).reshape(1, 1, C)
    il3 = batch["input_length"].reshape(B, 1, 1)
    ol3 = batch["output_length"].reshape(B, 1, 1)

    def step(c):
        s, lp, fin, tot, t, u, st, pc, emp = c
        outs = beam_fused.fused_class_beam_step(
            "v2", s, xin_path, base_path, fw, pc, st, lp, fin, t, u,
            il3, total_duration=tot, duration_table_tiled=dtab3,
            output_length3=ol3, emptied=emp, zero_duration_id=0)
        (pred, lp2, nt, nu, nfin, ntot, br, _ns, emp2, pc2, st2,
         s2) = outs
        return (s2 % T, lp2, nfin, ntot, nt % 60, nu % 16000, st2,
                pc2, emp2 * 0)

    c0 = (jnp.zeros((1, 1), jnp.int32), jnp.zeros((B, 1, W), jnp.float32),
          jnp.zeros((B, 1, W), jnp.int32), jnp.zeros((B, 1, W), jnp.int32),
          jnp.zeros((B, 1, W), jnp.int32), jnp.zeros((B, 1, W), jnp.int32),
          jnp.zeros((B, W, H), jnp.float32), jnp.zeros((B, W, 1), jnp.int32),
          jnp.zeros((B, 1, 1), jnp.int32))
    dt = bench_step(step, c0, n_lo=8, n_hi=64)
    beam_fused._TRIVIAL_SELECT = False
    return dt


t_nosel = run_fused(True)
log(f"T_noselect (fused v2 kernel, trivial selection) = {t_nosel*1e6:.2f} us")
t_full = run_fused(False)
log(f"T_full    (fused v2 kernel, bitonic selection)  = {t_full*1e6:.2f} us")
log(f"decomposition: T_noselect + T_sort(128) vs T_full -> "
    f"{(t_nosel*1e6):.2f} + sort vs {t_full*1e6:.2f}")
log("done2")


# ---- T_sel: the COMPLETE selection (widen + sort + dedup + cumsum +
# slot/pad/diag logic + hit3) as a micro kernel, v2 and v1 flavors ----
from ssnt_tts_tpu.ops.beam_pallas import _select_bitonic


def run_sel(C_, W_, nkeys, diag):
    def kern(lp_ref, v_ref, k1_ref, k2_ref, g_ref, d_ref, ohit_ref,
             on_ref):
        keys = [k1_ref[:]] + ([k2_ref[:]] if nkeys == 2 else [])
        dm = (d_ref[:] != 0) if diag else None
        hit3, n = _select_bitonic(
            lp_ref[:], v_ref[:] != 0, keys, g_ref[:], W_, diag_mask=dm)
        ohit_ref[:] = hit3.astype(jnp.int32)
        on_ref[:] = n

    rng = np.random.default_rng(0)
    lp0 = jnp.asarray(rng.normal(0, 1, (B, C_)), jnp.float32)
    v0 = jnp.asarray((rng.random((B, C_)) < 0.7).astype(np.int32))
    k10 = jnp.asarray(rng.integers(0, 1 << 20, (B, C_)), jnp.int32)
    k20 = jnp.asarray(rng.integers(0, 1 << 20, (B, C_)), jnp.int32)
    g0 = jnp.broadcast_to(jnp.arange(C_, dtype=jnp.int32)[None], (B, C_))
    d0 = jnp.asarray((rng.random((B, C_)) < 0.2).astype(np.int32))

    def step(c):
        lp, v = c
        out = pl.pallas_call(
            kern,
            out_shape=[jax.ShapeDtypeStruct((B, W_, C_), jnp.int32),
                       jax.ShapeDtypeStruct((B, 1), jnp.int32)],
        )(lp, v, k10, k20, g0, d0)
        # Real data dependency through BOTH outputs (a *0 here lets XLA
        # DCE the whole call).
        dep = out[1][:, :1] + out[0][:, 0, :1]
        return (lp + dep.astype(jnp.float32) * 1e-30, v)

    return bench_step(step, (lp0, v0), n_lo=16, n_hi=128)


t_sel_v2 = run_sel(80, 8, 2, True)
log(f"T_sel v2-flavor (C=80, 2 keys, diag): {t_sel_v2*1e6:.2f} us")
t_sel_tone = run_sel(64, 8, 2, False)
log(f"T_sel tone-flavor (C=64, 2 keys):     {t_sel_tone*1e6:.2f} us")
t_sel_v1 = run_sel(16, 8, 1, False)
log(f"T_sel v1-flavor (C=16, 1 key):        {t_sel_v1*1e6:.2f} us")
log("done3")


# ---- tone ablation (tone fused step measured SLOWER than v2 despite
# being structurally simpler — localize) ----
def run_fused_tone(trivial):
    from ssnt_tts_tpu.models import SSNTModel, stepmath
    from ssnt_tts_tpu.ops import beam_fused
    from ssnt_tts_tpu.parallel import train as train_lib
    from ssnt_tts_tpu.utils.config import ModelConfig, TrainConfig

    beam_fused._TRIVIAL_SELECT = trivial
    cfg = ModelConfig(vocab_size=128, mel_dim=80, encoder_dim=256,
                      encoder_layers=2, encoder_heads=4, decoder_dim=256,
                      joint_rank=64)
    model = SSNTModel(cfg)
    rng = np.random.default_rng(0)
    T = 80
    batch = {
        "tokens": jnp.asarray(rng.integers(1, 128, (B, T)), jnp.int32),
        "mel": jnp.asarray(rng.normal(0, 1, (B, 400, 80)), jnp.float32),
        "input_length": jnp.full((B,), T, jnp.int32),
        "output_length": jnp.full((B,), 400, jnp.int32),
    }
    st0 = train_lib.init_train_state(
        model, jax.random.PRNGKey(0), batch, TrainConfig(warmup_steps=2))
    w = stepmath.extract_class_step_weights(
        st0.params, "tone_head", "tone_ar")
    fw = beam_fused.prepare_fused_weights(w, jnp.bfloat16)
    enc = jax.jit(lambda p: model.apply(
        p, batch["tokens"], batch["input_length"],
        method=model.encode))(st0.params)
    xin_path, base_path = jax.jit(
        lambda e: stepmath.class_decode_paths(
            w, e, batch["input_length"], kind="tone",
            dtype=jnp.bfloat16))(enc)
    il3 = batch["input_length"].reshape(B, 1, 1)

    def step(c):
        s, lp, fin, t, u, st, pc = c
        outs = beam_fused.fused_class_beam_step(
            "tone", s, xin_path, base_path, fw, pc, st, lp, fin, t, u,
            il3, empty_tone_id=0)
        (pred, lp2, nt, nu, nfin, br, pc2, st2, s2) = outs
        return (s2 % T, lp2, nfin, nt % 60, nu % 16000, st2, pc2)

    c0 = (jnp.zeros((1, 1), jnp.int32), jnp.zeros((B, 1, W), jnp.float32),
          jnp.zeros((B, 1, W), jnp.int32), jnp.zeros((B, 1, W), jnp.int32),
          jnp.zeros((B, 1, W), jnp.int32),
          jnp.zeros((B, W, H), jnp.float32), jnp.zeros((B, W, 1), jnp.int32))
    dt = bench_step(step, c0, n_lo=8, n_hi=64)
    beam_fused._TRIVIAL_SELECT = False
    return dt


t_tn = run_fused_tone(True)
log(f"T_noselect_tone = {t_tn*1e6:.2f} us")
t_tf = run_fused_tone(False)
log(f"T_full_tone     = {t_tf*1e6:.2f} us")
log("done4")


# ---- v1 fused ablation (replaces the T_NOSEL_V2 proxy in bench) ----
def run_fused_v1(trivial):
    from ssnt_tts_tpu.models import SSNTModel, stepmath
    from ssnt_tts_tpu.ops import beam_fused
    from ssnt_tts_tpu.parallel import train as train_lib
    from ssnt_tts_tpu.utils.config import ModelConfig, TrainConfig

    beam_fused._TRIVIAL_SELECT = trivial
    cfg = ModelConfig(vocab_size=128, mel_dim=80, encoder_dim=256,
                      encoder_layers=2, encoder_heads=4, decoder_dim=256,
                      joint_rank=64)
    model = SSNTModel(cfg)
    rng = np.random.default_rng(0)
    T = 80
    M = 80
    batch = {
        "tokens": jnp.asarray(rng.integers(1, 128, (B, T)), jnp.int32),
        "mel": jnp.asarray(rng.normal(0, 1, (B, 400, M)), jnp.float32),
        "input_length": jnp.full((B,), T, jnp.int32),
        "output_length": jnp.full((B,), 400, jnp.int32),
    }
    st0 = train_lib.init_train_state(
        model, jax.random.PRNGKey(0), batch, TrainConfig(warmup_steps=2))
    w1 = stepmath.extract_v1_step_weights(st0.params)
    fw1 = beam_fused.prepare_v1_fused_weights(w1, jnp.bfloat16)
    enc = jax.jit(lambda p: model.apply(
        p, batch["tokens"], batch["input_length"],
        method=model.encode))(st0.params)
    pack = jax.jit(lambda e: stepmath.v1_enc_pack(
        w1, e, jnp.bfloat16))(enc)
    il3 = batch["input_length"].reshape(B, 1, 1)

    def step(c):
        t, u, lp, fin, st, pm = c
        idx = jnp.clip(t[:, 0, :], 0, T - 1)
        gath = jnp.take_along_axis(pack, idx[..., None], axis=1)
        (pred, lp2, nt, nu, nfin, br, th, mel, st2) = (
            beam_fused.fused_v1_beam_step(
                gath, pm, st, lp, fin, t, u, il3, fw1,
                dtype=jnp.bfloat16))
        return (nt % T, nu % 16000, lp2, nfin, st2, mel)

    c0 = (jnp.zeros((B, 1, W), jnp.int32), jnp.zeros((B, 1, W), jnp.int32),
          jnp.zeros((B, 1, W), jnp.float32), jnp.zeros((B, 1, W), jnp.int32),
          jnp.zeros((B, W, H), jnp.float32), jnp.zeros((B, W, M), jnp.float32))
    dt = bench_step(step, c0, n_lo=8, n_hi=64)
    beam_fused._TRIVIAL_SELECT = False
    return dt


t_v1n = run_fused_v1(True)
log(f"T_noselect_v1 = {t_v1n*1e6:.2f} us (includes the enc-pack gather)")
t_v1f = run_fused_v1(False)
log(f"T_full_v1     = {t_v1f*1e6:.2f} us")
log("done5")
