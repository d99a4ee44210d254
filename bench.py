"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extras": {...}}

Primary metric (BASELINE.md): SSNT lattice forward+backward throughput in
Mcells/s/chip at the BASELINE config-1 shape (B=32, 80 source tokens, 400 mel
frames). vs_baseline is measured / north-star target, where the target is 70%
of the HBM roofline for this memory-bound kernel (the reference publishes no
numbers — BASELINE.md).

Roofline model: the fused fwd+bwd DP moves ~56 B/cell of HBM traffic
(fwd: read le/ls/lf 12B + write alpha 4B; bwd: read le/ls/lf/alpha 16B +
write 3 grads 12B + beta traffic ~12B). On a v5e chip (~819 GB/s) that is
~14.6 Gcells/s; target = 0.7 * roofline.

Extras: decode audio-seconds/s at beam=8 (frame hop 12.5 ms), and lattice
forward-only throughput.
"""

import json
import time

import numpy as np


def _bench(fn, *args, iters=20, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _bench_chained(make_step, x0, iters=50, warmup=1, repeats=3):
    """Time `iters` data-dependent repetitions of a step INSIDE one jit, so
    host->device dispatch latency (large over the tunneled chip) is excluded.
    make_step(x) must return an array pytree with the same structure as x and
    a true data dependency on it. Returns median seconds per step."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def body(c, _):
            return make_step(c), None

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    jax.block_until_ready(run(x0))  # compile + warmup
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0))
        times.append((time.perf_counter() - t0) / iters)
    times.sort()
    return times[len(times) // 2]


def main():
    import jax
    import jax.numpy as jnp

    from ssnt_tts_tpu.ops import lattice, lattice_pallas

    dev = jax.devices()[0]
    extras = {"device": str(dev), "platform": dev.platform}

    # ---- primary: lattice fwd+bwd (B=32, T=80 tokens, U=400 frames) ----
    B, T, U = 32, 80, 400
    rng = np.random.default_rng(0)
    le = jnp.asarray(
        np.log(rng.uniform(0.1, 0.9, (B, T, U))), jnp.float32
    )
    ls = jnp.log1p(-jnp.exp(le))
    lf = jnp.asarray(rng.normal(0, 0.5, (B, T, U)), jnp.float32)
    T_b = jnp.full((B,), T, jnp.int32)
    U_b = jnp.full((B,), U, jnp.int32)
    cells = B * T * U

    def fwd_step(loss_fn):
        # Chain: perturb le by the (tiny) loss so each scan iteration truly
        # depends on the previous one — no hoisting, no dispatch in the loop.
        def step(x):
            out = loss_fn(x, ls, lf)
            return x + out[0] * 1e-12

        return step

    def grad_step(loss_fn):
        def step(x):
            g = jax.grad(
                lambda a: jnp.sum(loss_fn(a, ls, lf))
            )(x)
            return x + g * 1e-12

        return step

    xla_loss = lambda a, b, c: lattice.ssnt_loss(a, b, c, T_b, U_b)
    pallas_loss = lambda a, b, c: lattice_pallas.ssnt_loss_pallas(
        a, b, c, T_b, U_b
    )

    dt_fwdbwd = _bench_chained(grad_step(xla_loss), le)
    extras["lattice_fwdbwd_xla_Mcells_per_s"] = round(
        cells / dt_fwdbwd / 1e6, 1
    )
    dt_fwd = _bench_chained(fwd_step(xla_loss), le)
    extras["lattice_fwd_xla_Mcells_per_s"] = round(cells / dt_fwd / 1e6, 1)
    extras["lattice_shape"] = f"B{B}xT{T}xU{U}"

    # Pallas kernels (compiled path; skipped gracefully off-TPU).
    dt_fwdbwd_pallas = None
    try:
        dt_fwdbwd_pallas = _bench_chained(grad_step(pallas_loss), le)
        extras["lattice_fwdbwd_pallas_Mcells_per_s"] = round(
            cells / dt_fwdbwd_pallas / 1e6, 1
        )
        dt_fwd_pallas = _bench_chained(fwd_step(pallas_loss), le)
        extras["lattice_fwd_pallas_Mcells_per_s"] = round(
            cells / dt_fwd_pallas / 1e6, 1
        )
        # Cross-check implementations agree on hardware.
        delta = float(
            jnp.max(
                jnp.abs(
                    jax.jit(pallas_loss)(le, ls, lf)
                    - jax.jit(xla_loss)(le, ls, lf)
                )
            )
        )
        extras["pallas_vs_xla_max_abs_diff"] = round(delta, 6)
    except Exception as e:  # pragma: no cover
        extras["pallas_error"] = repr(e)[:200]

    if dt_fwdbwd_pallas is not None and dt_fwdbwd_pallas < dt_fwdbwd:
        dt_fwdbwd = dt_fwdbwd_pallas
    mcells_fwdbwd = cells / dt_fwdbwd / 1e6

    # Production-batch scaling point (BASELINE config-4 scale, B=256): the
    # column-scan kernel is chain-latency-bound at B=32 and saturates near
    # the HBM roofline at production batch.
    try:
        B2 = 256
        le2 = jnp.asarray(
            np.log(rng.uniform(0.1, 0.9, (B2, T, U))), jnp.float32
        )
        ls2 = jnp.log1p(-jnp.exp(le2))
        lf2 = jnp.asarray(rng.normal(0, 0.5, (B2, T, U)), jnp.float32)
        T_b2 = jnp.full((B2,), T, jnp.int32)
        U_b2 = jnp.full((B2,), U, jnp.int32)

        def grad_step_256(x):
            g = jax.grad(
                lambda a: jnp.sum(
                    lattice_pallas.ssnt_loss_pallas(a, ls2, lf2, T_b2, U_b2)
                )
            )(x)
            return x + g * 1e-12

        dt256 = _bench_chained(grad_step_256, le2, iters=20)
        mc256 = B2 * T * U / dt256 / 1e6
        extras["lattice_fwdbwd_pallas_B256_Mcells_per_s"] = round(mc256, 1)
    except Exception as e:  # pragma: no cover
        extras["b256_error"] = repr(e)[:200]

    # ---- decode audio-seconds/s @ beam=8 ----
    try:
        from ssnt_tts_tpu.models import SSNTModel
        from ssnt_tts_tpu.parallel import decode as decode_lib
        from ssnt_tts_tpu.parallel import train as train_lib
        from ssnt_tts_tpu.utils.config import ModelConfig, TrainConfig

        cfg = ModelConfig(
            vocab_size=128, mel_dim=80, encoder_dim=256, encoder_layers=2,
            encoder_heads=4, decoder_dim=256, joint_rank=64,
        )
        model = SSNTModel(cfg)
        Bd, Td, Ud, W = 32, 80, 400, 8
        batch = {
            "tokens": jnp.asarray(
                rng.integers(1, cfg.vocab_size, (Bd, Td)), jnp.int32
            ),
            "mel": jnp.asarray(
                rng.normal(0, 1, (Bd, Ud, cfg.mel_dim)), jnp.float32
            ),
            "input_length": jnp.full((Bd,), Td, jnp.int32),
            "output_length": jnp.full((Bd,), Ud, jnp.int32),
        }
        state = train_lib.init_train_state(
            model, jax.random.PRNGKey(0), batch, TrainConfig(warmup_steps=2)
        )
        dec_fn = jax.jit(
            lambda p, tok, il: decode_lib.beam_decode(
                model, p, tok, il, max_frames=Ud, beam_width=W
            )
        )
        dt_dec = _bench(
            dec_fn, state.params, batch["tokens"], batch["input_length"],
            iters=5, warmup=2,
        )
        frame_hop_s = 0.0125
        audio_s_per_s = Bd * Ud * frame_hop_s / dt_dec
        extras["decode_audio_s_per_s_beam8"] = round(audio_s_per_s, 1)
        extras["decode_ms_per_frame_batch32"] = round(
            dt_dec / Ud * 1e3, 3
        )

        train_fn = jax.jit(
            lambda s, b: train_lib.train_step(
                model, train_lib.make_optimizer(TrainConfig(warmup_steps=2)),
                s, b,
            )[1]["loss"]
        )
        dt_train = _bench(train_fn, state, batch, iters=5, warmup=2)
        extras["train_step_ms_B32"] = round(dt_train * 1e3, 1)

        # Production-batch decode point: per-step op overhead amortizes
        # across the batch, so audio-s/s scales with B.
        Bd2 = 256
        toks2 = jnp.asarray(
            rng.integers(1, cfg.vocab_size, (Bd2, Td)), jnp.int32
        )
        il2 = jnp.full((Bd2,), Td, jnp.int32)
        dt_dec2 = _bench(
            dec_fn, state.params, toks2, il2, iters=3, warmup=1
        )
        extras["decode_audio_s_per_s_beam8_B256"] = round(
            Bd2 * Ud * frame_hop_s / dt_dec2, 1
        )
    except Exception as e:  # pragma: no cover
        extras["decode_error"] = repr(e)

    # ---- roofline target ----
    hbm_gbps = 819.0 if dev.platform != "cpu" else 50.0
    bytes_per_cell = 56.0
    roofline_mcells = hbm_gbps * 1e9 / bytes_per_cell / 1e6
    target = 0.7 * roofline_mcells
    extras["roofline_Mcells_per_s"] = round(roofline_mcells, 1)

    print(
        json.dumps(
            {
                "metric": "lattice_fwdbwd_Mcells_per_s_chip",
                "value": round(mcells_fwdbwd, 1),
                "unit": "Mcells/s",
                "vs_baseline": round(mcells_fwdbwd / target, 3),
                "extras": extras,
            }
        )
    )


if __name__ == "__main__":
    main()
