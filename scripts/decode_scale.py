"""BASELINE config[4] decode-shape artifact (VERDICT r4 #7).

The B=2048 multi-host decode config had no artifact at any fidelity.
This script closes the SHAPE gap the same honest way TSHARD does: run
the full v2 production decode at B=2048 sharded over the 8-virtual-CPU
mesh's data axis (beams chip-local, no decode collectives — SURVEY §5),
plus an unsharded B=256 point for the scaling structure, and record
throughput + the sharding layout. NO ICI claims: the virtual mesh
shares one host's silicon (2 cores on this rig), so wall-clock measures
partitioning structure, not interconnect.

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python scripts/decode_scale.py --json DECODE_SCALE_r05.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--small-batch", type=int, default=256)
    p.add_argument("--seq", type=int, nargs=2, default=[80, 400],
                   metavar=("T", "U"))
    p.add_argument("--beam", type=int, default=8)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--json", type=str, default=None)
    args = p.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ssnt_tts_tpu.models import SSNTModel
    from ssnt_tts_tpu.parallel import decode as decode_lib
    from ssnt_tts_tpu.parallel import train as train_lib
    from ssnt_tts_tpu.utils.config import ModelConfig, TrainConfig

    T, U = args.seq
    W = args.beam
    cfg = ModelConfig(
        vocab_size=128, mel_dim=80, encoder_dim=256, encoder_layers=2,
        encoder_heads=4, decoder_dim=256, joint_rank=64,
    )
    model = SSNTModel(cfg)
    rng = np.random.default_rng(0)
    dtab = jnp.arange(cfg.duration_class_size, dtype=jnp.int32)

    init_batch = {
        "tokens": jnp.asarray(rng.integers(1, 128, (8, T)), jnp.int32),
        "mel": jnp.asarray(rng.normal(0, 1, (8, U, 80)), jnp.float32),
        "input_length": jnp.full((8,), T, jnp.int32),
        "output_length": jnp.full((8,), U, jnp.int32),
    }
    state = train_lib.init_train_state(
        model, jax.random.PRNGKey(0), init_batch, TrainConfig(warmup_steps=2)
    )
    params = state.params

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
    data_sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def run_case(B, sharded):
        toks = jnp.asarray(rng.integers(1, 128, (B, T)), jnp.int32)
        il = jnp.full((B,), T, jnp.int32)
        ol = jnp.full((B,), U, jnp.int32)
        if sharded:
            toks = jax.device_put(toks, data_sh)
            il = jax.device_put(il, data_sh)
            ol = jax.device_put(ol, data_sh)
            p = jax.device_put(params, rep)
        else:
            p = params

        @jax.jit
        def dec(p_, tk, il_, ol_):
            out = decode_lib.v2_duration_decode(
                model, p_, tk, il_, ol_, dtab,
                beam_width=W, max_frames=U, fuse_model=False,
                use_pallas=False,
            )
            return out["output_length"], out["beam_emptied"]

        out = dec(p, toks, il, ol)  # compile + warm
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = dec(p, toks, il, ol)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.reps
        return dt, out

    t_start = time.time()
    print(f"[scale] B={args.small_batch} unsharded...", flush=True)
    dt_small, _ = run_case(args.small_batch, sharded=False)
    print(f"[scale]   {dt_small*1e3:.0f} ms", flush=True)
    print(f"[scale] B={args.batch} sharded over 8-device data axis...",
          flush=True)
    dt_big, out_big = run_case(args.batch, sharded=True)
    print(f"[scale]   {dt_big*1e3:.0f} ms", flush=True)

    frame_hop_s = 0.0125
    result = {
        "config": "BASELINE configs[4] shape at virtual fidelity",
        "platform": "cpu-virtual-8 (2 physical cores)",
        "T": T, "U": U, "beam": W,
        "sharding": {
            "mesh": "Mesh(8, ('data',))",
            "batch_axis": "data (beams chip-local; decode needs no "
                          "collectives — SURVEY.md section 5)",
            "params": "replicated",
        },
        "runs": [
            {"B": args.small_batch, "sharded": False,
             "ms_per_decode": round(dt_small * 1e3, 1),
             "audio_s_per_s": round(
                 args.small_batch * U * frame_hop_s / dt_small, 1)},
            {"B": args.batch, "sharded": True,
             "ms_per_decode": round(dt_big * 1e3, 1),
             "audio_s_per_s": round(
                 args.batch * U * frame_hop_s / dt_big, 1),
             "beam_emptied_rate": round(
                 float(np.asarray(out_big[1]).mean()), 4)},
        ],
        "scaling_note": (
            "per-example wall-clock ratio B=2048-sharded vs B=256-"
            "unsharded = "
            f"{(dt_big / args.batch) / (dt_small / args.small_batch):.2f}"
            " (1.0 = perfect partitioning on shared silicon; real-chip"
            " throughput claims belong to BENCH which runs on the TPU)"
        ),
        "wall_s": round(time.time() - t_start, 1),
    }
    print(json.dumps(result, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
