#!/usr/bin/env python
"""Weak-scaling harness (BASELINE config 5): per-device batch held constant
while the data-parallel mesh grows; reports throughput and efficiency vs the
1-device run (north star: >= 90% on a real multi-chip slice).

On a real slice the classic efficiency number measures ICI/DCN gradient-sync
overhead. Without one (this container exposes a single TPU), the script runs
on virtual CPU devices — but virtual devices SHARE the host's silicon, so
classic weak-scaling efficiency there measures core contention, not
communication, and is reported only for completeness. The meaningful
single-host proxy is `partition_efficiency`:

    t(unsharded, total batch B) / t(sharded over n devices, same B)

i.e. what the mesh partitioning + psum machinery costs at fixed total work.
On real hardware the compute would additionally parallelize n-ways.

  python scripts/weak_scaling.py --cpu --devices 1 2 4 8
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--per-device-batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true", default=True)
    p.add_argument("--full", dest="tiny", action="store_false",
                   help="production ModelConfig dims (amortizes per-op "
                        "overhead; the honest partition-efficiency config)")
    p.add_argument("--seq", type=int, nargs=2, default=[24, 48],
                   metavar=("T", "U"))
    p.add_argument("--json", type=str, default=None,
                   help="write results to this JSON file")
    args = p.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max(args.devices)}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp
    import numpy as np

    from ssnt_tts_tpu.models import SSNTModel
    from ssnt_tts_tpu.parallel import mesh as mesh_lib
    from ssnt_tts_tpu.parallel import train as train_lib
    from ssnt_tts_tpu.utils.config import (
        MeshConfig,
        TrainConfig,
        tiny_model_config,
        ModelConfig,
    )
    import __graft_entry__ as g

    cfg = tiny_model_config() if args.tiny else ModelConfig()
    model = SSNTModel(cfg)
    results = {}
    record = {"per_device_batch": args.per_device_batch,
              "seq": args.seq, "steps": args.steps,
              "platform": "cpu" if args.cpu else "device", "runs": []}
    for n in args.devices:
        if n > len(jax.devices()):
            print(f"skip n={n}: only {len(jax.devices())} devices")
            continue
        B = args.per_device_batch * n
        T, U = args.seq
        batch = g._example_batch(cfg, B, T, U)
        tcfg = TrainConfig(warmup_steps=2, batch_size=B)
        state = train_lib.init_train_state(
            model, jax.random.PRNGKey(0), batch, tcfg
        )
        tx = train_lib.make_optimizer(tcfg)
        # Snapshot to host: the jitted step donates its state input, and on
        # identical shardings device_put may alias rather than copy, so each
        # timed run must start from a fresh device copy.
        host_state = jax.device_get(state)

        def timed_steps(mesh_n):
            mesh = mesh_lib.make_mesh(MeshConfig(data=mesh_n, model=1))
            step_fn, sstate = train_lib.make_sharded_train_step(
                model, tx, mesh, jax.device_put(host_state)
            )
            sbatch = jax.device_put(batch, mesh_lib.data_sharding(mesh))
            sstate, _ = step_fn(sstate, sbatch)  # compile
            jax.block_until_ready(sstate.params)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                sstate, metrics = step_fn(sstate, sbatch)
            jax.block_until_ready(sstate.params)
            return (time.perf_counter() - t0) / args.steps

        dt = timed_steps(n)
        # Same total batch, no partitioning: isolates mesh/psum overhead.
        dt_unsharded = timed_steps(1) if n > 1 else dt
        part_eff = dt_unsharded / dt
        thr = B / dt
        results[n] = thr
        eff = thr / (results[1] * n) if 1 in results else float("nan")
        record["runs"].append(
            {"devices": n, "ms_per_step": round(dt * 1e3, 2),
             "examples_per_s": round(thr, 1),
             "weak_scaling_efficiency_contended": round(eff, 3),
             "partition_efficiency": round(part_eff, 3)}
        )
        print(
            f"n={n}: {dt*1e3:8.2f} ms/step, {thr:10.1f} ex/s, "
            f"contended-eff={eff:.3f}, partition-eff={part_eff:.3f}",
            flush=True,
        )

    if args.json:
        with open(args.json, "w") as f:
            json.dump(record, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
