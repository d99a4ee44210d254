#!/usr/bin/env python
"""Weak-scaling harness (BASELINE config 5): per-device batch held constant
while the data-parallel mesh grows; reports throughput and efficiency vs the
1-device run (north star: >= 90%).

On a real multi-chip slice this measures ICI/DCN gradient-sync overhead.
Without one (this container exposes a single TPU), run it on virtual CPU
devices to validate the scaling *path*:

  python scripts/weak_scaling.py --cpu --devices 1 2 4 8
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--per-device-batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true", default=True)
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
    for n in args.devices:
        if n > len(jax.devices()):
            print(f"skip n={n}: only {len(jax.devices())} devices")
            continue
        B = args.per_device_batch * n
        T, U = 8, 16
        batch = g._example_batch(cfg, B, T, U)
        tcfg = TrainConfig(warmup_steps=2, batch_size=B)
        state = train_lib.init_train_state(
            model, jax.random.PRNGKey(0), batch, tcfg
        )
        mesh = mesh_lib.make_mesh(MeshConfig(data=n, model=1))
        tx = train_lib.make_optimizer(tcfg)
        step_fn, sstate = train_lib.make_sharded_train_step(
            model, tx, mesh, state
        )
        sbatch = jax.device_put(batch, mesh_lib.data_sharding(mesh))
        sstate, _ = step_fn(sstate, sbatch)  # compile
        jax.block_until_ready(sstate.params)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            sstate, metrics = step_fn(sstate, sbatch)
        jax.block_until_ready(sstate.params)
        dt = (time.perf_counter() - t0) / args.steps
        thr = B / dt
        results[n] = thr
        eff = thr / (results[1] * n) if 1 in results else float("nan")
        print(
            f"n={n}: {dt*1e3:8.2f} ms/step, {thr:10.1f} ex/s, "
            f"weak-scaling eff={eff:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
