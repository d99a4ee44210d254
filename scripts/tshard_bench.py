"""Measure the T-sharded lattice loss's structural overhead on the
virtual-device CPU mesh (VERDICT r3 #5a: replace the unmeasured
"negligible cost" claim with an artifact).

What this CAN measure on a single-chip rig: wall-clock of loss+grad vs
the unsharded XLA scan at shard counts 1/2/4/8 (virtual CPU devices), and
the communication structure (ring-hop count and bytes — U ppermutes of
B*4 bytes per direction). What it CANNOT measure: real ICI hop latency;
the artifact says so rather than extrapolating.

Round 5 additionally sweeps the pipeline block size (VERDICT r4 #5:
the blocked wavefront cuts collectives from 2*U per forward to
U/K + n - 1 ppermutes + 1 psum) and records the collective counts.

  python scripts/tshard_bench.py --json TSHARD_r05.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[2, 4, 8])
    p.add_argument("--shape", type=int, nargs=3, default=[400, 8, 64],
                   metavar=("U", "B", "T"))
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--blocks", type=int, nargs="+", default=[1, 8, 16, 40, 80, 100])
    p.add_argument("--json", type=str, default=None)
    args = p.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={max(args.devices)}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from ssnt_tts_tpu.ops import lattice, lattice_sharded

    U, B, T = args.shape
    rng = np.random.default_rng(0)
    le = jnp.asarray(np.log(rng.uniform(0.1, 0.9, (U, B, T))), jnp.float32)
    ls = jnp.log1p(-jnp.exp(le))
    lf = jnp.asarray(rng.normal(0, 0.5, (U, B, T)), jnp.float32)
    il = jnp.full((B,), T, jnp.int32)
    ol = jnp.full((B,), U, jnp.int32)

    def bench(f):
        f()  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = f()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.steps * 1e3

    grad_un = jax.jit(jax.grad(
        lambda a, b, c: jnp.sum(
            lattice.ssnt_loss(a, b, c, il, ol, layout="ubt")
        ),
        argnums=(0, 1, 2),
    ))
    ms_unsharded = bench(lambda: grad_un(le, ls, lf))

    result = {
        "shape": {"U": U, "B": B, "T": T},
        "platform": "cpu-virtual",
        "unsharded_xla_ms": round(ms_unsharded, 2),
        "comm_structure_note": (
            "per run: block=K => U/K + n - 1 ppermutes of K*B*4 bytes "
            "plus ONE psum per forward (r4 structure was U ppermutes + "
            "U psums); backward mirrors the ring"
        ),
        "note": (
            "virtual-device CPU mesh: measures partitioning/dispatch "
            "overhead of the ring-scan structure, NOT real ICI latency "
            "(single-chip rig; no hardware ring exists to time)"
        ),
        "runs": [],
    }
    for n in args.devices:
        devs = jax.devices()[:n]
        mesh = Mesh(np.asarray(devs).reshape(n), ("model",))
        for blk in args.blocks:
            if U % blk:
                continue
            grad_sh = jax.jit(jax.grad(
                lambda a, b, c: jnp.sum(
                    lattice_sharded.ssnt_loss_tsharded(
                        a, b, c, il, ol, mesh, axis="model", block=blk
                    )
                ),
                argnums=(0, 1, 2),
            ))
            ms = bench(lambda: grad_sh(le, ls, lf))
            hops = U // blk + (n - 1 if blk > 1 else 0)
            result["runs"].append({
                "shards": n,
                "block": blk,
                "ppermutes_per_fwd": hops,
                "psums_per_fwd": 1,
                "bytes_per_hop": blk * B * 4,
                "ms_per_grad": round(ms, 2),
                "vs_unsharded": round(ms_unsharded / ms, 3),
            })
            print(
                f"shards={n} block={blk}: {ms:.2f} ms "
                f"(unsharded {ms_unsharded:.2f}, {hops} hops/fwd)",
                flush=True,
            )

    out = json.dumps(result, indent=1)
    print(out)
    if args.json:
        with open(args.json, "w") as f:
            f.write(out)


if __name__ == "__main__":
    main()
