"""Round-2 perf probe: time every lattice variant on the real chip.

Usage: python scripts/probe_variants.py [B] [T] [U]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from ssnt_tts_tpu.ops import lattice, lattice_pallas, lattice_scan


def bench_chained(make_step, x0, iters=30, repeats=3):
    @jax.jit
    def run(x):
        def body(c, _):
            return make_step(c), None
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    jax.block_until_ready(run(x0))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0))
        times.append((time.perf_counter() - t0) / iters)
    times.sort()
    return times[len(times) // 2]


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    U = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    only = sys.argv[4].split(",") if len(sys.argv) > 4 else None
    rng = np.random.default_rng(0)
    le = jnp.asarray(np.log(rng.uniform(0.1, 0.9, (B, T, U))), jnp.float32)
    ls = jnp.log1p(-jnp.exp(le))
    lf = jnp.asarray(rng.normal(0, 0.5, (B, T, U)), jnp.float32)
    T_b = jnp.full((B,), T, jnp.int32)
    U_b = jnp.full((B,), U, jnp.int32)
    cells = B * T * U

    def grad_step(loss_fn):
        def step(x):
            g = jax.grad(lambda a: jnp.sum(loss_fn(a, ls, lf)))(x)
            return x + g * 1e-12
        return step

    def fwd_step(loss_fn):
        def step(x):
            out = loss_fn(x, ls, lf)
            return x + out[0] * 1e-12
        return step

    variants = {
        "pallas_log": lambda a, b, c: lattice_pallas.ssnt_loss_pallas(
            a, b, c, T_b, U_b, variant="log"),
        "pallas_exp": lambda a, b, c: lattice_pallas.ssnt_loss_pallas(
            a, b, c, T_b, U_b, variant="exp"),
        "scan_K8": lambda a, b, c: lattice_scan.ssnt_loss_scan(
            a, b, c, T_b, U_b, K=8),
        "scan_K16": lambda a, b, c: lattice_scan.ssnt_loss_scan(
            a, b, c, T_b, U_b, K=16),
        "scan_K32": lambda a, b, c: lattice_scan.ssnt_loss_scan(
            a, b, c, T_b, U_b, K=32),
        "xla": lambda a, b, c: lattice.ssnt_loss(a, b, c, T_b, U_b),
    }
    ref = None
    print(f"shape B{B} T{T} U{U}  device={jax.devices()[0]}", flush=True)
    for name, fn in variants.items():
        if only and name not in only:
            continue
        try:
            val = jax.jit(fn)(le, ls, lf)
            if ref is None:
                ref = val
            diff = float(jnp.max(jnp.abs(val - ref)))
            dt_g = bench_chained(grad_step(fn), le)
            dt_f = bench_chained(fwd_step(fn), le)
            print(f"{name:12s} fwd {cells/dt_f/1e6:9.1f} Mc/s  "
                  f"fwd+bwd {cells/dt_g/1e6:9.1f} Mc/s  "
                  f"({dt_g*1e6:8.1f} us)  maxdiff {diff:.2e}", flush=True)
        except Exception as e:
            print(f"{name:12s} FAILED: {repr(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
