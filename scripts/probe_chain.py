"""Calibrate VPU chain latency: how long does a chain of N dependent ops on a
(32, 128) f32 tile take inside a Pallas kernel, and how does widening the tile
change it? Also: grid-step overhead via chunk sweep on the real fwd kernel."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssnt_tts_tpu.ops import lattice_pallas


def bench(fn, *args, iters=30):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def chain_kernel(x_ref, o_ref, *, n_ops, op):
    x = x_ref[:]
    for i in range(n_ops):
        if op == "mul":
            x = x * 1.0000001
        elif op == "mac":
            x = x * 1.0000001 + 0.0000001
        elif op == "roll":
            x = pltpu.roll(x, shift=1, axis=1)
        elif op == "rowmax":
            m = jnp.max(x, axis=1, keepdims=True)
            x = x + m * 1e-9
        elif op == "exp":
            x = jnp.exp(x * 1e-9)
        elif op == "log":
            x = jnp.log(jnp.abs(x) + 1.0)
        elif op == "div":
            x = x / (1.0 + 1e-9 * x[0, 0])
    o_ref[:] = x


def run_chain(shape, n_ops, op):
    x = jnp.ones(shape, jnp.float32)

    f = pl.pallas_call(
        functools.partial(chain_kernel, n_ops=n_ops, op=op),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def chained(x):
        def body(c, _):
            return f(c), None

        out, _ = jax.lax.scan(body, x, None, length=20)
        return out

    dt = bench(chained, x) / 20
    return dt


def main():
    print("=== chained-op latency, (32,128) f32 tile ===")
    for op in ["mul", "mac", "roll", "rowmax", "exp", "log", "div"]:
        d200 = run_chain((32, 128), 200, op)
        d400 = run_chain((32, 128), 400, op)
        per_op = (d400 - d200) / 200
        print(f"  {op:8s}: per-op latency {per_op*1e9:7.1f} ns "
              f"({per_op*0.94e9:5.1f} cyc @940MHz)")

    print("=== same mac chain, wider tiles ===")
    for shape in [(8, 128), (32, 128), (32, 512), (256, 128), (512, 128)]:
        d200 = run_chain(shape, 200, "mac")
        d400 = run_chain(shape, 400, "mac")
        per_op = (d400 - d200) / 200
        print(f"  {str(shape):12s}: per-op {per_op*1e9:7.1f} ns")

    print("=== fwd kernel chunk sweep (B=32,T=80,U=400) ===")
    B, T, U = 32, 80, 400
    rng = np.random.default_rng(0)
    le = jnp.asarray(
        np.log(rng.uniform(0.1, 0.9, (U, B, T))), jnp.float32
    )
    ls = jnp.log1p(-jnp.exp(le))
    lf = jnp.asarray(rng.normal(0, 0.5, (U, B, T)), jnp.float32)
    for chunk in [8, 16, 25, 50, 100]:
        if U % chunk:
            continue
        f = jax.jit(
            lambda a, b, c, ck=chunk: lattice_pallas.forward_alphas_pallas(
                a, b, c, chunk=ck
            )
        )

        @jax.jit
        def chained(x, ck=chunk):
            def body(c, _):
                a = lattice_pallas.forward_alphas_pallas(c, ls, lf, chunk=ck)
                return c + a[0] * 1e-12, None

            out, _ = jax.lax.scan(body, x, None, length=20)
            return out

        dt = bench(chained, le, iters=5) / 20
        print(f"  chunk={chunk:4d}: {dt*1e6:8.1f} us")


if __name__ == "__main__":
    main()
