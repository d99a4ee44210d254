"""Absolute-cost calibration on the axon TPU: per-kernel dispatch cost,
achievable HBM bandwidth, grid-step cost, and in-kernel chain cost."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench_chained(step, x0, iters=30, repeats=5):
    @jax.jit
    def run(x):
        def body(c, _):
            return step(c), None

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


def report(name, dt, nbytes=None):
    bw = f"  {nbytes/dt/1e9:7.1f} GB/s" if nbytes else ""
    print(f"{name:55s} {dt*1e6:9.1f} us{bw}", flush=True)


# ---------------------------------------------------------------- XLA BW
def xla_bw():
    for shape in [(400, 32, 128), (4000, 32, 128)]:
        x = jnp.ones(shape, jnp.float32)
        nbytes = 2 * x.size * 4
        report(f"XLA x*1.0001 {shape}", bench_chained(lambda c: c * 1.0001, x),
               nbytes)


# ------------------------------------------------------- pallas copy kernel
def copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 1.0001


def pallas_copy(shape, chunk):
    U, B, T = shape
    grid = (U // chunk,)
    block = pl.BlockSpec((chunk, B, T), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        copy_kernel, grid=grid, in_specs=[block], out_specs=block,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
    )
    x = jnp.ones(shape, jnp.float32)
    nbytes = 2 * x.size * 4
    dt = bench_chained(lambda c: f(c), x)
    report(f"pallas copy {shape} chunk={chunk} ({grid[0]} steps)", dt, nbytes)
    return dt


# ------------------------------------------------- in-kernel chain absolute
def chain_kernel(x_ref, o_ref, *, n_ops, op):
    x = x_ref[:]
    for i in range(n_ops):
        if op == "mac":
            x = x * 1.0000001 + 1e-9
        elif op == "roll":
            x = pltpu.roll(x, shift=1, axis=1) * 1.0000001
        elif op == "lse":
            m = jnp.maximum(x, 0.1)
            x = m + jnp.log1p(jnp.exp(-jnp.abs(x - 0.1)))
    o_ref[:] = x


def chain_abs(shape, n_ops, op):
    f = pl.pallas_call(
        functools.partial(chain_kernel, n_ops=n_ops, op=op),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    x = jnp.zeros(shape, jnp.float32)
    dt = bench_chained(lambda c: f(c) * 0.5, x)
    report(f"pallas chain {op} x{n_ops} {shape}", dt)
    return dt


# ------------------------------------- grid-step cost: many tiny grid steps
def grid_cost(nsteps):
    shape = (nsteps, 8, 128)
    block = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        copy_kernel, grid=(nsteps,), in_specs=[block], out_specs=block,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
    )
    x = jnp.ones(shape, jnp.float32)
    dt = bench_chained(lambda c: f(c), x)
    report(f"pallas {nsteps} tiny grid steps", dt)
    return dt


def main():
    print(f"devices: {jax.devices()}", flush=True)
    xla_bw()
    pallas_copy((400, 32, 128), 16)
    pallas_copy((400, 32, 128), 100)
    pallas_copy((4000, 32, 128), 100)
    d0 = chain_abs((32, 128), 0, "mac")
    for op in ["mac", "roll", "lse"]:
        d400 = chain_abs((32, 128), 400, op)
        print(f"   -> {op} per-op {(d400-d0)/400*1e9:.2f} ns")
    d0w = chain_abs((256, 128), 0, "mac")
    d400w = chain_abs((256, 128), 400, "mac")
    print(f"   -> mac (256,128) per-op {(d400w-d0w)/400*1e9:.2f} ns")
    g100 = grid_cost(100)
    g800 = grid_cost(800)
    print(f"   -> per grid step {(g800-g100)/700*1e9:.1f} ns")
    # dispatch cost: single kernel, not chained, eager loop
    f = pl.pallas_call(
        copy_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    fj = jax.jit(f)
    x = jnp.ones((8, 128), jnp.float32)
    jax.block_until_ready(fj(x))
    t0 = time.perf_counter()
    for _ in range(50):
        x = fj(x)
    jax.block_until_ready(x)
    report("eager dispatch per tiny kernel", (time.perf_counter() - t0) / 50)


if __name__ == "__main__":
    main()
