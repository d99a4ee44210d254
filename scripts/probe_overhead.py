"""Decompose pallas kernel overhead on this rig: per-call vs per-grid-step vs
per-column vs layout (T=80 lane padding). One-off experiment."""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed_chain(make_step, x, iters=30):
    @jax.jit
    def run(x):
        def body(c, _):
            return make_step(c), None
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    jax.block_until_ready(run(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x))
        ts.append((time.perf_counter() - t0) / iters)
    return sorted(ts)[1]


def empty_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0


def main():
    print(f"device={jax.devices()[0]}", flush=True)

    # 1. Minimal pallas call: (8,128) single-block kernel.
    x = jnp.zeros((8, 128), jnp.float32)
    f = pl.pallas_call(
        empty_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    dt = timed_chain(lambda c: f(c), x)
    print(f"empty pallas call:            {dt*1e6:9.1f} us/call", flush=True)

    # XLA-only baseline chain step for comparison.
    dt = timed_chain(lambda c: c * 1.000001, x)
    print(f"xla-only chain step:          {dt*1e6:9.1f} us/iter", flush=True)

    # 2. Stub column walk at various (U, chunk, layout).
    def stub_kernel(le_ref, out_ref, acc, *, chunk):
        a = acc[:]
        for j in range(chunk):
            a = a + le_ref[j]
            out_ref[j] = a
        acc[:] = a

    def run_stub(U, shape2, chunk, note):
        le = jnp.zeros((U,) + shape2, jnp.float32)
        grid = (U // chunk,)
        block = pl.BlockSpec((chunk,) + shape2, lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        f = pl.pallas_call(
            functools.partial(stub_kernel, chunk=chunk),
            grid=grid,
            in_specs=[block],
            out_specs=block,
            out_shape=jax.ShapeDtypeStruct((U,) + shape2, jnp.float32),
            scratch_shapes=[pltpu.VMEM(shape2, jnp.float32)],
        )

        def step(c):
            out = f(c)
            return c + out[-1:] * 1e-12

        dt = timed_chain(step, le)
        ncols = U
        print(f"stub U={U:4d} chunk={chunk:3d} {note:18s}: "
              f"{dt*1e6:9.1f} us/call  {dt/ncols*1e9:8.1f} ns/col",
              flush=True)

    run_stub(400, (32, 80), 16, "(32,80)")
    run_stub(100, (32, 80), 10, "(32,80)")
    run_stub(400, (32, 80), 80, "(32,80)")
    run_stub(400, (32, 128), 16, "(32,128) padT")
    run_stub(400, (20, 128), 16, "(20,128) flat")
    run_stub(400, (20, 128), 80, "(20,128) flat")
    run_stub(400, (8, 128), 16, "(8,128)")
    run_stub(400, (160, 128), 8, "(160,128) B256flat")

    # 3. fori_loop instead of unrolled python loop.
    def stub_fori(le_ref, out_ref, acc, *, chunk):
        def body(j, a):
            a = a + le_ref[j]
            out_ref[j] = a
            return a
        acc[:] = jax.lax.fori_loop(0, chunk, body, acc[:])

    U = 400
    shape2 = (20, 128)
    chunk = 16
    le = jnp.zeros((U,) + shape2, jnp.float32)
    block = pl.BlockSpec((chunk,) + shape2, lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(stub_fori, chunk=chunk),
        grid=(U // chunk,),
        in_specs=[block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((U,) + shape2, jnp.float32),
        scratch_shapes=[pltpu.VMEM(shape2, jnp.float32)],
    )
    dt = timed_chain(lambda c: c + f(c)[-1:] * 1e-12, le)
    print(f"stub fori (20,128) chunk=16  : {dt*1e6:9.1f} us/call  "
          f"{dt/U*1e9:8.1f} ns/col", flush=True)


if __name__ == "__main__":
    main()
