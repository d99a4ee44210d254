"""Honest (slope-harness) microbenchmarks: per-op dependent-chain latency on
(32,128) tiles, independent-op issue throughput, and the bidir kernel's
chunk sweep — calibrates the banded-K kernel design."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssnt_tts_tpu.ops import lattice_pallas
from ssnt_tts_tpu.utils.timing import bench_fn, bench_step


def chain_kernel(x_ref, o_ref, *, n_ops, op, streams):
    xs = [x_ref[i] for i in range(streams)]
    for i in range(n_ops):
        for s in range(streams):
            x = xs[s]
            if op == "mac":
                x = x * 1.0000001 + 1e-9
            elif op == "add":
                x = x + 1e-9
            elif op == "roll":
                x = pltpu.roll(x, shift=1, axis=1) + 1e-9
            elif op == "lse":
                m = jnp.maximum(x, 0.1)
                x = m + jnp.log1p(jnp.exp(-jnp.abs(x - 0.1)))
            elif op == "max":
                x = jnp.maximum(x, x * 0.999999)
            elif op == "exp":
                x = jnp.exp(x * 1e-9)
            xs[s] = x
    acc = xs[0]
    for s in range(1, streams):
        acc = acc + xs[s]
    o_ref[:] = acc


def chain_time(shape, n_ops, op, streams=1):
    f = pl.pallas_call(
        functools.partial(chain_kernel, n_ops=n_ops, op=op, streams=streams),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    x = jnp.full((streams,) + shape, 0.5, jnp.float32)
    return bench_fn(lambda c: f(c) * 0.5 + c[0] * 1e-9, x, n_lo=20)


def main():
    shape = (32, 128)
    print("== dependent chain per-op latency, (32,128), 1 stream ==",
          flush=True)
    base = {}
    for op in ["add", "mac", "roll", "lse", "exp"]:
        d0 = chain_time(shape, 8, op)
        d1 = chain_time(shape, 72, op)
        per = (d1 - d0) / 64
        base[op] = per
        print(f"  {op:5s}: {per*1e9:7.2f} ns/op ({per*0.94e9:6.1f} cyc)",
              flush=True)

    print("== mac chain with S independent streams (issue pressure) ==",
          flush=True)
    for s in [1, 2, 4, 8]:
        d0 = chain_time(shape, 8, "mac", streams=s)
        d1 = chain_time(shape, 72, "mac", streams=s)
        per = (d1 - d0) / 64
        print(f"  S={s}: {per*1e9:7.2f} ns per chain-op "
              f"({per*0.94e9:6.1f} cyc)", flush=True)

    print("== bidir kernel chunk sweep (B=32,T=80,U=400) ==", flush=True)
    B, T, U = 32, 80, 400
    rng = np.random.default_rng(0)
    le = jnp.asarray(np.log(rng.uniform(0.1, 0.9, (U, B, T))), jnp.float32)
    ls = jnp.log1p(-jnp.exp(le))
    lf = jnp.asarray(rng.normal(0, 0.5, (U, B, T)), jnp.float32)
    T_b = jnp.full((B,), T, jnp.int32)
    U_b = jnp.full((B,), U, jnp.int32)
    cells = B * T * U
    for chunk in [8, 16, 40, 80]:
        dt = bench_fn(
            lambda a, b, c, ck=chunk:
            lattice_pallas.fused_alphas_betas_pallas(
                a, b, c, T_b, U_b, chunk=ck)[0],
            le, ls, lf,
        )
        print(f"  chunk={chunk:3d}: {dt*1e6:8.1f} us "
              f"({cells/dt/1e6:8.0f} Mcells/s)", flush=True)


if __name__ == "__main__":
    main()
