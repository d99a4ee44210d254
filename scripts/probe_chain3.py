"""Roll throughput/latency, sublane roll, rowmax, and non-foldable lse —
the numbers that decide the banded-K kernel design."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssnt_tts_tpu.utils.timing import bench_fn


def kern(x_ref, y_ref, o_ref, *, n_ops, op, streams):
    xs = [x_ref[i] for i in range(streams)]
    y = y_ref[:]
    for i in range(n_ops):
        for s in range(streams):
            x = xs[s]
            if op == "roll_lane":
                x = pltpu.roll(x, shift=1, axis=1)
            elif op == "roll_lane_indep":
                # roll of y (loop-invariant)? no — keep x dependency cheap:
                # chain is an add; rolls are independent per iteration.
                x = x + pltpu.roll(y * (1.0 + i * 1e-9), shift=1, axis=1)
            elif op == "roll_sub":
                x = pltpu.roll(x, shift=1, axis=0)
            elif op == "rowmax":
                x = x + jnp.max(x, axis=1, keepdims=True) * 1e-9
            elif op == "lse":
                m = jnp.maximum(x, y)
                x = m + jnp.log1p(jnp.exp(-jnp.abs(x - y)))
            elif op == "lse5":
                terms = [x + y] + [
                    pltpu.roll(x, shift=k, axis=1) + y * (1.0 + k * 1e-9)
                    for k in range(1, 5)
                ]
                m = terms[0]
                for t in terms[1:]:
                    m = jnp.maximum(m, t)
                acc = jnp.exp(terms[0] - m)
                for t in terms[1:]:
                    acc = acc + jnp.exp(t - m)
                x = m + jnp.log(acc)
            elif op == "mac5":
                # exp-domain banded apply: 4 rolls + 5 MACs
                acc = x * y
                for k in range(1, 5):
                    acc = acc + pltpu.roll(x, shift=k, axis=1) * (
                        y * (1.0 + k * 1e-9)
                    )
                x = acc * (1.0 / 1.1)
            xs[s] = x
    acc = xs[0]
    for s in range(1, streams):
        acc = acc + xs[s]
    o_ref[:] = acc


def t(shape, n_ops, op, streams=1):
    f = pl.pallas_call(
        functools.partial(kern, n_ops=n_ops, op=op, streams=streams),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    x = jnp.full((streams,) + shape, 0.5, jnp.float32)
    y = jnp.full(shape, -0.3, jnp.float32)
    return bench_fn(lambda c, yy: f(c, yy) * 0.5 + c[0] * 1e-9, x, y,
                    n_lo=20)


def perop(shape, op, streams=1, lo=8, hi=40):
    d0 = t(shape, lo, op, streams)
    d1 = t(shape, hi, op, streams)
    per = (d1 - d0) / (hi - lo) / streams
    print(f"  {op:16s} S={streams}: {per*1e9:8.2f} ns "
          f"({per*0.94e9:7.1f} cyc)  [chain-op basis]", flush=True)
    return per


def main():
    shape = (32, 128)
    print("== (32,128) dependent chains ==", flush=True)
    perop(shape, "roll_lane")
    perop(shape, "roll_sub")
    perop(shape, "rowmax")
    perop(shape, "lse")
    perop(shape, "lse5")
    perop(shape, "mac5")
    print("== roll throughput: S independent chains of rolls ==", flush=True)
    for s in (2, 4, 8):
        perop(shape, "roll_lane", streams=s)
    print("== add-chain with independent roll per iter ==", flush=True)
    perop(shape, "roll_lane_indep")
    perop(shape, "roll_lane_indep", streams=4)


if __name__ == "__main__":
    main()
