"""Timing via scalar fetch: run N iterations chained in a scan, reduce the
result to a scalar on device, np.asarray it (forces full execution, ~no
tunnel cost). Check linearity in N to validate."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def run_scalar(step, x0, iters):
    @jax.jit
    def run(x):
        def body(c, _):
            return step(c), None
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(jax.tree.leaves(out)[0][..., :1, :1])
    s = run(x0)
    np.asarray(s)  # warm
    t0 = time.perf_counter()
    np.asarray(run(x0))
    return (time.perf_counter() - t0) / iters


def main():
    a = jnp.ones((2048, 2048), jnp.float32) * 1e-3
    for iters in (5, 20, 80):
        dt = run_scalar(lambda c: (c @ a) * 1e-3 + c, a, iters)
        print(f"matmul2048 x{iters:3d}: {dt*1e6:9.1f} us/iter "
              f"({17.2e9/dt/1e12:.1f} Tflop/s)", flush=True)

    x = jnp.ones((4000, 64, 200), jnp.float32)
    for iters in (5, 20, 80):
        dt = run_scalar(lambda c: c * 1.0001, x, iters)
        nbytes = 2 * x.size * 4
        print(f"copy200MB x{iters:3d}: {dt*1e6:9.1f} us/iter "
              f"({nbytes/dt/1e9:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
