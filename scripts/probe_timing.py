"""Is block_until_ready trustworthy on the axon backend? Compare it against
forcing a device->host transfer, on workloads with known cost."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, x, iters, force_host):
    jax.block_until_ready(fn(x))
    t0 = time.perf_counter()
    out = fn(x)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    if force_host:
        np.asarray(jax.tree.leaves(out)[0])
    t2 = time.perf_counter()
    print(f"{name:45s} block_until_ready {(t1-t0)/iters*1e6:10.1f} us/iter"
          f"   +host {(t2-t0)/iters*1e6:10.1f} us/iter", flush=True)


def chained(step, iters):
    @jax.jit
    def run(x):
        def body(c, _):
            return step(c), None
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out
    return run


def main():
    # matmul: 2048^3*2 = 17.2 Gflop per iter, x20
    a = jnp.ones((2048, 2048), jnp.float32)
    f = chained(lambda c: c @ a * 1e-3, 20)
    timed("matmul 2048 f32 x20 (17.2 Gflop/it)", f, a, 20, True)
    timed("matmul again", f, a, 20, True)

    # elementwise on 200MB: 400MB traffic/iter
    x = jnp.ones((4000, 64, 200), jnp.float32)
    g = chained(lambda c: c * 1.0001, 30)
    timed("XLA copy 200MB x30", g, x, 30, True)
    timed("XLA copy again", g, x, 30, True)


if __name__ == "__main__":
    main()
