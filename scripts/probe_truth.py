"""Ground-truth timing: run LONG chained loops (seconds of wall time) so
host-dispatch artifacts are negligible. Uses iters-difference calibration:
t_per_iter = (T(iters_hi) - T(iters_lo)) / (iters_hi - iters_lo)."""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def chain_time(make_step, x, iters_lo=10, iters_hi=110):
    def build(n):
        @jax.jit
        def run(x):
            def body(c, _):
                return make_step(c), None
            out, _ = jax.lax.scan(body, x, None, length=n)
            return out
        return run

    run_lo, run_hi = build(iters_lo), build(iters_hi)
    jax.block_until_ready(run_lo(x))
    jax.block_until_ready(run_hi(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run_lo(x))
        t1 = time.perf_counter()
        jax.block_until_ready(run_hi(x))
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (iters_hi - iters_lo))
    ts.sort()
    return ts[1]


def stub_kernel(le_ref, ls_ref, lf_ref, out_ref, acc, *, chunk):
    a = acc[:]
    for j in range(chunk):
        a = a + le_ref[j] + ls_ref[j] + lf_ref[j]
        out_ref[j] = a
    acc[:] = a


def real_log_kernel(le_ref, ls_ref, lf_ref, out_ref, acc, *, chunk):
    from ssnt_tts_tpu.ops.lattice_pallas import _logaddexp, _shift_down_t
    a = acc[:]
    for j in range(chunk):
        a = lf_ref[j] + _logaddexp(a + le_ref[j],
                                   _shift_down_t(a + ls_ref[j]))
        out_ref[j] = a
    acc[:] = a


def run_kernel(kernel, U, shape2, chunk, note):
    rng = np.random.default_rng(0)
    le = jnp.asarray(rng.normal(-1, 0.3, (U,) + shape2), jnp.float32)
    ls = jnp.asarray(rng.normal(-1, 0.3, (U,) + shape2), jnp.float32)
    lf = jnp.asarray(rng.normal(0, 0.5, (U,) + shape2), jnp.float32)
    block = pl.BlockSpec((chunk,) + shape2, lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(kernel, chunk=chunk),
        grid=(U // chunk,),
        in_specs=[block, block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((U,) + shape2, jnp.float32),
        scratch_shapes=[pltpu.VMEM(shape2, jnp.float32)],
    )

    def step(c):
        out = f(c, ls, lf)
        return c + out[-1:] * 1e-12

    dt = chain_time(step, le)
    cells = U * shape2[0] * shape2[1]
    print(f"{note:34s}: {dt*1e6:9.1f} us/call  {dt/U*1e9:8.1f} ns/col  "
          f"{cells/dt/1e6:9.1f} Mc/s", flush=True)


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    # tiny xla op chain — measures scan-iteration floor
    x = jnp.zeros((8, 128), jnp.float32)
    dt = chain_time(lambda c: c * 1.000001, x)
    print(f"xla (8,128) mul chain             : {dt*1e6:9.1f} us/iter",
          flush=True)

    run_kernel(stub_kernel, 400, (32, 80), 16, "stub (32,80) c16")
    run_kernel(stub_kernel, 400, (32, 80), 80, "stub (32,80) c80")
    run_kernel(stub_kernel, 400, (20, 128), 80, "stub flat (20,128) c80")
    run_kernel(real_log_kernel, 400, (32, 80), 16, "log (32,80) c16")
    run_kernel(real_log_kernel, 400, (32, 80), 80, "log (32,80) c80")
    run_kernel(stub_kernel, 400, (256, 80), 8, "stub (256,80) c8")
    run_kernel(real_log_kernel, 400, (256, 80), 8, "log (256,80) c8")

    # full current pallas loss for reference, same method
    from ssnt_tts_tpu.ops import lattice_pallas
    B, T, U = 32, 80, 400
    rng = np.random.default_rng(0)
    le = jnp.asarray(np.log(rng.uniform(0.1, 0.9, (B, T, U))), jnp.float32)
    ls = jnp.log1p(-jnp.exp(le))
    lf = jnp.asarray(rng.normal(0, 0.5, (B, T, U)), jnp.float32)
    T_b = jnp.full((B,), T, jnp.int32)
    U_b = jnp.full((B,), U, jnp.int32)

    def grad_step(x):
        g = jax.grad(lambda a: jnp.sum(
            lattice_pallas.ssnt_loss_pallas(a, ls, lf, T_b, U_b)))(x)
        return x + g * 1e-12

    dt = chain_time(grad_step, le)
    print(f"pallas loss fwd+bwd B32 (r01 path): {dt*1e6:9.1f} us/iter  "
          f"{B*T*U/dt/1e6:9.1f} Mc/s", flush=True)


if __name__ == "__main__":
    main()
