"""Sweep the blocked-parallel-scan lattice on the real chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ssnt_tts_tpu.ops import lattice, lattice_pallas, lattice_scan


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


def main():
    rng = np.random.default_rng(0)
    for B, T, U in [(32, 80, 400), (256, 80, 400)]:
        le = jnp.asarray(np.log(rng.uniform(0.1, 0.9, (B, T, U))),
                         jnp.float32)
        ls = jnp.log1p(-jnp.exp(le))
        lf = jnp.asarray(rng.normal(0, 0.5, (B, T, U)), jnp.float32)
        T_b = jnp.full((B,), T, jnp.int32)
        U_b = jnp.full((B,), U, jnp.int32)
        cells = B * T * U

        for name, loss_fn in [
            ("pallas", lambda a, b, c: lattice_pallas.ssnt_loss_pallas(
                a, b, c, T_b, U_b)),
        ] + [
            (f"scan-K{K}", (lambda K: lambda a, b, c:
                lattice_scan.ssnt_loss_scan(a, b, c, T_b, U_b, K=K))(K))
            for K in (8, 16, 32)
        ]:
            try:
                # fwd only
                f = lambda a: a + loss_fn(a, ls, lf)[0] * 1e-12
                dtf = timed_chain(f, le)
                # fwd+bwd
                g = lambda a: a + jax.grad(
                    lambda x: jnp.sum(loss_fn(x, ls, lf))
                )(a) * 1e-12
                dtg = timed_chain(g, le, iters=20)
                print(
                    f"B{B} {name:9s}: fwd {cells/dtf/1e6:9.1f}  "
                    f"fwd+bwd {cells/dtg/1e6:9.1f} Mcells/s",
                    flush=True,
                )
            except Exception as e:
                print(f"B{B} {name}: {repr(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
