"""One-off experiment: sweep Pallas lattice chunk size / batch to locate
per-column overhead on the real chip. Not part of the bench contract."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ssnt_tts_tpu.ops import lattice_pallas


def timed(f, x, iters=50):
    @jax.jit
    def run(x):
        def body(c, _):
            out = f(c)
            return c + out[0] * 1e-12, None

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
    for B, T, U in [(32, 80, 400), (128, 80, 400), (256, 80, 400),
                    (32, 128, 400), (8, 80, 400)]:
        le = jnp.asarray(np.log(rng.uniform(0.1, 0.9, (B, T, U))),
                         jnp.float32)
        ls = jnp.log1p(-jnp.exp(le))
        lf = jnp.asarray(rng.normal(0, 0.5, (B, T, U)), jnp.float32)
        T_b = jnp.full((B,), T, jnp.int32)
        U_b = jnp.full((B,), U, jnp.int32)
        cells = B * T * U
        for chunk in (8, 16, 32, 64):
            if U % chunk:
                continue
            f = lambda a: lattice_pallas.ssnt_loss_pallas(
                a, ls, lf, T_b, U_b, chunk=chunk
            )
            try:
                dt = timed(f, le)
                print(
                    f"B{B} T{T} U{U} chunk{chunk}: fwd "
                    f"{cells / dt / 1e6:8.1f} Mcells/s  ({dt*1e3:.3f} ms)",
                    flush=True,
                )
            except Exception as e:
                print(f"B{B} T{T} chunk{chunk}: {repr(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()


def variant_bench():
    rng = np.random.default_rng(0)
    for B, T, U in [(32, 80, 400), (256, 80, 400)]:
        le = jnp.asarray(np.log(rng.uniform(0.1, 0.9, (B, T, U))),
                         jnp.float32)
        ls = jnp.log1p(-jnp.exp(le))
        lf = jnp.asarray(rng.normal(0, 0.5, (B, T, U)), jnp.float32)
        T_b = jnp.full((B,), T, jnp.int32)
        U_b = jnp.full((B,), U, jnp.int32)
        cells = B * T * U
        for variant in ("log", "exp"):
            def gradf(a, variant=variant):
                return jax.grad(
                    lambda x: jnp.sum(
                        lattice_pallas.ssnt_loss_pallas(
                            x, ls, lf, T_b, U_b, variant=variant
                        )
                    )
                )(a)
            f = lambda a: (a + gradf(a) * 1e-12,)
            g = lambda a: a + gradf(a) * 1e-12
            dt = timed(lambda a: (g(a), ) and (g(a),) , le) if False else None
            # simple chained timing
            @jax.jit
            def run(x, variant=variant):
                def body(c, _):
                    return g(c), None
                out, _ = jax.lax.scan(body, x, None, length=30)
                return out
            jax.block_until_ready(run(le))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(run(le))
                ts.append((time.perf_counter() - t0) / 30)
            dt = sorted(ts)[1]
            print(f"B{B} fwdbwd[{variant}]: {cells/dt/1e6:9.1f} Mcells/s"
                  f" ({dt*1e3:.3f} ms)", flush=True)


if __name__ == "__main__" and "--variant" in sys.argv:
    variant_bench()
