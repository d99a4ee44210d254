"""Quantify the (B,T,U)->(U,B,T) transpose cost and kernel-variant speeds on
the real chip. One-off experiment; not part of the bench contract."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ssnt_tts_tpu.ops import lattice, lattice_pallas


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
        # (U, B, T) native layout inputs.
        le_u = jnp.asarray(
            np.log(rng.uniform(0.1, 0.9, (U, B, T))), jnp.float32
        )
        ls_u = jnp.log1p(-jnp.exp(le_u))
        lf_u = jnp.asarray(rng.normal(0, 0.5, (U, B, T)), jnp.float32)
        T_b = jnp.full((B,), T, jnp.int32)
        U_b = jnp.full((B,), U, jnp.int32)
        cells = B * T * U

        # --- raw kernels, no transpose, no posterior math ---
        def fwd_only(a):
            al = lattice_pallas.forward_alphas_pallas(a, ls_u, lf_u, chunk=16)
            return a + al[-1:] * 1e-12

        dt = timed_chain(fwd_only, le_u)
        print(f"B{B} raw fwd kernel (ubt):      {cells/dt/1e6:9.1f} Mcells/s",
              flush=True)

        def fused_log(a):
            al, be = lattice_pallas.fused_alphas_betas_pallas(
                a, ls_u, lf_u, T_b, U_b, chunk=16
            )
            return a + (al[-1:] + be[:1]) * 1e-12

        dt = timed_chain(fused_log, le_u)
        print(f"B{B} raw fused log (ubt):       {cells/dt/1e6:9.1f} Mcells/s",
              flush=True)

        def fused_exp(a):
            al, be = lattice_pallas.fused_alphas_betas_pallas_exp(
                a, ls_u, lf_u, T_b, U_b, chunk=16
            )
            return a + (al[-1:] + be[:1]) * 1e-12

        dt = timed_chain(fused_exp, le_u)
        print(f"B{B} raw fused exp (ubt):       {cells/dt/1e6:9.1f} Mcells/s",
              flush=True)

        # fwd + bwdgrad (the large-B two-pass path) without transposes
        g = jnp.ones((B,), jnp.float32)

        def two_pass(a):
            al = lattice_pallas.forward_alphas_pallas(a, ls_u, lf_u, chunk=16)
            logz = lattice._gather_logz(al, a, T_b, U_b)
            d_le, d_ls, d_lf = lattice_pallas.backward_grads_pallas(
                a, ls_u, lf_u, al, T_b, U_b, g, logz, chunk=16
            )
            return a + d_le * 1e-12

        dt = timed_chain(two_pass, le_u, iters=20)
        print(f"B{B} raw fwd+bwdgrad (ubt):     {cells/dt/1e6:9.1f} Mcells/s",
              flush=True)

        # --- transpose-only cost ---
        def transpose_rt(a):
            bt = jnp.transpose(a, (1, 2, 0))  # (B, T, U)
            return jnp.transpose(bt, (2, 0, 1)) * 0.9999

        dt = timed_chain(transpose_rt, le_u)
        print(f"B{B} transpose round-trip x1:   {cells/dt/1e6:9.1f} Mcells/s "
              f"({dt*1e3:.3f} ms)", flush=True)


if __name__ == "__main__":
    main()
