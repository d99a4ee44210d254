"""Measure ssnt_loss_expin at the headline B=32xT=80xU=400 shape with the
honest length-threaded chain, alongside the log-API number."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from ssnt_tts_tpu.ops import lattice_pallas
from ssnt_tts_tpu.utils.timing import bench_step

B, T, U = 32, 80, 400
rng = np.random.default_rng(0)
le = jnp.asarray(np.log(rng.uniform(0.1, 0.9, (U, B, T))), jnp.float32)
ls = jnp.log1p(-jnp.exp(le))
lf = jnp.asarray(rng.normal(0, 0.5, (U, B, T)), jnp.float32)
T_b = jnp.full((B,), T, jnp.int32)
U_b = jnp.full((B,), U, jnp.int32)
cells = B * T * U

E = jnp.exp(le)
S = jnp.exp(ls)
mcol = jnp.max(lf, axis=2)
F = jnp.exp(lf - mcol[:, :, None])


def show(name, dt):
    print(f"{name}: {dt*1e6:8.1f} us  ({cells / dt / 1e6:8.1f} Mcells/s)",
          flush=True)


which = sys.argv[1:] or ["expin", "logchain"]

if "expin" in which:
    def step(il_c):
        g = jax.grad(
            lambda e, s, f, m: jnp.sum(
                lattice_pallas.ssnt_loss_expin(e, s, f, m, il_c, U_b)
            ),
            argnums=(0, 1, 2, 3),
        )(E, S, F, mcol)
        eps = g[0][0, 0, 0] + g[1][0, 0, 0] + g[2][0, 0, 0] + g[3][0, 0]
        return il_c + (eps > 1e30).astype(jnp.int32)

    show("expin grad (len-chain)", bench_step(step, T_b))

if "logchain" in which:
    def step2(il_c):
        g = jax.grad(
            lambda x, y, z: jnp.sum(
                lattice_pallas.ssnt_loss_pallas(
                    x, y, z, il_c, U_b, layout="ubt"
                )
            ),
            argnums=(0, 1, 2),
        )(le, ls, lf)
        eps = g[0][0, 0, 0] + g[1][0, 0, 0] + g[2][0, 0, 0]
        return il_c + (eps > 1e30).astype(jnp.int32)

    show("logapi grad (len-chain)", bench_step(step2, T_b))

if "kernel" in which:
    # Kernel-only: where does the 199 us go (kernel vs posterior)?
    def kstep(il_c):
        qn, bn, M, N = lattice_pallas.fused_expin_pallas(
            E, S, F, mcol, il_c, U_b, chunk=16
        )
        eps = qn[0, 0, 0] + bn[0, 0, 0] + M[0, 0] + N[0, 0]
        return il_c + (eps > 1e30).astype(jnp.int32)

    show("expin kernel only    ", bench_step(kstep, T_b))
