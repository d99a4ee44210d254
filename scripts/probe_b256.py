"""Honest B=256 grad numbers after the forward-hoisting fix (the fwd
kernel now depends on input_length, so a length-threaded chain cannot
hoist it out of the timing loop)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from ssnt_tts_tpu.ops import lattice_pallas
from ssnt_tts_tpu.utils.timing import bench_step

B, T, U = 256, 80, 400
rng = np.random.default_rng(0)
le = jnp.asarray(np.log(rng.uniform(0.1, 0.9, (U, B, T))), jnp.float32)
ls = jnp.log1p(-jnp.exp(le))
lf = jnp.asarray(rng.normal(0, 0.5, (U, B, T)), jnp.float32)
T_b = jnp.full((B,), T, jnp.int32)
U_b = jnp.full((B,), U, jnp.int32)
cells = B * T * U


def show(name, dt):
    gbs44 = cells * 44 / dt / 1e9
    print(f"{name}: {dt*1e6:8.1f} us  ({cells/dt/1e6:8.1f} Mcells/s, "
          f"{gbs44:5.0f} GB/s at 44B)", flush=True)


def chain(variant, a, b, c):
    def step(il_c):
        g = jax.grad(
            lambda x, y, z: jnp.sum(
                lattice_pallas.ssnt_loss_pallas(
                    x, y, z, il_c, U_b, layout="ubt", variant=variant
                )
            ),
            argnums=(0, 1, 2),
        )(a, b, c)
        eps = (
            g[0][0, 0, 0].astype(jnp.float32)
            + g[1][0, 0, 0].astype(jnp.float32)
            + g[2][0, 0, 0].astype(jnp.float32)
        )
        return il_c + (eps > 1e30).astype(jnp.int32)

    return bench_step(step, T_b, n_lo=6, n_hi=24)


show("B256 f32  (len-chain)", chain("log", le, ls, lf))
leh, lsh, lfh = (x.astype(jnp.bfloat16) for x in (le, ls, lf))
dt = chain("bf16", leh, lsh, lfh)
print(f"B256 bf16 (len-chain): {dt*1e6:8.1f} us  "
      f"({cells/dt/1e6:8.1f} Mcells/s, {cells*26/dt/1e9:5.0f} GB/s at 26B)",
      flush=True)
