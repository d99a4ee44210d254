"""Chunk sweep for the fused bidirectional kernel (the auto-dispatch winner
at small columns): smaller blocks -> more grid steps -> deeper HBM/compute
pipelining. Decides the chunk the auto path requests."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from ssnt_tts_tpu.ops import lattice_pallas
from ssnt_tts_tpu.utils.timing import bench_fn

B, T, U = 32, 80, 400
rng = np.random.default_rng(0)
le = jnp.asarray(np.log(rng.uniform(0.1, 0.9, (U, B, T))), jnp.float32)
ls = jnp.log1p(-jnp.exp(le))
lf = jnp.asarray(rng.normal(0, 0.5, (U, B, T)), jnp.float32)
T_b = jnp.full((B,), T, jnp.int32)
U_b = jnp.full((B,), U, jnp.int32)
cells = B * T * U


def grad_of(loss_fn):
    return lambda a, b, c: jax.grad(
        lambda x, y, z: jnp.sum(loss_fn(x, y, z)), argnums=(0, 1, 2)
    )(a, b, c)


for variant in ("fused", "plain"):
    for chunk in (16, 8, 4):
        fn = lambda a, b, c: lattice_pallas.ssnt_loss_pallas(
            a, b, c, T_b, U_b, layout="ubt", variant=variant, chunk=chunk
        )
        dt = bench_fn(grad_of(fn), le, ls, lf)
        print(f"{variant} chunk={chunk:2d}: fwd+bwd "
              f"{cells / dt / 1e6:8.1f} Mcells/s ({dt*1e6:.1f} us)",
              flush=True)
