"""Sweep the K-banded lattice kernels at the primary B=32 shape (and
optionally B=256) to pick _AUTO_BANDED_K (VERDICT r2 next-round #1).

Usage: python -u scripts/probe_banded_k.py [variants...]
Default variants: banded2 banded4 banded8 banded16 plain scan
"""

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


def run(variant, tag=""):
    fn = lambda a, b, c: lattice_pallas.ssnt_loss_pallas(
        a, b, c, T_b, U_b, layout="ubt", variant=variant
    )
    dt = bench_fn(grad_of(fn), le, ls, lf)
    print(f"{variant}{tag}: fwd+bwd {cells / dt / 1e6:8.1f} Mcells/s "
          f"({dt*1e6:.1f} us)", flush=True)
    dtf = bench_fn(fn, le, ls, lf)
    print(f"{variant}{tag}: fwd     {cells / dtf / 1e6:8.1f} Mcells/s "
          f"({dtf*1e6:.1f} us)", flush=True)


which = sys.argv[1:] or [
    "banded2", "banded4", "banded8", "banded16", "plain", "scan"
]
for v in which:
    run(v)
