"""Round-3 dispatch probe: fwd+bwd variants at the headline B=32 shape,
native time-major layout. Decides the small-column dispatch.

Variants:
  fused_log : fused bidirectional log-domain kernel + XLA posterior pass
  fused_exp : fused bidirectional exp-domain kernel + XLA posterior pass
  two_pass  : fwd kernel + fused bwd+grad kernel (betas never hit HBM)
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
    # All three cotangents (matches the train step; prevents DCE of parts
    # of the posterior pass in the non-fused paths).
    return lambda a, b, c: jax.grad(
        lambda x, y, z: jnp.sum(loss_fn(x, y, z)), argnums=(0, 1, 2)
    )(a, b, c)


def run(name, **kw):
    fn = lambda a, b, c: lattice_pallas.ssnt_loss_pallas(
        a, b, c, T_b, U_b, layout="ubt", **kw
    )
    dt = bench_fn(grad_of(fn), le, ls, lf)
    print(f"{name}: {cells / dt / 1e6:.1f} Mcells/s ({dt*1e6:.1f} us)",
          flush=True)


which = sys.argv[1:] or ["fused_log", "fused_exp", "two_pass"]
if "fused_log" in which:
    run("fused_log", variant="fused")
if "fused_exp" in which:
    run("fused_exp", variant="exp")
if "two_pass" in which:
    _saved = lattice_pallas._FUSED_MAX_COLUMN_ELEMS
    lattice_pallas._FUSED_MAX_COLUMN_ELEMS = 0
    run("two_pass", variant="log")
    lattice_pallas._FUSED_MAX_COLUMN_ELEMS = _saved
