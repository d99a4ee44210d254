"""Is the grad bench DCE'd? The bench chain consumes ONE element of each
returned grad (utils/timing.bench_fn -> _scalarize); an elementwise
posterior pass can then be dead-code-eliminated down to a column. Compare:

  scalar : current bench consumer (leaf[0,0,0] of each grad)
  sum    : jnp.sum of every grad (forces all READS, writes can still fold
           into the reduction)
  elem   : x + (d_le + d_ls + d_lf) * 1e-12 (forces every element to be
           computed AND consumed elementwise — the train-step-like shape)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from ssnt_tts_tpu.ops import lattice_pallas
from ssnt_tts_tpu.utils.timing import bench_fn, bench_step

B, T, U = 32, 80, 400
rng = np.random.default_rng(0)
le = jnp.asarray(np.log(rng.uniform(0.1, 0.9, (U, B, T))), jnp.float32)
ls = jnp.log1p(-jnp.exp(le))
lf = jnp.asarray(rng.normal(0, 0.5, (U, B, T)), jnp.float32)
T_b = jnp.full((B,), T, jnp.int32)
U_b = jnp.full((B,), U, jnp.int32)
cells = B * T * U

loss = lambda a, b, c: lattice_pallas.ssnt_loss_pallas(
    a, b, c, T_b, U_b, layout="ubt"
)
grad = lambda a, b, c: jax.grad(
    lambda x, y, z: jnp.sum(loss(x, y, z)), argnums=(0, 1, 2)
)(a, b, c)


def show(name, dt):
    print(f"{name}: {dt*1e6:8.1f} us  ({cells / dt / 1e6:8.1f} Mcells/s)",
          flush=True)


which = sys.argv[1:] or ["scalar", "sum", "elem"]

if "scalar" in which:
    show("scalar (bench today)", bench_fn(grad, le, ls, lf))

if "sum" in which:
    def step_sum(x):
        g = grad(x, ls, lf)
        s = g[0].sum() + g[1].sum() + g[2].sum()
        return x + s * 1e-20
    show("sum all grads       ", bench_step(step_sum, le))

if "elem" in which:
    def step_elem(x):
        g = grad(x, ls, lf)
        return x + (g[0] + g[1] + g[2]) * 1e-12
    show("elementwise consume ", bench_step(step_elem, le))
