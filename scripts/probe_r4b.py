"""Round-4 component probe at the headline B=32xT=80xU=400 shape.

Splits the 138.7 us fwd+bwd total into: fused bidir kernel alone,
fwd-only kernel, full grad path — across U-chunk sizes (the auto-chunk
caps at 16; if per-block grid overhead is material, bigger chunks win).
VMEM note: the bidir kernel runs 8 double-buffered streams of
(chunk, 32, 128) f32 blocks = chunk * 256 KB; chunk 40 ~= 10.5 MB.
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


def show(name, dt):
    print(f"{name}: {dt*1e6:8.1f} us  ({cells / dt / 1e6:8.1f} Mcells/s)",
          flush=True)


which = sys.argv[1:] or ["kernel", "grad"]

if "kernel" in which:
    for chunk in (16, 25, 40):
        fn = lambda a, b, c: lattice_pallas.fused_alphas_betas_pallas(
            a, b, c, T_b, U_b, chunk=chunk
        )[0]
        show(f"bidir kernel only  chunk={chunk}", bench_fn(fn, le, ls, lf))

if "fwd" in which:
    for chunk in (16, 25, 40):
        fn = lambda a, b, c: lattice_pallas.forward_alphas_pallas(
            a, b, c, chunk=chunk
        )
        show(f"fwd kernel only    chunk={chunk}", bench_fn(fn, le, ls, lf))

if "grad" in which:
    fn = grad_of(
        lambda a, b, c: lattice_pallas.ssnt_loss_pallas(
            a, b, c, T_b, U_b, layout="ubt"
        )
    )
    show("full grad (auto=fused, chunk16)", bench_fn(fn, le, ls, lf))
