"""Measure the packed-lane bidirectional kernel vs the unpacked one at the
headline B=32 x T=80 x U=400 shape, plus the full grad path both ways."""

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


which = sys.argv[1:] or ["packk", "packgrad"]

if "packk" in which:
    fn = lambda a, b, c: lattice_pallas.fused_alphas_betas_pallas_packed(
        a, b, c, T_b, U_b, chunk=16
    )[0]
    show("packed bidir kernel ", bench_fn(fn, le, ls, lf))

if "packgrad" in which:
    fn = grad_of(
        lambda a, b, c: lattice_pallas.ssnt_loss_pallas(
            a, b, c, T_b, U_b, layout="ubt", variant="fusedpack"
        )
    )
    show("full grad fusedpack ", bench_fn(fn, le, ls, lf))

if "check" in which:
    ref = jax.jit(
        lambda a, b, c: lattice_pallas.ssnt_loss_pallas(
            a, b, c, T_b, U_b, layout="ubt", variant="fused"
        )
    )(le, ls, lf)
    got = jax.jit(
        lambda a, b, c: lattice_pallas.ssnt_loss_pallas(
            a, b, c, T_b, U_b, layout="ubt", variant="fusedpack"
        )
    )(le, ls, lf)
    print("max_abs_diff:", float(jnp.max(jnp.abs(ref - got))), flush=True)

if "lenchain" in which:
    # The bench's round-4 input_length iteration chain (zero-artifact).
    from ssnt_tts_tpu.utils.timing import bench_step as _bs

    def step(il_c):
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

    show("grad via len-chain  ", _bs(step, T_b))
