"""Honest component breakdown of the fwd+bwd lattice at B=32,T=80,U=400
using the slope harness: transposes, each Pallas kernel, posterior pass."""

import jax
import jax.numpy as jnp
import numpy as np

from ssnt_tts_tpu.ops import lattice, lattice_pallas
from ssnt_tts_tpu.utils.timing import bench_fn, bench_step

B, T, U = 32, 80, 400
rng = np.random.default_rng(0)
le = jnp.asarray(np.log(rng.uniform(0.1, 0.9, (B, T, U))), jnp.float32)
ls = jnp.log1p(-jnp.exp(le))
lf = jnp.asarray(rng.normal(0, 0.5, (B, T, U)), jnp.float32)
T_b = jnp.full((B,), T, jnp.int32)
U_b = jnp.full((B,), U, jnp.int32)
cells = B * T * U

le_u = jnp.transpose(le, (2, 0, 1))
ls_u = jnp.transpose(ls, (2, 0, 1))
lf_u = jnp.transpose(lf, (2, 0, 1))


def report(name, dt):
    print(f"{name:52s} {dt*1e6:9.1f} us  {cells/dt/1e6:9.1f} Mcells/s",
          flush=True)


# 1. transposes alone (3 in-layout transposes, data-dependent chain)
def tr_step(x):
    o = jnp.transpose(x, (2, 0, 1))
    return jnp.transpose(o, (1, 2, 0)) * (1 + 1e-12)

report("transpose (B,T,U)->(U,B,T)->back x1 array", bench_step(tr_step, le))

# 2. fwd kernel alone on pre-transposed inputs
report("fwd kernel (U,B,T) chunk=16",
       bench_fn(lambda a, b, c: lattice_pallas.forward_alphas_pallas(
           a, b, c, chunk=16), le_u, ls_u, lf_u))

# 3. fused bidir log kernel alone
report("fused bidir log kernel",
       bench_fn(lambda a, b, c: lattice_pallas.fused_alphas_betas_pallas(
           a, b, c, T_b, U_b, chunk=16)[0], le_u, ls_u, lf_u))

# 3b. fused bidir exp kernel alone
report("fused bidir exp kernel",
       bench_fn(lambda a, b, c: lattice_pallas.fused_alphas_betas_pallas_exp(
           a, b, c, T_b, U_b, chunk=16)[0], le_u, ls_u, lf_u))

# 4. bwd+grad fused kernel alone (needs alphas + logz)
alphas0 = jax.jit(
    lambda a, b, c: lattice_pallas.forward_alphas_pallas(a, b, c, chunk=16)
)(le_u, ls_u, lf_u)
g1 = jnp.ones((B,), jnp.float32)
logz0 = jax.jit(lattice._gather_logz)(alphas0, le_u, T_b, U_b)

report("bwd+grad fused kernel",
       bench_fn(lambda a, b, c: lattice_pallas.backward_grads_pallas(
           a, b, c, alphas0, T_b, U_b, g1, logz0, chunk=16)[0],
           le_u, ls_u, lf_u))

# 5. full grad paths
def grad_path(**kw):
    def f(a, b, c):
        return jax.grad(
            lambda x: jnp.sum(
                lattice_pallas.ssnt_loss_pallas(x, b, c, T_b, U_b, **kw)
            )
        )(a)
    return f

report("FULL grad (default dispatch: bidir+XLA post)",
       bench_fn(grad_path(), le, ls, lf))

# 6. force the fwd + bwdgrad route by monkeypatching the threshold
orig = lattice_pallas._FUSED_MAX_COLUMN_ELEMS
lattice_pallas._FUSED_MAX_COLUMN_ELEMS = 0
report("FULL grad (fwd + bwdgrad route)",
       bench_fn(grad_path(), le, ls, lf))
lattice_pallas._FUSED_MAX_COLUMN_ELEMS = orig

# 7. fwd loss only (public, with transposes)
report("FULL fwd loss (public)",
       bench_fn(lambda a, b, c: lattice_pallas.ssnt_loss_pallas(
           a, b, c, T_b, U_b), le, ls, lf))
