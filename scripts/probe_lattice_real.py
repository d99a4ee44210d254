"""Re-measure every lattice path with the trustworthy slope harness."""

import jax
import jax.numpy as jnp
import numpy as np

from ssnt_tts_tpu.ops import lattice, lattice_pallas, lattice_scan
from ssnt_tts_tpu.utils.timing import bench_fn

B, T, U = 32, 80, 400
rng = np.random.default_rng(0)
le = jnp.asarray(np.log(rng.uniform(0.1, 0.9, (B, T, U))), jnp.float32)
ls = jnp.log1p(-jnp.exp(le))
lf = jnp.asarray(rng.normal(0, 0.5, (B, T, U)), jnp.float32)
T_b = jnp.full((B,), T, jnp.int32)
U_b = jnp.full((B,), U, jnp.int32)
cells = B * T * U


def report(name, dt):
    print(f"{name:50s} {dt*1e6:9.1f} us  {cells/dt/1e6:9.1f} Mcells/s",
          flush=True)


def grad_of(loss_fn):
    return lambda a, b, c: jax.grad(
        lambda x: jnp.sum(loss_fn(x, b, c))
    )(a)


xla = lambda a, b, c: lattice.ssnt_loss(a, b, c, T_b, U_b)
pal = lambda a, b, c: lattice_pallas.ssnt_loss_pallas(a, b, c, T_b, U_b)
pal_exp = lambda a, b, c: lattice_pallas.ssnt_loss_pallas(
    a, b, c, T_b, U_b, variant="exp"
)
scan16 = lambda a, b, c: lattice_scan.ssnt_loss_scan(a, b, c, T_b, U_b, K=16)
scan8 = lambda a, b, c: lattice_scan.ssnt_loss_scan(a, b, c, T_b, U_b, K=8)
scan32 = lambda a, b, c: lattice_scan.ssnt_loss_scan(a, b, c, T_b, U_b, K=32)

report("pallas grad (r1 bench path)", bench_fn(grad_of(pal), le, ls, lf))
report("pallas grad exp variant", bench_fn(grad_of(pal_exp), le, ls, lf))
report("pallas fwd loss only", bench_fn(pal, le, ls, lf))
report("XLA scan grad", bench_fn(grad_of(xla), le, ls, lf))
report("lattice_scan K=8 grad", bench_fn(grad_of(scan8), le, ls, lf))
report("lattice_scan K=16 grad", bench_fn(grad_of(scan16), le, ls, lf))
report("lattice_scan K=32 grad", bench_fn(grad_of(scan32), le, ls, lf))
report("lattice_scan K=16 fwd", bench_fn(scan16, le, ls, lf))
