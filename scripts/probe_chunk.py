"""Grid-pipeline overhead probe: time the banded forward kernel directly at
chunk in {8,16,32,64} x kband in {2,4}. If larger chunks (fewer grid steps)
win at equal total compute, the grid revolve is a material per-step cost and
_auto_chunk's cap at 16 is wrong for the latency-bound regime."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from ssnt_tts_tpu.ops import lattice_pallas
from ssnt_tts_tpu.utils.timing import bench_fn

B, T, U = 32, 80, 400
rng = np.random.default_rng(0)
le = jnp.asarray(np.log(rng.uniform(0.1, 0.9, (U, B, T))), jnp.float32)
ls = jnp.log1p(-jnp.exp(le))
lf = jnp.asarray(rng.normal(0, 0.5, (U, B, T)), jnp.float32)
cells = B * T * U

for chunk in (16, 32, 64, 8):
    for kband in (2, 4):
        Upad = -(-U // chunk) * chunk
        pad = lambda x: jnp.concatenate(
            [x, jnp.full((Upad - U, B, T), -1e30, x.dtype)], axis=0
        )
        fn = lambda a, b, c: lattice_pallas.forward_alphas_pallas_banded(
            pad(a), pad(b), pad(c), chunk=chunk, kband=kband
        )
        dt = bench_fn(fn, le, ls, lf)
        print(f"chunk={chunk:3d} kband={kband}: fwd "
              f"{cells / dt / 1e6:8.1f} Mcells/s ({dt*1e6:.1f} us)",
              flush=True)
