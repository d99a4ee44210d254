"""Probe what dominates the lattice kernel's per-column cost on the chip:
(a) block/loop overhead floor (stub body), (b) arithmetic without
transcendentals (max instead of logaddexp), (c) the real log-domain body,
(d) the exp-domain body. One-off experiment."""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssnt_tts_tpu.ops.lattice_pallas import (
    NEG, _logaddexp, _shift_down_t, forward_alphas_pallas,
)


def make_kernel(body):
    def _kernel(le_ref, ls_ref, lf_ref, out_ref, alpha_s, *, chunk):
        B, T = alpha_s.shape
        block_id = pl.program_id(0)
        t_ids = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
        alpha = alpha_s[:]
        for j in range(chunk):
            alpha = body(alpha, le_ref[j], ls_ref[j], lf_ref[j], t_ids,
                         block_id, j)
            out_ref[j] = alpha
        alpha_s[:] = alpha
    return _kernel


def run_variant(name, body, le, ls, lf, chunk=16, iters=30):
    U, B, T = le.shape
    grid = (U // chunk,)
    block = pl.BlockSpec((chunk, B, T), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(make_kernel(body), chunk=chunk),
        grid=grid,
        in_specs=[block, block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((U, B, T), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, T), jnp.float32)],
    )

    @jax.jit
    def run(x):
        def step(c, _):
            out = f(c, ls, lf)
            return c + out[-1:] * 1e-12, None
        out, _ = jax.lax.scan(step, x, None, length=iters)
        return out

    jax.block_until_ready(run(le))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(le))
        ts.append((time.perf_counter() - t0) / iters)
    dt = sorted(ts)[1]
    cells = U * B * T
    print(f"  {name:28s}: {cells/dt/1e6:9.1f} Mcells/s  "
          f"({dt/U*1e9:7.1f} ns/col)", flush=True)


def main():
    rng = np.random.default_rng(0)
    for B, T, U in [(32, 80, 400), (256, 80, 400), (256, 128, 400)]:
        print(f"B{B} T{T} U{U}:", flush=True)
        le = jnp.asarray(np.log(rng.uniform(0.1, 0.9, (U, B, T))),
                         jnp.float32)
        ls = jnp.log1p(-jnp.exp(le))
        lf = jnp.asarray(rng.normal(0, 0.5, (U, B, T)), jnp.float32)

        # (a) stub: single add per column, keeps the loop + VMEM traffic.
        run_variant(
            "stub (1 add)",
            lambda a, e, s, f, t, bi, j: a + f,
            le, ls, lf,
        )
        # (b) viterbi: same structure, max instead of logaddexp.
        run_variant(
            "viterbi (no transcend.)",
            lambda a, e, s, f, t, bi, j: f + jnp.maximum(
                a + e, _shift_down_t(a + s)
            ),
            le, ls, lf,
        )
        # (c) real log-domain body.
        run_variant(
            "log-domain (logaddexp)",
            lambda a, e, s, f, t, bi, j: f + _logaddexp(
                a + e, _shift_down_t(a + s)
            ),
            le, ls, lf,
        )
        # (d) exp-domain-ish: mul/add + one exp per column (normalizer off).
        run_variant(
            "exp-domain (mul/add+exp)",
            lambda a, e, s, f, t, bi, j: jnp.exp(f) * (
                a * e + _shift_down_t(a * s)
            ),
            le, ls, lf,
        )
        # (e) chunk sweep on the real body.
        for c in (8, 32, 64):
            if (U % c) == 0 and c * B * max(T, 128) * 4 * 8 < 12e6:
                run_variant(
                    f"log-domain chunk={c}",
                    lambda a, e, s, f, t, bi, j: f + _logaddexp(
                        a + e, _shift_down_t(a + s)
                    ),
                    le, ls, lf, chunk=c,
                )


if __name__ == "__main__":
    main()
