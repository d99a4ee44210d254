"""On-hardware check of the fused Pallas v1 beam step (ops/beam_pallas.py).

Asserts bit-exact equality vs the XLA path on randomized tie-heavy cases,
then slope-times both step formulations in a chained scan.

  python -u scripts/probe_beam_pallas.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from ssnt_tts_tpu.ops import beam_pallas, beam_v1
from ssnt_tts_tpu.utils.timing import bench_step


def main():
    B, W, T = 32, 8, 80
    il = jnp.full((B,), T, jnp.int32)
    for trial in range(20):
        r = np.random.default_rng(trial)
        h = r.normal(0, 1, (B, W, 2)).astype(np.float32)
        if trial % 2:
            h = np.round(h * 2) / 2
        lp = np.round(r.normal(0, 1, (B, W)), 1).astype(np.float32)
        fin = r.random((B, W)) < 0.2
        t = r.integers(0, T + 1, (B, W)).astype(np.int32)
        u = r.integers(0, 10, (B, W)).astype(np.int32)
        a = beam_v1.beam_search_decode_batched(
            jnp.asarray(h), jnp.asarray(lp), jnp.asarray(fin),
            jnp.asarray(t), jnp.asarray(u), il,
        )
        b = beam_pallas.beam_search_step_batched(
            jnp.asarray(h), jnp.asarray(lp), jnp.asarray(fin),
            jnp.asarray(t), jnp.asarray(u), il,
        )
        for name, xa, xb in zip(
            ["pred", "lp", "nt", "nu", "fin", "branch"], a, b
        ):
            np.testing.assert_array_equal(
                np.asarray(xa), np.asarray(xb),
                err_msg=f"trial {trial} {name}",
            )
    print("equality: 20 randomized trials bit-exact on", jax.devices()[0])

    rng = np.random.default_rng(0)
    h0 = jnp.asarray(rng.normal(0, 1, (B, W, 2)), jnp.float32)
    carry0 = (
        jnp.zeros((B, W), jnp.int32), jnp.zeros((B, W), jnp.int32),
        jnp.zeros((B, W), jnp.float32), jnp.zeros((B, W), bool),
    )

    def mk(fn):
        def step(c):
            t, u, lp, fin = c
            h = h0 + lp[..., None] * 1e-20
            pred, lp2, nt, nu, nfin, br = fn(h, lp, fin, t, u, il)
            return (nt, nu, lp2 * 1e-6, nfin)
        return step

    d_x = bench_step(
        mk(lambda *a: beam_v1.beam_search_decode_batched(*a)),
        carry0, n_lo=20, n_hi=100,
    )
    d_p = bench_step(
        mk(lambda *a: beam_pallas.beam_search_step_batched(*a)),
        carry0, n_lo=20, n_hi=100,
    )
    print(f"beam step XLA   : {d_x*1e6:7.2f} us")
    print(f"beam step pallas: {d_p*1e6:7.2f} us")


if __name__ == "__main__":
    main()
