"""On-hardware check of the fused Pallas beam steps (ops/beam_pallas.py).

Asserts bit-exact equality vs the XLA paths (v1 and v2) on randomized
tie-heavy cases, then slope-times all step formulations in a chained scan.

Recorded result (v5e, 2026-08-20): v1 pallas 7.1 us vs 11.7 XLA (wins,
auto-dispatched); v2 pallas 82 us vs 36 XLA at C=W*D=80 (loses - the
pairwise-mask temporaries spill to the Mosaic VMEM stack at ~2.8 MB/batch
row, forcing 4-row grid blocks; XLA's fused bool pipeline streams HBM
instead). v2 therefore defaults to the XLA path in parallel/decode.py.

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
    print(f"v1 beam step XLA   : {d_x*1e6:7.2f} us")
    print(f"v1 beam step pallas: {d_p*1e6:7.2f} us")


def main_v2():
    from ssnt_tts_tpu.ops import beam_v2

    B, W, D = 32, 8, 10
    il = jnp.full((B,), 80, jnp.int32)
    ol = jnp.full((B,), 400, jnp.int32)
    dt = jnp.arange(D, dtype=jnp.int32)
    for trial in range(15):
        r = np.random.default_rng(trial)
        h = r.normal(0, 1, (B, W, D)).astype(np.float32)
        if trial % 2:
            h = np.round(h * 2) / 2
        lp = np.round(r.normal(0, 1, (B, W)), 1).astype(np.float32)
        fin = r.random((B, W)) < 0.2
        t = r.integers(0, 81, (B, W)).astype(np.int32)
        u = r.integers(0, 10, (B, W)).astype(np.int32)
        tot = r.integers(0, 400, (B, W)).astype(np.int32)
        kw = dict(return_num_survivors=True)
        a = beam_v2.beam_search_decode(
            jnp.asarray(h), jnp.asarray(lp), jnp.asarray(fin),
            jnp.asarray(tot), dt, jnp.asarray(t), jnp.asarray(u),
            il, ol, **kw,
        )
        b = beam_pallas.v2_beam_search_decode(
            jnp.asarray(h), jnp.asarray(lp), jnp.asarray(fin),
            jnp.asarray(tot), dt, jnp.asarray(t), jnp.asarray(u),
            il, ol, **kw,
        )
        for name, xa, xb in zip(
            ["pred", "lp", "nt", "nu", "fin", "tot", "branch", "ns"], a, b
        ):
            np.testing.assert_array_equal(
                np.asarray(xa), np.asarray(xb),
                err_msg=f"trial {trial} {name}",
            )
    print("v2 equality: 15 randomized trials bit-exact")

    rng = np.random.default_rng(0)
    h0 = jnp.asarray(rng.normal(0, 1, (B, W, D)), jnp.float32)
    carry0 = (
        jnp.zeros((B, W), jnp.float32), jnp.zeros((B, W), bool),
        jnp.zeros((B, W), jnp.int32), jnp.zeros((B, W), jnp.int32),
        jnp.zeros((B, W), jnp.int32),
    )

    def mk(fn):
        def step(c):
            lp, fin, tot, t, u = c
            h = h0 + lp[..., None] * 1e-20
            pred, lp2, nt, nu, nfin, ntot, br, ns = fn(
                h, lp, fin, tot, dt, t, u, il, ol,
                return_num_survivors=True,
            )
            return (lp2 * 1e-6, nfin, ntot, nt, nu)
        return step

    d_x = bench_step(mk(beam_v2.beam_search_decode), carry0,
                     n_lo=20, n_hi=100)
    d_p = bench_step(mk(beam_pallas.v2_beam_search_decode), carry0,
                     n_lo=20, n_hi=100)
    print(f"v2 beam step XLA   : {d_x*1e6:7.2f} us")
    print(f"v2 beam step pallas: {d_p*1e6:7.2f} us")


if __name__ == "__main__":
    main()
    main_v2()


def main_tone():
    from ssnt_tts_tpu.ops import tone_latent

    B, W, K, T = 32, 8, 8, 80
    il = jnp.full((B,), T, jnp.int32)
    r = np.random.default_rng(7)
    for trial in range(10):
        rr = np.random.default_rng(trial)
        h = rr.normal(0, 1, (B, W, K)).astype(np.float32)
        if trial % 2:
            h = np.round(h * 2) / 2
        lp = np.round(rr.normal(0, 1, (B, W)), 1).astype(np.float32)
        fin = rr.random((B, W)) < 0.2
        t = rr.integers(0, T + 1, (B, W)).astype(np.int32)
        u = rr.integers(0, 10, (B, W)).astype(np.int32)
        a = tone_latent.beam_search_decode(
            jnp.asarray(h), jnp.asarray(lp), jnp.asarray(fin),
            jnp.asarray(t), jnp.asarray(u), il, empty_tone_id=0,
        )
        b = beam_pallas.tone_beam_search_decode(
            jnp.asarray(h), jnp.asarray(lp), jnp.asarray(fin),
            jnp.asarray(t), jnp.asarray(u), il, empty_tone_id=0,
        )
        for xa, xb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
    print("tone equality: 10 randomized trials bit-exact", flush=True)

    h0 = jnp.asarray(r.normal(0, 1, (B, W, K)), jnp.float32)
    carry0 = (
        jnp.zeros((B, W), jnp.float32), jnp.zeros((B, W), bool),
        jnp.zeros((B, W), jnp.int32), jnp.zeros((B, W), jnp.int32),
    )

    def mk(fn):
        def step(c):
            lp, fin, t, u = c
            h = h0 + lp[:, :, None] * 1e-6
            pred, lp2, nt, nu, nfin, br = fn(
                h, lp, fin, t, u, il, empty_tone_id=0
            )
            return (lp2, nfin, jnp.clip(nt, 0, T - 1), nu)
        return step

    d_x = bench_step(mk(tone_latent.beam_search_decode), carry0,
                     n_lo=8, n_hi=64)
    d_p = bench_step(mk(beam_pallas.tone_beam_search_decode), carry0,
                     n_lo=8, n_hi=64)
    print(f"tone beam step XLA   : {d_x*1e6:7.2f} us", flush=True)
    print(f"tone beam step pallas: {d_p*1e6:7.2f} us", flush=True)


if __name__ == "__main__":
    main_tone()
