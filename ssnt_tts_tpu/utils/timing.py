"""Trustworthy wall-clock measurement for tunneled/async TPU backends.

On the axon-tunneled chip, ``jax.block_until_ready`` returns without waiting
for device execution, and every host<->device round trip costs a fixed
~25-30 ms RPC. Naive timing therefore measures the tunnel, not the kernel
(this corrupted every round-1 number).

The only reliable recipe:
  1. chain N data-dependent iterations of the step inside ONE jitted
     ``lax.scan`` (no per-iter dispatch),
  2. reduce the result to a scalar ON DEVICE and fetch it with
     ``np.asarray`` — fetching a concrete value is the one operation that
     provably waits for execution (and a scalar costs ~nothing over the
     ~25 MB/s tunnel),
  3. run two different iteration counts and take the SLOPE, cancelling the
     fixed RPC roundtrip.

Validated against known-cost workloads (scripts/probe_timing2.py): a 2048^3
matmul chain measures ~150 Tflop/s bf16 (v5e peak 197) and a big elementwise
copy ~590 GB/s (HBM peak 819) — both physically plausible, unlike the
block_until_ready numbers (41 TB/s).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _scalarize(tree):
    """Cheap on-device scalar with a data dependency on every leaf."""
    acc = jnp.float32(0)
    for leaf in jax.tree.leaves(tree):
        sl = leaf
        while sl.ndim > 0:
            sl = sl[:1].squeeze(0) if sl.shape[0] else sl.sum(0)
        acc = acc + sl.astype(jnp.float32)
    return acc


def bench_step(make_step, x0, *, n_lo: int = 10, n_hi: int = 60,
               repeats: int = 3, target_delta_s: float = 0.25,
               max_iters: int = 5000) -> float:
    """Median seconds per step of ``make_step`` (x -> x-like with a true data
    dependency), measured by the chained-scan slope method above.

    The iteration count is a runtime ``fori_loop`` bound, so both slope
    points share ONE compiled program — remote compiles on the tunneled
    backend cost minutes, and an identical program also makes the two points
    differ only in trip count.

    The fixed RPC roundtrip jitters by several ms between calls, so ``n_hi``
    is raised adaptively until the extra compute between the two points is
    ~``target_delta_s`` — the slope must be taken over a compute delta that
    dwarfs the jitter, or the result is noise (this, not kernel speed,
    explained round-1's wandering numbers)."""

    @jax.jit
    def run(x, n):
        out = jax.lax.fori_loop(0, n, lambda i, c: make_step(c), x)
        return _scalarize(out)

    # Warm the compilation (and the device) before timing.
    np.asarray(run(x0, n_lo))

    def timed(n):
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(run(x0, n))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    def once(n):
        t0 = time.perf_counter()
        np.asarray(run(x0, n))
        return time.perf_counter() - t0

    # Geometric probe: grow n until the run is target_delta_s slower than
    # the n_lo run (single samples suffice to find the scale).
    t_probe = once(n_lo)
    n = max(n_hi, 4 * n_lo)
    while n < max_iters and once(n) - t_probe < target_delta_s:
        n *= 4
    n_hi = min(n, max_iters)

    t_lo, t_hi = timed(n_lo), timed(n_hi)
    return max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)


def bench_fn(fn, *args, n_lo: int = 10, n_hi: int = 60,
             repeats: int = 3) -> float:
    """bench_step for a function of constant args: the chain perturbs the
    first (float) arg by a tiny multiple of the output scalar."""
    first, rest = args[0], args[1:]

    def step(x):
        out = fn(x, *rest)
        # Preserve x's dtype (bf16 chains would otherwise promote to f32
        # and break the fori_loop carry).
        return (x + _scalarize(out) * 1e-12).astype(x.dtype)

    return bench_step(step, first, n_lo=n_lo, n_hi=n_hi, repeats=repeats)
