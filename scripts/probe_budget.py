"""Measure the primitive latencies the decode budgets are built from
(VERDICT r3 weak #8: the 50 Tflop/s and 3x-slack constants were asserted,
not measured).

A decode step inside lax.scan is a serial chain of small dispatches on a
core that finishes each op's vector work in ~ns; the budget therefore
decomposes into measured per-dispatch latencies, not flops/peak:

  L_mm     : one dependent small matmul (B*W=256 rows, model-sized)
  L_elem   : one dependent elementwise HLO on a (256, 256) activation
  L_pallas : one fused Pallas kernel launch (v1 beam-step sized, trivial
             body) in a dependent chain
  L_gather : one take_along_axis state reorder (B=32, W=8, F=416)

Derived budgets (written into bench.py):
  v1: n_mm_critical * L_mm + L_pallas + L_gather + n_glue * L_elem
  v2: same with the v2 step's critical matmul count and beam floor.

Run on the TPU:  python -u scripts/probe_budget.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ssnt_tts_tpu.utils.timing import bench_step

rng = np.random.default_rng(0)
out = {}


def report(name, dt_us):
    out[name] = round(dt_us, 3)
    print(f"{name:>10}: {dt_us:7.3f} us", flush=True)


# --- L_mm: dependent small matmul chain (decoder-cell shape) ---
# B*W=256 rows, 256 -> 768 (the GRU gate matmul shape), bf16 like the model.
W1 = jnp.asarray(rng.normal(0, 0.05, (256, 768)), jnp.bfloat16)
W2 = jnp.asarray(rng.normal(0, 0.05, (768, 256)), jnp.bfloat16)
x0 = jnp.asarray(rng.normal(0, 1, (256, 256)), jnp.bfloat16)


def mm_step(x):
    return jnp.tanh(x @ W1) @ W2


dt = bench_step(mm_step, x0, n_lo=64, n_hi=512)
report("L_mm_pair", dt * 1e6)  # 2 dependent matmuls + 1 elementwise

# --- L_elem: dependent elementwise HLO ---
y0 = jnp.asarray(rng.normal(0, 1, (256, 256)), jnp.float32)
dt_e1 = bench_step(lambda x: x * 1.000001 + 1e-9, y0, n_lo=64, n_hi=1024)
report("L_elem", dt_e1 * 1e6)

# --- L_pallas: trivial kernel launch, v1 beam-step block shape ---
def _trivial_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 1.000001


z0 = jnp.asarray(rng.normal(0, 1, (32, 8, 128)), jnp.float32)


def pallas_step(x):
    return pl.pallas_call(
        _trivial_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


dt_p = bench_step(pallas_step, z0, n_lo=64, n_hi=512)
report("L_pallas", dt_p * 1e6)

# --- L_gather: the decode state reorder ---
state0 = jnp.asarray(rng.normal(0, 1, (32, 8, 416)), jnp.float32)
idx = jnp.asarray(rng.integers(0, 8, (32, 8, 1)), jnp.int32)


def gather_step(x):
    g = jnp.take_along_axis(x, idx, axis=1)
    return g * 1.000001


dt_g = bench_step(gather_step, state0, n_lo=64, n_hi=512)
report("L_gather", dt_g * 1e6)

print(out)
