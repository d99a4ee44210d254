import time, functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ssnt_tts_tpu.ops.lattice_pallas import _logaddexp, NEG

def bench(fn, *a, iters=30, repeats=5):
    jax.block_until_ready(fn(*a))
    ts=[]
    for _ in range(repeats):
        t0=time.perf_counter()
        for _ in range(iters): out=fn(*a)
        jax.block_until_ready(out)
        ts.append((time.perf_counter()-t0)/iters)
    ts.sort(); return ts[len(ts)//2]

def shift_up_cat(x):
    B,T = x.shape
    return jnp.concatenate([x[:,1:], jnp.full((B,1), NEG, x.dtype)], axis=1)

def make_bwd(shift_up):
    def _bwd_kernel(in_len_ref, out_len_ref, le_ref, ls_ref, lf_ref,
                    beta_out_ref, beta_s, lf_s, *, chunk):
        B, T = beta_s.shape
        nblocks = pl.num_programs(0)
        block_id = pl.program_id(0)
        t_ids = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
        is_last_t = t_ids == in_len_ref[:] - 1
        out_len = out_len_ref[:]
        @pl.when(block_id == 0)
        def _():
            beta_s[:] = jnp.full((B, T), NEG)
            lf_s[:] = jnp.full((B, T), NEG)
        beta = beta_s[:]
        lf_next = lf_s[:]
        base_u = (nblocks - 1 - block_id) * chunk
        for j in range(chunk - 1, -1, -1):
            le = le_ref[j]
            cont = lf_next + beta
            rec = _logaddexp(le + cont, ls_ref[j] + shift_up(cont))
            init_col = jnp.where(is_last_t, le, NEG)
            beta = jnp.where(base_u + j == out_len - 1, init_col, rec)
            beta_out_ref[j] = beta
            lf_next = lf_ref[j]
        beta_s[:] = beta
        lf_s[:] = lf_next
    def backward(le, ls, lf, input_length, output_length, chunk=16):
        U,B,T = le.shape
        nblocks = U // chunk
        rev = pl.BlockSpec((chunk,B,T), lambda i: (nblocks-1-i,0,0), memory_space=pltpu.VMEM)
        len_spec = pl.BlockSpec((B,1), lambda i: (0,0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_bwd_kernel, chunk=chunk),
            grid=(nblocks,), in_specs=[len_spec,len_spec]+[rev]*3, out_specs=rev,
            out_shape=jax.ShapeDtypeStruct((U,B,T), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B,T), jnp.float32)]*2,
        )(input_length.reshape(B,1).astype(jnp.int32),
          output_length.reshape(B,1).astype(jnp.int32), le, ls, lf)
    return backward

rng = np.random.default_rng(0)
B,T,U = 32,80,400
le = jnp.asarray(np.log(rng.uniform(0.1,0.9,(U,B,T))), jnp.float32)
ls = jnp.log1p(-jnp.exp(le))
lf = jnp.asarray(rng.normal(0,0.5,(U,B,T)), jnp.float32)
T_b = jnp.full((B,), T, jnp.int32); U_b = jnp.full((B,), U, jnp.int32)

f = jax.jit(lambda a,b,c: make_bwd(shift_up_cat)(a,b,c,T_b,U_b))
print("bwd with concat shift_up:", round(bench(f, le, ls, lf)*1e6), "us", flush=True)
from ssnt_tts_tpu.ops import lattice_pallas
ref = jax.jit(lambda a,b,c: lattice_pallas.backward_betas_pallas(a,b,c,T_b,U_b,chunk=16))
print("max diff:", float(jnp.max(jnp.abs(f(le,ls,lf)-ref(le,ls,lf)))), flush=True)
