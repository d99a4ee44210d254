"""Pallas TPU kernels for the SSNT forward-backward lattice DP.

Design (see ops/lattice.py for the math): the DP is column-parallel in u, so
each kernel is a sequential walk over output-frame columns with pure
(B, T)-vector work per column — VPU elementwise ops with T on the 128-lane
axis and B on sublanes. The grid streams U in chunks; Pallas's grid pipeline
double-buffers the HBM->VMEM loads of the (CHUNK, B, T) blocks while the
carry column lives in VMEM scratch across grid steps. Layout is (U, B, T)
time-major so each column is a contiguous (B, T) tile.

Forward:  alpha[u] = lf[u] + logaddexp(alpha[u-1] + le[u-1],
                                       shift_t(alpha[u-1] + ls[u-1]))
Backward: beta[u]  = logaddexp(le[u] + lf[u+1] + beta[u+1],
                               ls[u] + shift_t^-1(lf[u+1] + beta[u+1]))
with per-example re-initialization at u == U_b - 1 (ragged batches handled
inside the kernel via masks on iota vs the length vectors — one fixed-shape
kernel serves any batch).

The public ssnt_loss_pallas mirrors ops.lattice.ssnt_loss (same custom_vjp
posterior math, verified equal in tests/test_lattice_pallas.py); posteriors
are computed by XLA elementwise fusions over the Pallas-produced alpha/beta.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssnt_tts_tpu.ops.lattice import (
    NEG,
    _canonicalize,
    _gather_logz,
)

_INTERPRET = False  # forced on by tests on the CPU backend


def _interpret() -> bool:
    """Compile Mosaic on TPU; interpret everywhere else, so forcing
    lattice_impl="pallas" off-TPU runs correctly (slow) instead of dying
    in Mosaic lowering (ADVICE r3 applied to this module too)."""
    return _INTERPRET or jax.default_backend() != "tpu"


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    return m + jnp.log1p(jnp.exp(-jnp.abs(a - b)))


def _f32(x):
    """Load-time upcast: kernels compute f32 in VMEM regardless of the HBM
    storage dtype (bf16 variant halves input traffic)."""
    return x.astype(jnp.float32)


def _shift_down_t(x):
    """x[..., t] -> value from t-1 (row 0 gets NEG). Lane-axis shift."""
    rolled = pltpu.roll(x, shift=1, axis=1)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(t_ids == 0, NEG, rolled)


def _shift_up_t(x):
    """x[..., t] -> value from t+1 (last row gets NEG). pltpu.roll requires a
    non-negative shift, so roll by T-1 (== -1 mod T)."""
    T = x.shape[1]
    rolled = pltpu.roll(x, shift=T - 1, axis=1)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(t_ids == T - 1, NEG, rolled)


def _lse(*terms):
    """logsumexp over a static list of (B, T) values (generic n-term)."""
    m = terms[0]
    for t in terms[1:]:
        m = jnp.maximum(m, t)
    acc = jnp.exp(terms[0] - m)
    for t in terms[1:]:
        acc = acc + jnp.exp(t - m)
    return m + jnp.log(acc)


def _shift_down_k(x, k):
    if k == 0:
        return x
    if k >= x.shape[1]:  # composed band wider than T (tiny-T tests)
        return jnp.full(x.shape, NEG, x.dtype)
    rolled = pltpu.roll(x, shift=k, axis=1)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(t_ids < k, NEG, rolled)


def _shift_up_k(x, k):
    if k == 0:
        return x
    T = x.shape[1]
    if k >= T:
        return jnp.full(x.shape, NEG, x.dtype)
    rolled = pltpu.roll(x, shift=T - k, axis=1)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(t_ids >= T - k, NEG, rolled)


# ------------------------------------------------------------------ forward

def _fwd_kernel(il_ref, le_ref, ls_ref, lf_ref, alpha_out_ref,
                alpha_s, le_s, ls_s, *, chunk):
    """Statically unrolled column walk: per column only VPU elementwise ops
    with static VMEM indices — no fori_loop bookkeeping, no dynamic slices,
    no per-column branches (the u==0 init is a select, true only in the very
    first column of block 0).

    il_ref (input_length) is accepted but unused by the recursion (alphas
    past an example's true T are garbage the consumers mask, exactly like
    the XLA reference). It exists so the pallas_call DEPENDS on the
    per-step state of chained measurements and real train steps: without
    it the forward was loop-INVARIANT under a length-threaded timing
    chain and XLA legally hoisted it out of the loop, inflating the
    B=256 grad numbers past the physical HBM roofline (890 GB/s
    apparent) — caught in round 4 by pricing every number against
    physics."""
    B, T = alpha_s.shape
    block_id = pl.program_id(0)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)

    alpha = alpha_s[:]
    le_prev = le_s[:]
    ls_prev = ls_s[:]
    for j in range(chunk):
        lf = _f32(lf_ref[j])
        stay = alpha + le_prev
        moved = _shift_down_t(alpha + ls_prev)
        rec = lf + _logaddexp(stay, moved)
        init = jnp.where(t_ids == 0, lf, NEG)
        is_first = (block_id == 0) & (j == 0)
        alpha = jnp.where(is_first, init, rec)
        alpha_out_ref[j] = alpha
        le_prev = _f32(le_ref[j])
        ls_prev = _f32(ls_ref[j])
    alpha_s[:] = alpha
    le_s[:] = le_prev
    ls_s[:] = ls_prev


def forward_alphas_pallas(le, ls, lf, input_length=None, *,
                          chunk: int = 16):
    """(U, B, T) inputs -> (U, B, T) alphas. U must be a multiple of chunk
    (callers pad). input_length participates only as a dependency (see
    _fwd_kernel docstring)."""
    U, B, T = le.shape
    assert U % chunk == 0, (U, chunk)
    if input_length is None:
        input_length = jnp.full((B,), T, jnp.int32)
    grid = (U // chunk,)
    block = pl.BlockSpec(
        (chunk, B, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    len_spec = pl.BlockSpec(
        (B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, chunk=chunk),
        grid=grid,
        in_specs=[len_spec, block, block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((U, B, T), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, T), jnp.float32),
            pltpu.VMEM((B, T), jnp.float32),
            pltpu.VMEM((B, T), jnp.float32),
        ],
        interpret=_interpret(),
    )(
        jnp.asarray(input_length, jnp.int32).reshape(B, 1),
        le, ls, lf,
    )


# ------------------------------------------------- banded forward (K-band)
#
# The column recursion is linear over the (logaddexp, +) semiring with a
# 2-banded operator (see ops/lattice_scan.py for the full derivation):
#     alpha_u = M_u alpha_{u-1},  M_u = [diag: lf_u + le_{u-1},
#                                        sub:  lf_u + ls_{u-1}(t-1)]
# Composing K consecutive columns into one (K+1)-banded operator OFF the
# dependency chain cuts the sequential depth to U/K: the critical chain
# becomes U/K (K+1)-term band-applies, while the band build (a K-leaf
# composition tree) and the K-1 interior-column replays are bulk VPU work
# the scheduler overlaps with it. This converts the latency-bound
# small-batch regime into a throughput-bound one at ~K/2x the elementwise
# work — a large net win when a (B, T) column is only a few VREGs (the VPU
# has ~40x throughput headroom there). The u=0 init is made uniform by a
# virtual carry: alpha_{-1} = onehot(t == 0) with virtual le_prev = 0,
# ls_prev = NEG, so alpha_0 = M_0 alpha_{-1} = where(t == 0, lf_0, NEG)
# exactly. kband=2 reproduces round-2's banded-pair kernels bit-exactly.


def _compose_down(A, B):
    """(A o B) for subdiagonal band operators (B applied first): band lists
    of (B, T) coefficients, result[k] = lse_{i+j=k} A[i] + shift_down(B[j], i).
    """
    out = [[] for _ in range(len(A) + len(B) - 1)]
    for i, Ai in enumerate(A):
        for j, Bj in enumerate(B):
            out[i + j].append(Ai + _shift_down_k(Bj, i))
    return [t[0] if len(t) == 1 else _lse(*t) for t in out]


def _compose_up(A, B):
    """(A o B) for superdiagonal band operators (B applied first):
    result[k] = lse_{i+j=k} A[i] + shift_up(B[j], i)."""
    out = [[] for _ in range(len(A) + len(B) - 1)]
    for i, Ai in enumerate(A):
        for j, Bj in enumerate(B):
            out[i + j].append(Ai + _shift_up_k(Bj, i))
    return [t[0] if len(t) == 1 else _lse(*t) for t in out]


def _tree_compose(ops, compose):
    """Compose a list of band operators (ops[0] applied first) pairwise:
    [M0, M1, M2, M3] -> [M1oM0, M3oM2] -> [(M3oM2)o(M1oM0)]."""
    while len(ops) > 1:
        nxt = []
        for i in range(0, len(ops) - 1, 2):
            nxt.append(compose(ops[i + 1], ops[i]))
        if len(ops) % 2:
            nxt.append(ops[-1])
        ops = nxt
    return ops[0]


def _fwd_kernel_banded(le_ref, ls_ref, lf_ref, alpha_out_ref,
                       alpha_s, le_s, ls_s, *, chunk, kband):
    B, T = alpha_s.shape
    block_id = pl.program_id(0)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)

    @pl.when(block_id == 0)
    def _():
        alpha_s[:] = jnp.where(t_ids == 0, 0.0, NEG)
        le_s[:] = jnp.zeros((B, T))
        ls_s[:] = jnp.full((B, T), NEG)

    # Per-column 2-band operators (bulk, chain-free).
    le_prev = le_s[:]
    ls_prev = ls_s[:]
    cols = []
    for j in range(chunk):
        lf = lf_ref[j]
        cols.append([lf + le_prev, lf + _shift_down_k(ls_prev, 1)])
        le_prev = le_ref[j]
        ls_prev = ls_ref[j]

    alpha = alpha_s[:]
    for g in range(chunk // kband):
        base = g * kband
        Ms = cols[base:base + kband]
        # Interior replay (columns base..base+K-2) — off the chain.
        a = alpha
        for j in range(kband - 1):
            a = _lse(Ms[j][0] + a, Ms[j][1] + _shift_down_k(a, 1))
            alpha_out_ref[base + j] = a
        # Composition tree M_{K-1} o ... o M_0 — off the chain.
        P = _tree_compose(list(Ms), _compose_down)
        # Banded apply — the only chain-dependent step (depth U/K overall).
        alpha = _lse(
            *[P[k] + _shift_down_k(alpha, k) for k in range(len(P))]
        )
        alpha_out_ref[base + kband - 1] = alpha
    alpha_s[:] = alpha
    le_s[:] = le_prev
    ls_s[:] = ls_prev


def forward_alphas_pallas_banded(le, ls, lf, *, chunk: int = 16,
                                 kband: int = 2):
    """(U, B, T) -> (U, B, T) alphas; K-banded chain (small-batch fast
    path). U must be a multiple of chunk; chunk a multiple of kband."""
    U, B, T = le.shape
    assert U % chunk == 0 and chunk % kband == 0, (U, chunk, kband)
    grid = (U // chunk,)
    block = pl.BlockSpec(
        (chunk, B, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel_banded, chunk=chunk, kband=kband),
        grid=grid,
        in_specs=[block, block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((U, B, T), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, T), jnp.float32),
            pltpu.VMEM((B, T), jnp.float32),
            pltpu.VMEM((B, T), jnp.float32),
        ],
        interpret=_interpret(),
    )(le, ls, lf)


# ----------------------------------------------------------------- backward

def _bwd_kernel(in_len_ref, out_len_ref, le_ref, ls_ref, lf_ref,
                beta_out_ref, beta_s, lf_s, *, chunk, total_u):
    B, T = beta_s.shape
    nblocks = pl.num_programs(0)
    block_id = pl.program_id(0)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    is_last_t = t_ids == in_len_ref[:] - 1  # (B, T) via broadcast of (B, 1)
    out_len = out_len_ref[:]  # (B, 1)

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
        rec = _logaddexp(le + cont, ls_ref[j] + _shift_up_t(cont))
        init_col = jnp.where(is_last_t, le, NEG)
        beta = jnp.where(base_u + j == out_len - 1, init_col, rec)
        beta_out_ref[j] = beta
        lf_next = lf_ref[j]
    beta_s[:] = beta
    lf_s[:] = lf_next


def backward_betas_pallas(le, ls, lf, input_length, output_length,
                          *, chunk: int = 16):
    """(U, B, T) inputs -> (U, B, T) betas, streaming blocks in reverse."""
    U, B, T = le.shape
    assert U % chunk == 0
    nblocks = U // chunk
    rev = lambda i: (nblocks - 1 - i, 0, 0)
    block_rev = pl.BlockSpec(
        (chunk, B, T), rev, memory_space=pltpu.VMEM
    )
    len_spec = pl.BlockSpec(
        (B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, chunk=chunk, total_u=U),
        grid=(nblocks,),
        in_specs=[len_spec, len_spec, block_rev, block_rev, block_rev],
        out_specs=block_rev,
        out_shape=jax.ShapeDtypeStruct((U, B, T), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, T), jnp.float32),
            pltpu.VMEM((B, T), jnp.float32),
        ],
        interpret=_interpret(),
    )(
        input_length.reshape(B, 1).astype(jnp.int32),
        output_length.reshape(B, 1).astype(jnp.int32),
        le, ls, lf,
    )


# --------------------------------------------- exp-domain (short-chain) fwd
#
# The log-domain column update's dependency chain runs ~45 VPU ops (logaddexp
# expands to max/abs/exp/log1p sequences). In the exponential domain with a
# per-row running normalizer the chain shrinks to ~10 ops:
#
#   q      = p * E_le_prev + shift_t(p * E_ls_prev)     (all non-negative,
#   p_raw  = q * E_lf                                    no cancellation)
#   s      = rowmax(p_raw);  p = p_raw / s;  M += log s
#   alpha  = log(p_raw) + M_prev                         (store; off-chain)
#
# exp(le)/exp(ls)/exp(lf) are loop-independent bulk work the hardware
# overlaps with the chain. Per-row normalization every column keeps p in
# [0, 1]; cells further than ~87 nats below the running row max flush to 0,
# which is far below the ~17-nat horizon at which f32 logaddexp already
# ignores contributions — value- and gradient-equivalent in f32.

_TINY = 1e-30


def _bidir_kernel_exp(in_len_ref, out_len_ref,
                      le_f_ref, ls_f_ref, lf_f_ref,
                      le_b_ref, ls_b_ref, lf_b_ref,
                      alpha_out_ref, beta_out_ref,
                      p_s, m_s, ele_s, els_s,
                      b_s, n_s, elf_s, *, chunk):
    B, T = p_s.shape
    block_id = pl.program_id(0)
    nblocks = pl.num_programs(0)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    first_t = (t_ids == 0).astype(jnp.float32)
    is_last_t = t_ids == in_len_ref[:] - 1
    out_len = out_len_ref[:]

    @pl.when(block_id == 0)
    def _():
        m_s[:] = jnp.zeros((B, 1))
        b_s[:] = jnp.zeros((B, T))
        n_s[:] = jnp.zeros((B, 1))
        elf_s[:] = jnp.zeros((B, T))

    def shift0_down(x):
        rolled = pltpu.roll(x, shift=1, axis=1)
        return jnp.where(t_ids == 0, 0.0, rolled)

    def shift0_up(x):
        rolled = pltpu.roll(x, shift=T - 1, axis=1)
        return jnp.where(t_ids == T - 1, 0.0, rolled)

    p = p_s[:]
    m = m_s[:]
    e_le_prev = ele_s[:]
    e_ls_prev = els_s[:]
    b = b_s[:]
    n = n_s[:]
    e_lf_next = elf_s[:]
    base_u_b = (nblocks - 1 - block_id) * chunk
    for j in range(chunk):
        jb = chunk - 1 - j
        # ---------------- forward column ----------------
        lf = lf_f_ref[j]
        e_lf = jnp.exp(lf)
        q = p * e_le_prev + shift0_down(p * e_ls_prev)
        p_raw = jnp.where((block_id == 0) & (j == 0), first_t, q) * e_lf
        s = jnp.max(p_raw, axis=1, keepdims=True)
        s_safe = jnp.maximum(s, _TINY)
        alpha_out_ref[j] = jnp.log(p_raw) + m
        p = p_raw / s_safe
        m = m + jnp.log(s_safe)
        e_le_prev = jnp.exp(le_f_ref[j])
        e_ls_prev = jnp.exp(ls_f_ref[j])
        # ---------------- backward column ----------------
        le_b = le_b_ref[jb]
        e_le_b = jnp.exp(le_b)
        c = b * e_lf_next
        b_raw = e_le_b * c + jnp.exp(ls_b_ref[jb]) * shift0_up(c)
        is_init = base_u_b + jb == out_len - 1
        b_raw = jnp.where(
            is_init, jnp.where(is_last_t, e_le_b, 0.0), b_raw
        )
        n = jnp.where(is_init, 0.0, n)
        sb = jnp.max(b_raw, axis=1, keepdims=True)
        sb_safe = jnp.maximum(sb, _TINY)
        beta_out_ref[jb] = jnp.log(b_raw) + n
        b = b_raw / sb_safe
        n = n + jnp.log(sb_safe)
        e_lf_next = jnp.exp(lf_b_ref[jb])
    p_s[:] = p
    m_s[:] = m
    ele_s[:] = e_le_prev
    els_s[:] = e_ls_prev
    b_s[:] = b
    n_s[:] = n
    elf_s[:] = e_lf_next


def fused_alphas_betas_pallas_exp(le, ls, lf, input_length, output_length,
                                  *, chunk: int = 16):
    """Exp-domain bidirectional pass: (U, B, T) -> (alphas, betas).

    Stored alphas/betas use -inf (not NEG) for dead cells (log 0)."""
    U, B, T = le.shape
    assert U % chunk == 0
    nblocks = U // chunk
    fwd = pl.BlockSpec(
        (chunk, B, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    bwd = pl.BlockSpec(
        (chunk, B, T), lambda i: (nblocks - 1 - i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    len_spec = pl.BlockSpec(
        (B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_bidir_kernel_exp, chunk=chunk),
        grid=(nblocks,),
        in_specs=[len_spec, len_spec, fwd, fwd, fwd, bwd, bwd, bwd],
        out_specs=(fwd, bwd),
        out_shape=(
            jax.ShapeDtypeStruct((U, B, T), jnp.float32),
            jax.ShapeDtypeStruct((U, B, T), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, T), jnp.float32),  # p
            pltpu.VMEM((B, 1), jnp.float32),  # M
            pltpu.VMEM((B, T), jnp.float32),  # exp(le) prev
            pltpu.VMEM((B, T), jnp.float32),  # exp(ls) prev
            pltpu.VMEM((B, T), jnp.float32),  # beta p
            pltpu.VMEM((B, 1), jnp.float32),  # N
            pltpu.VMEM((B, T), jnp.float32),  # exp(lf) next
        ],
        interpret=_interpret(),
    )(
        input_length.reshape(B, 1).astype(jnp.int32),
        output_length.reshape(B, 1).astype(jnp.int32),
        le, ls, lf, le, ls, lf,
    )


# -------------------------------------------- backward + gradients, fused

def _bwdgrad_kernel(in_len_ref, out_len_ref, gz_ref,
                    le_ref, ls_ref, lf_ref, alpha_ref,
                    d_le_ref, d_ls_ref, d_lf_ref,
                    beta_s, lf_s, *, chunk):
    """Beta recursion with the transition/occupancy posteriors computed in
    the same walk — the separate posterior pass (and the beta HBM write)
    disappear. gz_ref carries per-example (-cotangent, logz) packed as
    (B, 2): column 0 = upstream grad g, column 1 = logz (NEG if degenerate).
    """
    B, T = beta_s.shape
    nblocks = pl.num_programs(0)
    block_id = pl.program_id(0)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    in_len = in_len_ref[:]
    is_last_t = t_ids == in_len - 1
    t_valid = t_ids < in_len
    out_len = out_len_ref[:]
    g = gz_ref[:, 0:1]  # (B, 1)
    logz = gz_ref[:, 1:2]
    degenerate = logz <= NEG / 2
    neg_g = jnp.where(degenerate, 0.0, -g)

    @pl.when(block_id == 0)
    def _():
        beta_s[:] = jnp.full((B, T), NEG)
        lf_s[:] = jnp.full((B, T), NEG)

    beta = beta_s[:]
    lf_next = lf_s[:]
    base_u = (nblocks - 1 - block_id) * chunk
    for j in range(chunk - 1, -1, -1):
        u = base_u + j
        is_last_u = u == out_len - 1  # (B, 1)
        le = _f32(le_ref[j])
        ls = _f32(ls_ref[j])
        alpha = alpha_ref[j]
        cont = lf_next + beta  # lf[u+1] + beta[u+1]
        cont_shift_raw = _shift_up_t(cont)
        # Posterior continuations at column u (mirror _ssnt_loss_bwd).
        cont_emit = jnp.where(
            is_last_u, jnp.where(is_last_t, 0.0, NEG), cont
        )
        cont_shift = jnp.where(is_last_u, NEG, cont_shift_raw)
        valid = t_valid & (u < out_len)
        anorm = alpha - logz

        def post(score):
            return jnp.where(
                valid, jnp.exp(jnp.minimum(score, 30.0)), 0.0
            )

        odt = d_le_ref.dtype
        d_le_ref[j] = (neg_g * post(anorm + le + cont_emit)).astype(odt)
        d_ls_ref[j] = (neg_g * post(anorm + ls + cont_shift)).astype(odt)
        # Beta at u (needed for the occupancy grad and the next column).
        rec = _logaddexp(le + cont, ls + cont_shift_raw)
        init_col = jnp.where(is_last_t, le, NEG)
        beta = jnp.where(is_last_u, init_col, rec)
        d_lf_ref[j] = (neg_g * post(anorm + beta)).astype(odt)
        lf_next = _f32(lf_ref[j])
    beta_s[:] = beta
    lf_s[:] = lf_next


def backward_grads_pallas(le, ls, lf, alphas, input_length, output_length,
                          g, logz, *, chunk: int = 16):
    """(U, B, T) inputs + alphas -> (d_le, d_ls, d_lf) in one reverse pass.

    g: (B,) upstream cotangent of the per-example loss; logz: (B,)."""
    U, B, T = le.shape
    assert U % chunk == 0
    nblocks = U // chunk
    rev = pl.BlockSpec(
        (chunk, B, T), lambda i: (nblocks - 1 - i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    len_spec = pl.BlockSpec(
        (B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    gz_spec = pl.BlockSpec(
        (B, 2), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    gz = jnp.stack([g.astype(jnp.float32), logz.astype(jnp.float32)],
                   axis=1)
    # Grads are stored in the input dtype (bf16 variant: bf16 grads halve
    # the write traffic; posteriors live in [0, 1] where bf16 keeps ~0.4%
    # relative accuracy).
    shape = jax.ShapeDtypeStruct((U, B, T), le.dtype)
    return pl.pallas_call(
        functools.partial(_bwdgrad_kernel, chunk=chunk),
        grid=(nblocks,),
        in_specs=[len_spec, len_spec, gz_spec, rev, rev, rev, rev],
        out_specs=(rev, rev, rev),
        out_shape=(shape, shape, shape),
        scratch_shapes=[
            pltpu.VMEM((B, T), jnp.float32),
            pltpu.VMEM((B, T), jnp.float32),
        ],
        interpret=_interpret(),
    )(
        input_length.reshape(B, 1).astype(jnp.int32),
        output_length.reshape(B, 1).astype(jnp.int32),
        gz, le, ls, lf, alphas,
    )


# --------------------------------- banded backward + gradients (K-band)
#
# Same chain-shortening as the banded forward, for the beta recursion (a
# superdiagonal 2-band operator) with the posteriors computed in the same
# walk. Per-example re-initialization at u == U_b - 1 breaks linearity, so
# inputs are uniformized on load (ops/lattice_scan.py's derivation): for
# u >= U_b the columns become absorbing (le = 0, lf = 0; ls killed from
# u >= U_b - 1), making beta propagate as the identity through the padding;
# one virtual global init beta_{Upad} = onehot(t == T_b - 1) then yields
# exactly beta_{U_b-1} = where(t == T_b-1, le, NEG) for every example.


def _bwdgrad_kernel_banded(in_len_ref, out_len_ref, gz_ref,
                           le_ref, ls_ref, lf_ref, alpha_ref,
                           d_le_ref, d_ls_ref, d_lf_ref,
                           beta_s, lf_s, *, chunk, kband):
    B, T = beta_s.shape
    nblocks = pl.num_programs(0)
    block_id = pl.program_id(0)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    in_len = in_len_ref[:]
    is_last_t = t_ids == in_len - 1
    t_valid = t_ids < in_len
    out_len = out_len_ref[:]  # (B, 1)
    g = gz_ref[:, 0:1]
    logz = gz_ref[:, 1:2]
    degenerate = logz <= NEG / 2
    neg_g = jnp.where(degenerate, 0.0, -g)

    @pl.when(block_id == 0)
    def _():
        beta_s[:] = jnp.where(is_last_t, 0.0, NEG)
        lf_s[:] = jnp.zeros((B, T))

    base_u = (nblocks - 1 - block_id) * chunk

    # Uniformized columns + per-column superdiag ops (bulk, chain-free).
    lf_next = lf_s[:]  # uniformized lf at column base_u + chunk
    leu, lsu, lf_cols = [], [], []
    for j in range(chunk):
        u = base_u + j
        leu.append(jnp.where(u < out_len, le_ref[j], 0.0))
        lsu.append(jnp.where(u < out_len - 1, ls_ref[j], NEG))
        lf_cols.append(jnp.where(u < out_len, lf_ref[j], 0.0))
    # lf at column j+1 (the continuation frame of column j).
    lf_above = lf_cols[1:] + [lf_next]
    diag = [leu[j] + lf_above[j] for j in range(chunk)]
    sup = [lsu[j] + _shift_up_k(lf_above[j], 1) for j in range(chunk)]

    def post(score):
        return jnp.where(
            t_valid, jnp.exp(jnp.minimum(score, 30.0)), 0.0
        )

    def grads_at(j, beta_next, beta_j):
        u = base_u + j
        is_last_u = u == out_len - 1
        # alpha -> NEG where u >= out_len kills invalid-u posteriors.
        alpha = jnp.where(u < out_len, alpha_ref[j] - logz, NEG)
        cont = lf_above[j] + beta_next
        cont_emit = jnp.where(
            is_last_u, jnp.where(is_last_t, 0.0, NEG), cont
        )
        cont_shift = jnp.where(is_last_u, NEG, _shift_up_k(cont, 1))
        d_le_ref[j] = neg_g * post(alpha + leu[j] + cont_emit)
        d_ls_ref[j] = neg_g * post(alpha + ls_ref[j] + cont_shift)
        d_lf_ref[j] = neg_g * post(alpha + beta_j)

    beta = beta_s[:]
    for gidx in range(chunk // kband - 1, -1, -1):
        base = gidx * kband
        Ns = [[diag[base + j], sup[base + j]] for j in range(kband)]
        # Interior replay (columns base+K-1 .. base+1) — off the chain.
        bs = [None] * (kband + 1)
        bs[kband] = beta  # beta at column base + kband
        for j in range(kband - 1, 0, -1):
            bs[j] = _lse(Ns[j][0] + bs[j + 1],
                         Ns[j][1] + _shift_up_k(bs[j + 1], 1))
            grads_at(base + j, bs[j + 1], bs[j])
        # Composition tree N_base o ... o N_{base+K-1} (highest column
        # applied first) — off the chain.
        P = _tree_compose(list(reversed(Ns)), _compose_up)
        # Banded apply — the chain (depth U/K overall).
        beta = _lse(
            *[P[k] + _shift_up_k(beta, k) for k in range(len(P))]
        )
        grads_at(base, bs[1], beta)
    beta_s[:] = beta
    lf_s[:] = lf_cols[0]


def backward_grads_pallas_banded(le, ls, lf, alphas, input_length,
                                 output_length, g, logz, *,
                                 chunk: int = 16, kband: int = 2):
    """(U, B, T) inputs + alphas -> (d_le, d_ls, d_lf); K-banded chain
    (small-batch fast path). Betas never touch HBM."""
    U, B, T = le.shape
    assert U % chunk == 0 and chunk % kband == 0, (U, chunk, kband)
    nblocks = U // chunk
    rev = pl.BlockSpec(
        (chunk, B, T), lambda i: (nblocks - 1 - i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    len_spec = pl.BlockSpec(
        (B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    gz_spec = pl.BlockSpec(
        (B, 2), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    gz = jnp.stack([g.astype(jnp.float32), logz.astype(jnp.float32)],
                   axis=1)
    shape = jax.ShapeDtypeStruct((U, B, T), jnp.float32)
    return pl.pallas_call(
        functools.partial(_bwdgrad_kernel_banded, chunk=chunk, kband=kband),
        grid=(nblocks,),
        in_specs=[len_spec, len_spec, gz_spec, rev, rev, rev, rev],
        out_specs=(rev, rev, rev),
        out_shape=(shape, shape, shape),
        scratch_shapes=[
            pltpu.VMEM((B, T), jnp.float32),
            pltpu.VMEM((B, T), jnp.float32),
        ],
        interpret=_interpret(),
    )(
        input_length.reshape(B, 1).astype(jnp.int32),
        output_length.reshape(B, 1).astype(jnp.int32),
        gz, le, ls, lf, alphas,
    )


# ------------------------------------------------ fused bidirectional pass

def _bidir_kernel(in_len_ref, out_len_ref,
                  le_f_ref, ls_f_ref, lf_f_ref,
                  le_b_ref, ls_b_ref, lf_b_ref,
                  alpha_out_ref, beta_out_ref,
                  alpha_s, le_s, ls_s, beta_s, lf_s, *, chunk):
    """Alpha (forward) and beta (backward) are independent recurrences; one
    kernel walks both directions per grid step (the *_f refs index block i,
    the *_b refs block nblocks-1-i). Interleaving the two dependent chains
    lets them pipeline through the VPU concurrently, roughly halving the
    latency-bound fwd+bwd wall time at small batch."""
    B, T = alpha_s.shape
    block_id = pl.program_id(0)
    nblocks = pl.num_programs(0)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    is_last_t = t_ids == in_len_ref[:] - 1
    out_len = out_len_ref[:]

    @pl.when(block_id == 0)
    def _():
        beta_s[:] = jnp.full((B, T), NEG)
        lf_s[:] = jnp.full((B, T), NEG)

    alpha = alpha_s[:]
    le_prev = le_s[:]
    ls_prev = ls_s[:]
    beta = beta_s[:]
    lf_next = lf_s[:]
    base_u_b = (nblocks - 1 - block_id) * chunk
    for j in range(chunk):
        jb = chunk - 1 - j
        # --- forward column (block i, column j) ---
        lf_f = lf_f_ref[j]
        stay = alpha + le_prev
        moved = _shift_down_t(alpha + ls_prev)
        rec_a = lf_f + _logaddexp(stay, moved)
        init_a = jnp.where(t_ids == 0, lf_f, NEG)
        alpha = jnp.where((block_id == 0) & (j == 0), init_a, rec_a)
        alpha_out_ref[j] = alpha
        le_prev = le_f_ref[j]
        ls_prev = ls_f_ref[j]
        # --- backward column (block nblocks-1-i, column jb) ---
        le_b = le_b_ref[jb]
        cont = lf_next + beta
        rec_b = _logaddexp(le_b + cont, ls_b_ref[jb] + _shift_up_t(cont))
        init_b = jnp.where(is_last_t, le_b, NEG)
        beta = jnp.where(base_u_b + jb == out_len - 1, init_b, rec_b)
        beta_out_ref[jb] = beta
        lf_next = lf_b_ref[jb]
    alpha_s[:] = alpha
    le_s[:] = le_prev
    ls_s[:] = ls_prev
    beta_s[:] = beta
    lf_s[:] = lf_next


def fused_alphas_betas_pallas(le, ls, lf, input_length, output_length,
                              *, chunk: int = 16):
    """(U, B, T) inputs -> (alphas, betas), one bidirectional kernel pass."""
    U, B, T = le.shape
    assert U % chunk == 0
    nblocks = U // chunk
    fwd = pl.BlockSpec(
        (chunk, B, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    bwd = pl.BlockSpec(
        (chunk, B, T), lambda i: (nblocks - 1 - i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    len_spec = pl.BlockSpec(
        (B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_bidir_kernel, chunk=chunk),
        grid=(nblocks,),
        in_specs=[len_spec, len_spec, fwd, fwd, fwd, bwd, bwd, bwd],
        out_specs=(fwd, bwd),
        out_shape=(
            jax.ShapeDtypeStruct((U, B, T), jnp.float32),
            jax.ShapeDtypeStruct((U, B, T), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, T), jnp.float32),
            pltpu.VMEM((B, T), jnp.float32),
            pltpu.VMEM((B, T), jnp.float32),
            pltpu.VMEM((B, T), jnp.float32),
            pltpu.VMEM((B, T), jnp.float32),
        ],
        interpret=_interpret(),
    )(
        input_length.reshape(B, 1).astype(jnp.int32),
        output_length.reshape(B, 1).astype(jnp.int32),
        le, ls, lf, le, ls, lf,
    )


# ------------------------------------- packed fused bidirectional kernel
#
# The (B, T) column of the headline shape (B=32, T=80) occupies 4
# lane-padded f32 VREG rows of which 37.5% are dead lanes (T=80 of 128).
# Since the bidirectional kernel is VPU-ISSUE-bound (measured: wall time
# is flat in chunk size and ~2x the pure-bytes time; scripts/probe_r4b.py),
# dead lanes are directly wasted wall-clock. This variant flattens each
# column to (B*T,) laid out as (B*T/128, 128) — for 32x80 that is (20, 128),
# 2.5 data VREG-rows padded to 3, a 25% issue cut. The t-shifts become a
# global flat shift by one with (a) a row-carry lane (two pltpu.rolls + one
# select) and (b) a precomputed t==0 / t==T-1 boundary mask, since
# flat = b*T + t makes t+-1 adjacent except at example boundaries.
#
# Two more op-golf changes vs _bidir_kernel (both bit-exact):
#   - forward init by virtual carry (alpha_{-1} = onehot(t==0) with
#     le_prev = 0, ls_prev = NEG) instead of a per-column select — NEG
#     arithmetic makes the uniform recursion reproduce
#     where(t == 0, lf_0, NEG) exactly (same trick as the banded kernels);
#   - logaddexp via (max, min): m + log1p(exp(n - m)) with n = min — one
#     VPU op fewer than the abs/negate form, and n - m == -|a - b| exactly.
#
# Per-example ragged masks arrive as packed (rows, 128) i32 inputs
# (precomputed once per call in XLA — in_len/out_len vary per b, and an
# in-kernel gather of lengths by b = flat // T would lower poorly).


def _pack_shape(B: int, T: int):
    n = B * T
    if n % 128:
        return None
    return n // 128


def _packed_consts(B, T, input_length, output_length):
    """Packed (rows, 128) i32 helper arrays for the packed kernel."""
    rows = _pack_shape(B, T)
    p = jnp.arange(rows * 128, dtype=jnp.int32)
    t_ids = (p % T).reshape(rows, 128)
    b_ids = (p // T).reshape(rows, 128)
    in_len = jnp.asarray(input_length, jnp.int32)[b_ids]  # (rows, 128)
    out_len = jnp.asarray(output_length, jnp.int32)[b_ids]
    is_last_t = (t_ids == in_len - 1).astype(jnp.int32)
    return t_ids, is_last_t, out_len


def _bidir_kernel_packed(tid_ref, last_t_ref, ol_ref,
                         le_f_ref, ls_f_ref, lf_f_ref,
                         le_b_ref, ls_b_ref, lf_b_ref,
                         alpha_out_ref, beta_out_ref,
                         alpha_s, le_s, ls_s, beta_s, lf_s, *,
                         chunk, t_cols):
    """_bidir_kernel on packed (rows, 128) columns. tid_ref: i32 global t
    id per flat position; last_t_ref: i32 mask of t == in_len-1; ol_ref:
    i32 per-cell output_length. t_cols = T (static): the flat period."""
    R = alpha_s.shape[0]
    block_id = pl.program_id(0)
    nblocks = pl.num_programs(0)
    t0 = tid_ref[:] == 0
    tlast = tid_ref[:] == t_cols - 1
    is_last_t = last_t_ref[:] == 1
    out_len = ol_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    lane0 = lane == 0
    lane127 = lane == 127

    def shift_down(x):
        """flat p -> p-1 (t-1); t == 0 gets NEG. Full-tensor row roll: a
        narrowed (R, 1) carry column measured 1.6x SLOWER (the (R, 1)
        broadcast inside the select relayouts; lane/sublane rolls of the
        full tile are cheap) — scripts/probe_pack.py."""
        xr = pltpu.roll(x, 1, axis=0)  # rows down: [r] <- [r-1]
        base = jnp.where(lane127, xr, x)
        rolled = pltpu.roll(base, 1, axis=1)
        return jnp.where(t0, NEG, rolled)

    def shift_up(x):
        """flat p -> p+1 (t+1); t == T-1 gets NEG."""
        xr = pltpu.roll(x, R - 1, axis=0)  # rows up: [r] <- [r+1]
        base = jnp.where(lane0, xr, x)
        rolled = pltpu.roll(base, 127, axis=1)
        return jnp.where(tlast, NEG, rolled)

    def lae(a, b):
        m = jnp.maximum(a, b)
        n = jnp.minimum(a, b)
        return m + jnp.log1p(jnp.exp(n - m))

    @pl.when(block_id == 0)
    def _():
        # Virtual forward carry (see block comment): alpha_{-1} = onehot,
        # le_prev = 0, ls_prev = NEG reproduce the u = 0 init exactly.
        alpha_s[:] = jnp.where(t0, 0.0, NEG)
        le_s[:] = jnp.zeros((R, 128))
        ls_s[:] = jnp.full((R, 128), NEG)
        beta_s[:] = jnp.full((R, 128), NEG)
        lf_s[:] = jnp.full((R, 128), NEG)

    alpha = alpha_s[:]
    le_prev = le_s[:]
    ls_prev = ls_s[:]
    beta = beta_s[:]
    lf_next = lf_s[:]
    base_u_b = (nblocks - 1 - block_id) * chunk
    for j in range(chunk):
        jb = chunk - 1 - j
        # --- forward column ---
        stay = alpha + le_prev
        moved = shift_down(alpha + ls_prev)
        alpha = lf_f_ref[j] + lae(stay, moved)
        alpha_out_ref[j] = alpha
        le_prev = le_f_ref[j]
        ls_prev = ls_f_ref[j]
        # --- backward column ---
        le_b = le_b_ref[jb]
        cont = lf_next + beta
        rec_b = lae(le_b + cont, ls_b_ref[jb] + shift_up(cont))
        init_b = jnp.where(is_last_t, le_b, NEG)
        beta = jnp.where(base_u_b + jb == out_len - 1, init_b, rec_b)
        beta_out_ref[jb] = beta
        lf_next = lf_b_ref[jb]
    alpha_s[:] = alpha
    le_s[:] = le_prev
    ls_s[:] = ls_prev
    beta_s[:] = beta
    lf_s[:] = lf_next


def fused_alphas_betas_pallas_packed(le, ls, lf, input_length,
                                     output_length, *, chunk: int = 16):
    """(U, B, T) inputs -> (alphas, betas), packed-lane bidirectional pass.

    Requires (B*T) % 128 == 0 (callers dispatch; reshapes are free
    bitcasts). Bit-exact vs fused_alphas_betas_pallas."""
    U, B, T = le.shape
    rows = _pack_shape(B, T)
    assert rows is not None and U % chunk == 0
    nblocks = U // chunk
    t_ids, is_last_t, out_len = _packed_consts(
        B, T, input_length, output_length
    )
    pk = lambda x: x.reshape(U, rows, 128)
    fwd = pl.BlockSpec(
        (chunk, rows, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    bwd = pl.BlockSpec(
        (chunk, rows, 128), lambda i: (nblocks - 1 - i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    const = pl.BlockSpec(
        (rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    lep, lsp, lfp = pk(le), pk(ls), pk(lf)
    alphas, betas = pl.pallas_call(
        functools.partial(
            _bidir_kernel_packed, chunk=chunk, t_cols=T
        ),
        grid=(nblocks,),
        in_specs=[const] * 3 + [fwd, fwd, fwd, bwd, bwd, bwd],
        out_specs=(fwd, bwd),
        out_shape=(
            jax.ShapeDtypeStruct((U, rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((U, rows, 128), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)] * 5,
        interpret=_interpret(),
    )(
        t_ids, is_last_t, out_len,
        lep, lsp, lfp, lep, lsp, lfp,
    )
    return alphas.reshape(U, B, T), betas.reshape(U, B, T)


# ------------------------------------------------------------- public loss

def _pad_u(x, chunk):
    U = x.shape[0]
    pad = (-U) % chunk
    if pad:
        x = jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], NEG, x.dtype)], axis=0
        )
    return x


def _t_pad(T: int) -> int:
    return ((T + 127) // 128) * 128


def _auto_chunk(B: int, T: int, requested: int, streams: int = 8) -> int:
    """Cap the U-chunk so `streams` double-buffered (chunk, B, Tpad) blocks
    fit VMEM (~16 MB; keep under ~12)."""
    block_budget = (12 * 1024 * 1024) // (2 * streams)
    cap = max(1, block_budget // (B * _t_pad(T) * 4))
    chunk = min(requested, cap)
    # Power-of-two-ish chunk keeps padding small.
    for c in (16, 8, 4, 2, 1):
        if c <= chunk:
            return c
    return 1


# Below this many (B x padded-T) elements per column the kernels are
# dependency-chain latency-bound and the FUSED bidirectional kernel wins:
# interleaving the independent alpha and beta chains fills each other's
# issue stalls (measured v5e, B=32xT=80xU=400 fwd+bwd: fused 140 us vs
# plain two-pass 208 us vs banded2 317 us — scripts/probe_r4.py after the
# round-2 probe bug was fixed; round 2 shipped banded on corrupted data).
# Banding LOSES despite the shorter chain: the composition bulk lands on
# the in-order issue stream (probe_banded_k.py: K=4/8/16 monotonically
# worse), so the VPU here is issue-bound with stall slack that only an
# independent second chain can fill, not intra-chain restructuring.
# Above the threshold the chains are throughput-fed and the plain
# two-pass path (minimal 44 B/cell HBM traffic) is optimal.
_FUSED_MAX_COLUMN_ELEMS = 8192

# K used when a banded variant is forced without a suffix (the banded
# kernels are kept as conformance-tested probes of the composition
# approach; the auto dispatch never picks them — see above).
_AUTO_BANDED_K = 2


def _small_column(B: int, T: int) -> bool:
    return B * _t_pad(T) <= _FUSED_MAX_COLUMN_ELEMS


def _forward_dispatch(le, ls, lf, input_length, chunk, kband):
    """kband=0: plain column walk; kband>=2: K-banded chain."""
    U, B, T = le.shape
    if kband:
        c = _auto_chunk(B, T, chunk, streams=4)
        c = max(c, kband)
        return forward_alphas_pallas_banded(
            _pad_u(le, c), _pad_u(ls, c), _pad_u(lf, c), chunk=c,
            kband=kband,
        )[:U]
    c = _auto_chunk(B, T, chunk, streams=4)
    return forward_alphas_pallas(
        _pad_u(le, c), _pad_u(ls, c), _pad_u(lf, c), input_length,
        chunk=c,
    )[:U]


def _loss_fwd_impl(le, ls, lf, input_length, output_length, chunk, variant):
    """No-grad primal. Uses the same kernel family as the grad path for the
    given variant (forced variants apply here too, so primal-only values
    bit-match the values seen under grad — f32 reassociation differs between
    the banded/plain/exp walks)."""
    U, B, T = le.shape
    mode, kband = _grad_mode(variant, B, T)
    if mode == "exp":
        c = _auto_chunk(B, T, chunk, streams=8)
        alphas, _ = fused_alphas_betas_pallas_exp(
            _pad_u(le, c), _pad_u(ls, c), _pad_u(lf, c),
            input_length, output_length, chunk=c,
        )
        alphas = alphas[:U]
    else:
        # "fused" alphas come from the identical log-domain column walk as
        # "plain" (same op order), so the plain forward kernel is value-exact
        # for it and skips the wasted beta half.
        alphas = _forward_dispatch(le, ls, lf, input_length, chunk,
                                   kband=kband)
    logz = _gather_logz(alphas, le, input_length, output_length)
    return logz, (le, ls, lf, alphas)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _core(le, ls, lf, input_length, output_length, chunk, variant):
    """Time-major core: (U, B, T) inputs, (U, B, T) grads. Layout
    adaptation lives in the caller (its cotangent transposes come from the
    caller-level jnp.transpose VJP), so ubt callers pay no transposes."""
    logz, _ = _loss_fwd_impl(
        le, ls, lf, input_length, output_length, chunk, variant
    )
    return -logz


def _grad_mode(variant: str, B: int, T: int):
    """Deterministic grad-path choice, recomputed identically in fwd and
    bwd (variant is a nondiff arg; shapes are static). Returns
    (mode, kband) where kband is only meaningful for mode="banded".

    auto/log: fused bidirectional kernel + XLA posterior pass (64 B/cell)
    when latency/issue-bound (small columns) — PACKED-LANE
    ("fusedpack", B*T flattened to (rows, 128) when it packs with >= 8
    rows; a measured 17% issue cut over the lane-padded layout) or the
    unpacked "fused" kernel otherwise; plain two-pass (minimal 44 B/cell
    HBM traffic) when throughput-bound.
    banded / bandedN: force the K-banded path (N in {2,4,8,16};
    bare "banded" uses _AUTO_BANDED_K). Measured slower than both auto
    paths on v5e (see _FUSED_MAX_COLUMN_ELEMS note); kept as
    conformance-tested probes.
    fused/fusedpack/exp/plain: force those paths."""
    if variant == "bf16":
        # Same plain two-pass kernels; the bf16 storage rides on the input
        # arrays' dtype (kernels upcast on load, grads store in kind).
        return "plain", 0
    if variant in ("fused", "fusedpack", "exp", "plain"):
        return variant, 0
    if variant.startswith("banded"):
        k = int(variant[len("banded"):] or _AUTO_BANDED_K)
        assert k >= 2 and (k & (k - 1)) == 0, variant
        return "banded", k
    if _small_column(B, T):
        rows = _pack_shape(B, T)
        if rows is not None and rows >= 8:
            # Issue-bound regime with dead lanes (T not a multiple of
            # 128): the packed kernel trades them for a 2-roll shift.
            return "fusedpack", 0
        return "fused", 0
    return "plain", 0


def _core_fwd(le, ls, lf, input_length, output_length, chunk, variant):
    U, B, T = le.shape
    mode, kband = _grad_mode(variant, B, T)
    if mode in ("fused", "fusedpack", "exp"):
        c = _auto_chunk(B, T, chunk, streams=8)
        fused = {
            "exp": fused_alphas_betas_pallas_exp,
            "fused": fused_alphas_betas_pallas,
            "fusedpack": fused_alphas_betas_pallas_packed,
        }[mode]
        alphas, betas = fused(
            _pad_u(le, c), _pad_u(ls, c), _pad_u(lf, c),
            input_length, output_length, chunk=c,
        )
        alphas, betas = alphas[:U], betas[:U]
    else:
        alphas = _forward_dispatch(le, ls, lf, input_length, chunk,
                                   kband=kband)
        betas = None  # computed in the bwd pass (fused with the grads)
    logz = _gather_logz(alphas, le, input_length, output_length)
    return -logz, (
        le, ls, lf, alphas, betas, logz, input_length, output_length
    )


def _core_bwd(chunk, variant, res, g):
    le, ls, lf, alphas, betas, logz, input_length, output_length = res
    U, B, T = le.shape
    if betas is None:
        # Two-pass regime: one reverse pass computing the gradients directly
        # (betas never touch HBM, no separate posterior pass).
        mode, kband = _grad_mode(variant, B, T)
        if mode == "banded":
            c = max(_auto_chunk(B, T, chunk, streams=7), kband)
            bwd = functools.partial(
                backward_grads_pallas_banded, kband=kband
            )
        else:
            c = _auto_chunk(B, T, chunk, streams=7)
            bwd = backward_grads_pallas
        d = bwd(
            _pad_u(le, c), _pad_u(ls, c), _pad_u(lf, c),
            _pad_u(alphas, c), input_length, output_length, g, logz,
            chunk=c,
        )
        d_le, d_ls, d_lf = (x[:U] for x in d)
        return d_le, d_ls, d_lf, None, None

    # Posterior math identical to ops.lattice._ssnt_loss_bwd; XLA fuses these
    # elementwise passes over the Pallas-produced alpha/beta.
    u_idx = jnp.arange(U)[:, None, None]
    t_idx = jnp.arange(T)[None, None, :]
    in_len = input_length[None, :, None]
    out_len = output_length[None, :, None]
    valid = (t_idx < in_len) & (u_idx < out_len)
    is_last_u = u_idx == out_len - 1
    is_last_t = t_idx == in_len - 1

    lf_beta = lf + betas
    lf_beta_next_u = jnp.concatenate(
        [lf_beta[1:], jnp.full((1, B, T), NEG)], axis=0
    )
    cont_emit = jnp.where(
        is_last_u, jnp.where(is_last_t, 0.0, NEG), lf_beta_next_u
    )
    shifted = jnp.concatenate(
        [lf_beta_next_u[:, :, 1:], jnp.full((U, B, 1), NEG)], axis=2
    )
    cont_shift = jnp.where(is_last_u, NEG, shifted)

    logz_b = logz[None, :, None]
    degenerate = logz_b <= NEG / 2

    def post(score):
        s = jnp.minimum(score - logz_b, 30.0)
        return jnp.where(valid & ~degenerate, jnp.exp(s), 0.0)

    gB = g[None, :, None]
    d_le = -post(alphas + le + cont_emit) * gB
    d_ls = -post(alphas + ls + cont_shift) * gB
    d_lf = -post(alphas + betas) * gB
    return d_le, d_ls, d_lf, None, None


_core.defvjp(_core_fwd, _core_bwd)


def ssnt_loss_pallas(log_emit, log_shift, log_frame=None, input_length=None,
                     output_length=None, *, chunk: int = 16,
                     variant: str = "log", layout: str = "btu"):
    """Drop-in Pallas-accelerated ssnt_loss (same semantics/gradients as
    ops.lattice.ssnt_loss).

    variant="log" (default): auto-dispatch — the fused bidirectional
    log-domain kernel + XLA posterior pass (64 B/cell; the two interleaved
    chains hide each other's issue stalls) for issue-bound small columns,
    in its PACKED-LANE form when B*T flattens to >= 8 rows of 128 lanes
    (fused_alphas_betas_pallas_packed — bit-exact, converts the T->128
    lane padding into real work); plain column-walk two-pass kernels
    (44 B/cell: fwd reads 12B writes alpha 4B; the reverse pass reads
    16B and writes the 3 grads 12B, betas never in HBM) for
    throughput-bound large ones.
    variant="banded"/"bandedN" (N in 2/4/8/16) / "plain" / "fused": force
    one of those paths (banded = U/K-depth composed chains; measured
    slower than both auto paths on v5e, kept as tested probes).
    variant="exp": exp-domain short-chain fused kernels — ~equal values
    to f32 logaddexp (cells >87 nats below the running max flush to exactly
    0 instead of staying at huge-negative logs; both are below f32
    logaddexp's ~17-nat contribution horizon, so losses and gradients agree
    to f32 accuracy).
    variant="scan": pure-XLA blocked parallel scan (ops/lattice_scan.py,
    depth U/K + K) — the non-Pallas latency-breaking alternative, kept
    dispatchable so bench/probes can compare it on hardware.
    variant="bf16": plain two-pass with le/ls/lf AND the returned grads
    stored bf16 in HBM (f32 compute in VMEM, f32 alphas) — 26 B/cell vs
    44, the far-past-f32-roofline path for the throughput-bound regime;
    loss/grads agree with f32 to ~1% relative (mixed-precision contract).

    layout="btu": (B, T, U) reference-op layout (transposed to the kernels'
    time-major layout, 6 extra full-lattice HBM passes per fwd+bwd).
    layout="ubt": time-major (U, B, T) inputs consumed (and grads returned)
    directly — the framework-native layout the model's joints emit.
    """
    # bf16 variant: halved lattice HBM traffic — le/ls/lf stored bf16
    # (kernels compute f32 in VMEM; alphas stay f32; grads return bf16 and
    # the cast VJP restores the caller's dtype when it differs). With
    # ModelConfig.lattice_dtype="bfloat16" the producing joints emit bf16
    # directly, so no cast exists anywhere on the path. Accuracy: log-prob
    # inputs carry ~2^-8 relative noise that accumulates ~sqrt(U) along
    # paths — loss/grads agree with f32 to ~1e-2 relative
    # (tests/test_lattice_pallas.py sets the contract), the standard
    # mixed-precision training trade.
    store_dtype = jnp.bfloat16 if variant == "bf16" else jnp.float32
    args = _canonicalize(log_emit, log_shift, log_frame, input_length,
                         output_length, layout, dtype=store_dtype)
    if layout == "btu":
        args = (
            jnp.transpose(args[0], (2, 0, 1)),
            jnp.transpose(args[1], (2, 0, 1)),
            jnp.transpose(args[2], (2, 0, 1)),
        ) + args[3:]
    if variant == "scan":
        from ssnt_tts_tpu.ops import lattice_scan

        return lattice_scan.ssnt_loss_scan(*args[:5], layout="ubt")
    return _core(*args, chunk, variant)


# ------------------------------------------- exp-native loss ("expin")
#
# The log-API kernels are VPU-issue-bound at small batch, and ~55% of the
# issue slots are the per-cell exp/log1p pairs of logaddexp
# (docs/LATTICE_FLOOR.md). Those transcendentals exist ONLY because the
# interface carries log-probs: the model's joints compute the transition
# probabilities E = exp(log_emit), S = exp(log_shift) natively (softmax),
# and the frame likelihood factors as exp(lf) = F * exp(mcol) with
# F = exp(lf - max_t lf) in (0, 1] and a per-(u, b) scalar mcol. With
# inputs in that form the whole forward-backward runs multiply-add:
#
#   q_u   = p * E_{u-1} + shift_t(p * S_{u-1});  s = rowmax(q)
#   qn_u  = q / s;  p = qn_u * F_u;   M_u = M_{u-1} + log s + mcol_u
#   alpha = log(qn_u * F_u) + M_u                      (never materialized)
#
# (mirrored for beta), with per-cell state all in [0, 1] (q <= 1 because
# p <= max F <= 1 and E + S = 1), per-column scalar normalizers, and NO
# per-cell transcendentals anywhere — the only exps/logs touch (B, 1)
# scalars. The posteriors are then PRODUCTS of stored fields times
# per-column scalar exponentials, and the grads returned are wrt the
# exp-domain inputs themselves:
#
#   dE[t,u] = -g * qn_u F_u * cont_emit(u)      * scale_a(u)
#   dS[t,u] = -g * qn_u F_u * shift^-1(cont)(u) * scale_a(u)
#   dF[t,u] = -g * qn_u bn_u * exp(M_u + N_u - logz)   (no division: the
#             F factor of the occupancy posterior cancels analytically)
#   dmcol[u] = -g * [u < out_len]   (occupancy sums to 1 per live column)
#
# Numerics: identical flush-to-zero horizon as variant="exp" (cells more
# than ~87 nats below the running column max flush to exactly 0, far
# below f32 logaddexp's ~17-nat contribution horizon); equality vs the
# log path is asserted to f32 accuracy in tests/test_lattice_pallas.py.


def _bidir_kernel_expin(in_len_ref, out_len_ref,
                        E_f_ref, S_f_ref, F_f_ref, mc_f_ref,
                        E_b_ref, S_b_ref, F_b_ref, mc_b_ref,
                        qn_out_ref, bn_out_ref, M_out_ref, N_out_ref,
                        p_s, m_s, eprev_s, sprev_s,
                        c_s, n_s, *, chunk):
    B, T = p_s.shape
    block_id = pl.program_id(0)
    nblocks = pl.num_programs(0)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    first_t = (t_ids == 0).astype(jnp.float32)
    is_last_t = t_ids == in_len_ref[:] - 1
    out_len = out_len_ref[:]  # (B, 1)

    @pl.when(block_id == 0)
    def _():
        # Forward virtual carry: p = onehot(t==0) with E_prev = 1,
        # S_prev = 0 makes q_0 = onehot(t==0) -> alpha_0 = lf_0 at t=0.
        p_s[:] = first_t
        m_s[:] = jnp.zeros((B, 1))
        eprev_s[:] = jnp.ones((B, T))
        sprev_s[:] = jnp.zeros((B, T))
        c_s[:] = jnp.zeros((B, T))
        n_s[:] = jnp.zeros((B, 1))

    def shift0_down(x):
        rolled = pltpu.roll(x, shift=1, axis=1)
        return jnp.where(t_ids == 0, 0.0, rolled)

    def shift0_up(x):
        rolled = pltpu.roll(x, shift=T - 1, axis=1)
        return jnp.where(t_ids == T - 1, 0.0, rolled)

    p = p_s[:]
    m = m_s[:]
    e_prev = eprev_s[:]
    s_prev = sprev_s[:]
    c = c_s[:]
    n = n_s[:]
    base_u_b = (nblocks - 1 - block_id) * chunk
    # Renormalize every RENORM-th processed column only: Mosaic's
    # cross-lane rowmax dominates a per-column schedule (measured 162 us
    # kernel vs ~30 us of multiply-adds). Between renorms the fields can
    # only DECAY (q and b_raw are convex combinations scaled by F <= 1),
    # so correctness needs no per-column scaling — only underflow safety
    # bounds the gap: a group flushes paths whose mass falls ~38 decades
    # below f32 normal within RENORM columns, i.e. a sustained best-path
    # frame log-likelihood drop of > ~20 nats per column, far outside
    # the flush-to-zero contract the exp variants already carry.
    renorm = 4
    for j in range(chunk):
        jb = chunk - 1 - j
        do_norm = (j + 1) % renorm == 0
        # ---------------- forward column ----------------
        q = p * e_prev + shift0_down(p * s_prev)
        if do_norm:
            s = jnp.maximum(jnp.max(q, axis=1, keepdims=True), _TINY)
            qn = q * pl.reciprocal(s, approx=False)
            m = m + jnp.log(s)
        else:
            qn = q
        qn_out_ref[j] = qn
        m = m + mc_f_ref[j][:, None]
        M_out_ref[j] = m[:, 0]
        p = qn * F_f_ref[j]
        e_prev = E_f_ref[j]
        s_prev = S_f_ref[j]
        # ---------------- backward column ----------------
        u_b = base_u_b + jb
        is_init = u_b == out_len - 1  # (B, 1)
        E_b = E_b_ref[jb]
        b_raw = E_b * c + S_b_ref[jb] * shift0_up(c)
        b_raw = jnp.where(
            is_init, jnp.where(is_last_t, E_b, 0.0), b_raw
        )
        # c carried = F[u+1] * bn[u+1]; scalar part = mcol[u+1] + N[u+1],
        # zeroed at init (beta_init = log E exactly).
        n = jnp.where(is_init, 0.0, n)
        if do_norm:
            sb = jnp.maximum(
                jnp.max(b_raw, axis=1, keepdims=True), _TINY
            )
            bn = b_raw * pl.reciprocal(sb, approx=False)
            n = n + jnp.log(sb)
        else:
            bn = b_raw
        bn_out_ref[jb] = bn
        N_out_ref[jb] = n[:, 0]
        c = F_b_ref[jb] * bn
        n = n + mc_b_ref[jb][:, None]  # feeds column u_b - 1
    p_s[:] = p
    m_s[:] = m
    eprev_s[:] = e_prev
    sprev_s[:] = s_prev
    c_s[:] = c
    n_s[:] = n


def fused_expin_pallas(E, S, F, mcol, input_length, output_length,
                       *, chunk: int = 16):
    """(U, B, T) prob-domain inputs -> (qn, bn (U, B, T), M, N (U, B)).

    alpha[u] = log(qn[u] * F[u]) + M[u]; beta[u] = log(bn[u]) + N[u]."""
    U, B, T = E.shape
    assert U % chunk == 0
    nblocks = U // chunk
    fwd = pl.BlockSpec(
        (chunk, B, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    bwd = pl.BlockSpec(
        (chunk, B, T), lambda i: (nblocks - 1 - i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    fwd2 = pl.BlockSpec(
        (chunk, B), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    bwd2 = pl.BlockSpec(
        (chunk, B), lambda i: (nblocks - 1 - i, 0),
        memory_space=pltpu.VMEM,
    )
    len_spec = pl.BlockSpec(
        (B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_bidir_kernel_expin, chunk=chunk),
        grid=(nblocks,),
        in_specs=[len_spec, len_spec,
                  fwd, fwd, fwd, fwd2, bwd, bwd, bwd, bwd2],
        out_specs=(fwd, bwd, fwd2, bwd2),
        out_shape=(
            jax.ShapeDtypeStruct((U, B, T), jnp.float32),
            jax.ShapeDtypeStruct((U, B, T), jnp.float32),
            jax.ShapeDtypeStruct((U, B), jnp.float32),
            jax.ShapeDtypeStruct((U, B), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, T), jnp.float32),  # p
            pltpu.VMEM((B, 1), jnp.float32),  # M carry
            pltpu.VMEM((B, T), jnp.float32),  # E_prev
            pltpu.VMEM((B, T), jnp.float32),  # S_prev
            pltpu.VMEM((B, T), jnp.float32),  # c = F*bn next
            pltpu.VMEM((B, 1), jnp.float32),  # N carry
        ],
        interpret=_interpret(),
    )(
        input_length.reshape(B, 1).astype(jnp.int32),
        output_length.reshape(B, 1).astype(jnp.int32),
        E, S, F, mcol, E, S, F, mcol,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _expin_core(E, S, F, mcol, input_length, output_length, chunk):
    loss, _ = _expin_fwd(E, S, F, mcol, input_length, output_length, chunk)
    return loss


def _expin_fwd(E, S, F, mcol, input_length, output_length, chunk):
    U, B, T = E.shape
    c = _auto_chunk(B, T, chunk, streams=10)
    pad = (-U) % c
    if pad:
        zf = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
        )
        Ep, Sp, Fp, mcp = zf(E), zf(S), zf(F), zf(mcol)
    else:
        Ep, Sp, Fp, mcp = E, S, F, mcol
    qn, bn, M, N = fused_expin_pallas(
        Ep, Sp, Fp, mcp, input_length, output_length, chunk=c
    )
    qn, bn, M, N = qn[:U], bn[:U], M[:U], N[:U]
    # logz = alpha[u_last, t_last] + le[u_last, t_last]
    #      = log(qn * F * E at the final cell) + M[u_last]
    b_idx = jnp.arange(B)
    u_last = jnp.clip(output_length - 1, 0, U - 1)
    t_last = jnp.clip(input_length - 1, 0, T - 1)
    cell = (
        qn[u_last, b_idx, t_last]
        * F[u_last, b_idx, t_last]
        * E[u_last, b_idx, t_last]
    )
    logz = jnp.where(
        cell > 0.0, jnp.log(jnp.maximum(cell, _TINY)) + M[u_last, b_idx],
        NEG,
    )
    res = (E, S, F, mcol, qn, bn, M, N, logz, input_length,
           output_length)
    return -logz, res


def _expin_bwd(chunk, res, g):
    (E, S, F, mcol, qn, bn, M, N, logz, input_length,
     output_length) = res
    U, B, T = E.shape
    u_idx = jnp.arange(U)[:, None, None]
    t_idx = jnp.arange(T)[None, None, :]
    in_len = input_length[None, :, None]
    out_len = output_length[None, :, None]
    valid = (t_idx < in_len) & (u_idx < out_len)
    is_last_u = u_idx == out_len - 1
    is_last_t = t_idx == in_len - 1

    logz2 = logz[None, :]  # (1, B) vs (U, B) scalars
    degenerate = logz[None, :, None] <= NEG / 2
    gB = jnp.where(degenerate | ~valid, 0.0, -g[None, :, None])

    def scal(x):  # (U, B) clipped scalar exponential -> (U, B, 1)
        return jnp.exp(jnp.minimum(x - logz2, 30.0))[:, :, None]

    # Continuation pieces at u+1: vector c = F * bn, scalar mcol + N.
    c_vec = F * bn
    c_next = jnp.concatenate([c_vec[1:], jnp.zeros((1, B, T))], axis=0)
    cs_next = jnp.concatenate([(mcol + N)[1:], jnp.full((1, B), NEG)],
                              axis=0)
    scale_c = scal(M + cs_next)     # emit/shift continuation scale
    scale_t = scal(M)               # terminal-emit scale
    scale_f = scal(M + N)           # occupancy scale

    qnF = qn * F
    d_E = gB * jnp.where(
        is_last_u,
        qnF * is_last_t.astype(jnp.float32) * scale_t,
        qnF * c_next * scale_c,
    )
    shifted_c = jnp.concatenate(
        [c_next[:, :, 1:], jnp.zeros((U, B, 1))], axis=2
    )
    d_S = gB * jnp.where(is_last_u, 0.0, qnF * shifted_c * scale_c)
    # Occupancy: post_lf = qn*F*bn*scale_f; the F factor cancels in d/dF.
    d_F = gB * qn * bn * scale_f
    # d/dmcol[u, b] = sum_t d/dlf = sum_t signed post_lf.
    d_mcol = jnp.sum(d_F * F, axis=2)  # (U, B)
    return d_E, d_S, d_F, d_mcol, None, None


_expin_core.defvjp(_expin_fwd, _expin_bwd)


def ssnt_loss_expin(E, S, F, mcol, input_length=None, output_length=None,
                    *, chunk: int = 16):
    """SSNT NLL on exp-native (probability-domain) inputs — the
    transcendental-free fast path for the issue-bound small-batch regime
    (docs/LATTICE_FLOOR.md).

    Args (time-major):
      E, S: (U, B, T) f32 emit/shift probabilities (E + S = 1 per cell —
        exactly what TransitionJoint's softmax produces before any log).
      F: (U, B, T) f32 column-max-normalized frame likelihoods
        exp(lf - mcol), in (0, 1].
      mcol: (U, B) f32 per-column max frame log-likelihood max_t lf.
      input_length, output_length: optional (B,) i32.

    Returns (B,) NLL identical to ssnt_loss(log E, log S, log F + mcol)
    to f32 accuracy; gradients are wrt (E, S, F, mcol) — related to the
    log-API grads by the exact chain rule d_le = E * d_E etc.
    (tests/test_lattice_pallas.py asserts both).
    """
    U, B, T = E.shape
    if input_length is None:
        input_length = jnp.full((B,), T, jnp.int32)
    if output_length is None:
        output_length = jnp.full((B,), U, jnp.int32)
    return _expin_core(
        E.astype(jnp.float32), S.astype(jnp.float32),
        F.astype(jnp.float32), mcol.astype(jnp.float32),
        jnp.asarray(input_length, jnp.int32),
        jnp.asarray(output_length, jnp.int32), chunk,
    )
