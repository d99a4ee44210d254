"""Fused Pallas kernel for the v1 beam-search step (decode latency path).

The XLA formulation of one beam step (ops/beam_v1.py + ops/beam_common.py)
is ~40 small HLOs on (B, W)/(B, C, C) tensors; inside the decode `lax.scan`
each op is a serial dispatch on a core that finishes the actual vector work
in nanoseconds, so the step cost is dominated by op count
(docs/DECODE_PROFILE.md). This kernel collapses candidate construction +
sort-free selection into ONE launch.

Semantics are ops/beam_v1.beam_search_step exactly (reference:
/root/reference/src/lib.rs:149-230, sort/dedup/pad :160-169):

- candidates in generation order (beam-major, class-minor) — the caller
  passes h reshaped to (B, 2W) and the per-beam state repeated ×2, both
  pure layout views so the interleaved lane index IS the generation index;
- stable descending order via pairwise IEEE compares (log_prob, ties by
  generation index) — the same ranks as beam_common.select_beams, so the
  −0.0/+0.0 TopK hazard documented there cannot reappear;
- adjacency dedup, survivor-rank selection, and pad-by-repetition;
- field extraction via where-masked one-hot reductions (no gathers:
  Mosaic lowers lane-gathers poorly; a one-hot sum with exactly one live
  lane is exact for f32 — x + 0.0 terms — and for all int fields).

The only observable difference from the XLA path: a selected log_prob of
−0.0 can come back as +0.0 (the one-hot sum adds +0.0 terms and IEEE says
−0.0 + +0.0 = +0.0). Every downstream consumer — the reference semantics,
the dedup/rank compares, numpy's assert_array_equal — compares with IEEE
==, for which the two are identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_INTERPRET = False  # flipped by tests on the CPU backend


def _v1_kernel(
    h_ref, lp_ref, fin_ref, t_ref, u_ref, il_ref,
    opred_ref, olp_ref, ont_ref, onu_ref, ofin_ref, obr_ref,
):
    B, C = h_ref.shape
    W_out = opred_ref.shape[1]

    h = h_ref[:]            # (B, C) candidate-class step log-prob
    lp = lp_ref[:]          # (B, C) parent cumulative log-prob (repeated x2)
    fin = fin_ref[:] != 0   # (B, C)
    t = t_ref[:]
    u = u_ref[:]
    il = il_ref[:]          # (B, 1)

    gen = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    is_shift = (gen % 2) == 1
    active = (t >= 0) & (t < il) & (~fin)
    last = t == il - 1

    # Emit slot (src/lib.rs:187-195; padding when inactive :174-184).
    e_lp = jnp.where(active, lp + h, lp)
    e_fin = ~(active & ~last)
    e_nu = jnp.where(active & ~last, u + 1, u)
    # Shift slot (prohibited at the last frame -> finishing no-op,
    # src/lib.rs:196-205; ordinary shift :206-215).
    s_pred = jnp.where(last, 0, 1)
    s_lp = jnp.where(last, lp, lp + h)
    s_nt = jnp.where(last, t, t + 1)
    s_nu = jnp.where(last, u, u + 1)

    pred = jnp.where(is_shift, s_pred, 0)
    clp = jnp.where(is_shift, s_lp, e_lp)
    # select on i1 vectors is unsupported by Mosaic -> logical form
    cfin = (is_shift & last) | (~is_shift & e_fin)
    cnt = jnp.where(is_shift, s_nt, t)
    cnu = jnp.where(is_shift, s_nu, e_nu)
    valid = (~is_shift) | active  # emit always valid; shift iff active
    parent = gen // 2

    # Pairwise stable order + adjacency dedup (beam_common.select_beams).
    # Mosaic cannot broadcast/reshape i1 vectors into 3D, so every mask
    # that crosses into (B, i, j) space lives as int32 0/1; compares on
    # 32-bit 3D operands (producing elementwise i1, no reshape) are fine.
    v32 = valid.astype(jnp.int32)
    fin32 = cfin.astype(jnp.int32)
    vi, vj = v32[:, :, None], v32[:, None, :]
    lpi, lpj = clp[:, :, None], clp[:, None, :]
    gi, gj = gen[:, :, None], gen[:, None, :]
    eq = vi & vj & (lpi == lpj).astype(jnp.int32)
    eq &= (pred[:, :, None] == pred[:, None, :]).astype(jnp.int32)
    eq &= (cnt[:, :, None] == cnt[:, None, :]).astype(jnp.int32)
    eq &= (cnu[:, :, None] == cnu[:, None, :]).astype(jnp.int32)
    eq &= (fin32[:, :, None] == fin32[:, None, :]).astype(jnp.int32)
    before = vj & (
        (lpj > lpi).astype(jnp.int32)
        | ((lpj == lpi).astype(jnp.int32) & (gj < gi).astype(jnp.int32))
    )
    rank = jnp.sum(before, axis=2)  # (B, C)
    dup = (
        jnp.sum(
            eq & (rank[:, None, :] == rank[:, :, None] - 1).astype(jnp.int32),
            axis=2,
        )
        > 0
    )
    keep = valid & ~dup
    k32 = keep.astype(jnp.int32)
    n = jnp.sum(k32, axis=1, keepdims=True)  # (B, 1)
    krank = jnp.sum(before & k32[:, None, :], axis=2)  # (B, C)

    j = jax.lax.broadcasted_iota(jnp.int32, (B, W_out), 1)
    n_safe = jnp.maximum(n, 1)
    want = jnp.where(j < n, j % n_safe, (j - n) % n_safe)  # (B, W_out)
    hit = k32[:, None, :] & (
        krank[:, None, :] == want[:, :, None]
    ).astype(jnp.int32)
    hit = hit | (
        (n == 0).astype(jnp.int32)[:, :, None]
        & (gen == 0).astype(jnp.int32)[:, None, :]
    )
    hit3 = hit == 1  # elementwise i1, never reshaped

    def pick_f32(x):
        return jnp.sum(jnp.where(hit3, x[:, None, :], 0.0), axis=2)

    def pick_i32(x):
        return jnp.sum(jnp.where(hit3, x[:, None, :], 0), axis=2)

    opred_ref[:] = pick_i32(pred)
    olp_ref[:] = pick_f32(clp)
    ont_ref[:] = pick_i32(cnt)
    onu_ref[:] = pick_i32(cnu)
    ofin_ref[:] = pick_i32(cfin.astype(jnp.int32))
    obr_ref[:] = pick_i32(parent)


def beam_search_step_batched(
    h: jax.Array,
    log_prob_history: jax.Array,
    is_finished: jax.Array,
    t: jax.Array,
    u: jax.Array,
    input_length: jax.Array,
    *,
    max_beam_width: int | None = None,
):
    """Fused batched v1 step: h (B, W, 2), state (B, W), input_length (B,).

    Drop-in equal to ops.beam_v1.beam_search_decode_batched (tested
    bit-exactly in tests/test_beam_pallas.py; on-hardware equality in
    scripts/probe_beam_pallas.py).
    """
    B, W, _ = h.shape
    W_out = W if max_beam_width is None else max_beam_width

    rep = lambda x: jnp.repeat(x, 2, axis=1)
    out = pl.pallas_call(
        _v1_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((B, W_out), jnp.int32),
            jax.ShapeDtypeStruct((B, W_out), jnp.float32),
            jax.ShapeDtypeStruct((B, W_out), jnp.int32),
            jax.ShapeDtypeStruct((B, W_out), jnp.int32),
            jax.ShapeDtypeStruct((B, W_out), jnp.int32),
            jax.ShapeDtypeStruct((B, W_out), jnp.int32),
        ],
        interpret=_INTERPRET,
    )(
        h.reshape(B, 2 * W).astype(jnp.float32),
        rep(log_prob_history.astype(jnp.float32)),
        rep(is_finished.astype(jnp.int32)),
        rep(t.astype(jnp.int32)),
        rep(u.astype(jnp.int32)),
        jnp.asarray(input_length, jnp.int32).reshape(B, 1),
    )
    pred, lp, nt, nu, fin, br = out
    return pred, lp, nt, nu, fin != 0, br
