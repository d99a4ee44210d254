"""Probe: sort-free select_beams (rank one-hot) vs the top_k formulation.

The top_k in ops/beam_common.select_beams is the last sorting primitive in
the decode step. But the pairwise `before` matrix already yields every
candidate's stable-sort rank; masking it by `keep` gives the rank *among
survivors* directly, so the top_k + rank-indexing can be replaced by an
integer one-hot reduction: src[j] = sum_i i * [krank[i] == wanted_rank[j]].
No sort anywhere; tie semantics are inherited from the rank definition
(strictly-greater log_prob, ties by generation index) — identical to XLA
TopK's lower-index tie break.

Times both at the production decode shape and checks bit-exact equality on
randomized + tie-heavy cases.  python -u scripts/probe_select.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from ssnt_tts_tpu.ops import beam_v1
from ssnt_tts_tpu.ops.beam_common import interleave_candidates
from ssnt_tts_tpu.utils.timing import bench_step

_EQ_KEYS = beam_v1._EQ_KEYS


def select_beams_nosort(fields, valid, log_prob, max_beam_width, eq_keys,
                        diag_mask=None):
    """Sort-free reimplementation of beam_common.select_beams."""
    C = valid.shape[0]
    gen = jnp.arange(C, dtype=jnp.int32)

    eq = valid[:, None] & valid[None, :]
    eq &= log_prob[:, None] == log_prob[None, :]
    for k in eq_keys:
        if k == "log_prob":
            continue
        a = fields[k]
        eq &= a[:, None] == a[None, :]
    lp_i, lp_j = log_prob[:, None], log_prob[None, :]
    before = valid[None, :] & (
        (lp_j > lp_i) | ((lp_j == lp_i) & (gen[None, :] < gen[:, None]))
    )
    rank = jnp.sum(before, axis=1).astype(jnp.int32)
    dup = jnp.any(eq & (rank[None, :] == rank[:, None] - 1), axis=1)
    keep = valid & ~dup
    n = jnp.sum(keep).astype(jnp.int32)

    # Rank among survivors (no sort): count keep-predecessors.
    krank = jnp.sum(before & keep[None, :], axis=1).astype(jnp.int32)

    j = jnp.arange(max_beam_width, dtype=jnp.int32)
    n_safe = jnp.maximum(n, 1)
    want = jnp.where(j < n, j % n_safe, (j - n) % n_safe)  # (W,)
    hit = keep[None, :] & (krank[None, :] == want[:, None])  # (W, C)
    # n == 0: top_k over all -inf picks index 0 — replicate.
    hit = hit | ((n == 0) & (gen[None, :] == 0))
    src = jnp.sum(hit * gen[None, :], axis=1)  # (W,) exact int one-hot

    out = {k: v[src] for k, v in fields.items()}

    if diag_mask is not None:
        diag_keep = keep & diag_mask
        any_diag = jnp.any(diag_keep)
        first = jnp.argmin(jnp.where(diag_keep, rank, C))
        last = max_beam_width - 1
        for k in out:
            out[k] = out[k].at[last].set(
                jnp.where(any_diag, fields[k][first], out[k][last])
            )
    out["num_survivors"] = n
    return out


def v1_step_with(select_fn, h, lp, fin, t, u, il):
    """beam_v1.beam_search_step with a pluggable selector (single utterance)."""
    W = h.shape[0]
    t = t.astype(jnp.int32)
    u = u.astype(jnp.int32)
    il = jnp.asarray(il, jnp.int32)
    active = (t >= 0) & (t < il) & (~fin)
    last = t == il - 1
    hist = lp
    emit_pred = jnp.zeros((W,), jnp.int32)
    emit_lp = jnp.where(active, hist + h[:, 0], hist)
    emit_fin = ~(active & ~last)
    emit_nt = t
    emit_nu = jnp.where(active & ~last, u + 1, u)
    emit_valid = jnp.ones((W,), bool)
    shift_pred = jnp.where(last, 0, 1).astype(jnp.int32)
    shift_lp = jnp.where(last, hist, hist + h[:, 1])
    shift_fin = last
    shift_nt = jnp.where(last, t, t + 1)
    shift_nu = jnp.where(last, u, u + 1)
    shift_valid = active
    parent = jnp.arange(W, dtype=jnp.int32)
    fields = {
        "prediction": interleave_candidates([emit_pred, shift_pred]),
        "log_prob": interleave_candidates([emit_lp, shift_lp]),
        "next_t": interleave_candidates([emit_nt, shift_nt]),
        "next_u": interleave_candidates([emit_nu, shift_nu]),
        "is_finished": interleave_candidates([emit_fin, shift_fin]),
        "parent_branch": interleave_candidates([parent, parent]),
    }
    valid = interleave_candidates([emit_valid, shift_valid])
    out = select_fn(fields, valid, fields["log_prob"], W, _EQ_KEYS)
    return (out["prediction"], out["log_prob"], out["next_t"], out["next_u"],
            out["is_finished"], out["parent_branch"])


def main():
    from ssnt_tts_tpu.ops import beam_common

    B, W = 32, 8
    rng = np.random.default_rng(0)
    il = jnp.full((B,), 80, jnp.int32)

    # --- equality sweep (randomized + tie-heavy via coarse quantization) ---
    for trial in range(200):
        r = np.random.default_rng(trial)
        h = r.normal(0, 1, (B, W, 2)).astype(np.float32)
        if trial % 2:
            h = np.round(h * 2) / 2  # force log-prob ties
        lp = np.round(r.normal(0, 1, (B, W)), 1).astype(np.float32)
        fin = r.random((B, W)) < 0.2
        t = r.integers(0, 81, (B, W)).astype(np.int32)
        u = r.integers(0, 10, (B, W)).astype(np.int32)
        a = jax.vmap(
            lambda *x: v1_step_with(beam_common.select_beams, *x)
        )(jnp.asarray(h), jnp.asarray(lp), jnp.asarray(fin),
          jnp.asarray(t), jnp.asarray(u), il)
        b = jax.vmap(
            lambda *x: v1_step_with(select_beams_nosort, *x)
        )(jnp.asarray(h), jnp.asarray(lp), jnp.asarray(fin),
          jnp.asarray(t), jnp.asarray(u), il)
        for xa, xb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
    print("equality: 200 randomized trials bit-exact", flush=True)

    # --- timing at the production shape ---
    h0 = jnp.asarray(rng.normal(0, 1, (B, W, 2)), jnp.float32)
    carry0 = (
        jnp.zeros((B, W), jnp.int32), jnp.zeros((B, W), jnp.int32),
        jnp.zeros((B, W), jnp.float32), jnp.zeros((B, W), bool),
    )

    def mk(select_fn):
        def step(carry):
            t, u, lp, fin = carry
            h = h0 + lp[..., None] * 1e-20
            out = jax.vmap(
                lambda *x: v1_step_with(select_fn, *x)
            )(h, lp, fin, t, u, il)
            pred, lp2, nt, nu, nfin, branch = out
            return (nt, nu, lp2 * 1e-6, nfin)
        return step

    dt_topk = bench_step(mk(beam_common.select_beams), carry0, n_lo=20, n_hi=100)
    dt_nos = bench_step(mk(select_beams_nosort), carry0, n_lo=20, n_hi=100)
    print(f"beam step  top_k: {dt_topk*1e6:7.2f} us", flush=True)
    print(f"beam step nosort: {dt_nos*1e6:7.2f} us", flush=True)


if __name__ == "__main__":
    main()
