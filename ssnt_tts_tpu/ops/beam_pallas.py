"""Fused Pallas kernels for the beam-search steps (decode latency path).

The XLA formulation of one beam step (ops/beam_v1.py + ops/beam_common.py)
is ~40 small HLOs on (B, W)/(B, C, C) tensors; inside the decode `lax.scan`
each op is a serial dispatch on a core that finishes the actual vector work
in nanoseconds, so the step cost is dominated by op count
(docs/DECODE_PROFILE.md). These kernels collapse candidate construction +
selection into ONE launch. Since round 5 the selection itself is a
128-lane BITONIC SORT NETWORK (_select_bitonic — (lp desc, gen asc) is a
strict total order, so it reproduces the reference's stable sort exactly,
~5x cheaper than the pairwise-rank algebra it replaced, which is kept as
_select_sort_free/_select_sort_free_tiled for conformance cross-checks);
the model-FUSED kernels that additionally run the AR model step in the
same launch live in ops/beam_fused.py and are the TPU decode defaults.

Semantics are ops/beam_v1.beam_search_step exactly (reference:
/root/reference/src/lib.rs:149-230, sort/dedup/pad :160-169):

- candidates laid out CLASS-MAJOR in the lane axis (pos = k*W + w): the
  per-beam state expands in-kernel by pltpu.repeat (which tiles) and h
  arrives via one transpose dispatch — the reference's beam-major
  GENERATION index gen = w*D + k is computed from the position and is the
  only ordering the semantics ever consult;
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
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # forced on by tests on the CPU backend


def _interpret() -> bool:
    """Compile Mosaic on TPU; interpret everywhere else. Off-TPU callers
    that force use_pallas=True get a correct (slow) interpreted kernel
    instead of an obscure Mosaic lowering error (ADVICE r3)."""
    return _INTERPRET or jax.default_backend() != "tpu"

# The pairwise-mask algebra materializes (BB, C, C)-shaped temporaries on
# Mosaic's VMEM stack — i1 masks cost a full vreg lane each (measured:
# stack/row = temps * C * 128 lanes * 4 B, with ~70 temps for the v2
# kernel and ~45 for v1; eq-key packing shrinks op count but not the
# allocator's stack). Batch is processed in grid blocks sized to budget.
_VMEM_STACK_BUDGET = 12 * 2**20


def _batch_block(B: int, C: int, temps: int) -> int:
    per_row = C * max(C, 128) * 4 * temps
    bb = max(1, min(B, _VMEM_STACK_BUDGET // per_row))
    while B % bb:
        bb -= 1
    return bb


def _select_jc(C: int) -> int | None:
    """Slab width the tiled selection will ACTUALLY use for candidate
    count C, or None when C forces the one-shot fallback. Single source
    of truth shared by the kernels and the batch-block sizing (ADVICE r4:
    sizing bb for 8-high slabs while the kernel auto-picked jc=16 — or
    worse, fell back to the ~70-temp one-shot path — could double or
    quadruple the live VMEM footprint on the default TPU decode path)."""
    if C % 8:
        return None
    return 16 if C % 16 == 0 else 8


def _select_block(B: int, C: int, *, oneshot_temps: int = 70,
                  W_out: int = 8) -> int:
    """Batch block sized for the bitonic selection (round 5): ~12 live
    (BB, L) lane rows for the sort plus the (BB, W_out, C) hit/pick
    temporaries — O(B*L), far below the old pairwise forms' footprints."""
    L = max(128, 1 << max(1, (C - 1).bit_length()))
    per_row = 4 * (14 * L + 6 * max(W_out, 8) * max(C, 128))
    bb = max(1, min(B, _VMEM_STACK_BUDGET // per_row))
    while B % bb:
        bb -= 1
    return bb


def _v1_candidates_and_hit(
    h_ref, lp_ref, fin_ref, t_ref, u_ref, il_ref, W_out,
):
    """Shared v1 candidate construction + selection (see _v1_kernel).

    Per-beam state refs are UNREPEATED (BB, 1, W); the candidate
    expansion happens in-kernel via pltpu.repeat (one VPU op each),
    replacing four XLA jnp.repeat dispatches that cost ~0.75 us EACH
    inside the decode scan (scripts/probe_budget.py). pltpu.repeat TILES
    ([x0..xW x0..xW]), so candidates live in CLASS-MAJOR physical order
    (pos = k*W + w); reference semantics (stable sort by beam-major
    generation order, src/lib.rs:149-170) are preserved by computing the
    reference generation index gen = w*2 + k from the position and using
    it — never the physical position — as the tie-break/stability key.
    h arrives pre-transposed to (BB, 1, 2W) class-major (one XLA
    transpose+reshape dispatch replaces the four repeats)."""
    B, _, C = h_ref.shape
    W = C // 2

    rep2 = lambda r: pltpu.repeat(r[:][:, 0, :], 2, axis=1)
    h = h_ref[:][:, 0, :]    # (B, C) class-major step log-prob
    lp = rep2(lp_ref)        # (B, C) parent cumulative log-prob
    fin = rep2(fin_ref) != 0
    t = rep2(t_ref)
    u = rep2(u_ref)
    il = il_ref[:][:, 0, :]  # (B, 1)
    return _v1_candidates_from_vals(h, lp, fin, t, u, il, W_out)


def _v1_candidates_from_vals(h, lp, fin, t, u, il, W_out):
    """v1 candidate grid + selection over ALREADY class-major-expanded
    (B, C=2W) lane values (emit lanes [0, W), shift lanes [W, 2W); each
    parent's state repeated). Shared by the beam-only kernels (which
    expand from refs via pltpu.repeat) and the round-5 model-fused v1
    kernel (ops/beam_fused.py). Returns (pred, clp, cnt, cnu, cfin,
    parent, hit3) plus the repeated parent (fin, t) via closure-free
    composition — callers that need fin_prev/t_hist pick them from the
    same hit3 against their own expansions."""
    B, C = h.shape
    W = C // 2
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    is_shift = pos >= W      # class k = pos // W for D = 2
    parent = pos - jnp.where(is_shift, W, 0)  # pos % W
    gen = parent * 2 + is_shift.astype(jnp.int32)
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

    # Pairwise stable order + adjacency dedup (beam_common.select_beams).
    # The four int eq_ignore_parent fields pack into ONE injective i32 key
    # (2D op) so the O(C^2) space sees a single compare. Bounds: needs
    # 0 <= next_u < 16384 plus |key| within i32 (next_t may legitimately
    # be negative on padding lanes; the packing stays injective for signed
    # next_t) — far above any TTS shape this framework targets.
    ekey = ((cnt * 16384 + cnu) * 2 + pred) * 2 + cfin.astype(jnp.int32)
    hit3, _n = _select(clp, valid, [ekey], gen, W_out)
    return pred, clp, cnt, cnu, cfin, parent, hit3


def _v1_candidates_core(h, lp, fin, t, u, il, W_out, trivial=False):
    """_v1_candidates_from_vals with an optional trivial-selection
    ablation (budget probes only: slot j <- candidate with gen j)."""
    if not trivial:
        return _v1_candidates_from_vals(h, lp, fin, t, u, il, W_out)
    B, C = h.shape
    W = C // 2
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    is_shift = pos >= W
    parent = pos - jnp.where(is_shift, W, 0)
    gen = parent * 2 + is_shift.astype(jnp.int32)
    active = (t >= 0) & (t < il) & (~fin)
    last = t == il - 1
    e_lp = jnp.where(active, lp + h, lp)
    e_fin = ~(active & ~last)
    e_nu = jnp.where(active & ~last, u + 1, u)
    s_pred = jnp.where(last, 0, 1)
    s_lp = jnp.where(last, lp, lp + h)
    s_nt = jnp.where(last, t, t + 1)
    s_nu = jnp.where(last, u, u + 1)
    pred = jnp.where(is_shift, s_pred, 0)
    clp = jnp.where(is_shift, s_lp, e_lp)
    cfin = (is_shift & last) | (~is_shift & e_fin)
    cnt = jnp.where(is_shift, s_nt, t)
    cnu = jnp.where(is_shift, s_nu, e_nu)
    j = jax.lax.broadcasted_iota(jnp.int32, (B, W_out), 1)
    hit3 = gen[:, None, :] == j[:, :, None]
    return pred, clp, cnt, cnu, cfin, parent, hit3


def _pick_f32(hit3, x):
    return jnp.sum(jnp.where(hit3, x[:, None, :], 0.0), axis=2)


def _pick_i32(hit3, x):
    return jnp.sum(jnp.where(hit3, x[:, None, :], 0), axis=2)


def _v1_kernel(
    h_ref, lp_ref, fin_ref, t_ref, u_ref, il_ref,
    opred_ref, olp_ref, ont_ref, onu_ref, ofin_ref, obr_ref,
):
    # Refs are (BB, 1, X): the batch block rides the unconstrained leading
    # dim so BB can be any divisor of B (Mosaic requires the last two block
    # dims to be (8k, 128k) or full-size).
    W_out = opred_ref.shape[2]
    pred, clp, cnt, cnu, cfin, parent, hit3 = _v1_candidates_and_hit(
        h_ref, lp_ref, fin_ref, t_ref, u_ref, il_ref, W_out
    )
    opred_ref[:] = _pick_i32(hit3, pred)[:, None, :]
    olp_ref[:] = _pick_f32(hit3, clp)[:, None, :]
    ont_ref[:] = _pick_i32(hit3, cnt)[:, None, :]
    onu_ref[:] = _pick_i32(hit3, cnu)[:, None, :]
    ofin_ref[:] = _pick_i32(hit3, cfin.astype(jnp.int32))[:, None, :]
    obr_ref[:] = _pick_i32(hit3, parent)[:, None, :]


def _v1_reorder_kernel(
    h_ref, lp_ref, fin_ref, t_ref, u_ref, il_ref, state_ref,
    opred_ref, olp_ref, ont_ref, onu_ref, ofin_ref, obr_ref, ostate_ref,
):
    """_v1_kernel + in-kernel parent-pointer state reorder.

    state_ref (BB, W, F) f32: per-beam state rows (decoder carry | mel |
    prev_mel | extra lanes). ostate_ref (BB, W_out, F): row i :=
    state[branch[i]]. The reorder is W masked accumulations (branch is
    already in VMEM, so the decode loop's take_along_axis gathers and
    their HBM round-trip disappear); exact for finite values, with the
    usual one-hot-sum caveat that a -0.0 lane returns as +0.0.
    """
    W_out = opred_ref.shape[2]
    W = state_ref.shape[1]
    pred, clp, cnt, cnu, cfin, parent, hit3 = _v1_candidates_and_hit(
        h_ref, lp_ref, fin_ref, t_ref, u_ref, il_ref, W_out
    )
    branch = _pick_i32(hit3, parent)  # (B, W_out)
    opred_ref[:] = _pick_i32(hit3, pred)[:, None, :]
    olp_ref[:] = _pick_f32(hit3, clp)[:, None, :]
    ont_ref[:] = _pick_i32(hit3, cnt)[:, None, :]
    onu_ref[:] = _pick_i32(hit3, cnu)[:, None, :]
    ofin_ref[:] = _pick_i32(hit3, cfin.astype(jnp.int32))[:, None, :]
    obr_ref[:] = branch[:, None, :]

    state = state_ref[:]  # (B, W, F)
    acc = jnp.zeros(
        (state.shape[0], W_out, state.shape[2]), jnp.float32
    )
    for w in range(W):
        m = (branch == w).astype(jnp.int32)[:, :, None]  # (B, W_out, 1)
        acc = acc + jnp.where(m == 1, state[:, w, :][:, None, :], 0.0)
    ostate_ref[:] = acc


def _select_sort_free(
    clp, valid, eq_keys, gen, W_out, diag_mask=None,
):
    """Shared in-kernel sort-free selection (beam_common semantics).

    Args (all (B, C) unless noted):
      clp f32 candidate log-probs; valid bool; eq_keys: 1-2 int32 arrays,
      the eq_ignore_parent fields PACKED into injective integer keys by the
      caller (packing is what keeps the O(C^2) compare count down); gen i32
      generation index; diag_mask: optional bool, v2 re-injection flags.

    Returns (hit3 (B, W_out, C) i1 one-hot, n (B, 1) i32 survivors).

    VMEM-stack discipline (this is the whole game at C ~ 100): every 3D
    temporary Mosaic materializes costs BB*C*128 bytes/lane-padded element,
    so (a) all pairwise masks stay i1 — never cast per-compare, only once
    per reduction; (b) i1 values are never broadcast or reshaped (Mosaic
    cannot) — wherever a (B,1,C) mask would meet a (B,W,C) one, the mask is
    folded into an i32 key BEFORE expansion (sentinel trick below).
    """
    B, C = clp.shape
    v32 = valid.astype(jnp.int32)
    # Expansion happens on i32/f32; compares yield elementwise i1 in place.
    vj = v32[:, None, :] == 1
    vi = v32[:, :, None] == 1
    lpi, lpj = clp[:, :, None], clp[:, None, :]
    gi, gj = gen[:, :, None], gen[:, None, :]
    eq = vi & vj & (lpi == lpj)
    for a in eq_keys:
        eq &= a[:, :, None] == a[:, None, :]
    before = vj & ((lpj > lpi) | ((lpj == lpi) & (gj < gi)))
    rank = jnp.sum(before.astype(jnp.int32), axis=2)  # (B, C)
    dup = (
        jnp.sum(
            (eq & (rank[:, None, :] == rank[:, :, None] - 1)).astype(
                jnp.int32
            ),
            axis=2,
        )
        > 0
    )
    keep = valid & ~dup
    k32 = keep.astype(jnp.int32)
    n = jnp.sum(k32, axis=1, keepdims=True)  # (B, 1)
    krank = jnp.sum((before & (k32[:, None, :] == 1)).astype(jnp.int32),
                    axis=2)  # (B, C)

    # Output slot j wants survivor-rank want[j]; non-survivors get their
    # key bumped out of range so ONE i32 compare produces the (B, W, C)
    # one-hot with no i1 broadcasting. Empty beam (n == 0, the reference
    # panic) deterministically selects candidate 0 via sentinel -1.
    j = jax.lax.broadcasted_iota(jnp.int32, (B, W_out), 1)
    n_safe = jnp.maximum(n, 1)
    want = jnp.where(j < n, j % n_safe, (j - n) % n_safe)
    want = jnp.where(n == 0, -1, want)
    key = krank + (1 - k32) * (C + 1)  # non-keep can never match
    key = jnp.where((n == 0) & (gen == 0), -1, key)

    if diag_mask is not None:
        # v2 re-injection (src/v2.rs:282-308): the first surviving flagged
        # candidate (minimal stable rank among flagged) replaces the last
        # output slot — fold it into the same key/want compare: sentinel -2
        # on the chosen candidate, -2 wanted by the last slot. The chosen
        # candidate keeps serving its own survivor rank for the other
        # slots, so only slots < W_out-1 match on krank (their want is
        # always < n <= C, never -2).
        dk = keep & diag_mask
        dk32 = dk.astype(jnp.int32)
        any_diag = jnp.sum(dk32, axis=1, keepdims=True) > 0  # (B, 1)
        rmin = jnp.min(jnp.where(dk, rank, C), axis=1, keepdims=True)
        first = dk & (rank == rmin)  # one-hot (B, C)
        want = jnp.where(
            (j == W_out - 1) & any_diag & (n > 0), -2, want
        )
        key2 = jnp.where(first & any_diag & (n > 0), -2, key)
        hit3 = (key[:, None, :] == want[:, :, None]) | (
            (key2[:, None, :] == want[:, :, None])
        )
        return hit3, n

    hit3 = key[:, None, :] == want[:, :, None]
    return hit3, n


def _select_sort_free_tiled(
    clp, valid, eq_keys, gen, W_out, diag_mask=None, jc: int | None = None,
):
    """_select_sort_free with O(B*jc*C) temporaries instead of O(B*C*C).

    At C = W*D ~ 80 the one-shot pairwise algebra materializes ~70
    (BB, C, C) temporaries on Mosaic's VMEM stack (~2.8 MB per batch row),
    capping the grid block at 4 rows and losing to XLA on spill traffic
    (docs/DECODE_PROFILE.md round 3). This version computes the same three
    j-reductions — rank, dup, survivor-rank — with `lax.fori_loop`s whose
    bodies touch one (B, jc, C) slab of the pairwise space at a time, so
    the live set is a handful of slabs and the WHOLE batch fits one grid
    block. The j-slab is peeled off by rotating full lane-vectors jc lanes
    per iteration (pltpu.roll; static shift) and slicing lanes [0:jc] —
    no dynamic lane addressing, which Mosaic lowers poorly.

    Semantics identical to _select_sort_free (same ranks, dedup, padding,
    empty-beam sentinel, diagonal re-injection); tests assert equality in
    interpret mode and scripts/probe_beam_pallas.py on hardware.
    """
    B, C = clp.shape
    if jc is None:
        # 16-wide slabs halve the fori_loop trip count when C allows;
        # measured NEUTRAL at C=80/64 (22.8 vs 22.9 us v2 step — the
        # reduction work dominates, not loop bookkeeping), kept for the
        # marginally lower bound. Kept in sync with the caller's batch
        # block sizing via _select_jc (ADVICE r4).
        jc = _select_jc(C)
        assert jc is not None, C
    assert C % jc == 0, (C, jc)
    nblk = C // jc
    v32 = valid.astype(jnp.int32)
    lpi = clp[:, None, :]
    gi = gen[:, None, :]
    roll = lambda x: pltpu.roll(x, C - jc, axis=1)

    def before_blk(lp_r, v_r, g_r):
        """(B, jc, C) i1: candidate j (slab row) strictly before i (lane).
        gen is carried as a rolled VALUE vector like the others — the
        physical position is NOT the generation index (the kernels place
        candidates class-major but tie-break in reference beam-major
        generation order)."""
        lpj = lp_r[:, :jc][:, :, None]
        gj = g_r[:, :jc][:, :, None]
        vj = v_r[:, :jc][:, :, None] == 1
        return vj & ((lpj > lpi) | ((lpj == lpi) & (gj < gi)))

    # Phase 1: rank_i = #(valid j strictly before i).
    def p1(k, carry):
        lp_r, v_r, g_r, acc = carry
        acc = acc + jnp.sum(
            before_blk(lp_r, v_r, g_r).astype(jnp.int32), axis=1
        )
        return roll(lp_r), roll(v_r), roll(g_r), acc

    _, _, _, rank = jax.lax.fori_loop(
        0, nblk, p1, (clp, v32, gen, jnp.zeros((B, C), jnp.int32))
    )

    # Phase 2: dup_i = exists j equal (eq_ignore_parent) at rank_i - 1.
    def p2(k, carry):
        lp_r, v_r, key_rs, rank_r, acc = carry
        lpj = lp_r[:, :jc][:, :, None]
        vj = v_r[:, :jc][:, :, None] == 1
        eq = (v32[:, None, :] == 1) & vj & (lpi == lpj)
        for a, a_r in zip(eq_keys, key_rs):
            eq &= a[:, None, :] == a_r[:, :jc][:, :, None]
        hit = eq & (rank_r[:, :jc][:, :, None] == rank[:, None, :] - 1)
        acc = acc + jnp.sum(hit.astype(jnp.int32), axis=1)
        return (
            roll(lp_r), roll(v_r), tuple(roll(a) for a in key_rs),
            roll(rank_r), acc,
        )

    _, _, _, _, dupc = jax.lax.fori_loop(
        0, nblk, p2,
        (clp, v32, tuple(eq_keys), rank, jnp.zeros((B, C), jnp.int32)),
    )
    keep = valid & ~(dupc > 0)
    k32 = keep.astype(jnp.int32)
    n = jnp.sum(k32, axis=1, keepdims=True)

    # Phase 3: krank_i = #(surviving j strictly before i).
    def p3(k, carry):
        lp_r, v_r, g_r, k_r, acc = carry
        hit = before_blk(lp_r, v_r, g_r) & (k_r[:, :jc][:, :, None] == 1)
        acc = acc + jnp.sum(hit.astype(jnp.int32), axis=1)
        return roll(lp_r), roll(v_r), roll(g_r), roll(k_r), acc

    _, _, _, _, krank = jax.lax.fori_loop(
        0, nblk, p3, (clp, v32, gen, k32, jnp.zeros((B, C), jnp.int32))
    )

    # Tail identical to _select_sort_free (all (B, C)/(B, W_out, C) sized).
    j = jax.lax.broadcasted_iota(jnp.int32, (B, W_out), 1)
    n_safe = jnp.maximum(n, 1)
    want = jnp.where(j < n, j % n_safe, (j - n) % n_safe)
    want = jnp.where(n == 0, -1, want)
    key = krank + (1 - k32) * (C + 1)
    key = jnp.where((n == 0) & (gen == 0), -1, key)

    if diag_mask is not None:
        dk = keep & diag_mask
        dk32 = dk.astype(jnp.int32)
        any_diag = jnp.sum(dk32, axis=1, keepdims=True) > 0
        rmin = jnp.min(jnp.where(dk, rank, C), axis=1, keepdims=True)
        first = dk & (rank == rmin)
        want = jnp.where(
            (j == W_out - 1) & any_diag & (n > 0), -2, want
        )
        key2 = jnp.where(first & any_diag & (n > 0), -2, key)
        hit3 = (key[:, None, :] == want[:, :, None]) | (
            (key2[:, None, :] == want[:, :, None])
        )
        return hit3, n

    hit3 = key[:, None, :] == want[:, :, None]
    return hit3, n


def _widen_lanes_f32(x, L: int):
    """(B, C) f32 -> (B, L) via a one-hot diagonal MXU dot (exact at
    HIGHEST precision; Mosaic supports neither lane-concat of
    mixed-offset vregs nor dynamic_update_slice, so this is THE widening
    primitive). Pad lanes read 0.0."""
    B, C = x.shape
    Wd = (
        jax.lax.broadcasted_iota(jnp.int32, (C, L), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (C, L), 1)
    ).astype(jnp.float32)
    return jnp.dot(
        x, Wd, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _widen_lanes_i32(x, L: int):
    """(B, C) i32 -> (B, L), exact for any i32 (12-bit split around the
    f32 widening dot; arithmetic shift keeps negatives exact)."""
    lo = (x & 0xFFF).astype(jnp.float32)
    hi = (x >> 12).astype(jnp.float32)  # |hi| < 2**19: f32-exact
    return (
        _widen_lanes_f32(hi, L).astype(jnp.int32) * 4096
        + _widen_lanes_f32(lo, L).astype(jnp.int32)
    )


_SENT = -3.0e38  # below any real log-prob; sorts invalid/pad lanes last


def _bitonic_sort_desc(lp, arrays):
    """In-kernel bitonic sort of (B, L) lanes, descending by
    (lp, arrays[0]) with arrays[0] (the unique generation index) as the
    ascending tiebreak — a strict total order, so the network output is
    exactly the reference's stable-sort permutation. All payload arrays
    move together. L power of two. Costs ~L log^2 L lane-ops: measured
    3.5 us for L=128 with 4 payloads on v5e — ~5x cheaper than the
    pairwise-rank formulation it replaces (docs/DECODE_PROFILE.md r5).

    Mosaic notes: the butterfly partner (index XOR j) is two cyclic
    rolls + a lane-parity select; i1-valued selects are expressed in
    and/or form (Mosaic cannot select on i1 vectors)."""
    B, L = lp.shape
    gen = arrays[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    k = 2
    while k <= L:
        j = k // 2
        while j >= 1:
            roll2 = lambda z: (
                pltpu.roll(z, L - j, axis=1), pltpu.roll(z, j, axis=1)
            )
            is_lo = (lane & j) == 0
            lp_a, lp_b = roll2(lp)
            lp_p = jnp.where(is_lo, lp_a, lp_b)
            parts = []
            for z in arrays:
                za, zb = roll2(z)
                parts.append(jnp.where(is_lo, za, zb))
            gen_p = parts[0]
            eq = lp_p == lp
            pbs = (lp_p > lp) | (eq & (gen_p < gen))  # partner first
            sbp = (lp > lp_p) | (eq & (gen < gen_p))  # self first
            desc = (lane & k) == 0
            t1 = (is_lo & pbs) | (~is_lo & sbp)
            t2 = (is_lo & sbp) | (~is_lo & pbs)
            take = (desc & t1) | (~desc & t2)
            lp = jnp.where(take, lp_p, lp)
            arrays = [
                jnp.where(take, zp, z) for z, zp in zip(arrays, parts)
            ]
            gen = arrays[0]
            j //= 2
        k *= 2
    return lp, arrays


def _select_bitonic(clp, valid, eq_keys, gen, W_out, diag_mask=None):
    """Drop-in replacement for _select_sort_free/_select_sort_free_tiled
    built on a full bitonic sort instead of O(C^2) pairwise rank algebra.

    Identical semantics (ranks, adjacent dedup, pad-by-repetition,
    empty-beam gen-0 sentinel, diagonal re-injection) — the sorted order
    by (lp desc, gen asc) IS the pairwise rank order, dedup becomes an
    adjacent compare, survivor rank a lane prefix-sum. Returns
    (hit3 (B, W_out, C) i1 one-hot, n (B, 1) i32 survivors).

    Cost: ~L log^2 L tiny lane-ops (L = C padded to a power of two)
    vs the pairwise forms' ~C^2-element reductions: 20.2 -> ~7 us for
    the full v2 beam kernel at C=80 on v5e (scripts/probe_fused.py)."""
    B, C = clp.shape
    # Pad to >= 128 lanes: cyclic rolls at native vreg width lower to
    # plain lane rotates; sub-vreg widths (64, 16) measured SLOWER than
    # a full 128-lane network despite fewer stages
    # (scripts/probe_budget_r5.py: L=64 sort 6.1 us vs L=128 3.4 us).
    L = max(128, 1 << max(1, (C - 1).bit_length()))
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)

    lp0 = jnp.where(valid, clp, _SENT)
    if L == C:
        lp = lp0
        gen_L = gen
        eks = list(eq_keys)
        diag_L = (
            diag_mask.astype(jnp.int32) if diag_mask is not None else None
        )
    else:
        lp = _widen_lanes_f32(lp0, L)
        lp = jnp.where(lane < C, lp, _SENT)
        # Pad lanes get unique gen ids >= C (never selected: lp = SENT).
        gen_L = jnp.where(lane < C, _widen_lanes_i32(gen, L), lane)
        eks = [_widen_lanes_i32(k, L) for k in eq_keys]
        diag_L = (
            _widen_lanes_i32(diag_mask.astype(jnp.int32), L)
            if diag_mask is not None
            else None
        )
    arrays = [gen_L] + eks + ([diag_L] if diag_L is not None else [])
    lp_s, arrays = _bitonic_sort_desc(lp, arrays)
    gen_s = arrays[0]
    eks_s = arrays[1:1 + len(eq_keys)]
    diag_s = arrays[-1] if diag_L is not None else None

    finite = lp_s > jnp.float32(_SENT * 0.9)
    fin32 = finite.astype(jnp.int32)
    prev = lambda z: pltpu.roll(z, 1, axis=1)
    eqadj = (lp_s == prev(lp_s)) & (prev(fin32) == 1)
    for ek in eks_s:
        eqadj &= ek == prev(ek)
    dup = finite & (lane >= 1) & eqadj
    keep = finite & ~dup
    k32 = keep.astype(jnp.int32)
    # Lane prefix-sum (inclusive) of keep.
    csum = k32
    sh = 1
    while sh < L:
        csum = csum + jnp.where(
            lane >= sh, pltpu.roll(csum, sh, axis=1), 0
        )
        sh *= 2
    n = csum[:, L - 1:L]  # (B, 1)

    j = jax.lax.broadcasted_iota(jnp.int32, (B, W_out), 1)
    n_safe = jnp.maximum(n, 1)
    want = jnp.where(j < n, j % n_safe, (j - n) % n_safe)
    want = jnp.where(n == 0, -1, want)
    key_s = (csum - 1) + (1 - k32) * (L + 1)
    key_s = jnp.where((n == 0) & (gen_s == 0), -1, key_s)

    if diag_s is not None:
        dk = keep & (diag_s == 1)
        dk32 = dk.astype(jnp.int32)
        any_diag = jnp.sum(dk32, axis=1, keepdims=True) > 0
        firstpos = jnp.min(jnp.where(dk, lane, L), axis=1, keepdims=True)
        want = jnp.where(
            (j == W_out - 1) & any_diag & (n > 0), -2, want
        )
        key2_s = jnp.where(
            (lane == firstpos) & any_diag & (n > 0), -2, key_s
        )
        hitW = (key_s[:, None, :] == want[:, :, None]) | (
            key2_s[:, None, :] == want[:, :, None]
        )
    else:
        hitW = key_s[:, None, :] == want[:, :, None]

    slotgen = jnp.sum(
        jnp.where(hitW, gen_s[:, None, :], 0), axis=2
    )  # (B, W_out)
    hit3 = slotgen[:, :, None] == gen[:, None, :]
    return hit3, n


def _select(clp, valid, eq_keys, gen, W_out, diag_mask=None):
    """Selection dispatch: the bitonic formulation (round 5) everywhere —
    it dominates both pairwise forms at every C this framework uses and
    its live set is O(B*L) lanes, not O(B*C*C). The pairwise forms are
    kept for conformance cross-checks (scripts/probe_select_impls.py,
    tests exercise both)."""
    return _select_bitonic(clp, valid, eq_keys, gen, W_out, diag_mask)


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

    C = 2 * W
    bb = _batch_block(B, C, temps=45)
    row = lambda width: pl.BlockSpec((bb, 1, width), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        _v1_kernel,
        grid=(B // bb,),
        in_specs=[row(C)] + [row(W)] * 4 + [row(1)],
        out_specs=[row(W_out)] * 6,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, W_out), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, W_out), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, W_out), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, W_out), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, W_out), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, W_out), jnp.int32),
        ],
        interpret=_interpret(),
    )(
        jnp.transpose(h, (0, 2, 1)).reshape(B, 1, C).astype(jnp.float32),
        log_prob_history.astype(jnp.float32).reshape(B, 1, W),
        is_finished.astype(jnp.int32).reshape(B, 1, W),
        t.astype(jnp.int32).reshape(B, 1, W),
        u.astype(jnp.int32).reshape(B, 1, W),
        jnp.asarray(input_length, jnp.int32).reshape(B, 1, 1),
    )
    pred, lp, nt, nu, fin, br = (x.reshape(B, W_out) for x in out)
    return pred, lp, nt, nu, fin != 0, br


def beam_search_step_reorder(
    h: jax.Array,
    log_prob_history: jax.Array,
    is_finished: jax.Array,
    t: jax.Array,
    u: jax.Array,
    input_length: jax.Array,
    state: jax.Array,
    *,
    max_beam_width: int | None = None,
):
    """Fused v1 step + parent-pointer reorder of per-beam state.

    state: (B, W, F) f32 — anything the decode loop threads per beam
    (decoder carry, mel frames, flags as f32 lanes). Returns the
    beam_search_step_batched tuple plus state[branch] (B, W_out, F).
    Equality vs step + take_along_axis: tests/test_beam_pallas.py.
    """
    B, W, _ = h.shape
    W_out = W if max_beam_width is None else max_beam_width
    F = state.shape[2]

    C = 2 * W
    bb = _batch_block(B, C, temps=45)
    row = lambda width: pl.BlockSpec((bb, 1, width), lambda i: (i, 0, 0))
    srow = lambda n_, width: pl.BlockSpec(
        (bb, n_, width), lambda i: (i, 0, 0)
    )
    out = pl.pallas_call(
        _v1_reorder_kernel,
        grid=(B // bb,),
        in_specs=[row(C)] + [row(W)] * 4 + [row(1)] + [srow(W, F)],
        out_specs=[row(W_out)] * 6 + [srow(W_out, F)],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, W_out), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, W_out), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, W_out), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, W_out), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, W_out), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, W_out), jnp.int32),
            jax.ShapeDtypeStruct((B, W_out, F), jnp.float32),
        ],
        interpret=_interpret(),
    )(
        jnp.transpose(h, (0, 2, 1)).reshape(B, 1, C).astype(jnp.float32),
        log_prob_history.astype(jnp.float32).reshape(B, 1, W),
        is_finished.astype(jnp.int32).reshape(B, 1, W),
        t.astype(jnp.int32).reshape(B, 1, W),
        u.astype(jnp.int32).reshape(B, 1, W),
        jnp.asarray(input_length, jnp.int32).reshape(B, 1, 1),
        state.astype(jnp.float32),
    )
    pred, lp, nt, nu, fin, br = (x.reshape(B, W_out) for x in out[:6])
    return pred, lp, nt, nu, fin != 0, br, out[6]


def _v2_candidates(
    h, hist, fin, tot0, t, u, dtab, T, U, *,
    D: int,
    zero_duration_id: int,
    allow_skip: bool,
    test_mode: bool,
    band_lower_frac: float,
    band_upper_frac: float,
    overrun_multiplier: int,
    diag_lo: float,
    diag_hi: float,
    feas_guard: bool = False,
):
    """Beam-major v2 candidate grid on (B, C) lane vectors (semantics:
    ops/beam_v2.beam_search_step; reference src/v2.rs:119-166, 313-323).

    All args (B, C) except dtab (1 or B, C) and T/U (B, 1). Shared by the
    standalone fused beam kernel (_make_v2_kernel) and the round-5
    model-fused kernel (ops/beam_fused.py) so the two cannot drift.

    Returns (pred, lp, nt, nu, cfin, tot, valid, diag_mask, gen, parent,
    ekey1, ekey2)."""
    B, C = h.shape
    gen = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    d_ids = gen % D
    parent = gen // D

    active = (t < T) & (~fin)          # src/v2.rs:119-125
    last = t == T - 1

    tot = tot0 + dtab                  # (B, C) candidate cumulative

    Uf = U.astype(jnp.float32)         # (B, 1)
    Tf = T.astype(jnp.float32)
    diag = Uf / Tf * (t + 1).astype(jnp.float32)
    lower = jnp.maximum(diag - Uf * band_lower_frac, 0.0).astype(
        jnp.int32
    )
    upper = jnp.minimum(diag + Uf * band_upper_frac, Uf).astype(
        jnp.int32
    )
    band_ok = (tot >= lower) & (tot <= upper)
    overrun = (T - (t + 1)) * overrun_multiplier > U
    final_len_ok = (~last) | (tot == U)
    skip_ok = (
        jnp.full((B, C), True)
        if allow_skip
        else d_ids != zero_duration_id
    )

    valid = active & skip_ok
    if not test_mode:
        valid = valid & band_ok & (~overrun) & final_len_ok
        if feas_guard:
            # V2BeamConfig.final_feasible_guard (round-5 empty-beam
            # remedy): future f = T-1-t positions add [f*dmin, f*dmax]
            # frames; prune candidates that cannot land on U exactly.
            lane1 = jax.lax.broadcasted_iota(
                jnp.int32, dtab.shape, 1
            )
            adm = jnp.where(
                jnp.full(dtab.shape, True)
                if allow_skip
                else (lane1 % D != zero_duration_id),
                dtab, jnp.int32(2**30),
            )
            dmin = jnp.min(adm, axis=1, keepdims=True)
            dmax = jnp.max(dtab, axis=1, keepdims=True)
            f = jnp.maximum(T - 1 - t, 0)
            rem = U - tot
            valid = valid & (rem >= f * dmin) & (rem <= f * dmax)

    pred = d_ids
    lp = hist + h
    nt = jnp.where(last, t, t + 1)
    nu = jnp.where(last, u, u + 1)
    cfin = last

    # Padding candidate for finished/out-of-range beams in class slot 0
    # (src/v2.rs:313-323).
    pad0 = (~active) & (d_ids == 0)
    pred = jnp.where(pad0, zero_duration_id, pred)
    lp = jnp.where(pad0, hist, lp)
    nt = jnp.where(pad0, t, nt)
    nu = jnp.where(pad0, u, nu)
    cfin = cfin | pad0
    tot = jnp.where(pad0, tot0, tot)
    valid = valid | pad0

    diag_mask = None
    if not test_mode:
        # on_diagonal uses the candidate's next_t (src/v2.rs:113-117).
        diag_next = Uf / Tf * nt.astype(jnp.float32)
        diff = tot.astype(jnp.float32) - diag_next
        diag_mask = (diff >= diag_lo) & (diff <= diag_hi)

    # Five int eq fields pack into TWO injective i32 keys (2D ops).
    # Bounds: 0 <= nu < 16384, |nt| < 32768, tot < 2**17, D <= 64.
    ekey1 = nt * 16384 + nu
    ekey2 = (tot * 64 + pred) * 2 + cfin.astype(jnp.int32)
    return (
        pred, lp, nt, nu, cfin, tot, valid, diag_mask, gen, parent,
        ekey1, ekey2,
    )


def _make_v2_kernel(
    W_out: int,
    D: int,
    zero_duration_id: int,
    allow_skip: bool,
    test_mode: bool,
    band_lower_frac: float,
    band_upper_frac: float,
    overrun_multiplier: int,
    diag_lo: float,
    diag_hi: float,
    reorder_state: bool = False,
    feas_guard: bool = False,
):
    """Fused v2 duration-class step (semantics: ops/beam_v2.beam_search_step,
    reference /root/reference/src/v2.rs:119-166, 269-339). With
    reorder_state the kernel additionally takes a (BB, W, F) f32 per-beam
    state row and emits state[branch] (the decode loop's take_along_axis
    reorder folded in, as the v1 reorder kernel does)."""

    def kernel(
        h_ref, hist_ref, fin_ref, tot_ref, t_ref, u_ref, dtab_ref,
        il_ref, ol_ref, *rest,
    ):
        if reorder_state:
            (state_ref, opred_ref, olp_ref, ont_ref, onu_ref, ofin_ref,
             otot_ref, obr_ref, onsurv_ref, ostate_ref) = rest
        else:
            (opred_ref, olp_ref, ont_ref, onu_ref, ofin_ref,
             otot_ref, obr_ref, onsurv_ref) = rest
        # Refs are (BB, 1, X); see _v1_kernel for the layout rationale.
        # Per-beam state is UNREPEATED (BB, 1, W): the xD candidate
        # expansion runs in-kernel (pltpu.repeat, one VPU op each) instead
        # of five XLA jnp.repeat dispatches inside the decode scan.
        B, _, C = h_ref.shape

        # v2 keeps BEAM-MAJOR candidates with XLA-side xD expansion:
        # unlike v1's x2, pltpu.repeat(x, D=10) lowers poorly (measured
        # +3 us/step vs the XLA repeats — scripts/probe_beam_pallas.py),
        # so the five jnp.repeat dispatches stay outside.
        h = h_ref[:][:, 0, :]       # (B, C) beam-major class-minor
        hist = hist_ref[:][:, 0, :]  # (B, C) parent log-prob (rep xD)
        fin = fin_ref[:][:, 0, :] != 0
        tot0 = tot_ref[:][:, 0, :]
        t = t_ref[:][:, 0, :]
        u = u_ref[:][:, 0, :]
        dtab = dtab_ref[:][:, 0, :]  # (1, C): duration_table tiled W times
        T = il_ref[:][:, 0, :]       # (B, 1)
        U = ol_ref[:][:, 0, :]       # (B, 1)

        (pred, lp, nt, nu, cfin, tot, valid, diag_mask, gen, parent,
         ekey1, ekey2) = _v2_candidates(
            h, hist, fin, tot0, t, u, dtab, T, U,
            D=D, zero_duration_id=zero_duration_id,
            allow_skip=allow_skip, test_mode=test_mode,
            band_lower_frac=band_lower_frac,
            band_upper_frac=band_upper_frac,
            overrun_multiplier=overrun_multiplier,
            diag_lo=diag_lo, diag_hi=diag_hi,
            feas_guard=feas_guard,
        )
        hit3, n = _select(
            lp, valid, [ekey1, ekey2], gen, W_out, diag_mask=diag_mask
        )

        def pick_f32(x):
            return jnp.sum(jnp.where(hit3, x[:, None, :], 0.0), axis=2)

        def pick_i32(x):
            return jnp.sum(jnp.where(hit3, x[:, None, :], 0), axis=2)

        branch = pick_i32(parent)
        opred_ref[:] = pick_i32(pred)[:, None, :]
        olp_ref[:] = pick_f32(lp)[:, None, :]
        ont_ref[:] = pick_i32(nt)[:, None, :]
        onu_ref[:] = pick_i32(nu)[:, None, :]
        ofin_ref[:] = pick_i32(cfin.astype(jnp.int32))[:, None, :]
        otot_ref[:] = pick_i32(tot)[:, None, :]
        obr_ref[:] = branch[:, None, :]
        onsurv_ref[:] = n[:, None, :]
        if reorder_state:
            state = state_ref[:]  # (B, W, F)
            acc = jnp.zeros(
                (state.shape[0], W_out, state.shape[2]), jnp.float32
            )
            for w in range(state.shape[1]):
                m = (branch == w).astype(jnp.int32)[:, :, None]
                acc = acc + jnp.where(
                    m == 1, state[:, w, :][:, None, :], 0.0
                )
            ostate_ref[:] = acc

    return kernel


def v2_beam_search_decode(
    h: jax.Array,
    log_prob_history: jax.Array,
    is_finished: jax.Array,
    total_duration: jax.Array,
    duration_table: jax.Array,
    t: jax.Array,
    u: jax.Array,
    input_length: jax.Array,
    output_length: jax.Array,
    *,
    zero_duration_id: int = 0,
    allow_skip: bool = False,
    test_mode: bool = False,
    max_beam_width: int | None = None,
    return_num_survivors: bool = False,
    config=None,
    state=None,
):
    """Fused batched v2 step; drop-in equal to ops.beam_v2.beam_search_decode
    (bit-exact: tests/test_beam_pallas.py, scripts/probe_beam_pallas.py).

    state: optional (B, W, F) f32 per-beam state rows; when given, the
    kernel also returns state[branch] as the LAST output — the decode
    loop's take_along_axis reorder folded into the launch (one fewer
    ~1.75 us gather dispatch per scan step; scripts/probe_budget.py)."""
    from ssnt_tts_tpu.utils.config import V2BeamConfig

    cfg = config if config is not None else V2BeamConfig()
    B, W, D = h.shape
    if D > 64:
        # Same eq-key packing bound as ops.beam_v2 (tot * 64 + pred);
        # D is static so fail loudly instead of silently merging beams.
        raise ValueError(
            f"duration_class_size {D} > 64 breaks eq-key packing injectivity"
        )
    W_out = W if max_beam_width is None else max_beam_width
    C = W * D

    input_length = jnp.asarray(input_length, jnp.int32)
    output_length = jnp.asarray(output_length, jnp.int32)
    if test_mode:
        output_length = jnp.zeros_like(input_length)

    kernel = _make_v2_kernel(
        W_out, D, zero_duration_id, bool(allow_skip), bool(test_mode),
        float(cfg.band_lower_frac), float(cfg.band_upper_frac),
        int(cfg.overrun_multiplier),
        float(cfg.diagonal_window[0]), float(cfg.diagonal_window[1]),
        reorder_state=state is not None,
        feas_guard=bool(getattr(cfg, "final_feasible_guard", False)),
    )
    rep = lambda x: jnp.repeat(x, D, axis=1).reshape(B, 1, C)
    # Block sized for the selection path the kernel will actually take:
    # ~16 live (BB, jc, C) slabs for the tiled path, ~70 (BB, C, C)
    # pairwise masks for the one-shot fallback (ADVICE r4).
    bb = _select_block(B, C, oneshot_temps=70)
    row = lambda width: pl.BlockSpec((bb, 1, width), lambda i: (i, 0, 0))
    in_specs = (
        [row(C)] * 6
        + [pl.BlockSpec((1, 1, C), lambda i: (0, 0, 0))]  # dur table
        + [row(1)] * 2
    )
    out_specs = [row(W_out)] * 7 + [row(1)]
    out_shape = [
        jax.ShapeDtypeStruct((B, 1, W_out), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, W_out), jnp.float32),
        jax.ShapeDtypeStruct((B, 1, W_out), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, W_out), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, W_out), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, W_out), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, W_out), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
    ]
    args = [
        h.reshape(B, 1, C).astype(jnp.float32),
        rep(log_prob_history.astype(jnp.float32)),
        rep(is_finished.astype(jnp.int32)),
        rep(total_duration.astype(jnp.int32)),
        rep(t.astype(jnp.int32)),
        rep(u.astype(jnp.int32)),
        jnp.tile(
            jnp.asarray(duration_table, jnp.int32), W
        ).reshape(1, 1, C),
        input_length.reshape(B, 1, 1),
        output_length.reshape(B, 1, 1),
    ]
    if state is not None:
        F = state.shape[2]
        srow = lambda n_, width: pl.BlockSpec(
            (bb, n_, width), lambda i: (i, 0, 0)
        )
        in_specs = list(in_specs) + [srow(W, F)]
        out_specs = out_specs + [srow(W_out, F)]
        out_shape = out_shape + [
            jax.ShapeDtypeStruct((B, W_out, F), jnp.float32)
        ]
        args = args + [state.astype(jnp.float32)]
    out = pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*args)
    pred, lp, nt, nu, fin, tot, br = (
        x.reshape(B, W_out) for x in out[:7]
    )
    result = (pred, lp, nt, nu, fin != 0, tot, br)
    if return_num_survivors:
        result = result + (out[7].reshape(B),)
    if state is not None:
        result = result + (out[8],)
    return result


def _make_tone_kernel(W_out: int, K: int, empty_tone_id: int,
                      reorder_state: bool = False):
    """Fused tone-latent step (semantics: ops/tone_latent.beam_search_step,
    reference /root/reference/src/tone_latent.rs:144-234): structurally the
    v2 step minus duration bookkeeping — every class admissible for active
    beams, unconditional (t, u) -> (t+1, u+1) advance, empty_tone_id
    padding for finished/out-of-range beams. With reorder_state the
    kernel also reorders a (BB, W, F) per-beam state row by branch (see
    _make_v2_kernel)."""

    def kernel(h_ref, hist_ref, fin_ref, t_ref, u_ref, il_ref, *rest):
        if reorder_state:
            (state_ref, opred_ref, olp_ref, ont_ref, onu_ref, ofin_ref,
             obr_ref, ostate_ref) = rest
        else:
            (opred_ref, olp_ref, ont_ref, onu_ref, ofin_ref,
             obr_ref) = rest
        B, _, C = h_ref.shape
        W = C // K

        repK = lambda r: pltpu.repeat(r[:][:, 0, :], K, axis=1)
        h = h_ref[:][:, 0, :]   # (B, C) class-major (h pre-transposed)
        hist = repK(hist_ref)
        fin0 = repK(fin_ref) != 0
        t = repK(t_ref)
        u = repK(u_ref)
        il = il_ref[:][:, 0, :]  # (B, 1)

        pos = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
        d_ids = pos // W
        parent = pos - d_ids * W
        gen = parent * K + d_ids  # reference generation order

        active = (t < il) & (~fin0)  # tone_latent.rs:75-84
        pred = d_ids
        lp = hist + h
        nt = t + 1
        nu = u + 1
        pad0 = (~active) & (d_ids == 0)
        pred = jnp.where(pad0, empty_tone_id, pred)
        lp = jnp.where(pad0, hist, lp)
        nt = jnp.where(pad0, t, nt)
        nu = jnp.where(pad0, u, nu)
        cfin = pad0
        valid = active | pad0

        ekey1 = nt * 16384 + nu
        ekey2 = pred * 2 + cfin.astype(jnp.int32)
        hit3, _n = _select(lp, valid, [ekey1, ekey2], gen, W_out)

        branch = _pick_i32(hit3, parent)
        opred_ref[:] = _pick_i32(hit3, pred)[:, None, :]
        olp_ref[:] = _pick_f32(hit3, lp)[:, None, :]
        ont_ref[:] = _pick_i32(hit3, nt)[:, None, :]
        onu_ref[:] = _pick_i32(hit3, nu)[:, None, :]
        ofin_ref[:] = _pick_i32(hit3, cfin.astype(jnp.int32))[:, None, :]
        obr_ref[:] = branch[:, None, :]
        if reorder_state:
            state = state_ref[:]
            acc = jnp.zeros(
                (state.shape[0], W_out, state.shape[2]), jnp.float32
            )
            for w in range(state.shape[1]):
                m = (branch == w).astype(jnp.int32)[:, :, None]
                acc = acc + jnp.where(
                    m == 1, state[:, w, :][:, None, :], 0.0
                )
            ostate_ref[:] = acc

    return kernel


def tone_beam_search_decode(
    h: jax.Array,
    log_prob_history: jax.Array,
    is_finished: jax.Array,
    t: jax.Array,
    u: jax.Array,
    input_length: jax.Array,
    *,
    empty_tone_id: int = 0,
    max_beam_width: int | None = None,
    state=None,
):
    """Fused batched tone step; drop-in equal to
    ops.tone_latent.beam_search_decode (tests/test_beam_pallas.py).
    state: optional (B, W, F) f32 per-beam rows; when given the kernel
    also returns state[branch] as the last output (folded reorder)."""
    B, W, K = h.shape
    if K * 2 >= 2**31:
        raise ValueError(f"tone_class_size {K} overflows eq-key packing")
    W_out = W if max_beam_width is None else max_beam_width
    C = W * K

    kernel = _make_tone_kernel(
        W_out, K, int(empty_tone_id), reorder_state=state is not None
    )
    bb = _select_block(B, C, oneshot_temps=70)
    row = lambda width: pl.BlockSpec((bb, 1, width), lambda i: (i, 0, 0))
    in_specs = [row(C)] + [row(W)] * 4 + [row(1)]
    out_specs = [row(W_out)] * 6
    out_shape = [
        jax.ShapeDtypeStruct((B, 1, W_out), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, W_out), jnp.float32),
        jax.ShapeDtypeStruct((B, 1, W_out), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, W_out), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, W_out), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, W_out), jnp.int32),
    ]
    args = [
        jnp.transpose(h, (0, 2, 1)).reshape(B, 1, C).astype(jnp.float32),
        log_prob_history.astype(jnp.float32).reshape(B, 1, W),
        is_finished.astype(jnp.int32).reshape(B, 1, W),
        t.astype(jnp.int32).reshape(B, 1, W),
        u.astype(jnp.int32).reshape(B, 1, W),
        jnp.asarray(input_length, jnp.int32).reshape(B, 1, 1),
    ]
    if state is not None:
        F = state.shape[2]
        srow = lambda n_, width: pl.BlockSpec(
            (bb, n_, width), lambda i: (i, 0, 0)
        )
        in_specs = in_specs + [srow(W, F)]
        out_specs = out_specs + [srow(W_out, F)]
        out_shape = out_shape + [
            jax.ShapeDtypeStruct((B, W_out, F), jnp.float32)
        ]
        args = args + [state.astype(jnp.float32)]
    out = pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*args)
    pred, lp, nt, nu, fin, br = (x.reshape(B, W_out) for x in out[:6])
    result = (pred, lp, nt, nu, fin != 0, br)
    if state is not None:
        result = result + (out[6],)
    return result
