"""Model-fused v2/tone beam decode step — ONE kernel launch per step.

Round-4's fused beam kernels still left the decode scan ~10 serial
dispatches per step: the AR class-cell's matmuls (embed + GRU + output
head), the enc gather, the candidate-state repeats, and the kernel itself.
On a TPU the vector work of each of those ops finishes in nanoseconds;
inside a `lax.scan` the step cost is the SUM OF DISPATCH LATENCIES
(docs/DECODE_PROFILE.md) — the structural floor VERDICT r4 #1 told us to
break by moving the model matmuls INTO the beam kernel (Mosaic drives the
MXU directly).

Two structural observations make the fusion cheap (models/stepmath.py):

  1. In the v2/tone scans every beam's source position t is a
     deterministic function of the step index, so the enc-side matmuls
     hoist OUT of the scan entirely into (T, B, ·) path arrays; the
     kernel indexes its step's slab via scalar-prefetch (no XLA slicing
     dispatch).
  2. The per-step model math that remains — class-embedding one-hot,
     GRU cell, output projection, log_softmax — is all (B*W, H)-shaped
     MXU/VPU work that fits in the same kernel invocation as the
     candidate grid + tiled sort-free selection + parent-pointer state
     reorder (ops/beam_pallas.py machinery, shared not copied).

The per-step scan body is then: fused kernel + one scalar increment.

Layout notes (Mosaic):
  - beam state rides (B, 1, W) lane vectors and (B, W, H) row blocks —
    the layouts the existing kernels use; no relayouts cross the
    XLA/kernel boundary between steps (outputs feed back as inputs).
  - prev_class is carried BOTH ways: (B, W, 1) sublane layout feeds the
    embedding one-hot; the kernel emits the selected class in that
    layout directly from the selection one-hot (a keepdims pick), so no
    lane<->sublane relayout ever happens.
  - the per-beam candidate expansion (B, W) -> (B, C) is ONE f32 MXU
    one-hot matmul over all five fields (stacked on the sublane axis) —
    exact for f32 and for ints < 2**24.
  - logits (B, W, D) -> beam-major (B, C) lanes via W static
    roll-accumulates (pltpu.roll; no dynamic lane addressing).

Model math calls models/stepmath.py functions — the same code the tests
bit-check against the flax modules — so the fused path cannot drift from
the training-time parameters' semantics.

Reference mapping: replaces the reference's per-step h computation +
beam op round trip (SURVEY.md §3.1; src/v2.rs:221-267,
src/tone_latent.rs:144-182) with a single on-device launch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssnt_tts_tpu.models import stepmath
from ssnt_tts_tpu.ops.beam_pallas import (
    _VMEM_STACK_BUDGET,
    _interpret,
    _pick_f32,
    _pick_i32,
    _select,
    _v2_candidates,
)

# Budget-probe ablation switch (scripts/probe_budget_r5.py): replaces the
# bitonic selection with a trivial slot<-candidate identity so the
# non-selection kernel cost is separately measurable. NEVER set outside
# probes.
_TRIVIAL_SELECT = False


class FusedWeights(NamedTuple):
    """Kernel-ready weight arrays (pre-cast once, outside the scan, to
    the model's compute dtype; the kernel infers its compute dtype from
    embed.dtype so it can never diverge from the flax modules)."""

    embed: jax.Array   # (D, H) compute dtype
    wi: jax.Array      # (H, 3H) compute dtype
    bi: jax.Array      # (1, 3H) compute dtype
    wh: jax.Array      # (H, 3H) compute dtype
    bhn: jax.Array     # (1, H) compute dtype
    out_k: jax.Array   # (H, D) f32
    out_b: jax.Array   # (1, D) f32


def prepare_fused_weights(
    w: stepmath.ClassStepWeights, dtype=jnp.bfloat16
) -> FusedWeights:
    bf = jnp.dtype(dtype)
    return FusedWeights(
        embed=w.embed.astype(bf),
        wi=w.wi.astype(bf),
        bi=w.bi.astype(bf).reshape(1, -1),
        wh=w.wh.astype(bf),
        bhn=w.bhn.astype(bf).reshape(1, -1),
        out_k=w.out_k.astype(jnp.float32),
        out_b=w.out_b.astype(jnp.float32).reshape(1, -1),
    )


def _rows_to_lanes(x3, C: int):
    """(B, W, D) -> (B, C=W*D): lane w*D+d := x3[b, w, d], via W static
    one-hot MXU dots with shifted-diagonal matrices (disjoint supports,
    exact at HIGHEST precision; Mosaic's lane-concat can't assemble
    mixed-offset vregs, so no concatenate/roll form survives lowering)."""
    B, W, D = x3.shape
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (D, C), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (D, C), 1)
    acc = None
    for w in range(W):
        M = (c_iota == d_iota + w * D).astype(jnp.float32)
        term = jnp.dot(
            x3[:, w, :].astype(jnp.float32), M,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        acc = term if acc is None else acc + term
    return acc


def _expand_parent_major(fields, D: int, C: int):
    """[(B, W) f32] -> [(B, C) f32] with out[b, c] = field[b, c // D]:
    one f32 MXU one-hot matmul for ALL fields (stacked on sublanes).
    Exact for f32 values and integers below 2**24."""
    B, W = fields[0].shape
    X = jnp.concatenate(fields, axis=0)  # (k*B, W)
    M = (
        jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (W, C), 1) // D
    ).astype(jnp.float32)
    # HIGHEST precision is load-bearing: default matmul precision
    # truncates operands to bf16, which corrupts any field value above
    # bf16's 8-bit mantissa (total_duration routinely is).
    E = jnp.dot(
        X, M, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (k*B, C)
    return [E[i * B:(i + 1) * B] for i in range(len(fields))]


def _model_step(
    xin, base1, pc3, state3, embed, wi, bi, wh, bhn, out_k, out_b,
):
    """In-kernel AR class step (stepmath semantics, 2D shapes).

    xin (B, H) bf16; base1 (B, D) f32; pc3 (B, W, 1) i32;
    state3 (B, W, H) f32. Returns (h_logp3 (B, W, D) f32,
    new_state (B, W, H) f32)."""
    B, W, H = state3.shape
    D = base1.shape[1]
    bf = embed.dtype  # the model's compute dtype (ModelConfig.dtype)
    oh3 = (
        jax.lax.broadcasted_iota(jnp.int32, (B, W, D), 2) == pc3
    ).astype(jnp.float32)
    # One-hot row pick, all-f32 at HIGHEST precision (Mosaic rejects
    # bf16 operands under HIGHEST; f32-upcast -> pick -> round back is
    # value-identical to a table lookup in the compute dtype).
    emb = jnp.dot(
        oh3.reshape(B * W, D), embed.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(bf)
    x = emb + jnp.broadcast_to(
        xin[:, None, :], (B, W, H)
    ).reshape(B * W, H)
    # Biases stay 2D (1, X): Mosaic's 1D-vector broadcasts are unsafe
    # (silently wrong values on hardware — bisected round 5); (1, X) +
    # (N, X) is the supported sublane-broadcast form.
    new_h = stepmath.gru_step(
        wi, bi, wh, bhn, state3.reshape(B * W, H), x
    )  # (B*W, H) f32
    corr = (
        jnp.dot(new_h, out_k, preferred_element_type=jnp.float32)
        + out_b
    )  # (B*W, D) f32
    logits3 = base1[:, None, :] + corr.reshape(B, W, D)
    h_logp3 = jax.nn.log_softmax(logits3, axis=-1)
    return h_logp3, new_h.reshape(B, W, H)


def _reorder_rows(state3, branch, W_out: int):
    """state3 (B, W, F), branch (B, W_out) -> state3[b, branch[b, i], :]
    via W masked accumulations (branch already in VMEM)."""
    B, W, F = state3.shape
    acc = jnp.zeros((B, W_out, F), state3.dtype)
    for w in range(W):
        m = (branch == w).astype(jnp.int32)[:, :, None]
        acc = acc + jnp.where(m == 1, state3[:, w, :][:, None, :],
                              jnp.zeros((), state3.dtype))
    return acc


def _make_fused_kernel(
    kind: str,
    W: int,
    D: int,
    *,
    zero_duration_id: int = 0,
    allow_skip: bool = False,
    test_mode: bool = False,
    band_lower_frac: float = 0.05,
    band_upper_frac: float = 0.1,
    overrun_multiplier: int = 3,
    diag_lo: float = -20.0,
    diag_hi: float = 0.0,
    empty_tone_id: int = 0,
    feas_guard: bool = False,
):
    """kind: "v2" (duration constraints + re-injection + survivor count)
    or "tone" (no duration bookkeeping)."""
    C = W * D
    v2 = kind == "v2"

    def kernel(s_ref, xin_ref, base_ref, pc_ref, state_ref,
               lp_ref, fin_ref, *rest):
        if v2:
            (tot_ref, t_ref, u_ref, dtab_ref, il_ref, ol_ref,
             emptied_ref,
             embed_ref, wi_ref, bi_ref, wh_ref, bhn_ref, outk_ref,
             outb_ref,
             opred_ref, olp_ref, ont_ref, onu_ref, ofin_ref, otot_ref,
             obr_ref, onsurv_ref, oemptied_ref, opc_ref,
             ostate_ref, ostep_ref) = rest
        else:
            (t_ref, u_ref, il_ref,
             embed_ref, wi_ref, bi_ref, wh_ref, bhn_ref, outk_ref,
             outb_ref,
             opred_ref, olp_ref, ont_ref, onu_ref, ofin_ref,
             obr_ref, opc_ref, ostate_ref, ostep_ref) = rest
        B = state_ref.shape[0]

        # ---- model: AR class step for all (b, w) rows ----
        h3, new_state = _model_step(
            xin_ref[:][0], base_ref[:][0], pc_ref[:], state_ref[:],
            embed_ref[:], wi_ref[:], bi_ref[:], wh_ref[:], bhn_ref[:],
            outk_ref[:], outb_ref[:],
        )
        h = _rows_to_lanes(h3, C)  # (B, C) beam-major class-minor f32

        # ---- candidate grid on (B, C) lanes ----
        lp_w = lp_ref[:][:, 0, :]          # (B, W)
        fin_w = fin_ref[:][:, 0, :]
        t_w = t_ref[:][:, 0, :]
        u_w = u_ref[:][:, 0, :]
        T = il_ref[:][:, 0, :]             # (B, 1)
        if v2:
            tot_w = tot_ref[:][:, 0, :]
            hist, finf, totf, tf, uf = _expand_parent_major(
                [lp_w, fin_w.astype(jnp.float32),
                 tot_w.astype(jnp.float32), t_w.astype(jnp.float32),
                 u_w.astype(jnp.float32)],
                D, C,
            )
            fin = finf.astype(jnp.int32) != 0
            tot0 = totf.astype(jnp.int32)
            t = tf.astype(jnp.int32)
            u = uf.astype(jnp.int32)
            dtab = dtab_ref[:][:, 0, :]    # (1, C)
            U = ol_ref[:][:, 0, :]         # (B, 1)
            (pred, clp, nt, nu, cfin, tot, valid, diag_mask, gen,
             parent, ekey1, ekey2) = _v2_candidates(
                h, hist, fin, tot0, t, u, dtab, T, U,
                D=D, zero_duration_id=zero_duration_id,
                allow_skip=allow_skip, test_mode=test_mode,
                band_lower_frac=band_lower_frac,
                band_upper_frac=band_upper_frac,
                overrun_multiplier=overrun_multiplier,
                diag_lo=diag_lo, diag_hi=diag_hi,
                feas_guard=feas_guard,
            )
        else:
            hist, finf, tf, uf = _expand_parent_major(
                [lp_w, fin_w.astype(jnp.float32),
                 t_w.astype(jnp.float32), u_w.astype(jnp.float32)],
                D, C,
            )
            fin = finf.astype(jnp.int32) != 0
            t = tf.astype(jnp.int32)
            u = uf.astype(jnp.int32)
            gen = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
            d_ids = gen % D
            parent = gen // D
            active = (t < T) & (~fin)      # tone_latent.rs:75-84
            pred = d_ids
            clp = hist + h
            nt = t + 1
            nu = u + 1
            pad0 = (~active) & (d_ids == 0)
            pred = jnp.where(pad0, empty_tone_id, pred)
            clp = jnp.where(pad0, hist, clp)
            nt = jnp.where(pad0, t, nt)
            nu = jnp.where(pad0, u, nu)
            cfin = pad0
            valid = active | pad0
            diag_mask = None
            ekey1 = nt * 16384 + nu
            ekey2 = pred * 2 + cfin.astype(jnp.int32)

        if _TRIVIAL_SELECT:
            jj = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
            hit3 = gen[:, None, :] == jj[:, :, None]
            n = jnp.sum(valid.astype(jnp.int32), axis=1, keepdims=True)
        else:
            hit3, n = _select(
                clp, valid, [ekey1, ekey2], gen, W, diag_mask=diag_mask
            )

        branch = _pick_i32(hit3, parent)   # (B, W)
        opred_ref[:] = _pick_i32(hit3, pred)[:, None, :]
        olp_ref[:] = _pick_f32(hit3, clp)[:, None, :]
        ont_ref[:] = _pick_i32(hit3, nt)[:, None, :]
        onu_ref[:] = _pick_i32(hit3, nu)[:, None, :]
        ofin_ref[:] = _pick_i32(hit3, cfin.astype(jnp.int32))[:, None, :]
        obr_ref[:] = branch[:, None, :]
        if v2:
            otot_ref[:] = _pick_i32(hit3, tot)[:, None, :]
            onsurv_ref[:] = n[:, None, :]
            oemptied_ref[:] = jnp.maximum(
                emptied_ref[:][:, 0, :], (n == 0).astype(jnp.int32)
            )[:, None, :]
        # Selected class in (B, W, 1) sublane layout — feeds the next
        # step's embedding one-hot with no lane<->sublane relayout.
        opc_ref[:] = jnp.sum(
            jnp.where(hit3, pred[:, None, :], 0), axis=2, keepdims=True
        )
        ostate_ref[:] = _reorder_rows(new_state, branch, W)
        # Next step index: the scan body then contains NOTHING but this
        # kernel (the +1 would otherwise be its own ~0.75 us dispatch).
        # Stored as a (1, 1) broadcast: Mosaic cannot store scalars.
        ostep_ref[:] = jnp.broadcast_to(s_ref[0, 0] + 1, (1, 1))

    return kernel


def _fused_block(B: int, C: int, W: int, H: int) -> int:
    """Batch block sized for bitonic selection + the model temporaries."""
    L = max(128, 1 << max(1, (C - 1).bit_length()))
    sel = 4 * (14 * L + 6 * max(W, 8) * max(C, 128))
    model = W * 3 * max(H, 128) * 4 * 8
    per_row = sel + model
    bb = max(1, min(B, _VMEM_STACK_BUDGET // per_row))
    while B % bb:
        bb -= 1
    return bb


def fused_class_beam_step(
    kind: str,
    s: jax.Array,
    xin_path: jax.Array,
    base_path: jax.Array,
    fw: FusedWeights,
    prev_class: jax.Array,
    state: jax.Array,
    log_prob: jax.Array,
    is_finished: jax.Array,
    t: jax.Array,
    u: jax.Array,
    input_length3: jax.Array,
    *,
    total_duration: jax.Array | None = None,
    duration_table_tiled: jax.Array | None = None,
    output_length3: jax.Array | None = None,
    emptied: jax.Array | None = None,
    zero_duration_id: int = 0,
    allow_skip: bool = False,
    test_mode: bool = False,
    empty_tone_id: int = 0,
    config=None,
):
    """One fused decode step (model AR cell + beam selection + reorder).

    Shapes (all carried between steps unchanged — no relayouts):
      s (1,) i32 step index (scalar prefetch);
      xin_path (T, B, H) bf16, base_path (T, B, D) f32
        (models/stepmath.class_decode_paths);
      prev_class (B, W, 1) i32; state (B, W, H) f32;
      log_prob (B, 1, W) f32; is_finished/t/u (B, 1, W) i32;
      input_length3/output_length3 (B, 1, 1) i32;
      total_duration (B, 1, W) i32, duration_table_tiled (1, 1, C) i32,
      emptied (B, 1, 1) i32 — v2 only.

    Returns, v2: (pred, lp, nt, nu, nfin, ntot, branch) each (B, 1, W),
    nsurv (B, 1, 1), emptied (B, 1, 1), prev_class (B, W, 1),
    state (B, W, H), next_step (1, 1). Tone: (pred, lp, nt, nu, nfin,
    branch), prev_class, state, next_step. next_step = s + 1 emitted by
    the kernel so the scan body is exactly ONE dispatch.
    """
    from ssnt_tts_tpu.utils.config import V2BeamConfig

    v2 = kind == "v2"
    B, W, H = state.shape
    D = base_path.shape[2]
    C = W * D
    cfg = config if config is not None else V2BeamConfig()

    kernel = _make_fused_kernel(
        kind, W, D,
        zero_duration_id=zero_duration_id, allow_skip=bool(allow_skip),
        test_mode=bool(test_mode),
        band_lower_frac=float(cfg.band_lower_frac),
        band_upper_frac=float(cfg.band_upper_frac),
        overrun_multiplier=int(cfg.overrun_multiplier),
        diag_lo=float(cfg.diagonal_window[0]),
        diag_hi=float(cfg.diagonal_window[1]),
        empty_tone_id=empty_tone_id,
        feas_guard=bool(getattr(cfg, "final_feasible_guard", False)),
    )
    bb = _fused_block(B, C, W, H)
    row = lambda width: pl.BlockSpec(
        (bb, 1, width), lambda i, sr: (i, 0, 0)
    )
    full2 = lambda a, b_: pl.BlockSpec((a, b_), lambda i, sr: (0, 0))
    path = lambda width, dt: pl.BlockSpec(
        (1, bb, width), lambda i, sr: (sr[0, 0], i, 0)
    )
    sub = lambda n_, width: pl.BlockSpec(
        (bb, n_, width), lambda i, sr: (i, 0, 0)
    )

    in_specs = [
        path(H, None),            # xin
        path(D, None),            # base
        sub(W, 1),                # prev_class
        sub(W, H),                # state
        row(W),                   # log_prob
        row(W),                   # is_finished
    ]
    args = [
        xin_path, base_path, prev_class.astype(jnp.int32),
        state.astype(jnp.float32),
        log_prob.astype(jnp.float32), is_finished.astype(jnp.int32),
    ]
    if v2:
        in_specs += [row(W)]
        args += [total_duration.astype(jnp.int32)]
    in_specs += [row(W), row(W)]
    args += [t.astype(jnp.int32), u.astype(jnp.int32)]
    if v2:
        in_specs += [pl.BlockSpec((1, 1, C), lambda i, sr: (0, 0, 0))]
        args += [duration_table_tiled]
    in_specs += [row(1)]
    args += [input_length3]
    if v2:
        in_specs += [row(1), row(1)]
        args += [output_length3, emptied.astype(jnp.int32)]
    # Weights (loop-invariant; DMA'd per grid block).
    H3 = fw.wi.shape[1]
    in_specs += [
        full2(D, H), full2(H, H3), full2(1, H3), full2(H, H3),
        full2(1, H), full2(H, D), full2(1, D),
    ]
    args += list(fw)

    out_specs = [row(W)] * (7 if v2 else 6)
    out_shape = [
        jax.ShapeDtypeStruct((B, 1, W), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, W), jnp.float32),
        jax.ShapeDtypeStruct((B, 1, W), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, W), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, W), jnp.int32),
    ]
    if v2:
        out_shape += [
            jax.ShapeDtypeStruct((B, 1, W), jnp.int32),  # tot
        ]
    out_shape += [jax.ShapeDtypeStruct((B, 1, W), jnp.int32)]  # branch
    if v2:
        out_specs += [row(1), row(1)]
        out_shape += [
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),  # nsurv
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),  # emptied
        ]
    out_specs += [sub(W, 1), sub(W, H)]
    out_shape += [
        jax.ShapeDtypeStruct((B, W, 1), jnp.int32),      # prev_class
        jax.ShapeDtypeStruct((B, W, H), jnp.float32),    # state
    ]
    out_specs += [pl.BlockSpec((1, 1), lambda i, sr: (0, 0))]
    out_shape += [jax.ShapeDtypeStruct((1, 1), jnp.int32)]  # s + 1

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // bb,),
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        interpret=_interpret(),
    )(jnp.asarray(s, jnp.int32).reshape(1, 1), *args)


# ------------------------------------------------------------ v1 fusion

class V1FusedWeights(NamedTuple):
    """Kernel-ready v1 decode-step weights (compute dtype pre-cast;
    biases 2D — Mosaic 1D broadcasts are unsafe)."""

    pw1: jax.Array   # (M, H)
    pb1: jax.Array   # (1, H)
    pw2: jax.Array   # (H, H)
    pb2: jax.Array   # (1, H)
    wi: jax.Array    # (H, 3H)
    bi: jax.Array    # (1, 3H)
    wh: jax.Array    # (H, 3H)
    bhn: jax.Array   # (1, H)
    dpre_k: jax.Array   # (H, R)
    dpre_b: jax.Array   # (1, R)
    dproj_k: jax.Array  # (R, 2R)
    dproj_b: jax.Array  # (1, 2R)
    dbias_k: jax.Array  # (H, 2) f32
    dbias_b: jax.Array  # (1, 2) f32
    dmel_k: jax.Array   # (H, M)
    dmel_b: jax.Array   # (1, M)


def prepare_v1_fused_weights(
    w: stepmath.V1StepWeights, dtype=jnp.bfloat16
) -> V1FusedWeights:
    bf = jnp.dtype(dtype)
    f32 = jnp.float32
    r2 = lambda a: a.reshape(1, -1)
    return V1FusedWeights(
        pw1=w.prenet_w1.astype(bf), pb1=r2(w.prenet_b1.astype(bf)),
        pw2=w.prenet_w2.astype(bf), pb2=r2(w.prenet_b2.astype(bf)),
        wi=w.wi.astype(bf), bi=r2(w.bi.astype(bf)),
        wh=w.wh.astype(bf), bhn=r2(w.bhn.astype(bf)),
        dpre_k=w.dec_pre_k.astype(bf), dpre_b=r2(w.dec_pre_b.astype(bf)),
        dproj_k=w.dec_proj_k.astype(bf),
        dproj_b=r2(w.dec_proj_b.astype(bf)),
        dbias_k=w.dec_bias_k.astype(f32),
        dbias_b=r2(w.dec_bias_b.astype(f32)),
        dmel_k=w.dec_mel_k.astype(bf), dmel_b=r2(w.dec_mel_b.astype(bf)),
    )


def _make_v1_fused_kernel(W: int, M: int, H: int, R2: int, dtype):
    """Fused v1 decode step: prenet + GRU + transition/frame joints +
    class-major candidate grid + bitonic selection + all per-beam state
    reorders, one launch (semantics: SSNTModel.decode_step +
    ops/beam_v1.beam_search_step; reference src/lib.rs:149-230). The
    enc-side gather stays OUTSIDE (t is data-dependent in v1 — the
    alignment search itself — unlike v2/tone's step-determined t)."""
    C = 2 * W
    from ssnt_tts_tpu.ops.beam_pallas import _v1_candidates_from_vals

    def kernel(gath_ref, pm_ref, state_ref, lp_ref, fin_ref, t_ref,
               u_ref, il_ref,
               pw1_ref, pb1_ref, pw2_ref, pb2_ref, wi_ref, bi_ref,
               wh_ref, bhn_ref, dpre_k_ref, dpre_b_ref, dproj_k_ref,
               dproj_b_ref, dbias_k_ref, dbias_b_ref, dmel_k_ref,
               dmel_b_ref,
               opred_ref, olp_ref, ont_ref, onu_ref, ofin_ref, obr_ref,
               othist_ref, omel_ref, ostate_ref):
        B = state_ref.shape[0]
        w = stepmath.V1StepWeights(
            prenet_w1=pw1_ref[:], prenet_b1=pb1_ref[:],
            prenet_w2=pw2_ref[:], prenet_b2=pb2_ref[:],
            wi=wi_ref[:], bi=bi_ref[:], wh=wh_ref[:], bhn=bhn_ref[:],
            dec_pre_k=dpre_k_ref[:], dec_pre_b=dpre_b_ref[:],
            dec_proj_k=dproj_k_ref[:], dec_proj_b=dproj_b_ref[:],
            dec_bias_k=dbias_k_ref[:], dec_bias_b=dbias_b_ref[:],
            dec_mel_k=dmel_k_ref[:], dec_mel_b=dmel_b_ref[:],
            enc_proj_k=None, enc_proj_b=None, enc_bias_k=None,
            enc_bias_b=None, enc_mel_k=None, enc_mel_b=None,
        )
        he, hs, mel, new_h = stepmath.v1_step_math(
            w, gath_ref[:].reshape(B * W, -1),
            state_ref[:].reshape(B * W, H),
            pm_ref[:].reshape(B * W, M),
            dtype=dtype, R2=R2, M=M,
        )
        # Class-major h (B, C): emit lanes [0, W), shift lanes [W, 2W).
        he3 = he.reshape(B, W, 1)
        hs3 = hs.reshape(B, W, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
        h_cm = jnp.zeros((B, C), jnp.float32)
        for w_ in range(W):
            h_cm = jnp.where(
                lane == w_, jnp.broadcast_to(he3[:, w_, :], (B, C)), h_cm
            )
            h_cm = jnp.where(
                lane == W + w_,
                jnp.broadcast_to(hs3[:, w_, :], (B, C)), h_cm,
            )
        rep2v = lambda x: pltpu.repeat(x, 2, axis=1)
        lp2 = rep2v(lp_ref[:][:, 0, :])
        fin2 = rep2v(fin_ref[:][:, 0, :])
        t2 = rep2v(t_ref[:][:, 0, :])
        u2 = rep2v(u_ref[:][:, 0, :])
        il = il_ref[:][:, 0, :]
        if _TRIVIAL_SELECT:
            from ssnt_tts_tpu.ops.beam_pallas import _v1_candidates_core
            pred, clp, cnt, cnu, cfin, parent, hit3 = (
                _v1_candidates_core(
                    h_cm, lp2, fin2 != 0, t2, u2, il, W, trivial=True
                )
            )
        else:
            pred, clp, cnt, cnu, cfin, parent, hit3 = (
                _v1_candidates_from_vals(
                    h_cm, lp2, fin2 != 0, t2, u2, il, W
                )
            )
        branch = _pick_i32(hit3, parent)
        opred_ref[:] = _pick_i32(hit3, pred)[:, None, :]
        olp_ref[:] = _pick_f32(hit3, clp)[:, None, :]
        ont_ref[:] = _pick_i32(hit3, cnt)[:, None, :]
        onu_ref[:] = _pick_i32(hit3, cnu)[:, None, :]
        nfin = _pick_i32(hit3, cfin.astype(jnp.int32))
        ofin_ref[:] = nfin[:, None, :]
        obr_ref[:] = branch[:, None, :]
        # Frame source position = parent's t before the step.
        othist_ref[:] = _pick_i32(hit3, t2)[:, None, :]
        # Sublane-layout masks for the mel finalize (keepdims picks; no
        # lane<->sublane relayout).
        nfin_sub = jnp.sum(
            jnp.where(hit3, cfin.astype(jnp.int32)[:, None, :], 0),
            axis=2, keepdims=True,
        )
        finprev_sub = jnp.sum(
            jnp.where(hit3, fin2[:, None, :], 0), axis=2, keepdims=True
        )
        mel_r = _reorder_rows(mel.reshape(B, W, M), branch, W)
        pm_r = _reorder_rows(pm_ref[:], branch, W)
        st_r = _reorder_rows(new_h.reshape(B, W, H), branch, W)
        # Finished beams emit no new frame; keep their last mel
        # (parallel.decode.beam_decode's post-step where).
        keep_old = (nfin_sub == 1) & (finprev_sub == 1)
        omel_ref[:] = jnp.where(keep_old, pm_r, mel_r)
        ostate_ref[:] = st_r

    return kernel


def fused_v1_beam_step(
    gath: jax.Array,
    prev_mel: jax.Array,
    state: jax.Array,
    log_prob: jax.Array,
    is_finished: jax.Array,
    t: jax.Array,
    u: jax.Array,
    input_length3: jax.Array,
    fw: V1FusedWeights,
    *,
    dtype=jnp.bfloat16,
):
    """One fused v1 decode step.

    gath (B, W, 2R+2+M) f32: stepmath.v1_enc_pack rows gathered at each
    beam's t (the one XLA dispatch left in the scan body);
    prev_mel (B, W, M) f32; state (B, W, H) f32; log_prob (B, 1, W) f32;
    is_finished/t/u (B, 1, W) i32; input_length3 (B, 1, 1) i32.

    Returns (pred, lp, nt, nu, nfin, branch, t_hist) each (B, 1, W),
    mel (B, W, M) f32 (finalized: finished beams keep their last frame),
    state (B, W, H) f32 (parent-reordered)."""
    B, W, H = state.shape
    M = prev_mel.shape[2]
    R2 = gath.shape[2] - 2 - M
    kernel = _make_v1_fused_kernel(W, M, H, R2, jnp.dtype(dtype))
    bb = _fused_block(B, 2 * W, W, H)
    row = lambda w_: pl.BlockSpec((bb, 1, w_), lambda i: (i, 0, 0))
    sub = lambda n_, w_: pl.BlockSpec((bb, n_, w_), lambda i: (i, 0, 0))
    full2 = lambda a, b_: pl.BlockSpec((a, b_), lambda i: (0, 0))
    H3 = fw.wi.shape[1]
    R = R2 // 2
    in_specs = [
        sub(W, R2 + 2 + M), sub(W, M), sub(W, H),
        row(W), row(W), row(W), row(W), row(1),
        full2(M, H), full2(1, H), full2(H, H), full2(1, H),
        full2(H, H3), full2(1, H3), full2(H, H3), full2(1, H),
        full2(H, R), full2(1, R), full2(R, R2), full2(1, R2),
        full2(H, 2), full2(1, 2), full2(H, M), full2(1, M),
    ]
    out_specs = [row(W)] * 7 + [sub(W, M), sub(W, H)]
    out_shape = [
        jax.ShapeDtypeStruct((B, 1, W), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, W), jnp.float32),
        jax.ShapeDtypeStruct((B, 1, W), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, W), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, W), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, W), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, W), jnp.int32),
        jax.ShapeDtypeStruct((B, W, M), jnp.float32),
        jax.ShapeDtypeStruct((B, W, H), jnp.float32),
    ]
    return pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(
        gath.astype(jnp.float32), prev_mel.astype(jnp.float32),
        state.astype(jnp.float32), log_prob.astype(jnp.float32),
        is_finished.astype(jnp.int32), t.astype(jnp.int32),
        u.astype(jnp.int32), input_length3, *fw,
    )
