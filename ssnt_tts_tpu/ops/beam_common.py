"""Shared beam-selection machinery for the three SSNT beam-search step kernels.

The reference (Rust) implements each beam step as:

    expand candidates (ordered: beam-major, class-minor)
      -> stable sort descending by cumulative log-prob       (src/lib.rs:161)
      -> dedup consecutive candidates equal on all fields
         except parent_branch ("eq_ignore_parent")           (src/lib.rs:162)
      -> pad by repeating survivors from the front           (src/lib.rs:163-167)
      -> truncate to max_beam_width                          (src/lib.rs:168)

This module reproduces those semantics with fixed shapes on TPU:
candidates live in a dense (W*D,) layout (one slot per beam x class, with a
validity mask standing in for Rust's Option/filter_map), selection uses a
stable lexsort keyed on (validity, -log_prob) so that equal-log-prob
candidates keep the reference's generation order, dedup is a vectorized
adjacent-equality mask (exact because field equality is transitive for
non-NaN floats), and the pad-by-repetition is a modular gather.

v2's diagonal re-injection (src/v2.rs:282-308) is supported via `diag_mask`:
the first surviving candidate flagged on-diagonal replaces the final beam
slot, exactly like the reference's truncate(max_w-1) + push.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp


def select_beams(
    fields: Dict[str, jax.Array],
    valid: jax.Array,
    log_prob: jax.Array,
    max_beam_width: int,
    eq_keys: Sequence[str],
    diag_mask: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Select the top `max_beam_width` beam hypotheses reference-identically.

    Args:
      fields: name -> (C,) candidate field arrays (C = beam_width * class_count).
        Candidate index order must match the reference's generation order
        (beam-major, class-minor); invalid slots may hold arbitrary values.
      valid: (C,) bool admissibility mask.
      log_prob: (C,) f32 cumulative log-probs (the sort key).
      max_beam_width: static output width.
      eq_keys: field names participating in `eq_ignore_parent` dedup
        (reference: prediction, log_prob, next_t, next_u, is_finished
        [, total_duration]).
      diag_mask: optional (C,) bool; if given, the first *surviving* candidate
        with a True flag replaces the last output slot (v2 diagonal
        re-injection, src/v2.rs:298-308).

    Returns:
      name -> (max_beam_width,) selected fields, plus key "num_survivors"
      (scalar i32; 0 indicates the reference would have panicked with an
      empty beam, src/v2.rs:292).
    """
    C = valid.shape[0]
    idx = jnp.arange(C, dtype=jnp.int32)

    # Stable sort: invalid candidates strictly after all valid ones (even
    # -inf-scored ones), ties broken by candidate generation order.
    neg_lp = jnp.where(valid, -log_prob, jnp.inf)
    order = jnp.lexsort((neg_lp, (~valid).astype(jnp.int32)))

    sorted_fields = {k: v[order] for k, v in fields.items()}
    sorted_lp = log_prob[order]
    sorted_valid = valid[order]

    # Adjacent dedup (eq_ignore_parent). Equality on the eq fields is
    # transitive for non-NaN values, so "equal to immediate predecessor"
    # coincides with Rust's dedup_by against the last-retained element.
    eq_prev = sorted_valid & jnp.roll(sorted_valid, 1)
    eq_prev = eq_prev & (sorted_lp == jnp.roll(sorted_lp, 1))
    for k in eq_keys:
        if k == "log_prob":
            continue
        a = sorted_fields[k]
        eq_prev = eq_prev & (a == jnp.roll(a, 1))
    eq_prev = eq_prev.at[0].set(False)
    keep = sorted_valid & ~eq_prev

    n = jnp.sum(keep).astype(jnp.int32)
    rank = jnp.cumsum(keep).astype(jnp.int32) - 1
    # survivor_pos[r] = sorted-order position of the r-th survivor.
    survivor_pos = (
        jnp.zeros((C,), jnp.int32)
        .at[jnp.where(keep, rank, C)]
        .set(idx, mode="drop")
    )

    j = jnp.arange(max_beam_width, dtype=jnp.int32)
    n_safe = jnp.maximum(n, 1)
    # Slots beyond the survivor count repeat survivors from the front
    # (reference pushes results[i % n] for i in 0..max_w-n).
    src_rank = jnp.where(j < n, j % n_safe, (j - n) % n_safe)
    src = survivor_pos[src_rank]

    out = {k: v[src] for k, v in sorted_fields.items()}

    if diag_mask is not None:
        sorted_diag = diag_mask[order]
        diag_keep = keep & sorted_diag
        any_diag = jnp.any(diag_keep)
        first_pos = jnp.argmax(diag_keep)  # first True in sorted order
        last = max_beam_width - 1
        for k in out:
            out[k] = out[k].at[last].set(
                jnp.where(any_diag, sorted_fields[k][first_pos], out[k][last])
            )

    out["num_survivors"] = n
    return out


def interleave_candidates(per_class: Sequence[jax.Array]) -> jax.Array:
    """Stack per-class (W,) candidate arrays into beam-major (W*D,) order."""
    return jnp.stack(per_class, axis=1).reshape(-1)
