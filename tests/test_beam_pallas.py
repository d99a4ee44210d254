"""Fused Pallas v1 beam step vs the XLA reference path.

Runs the kernel in interpreter mode on the CPU backend (the same kernel
code the TPU compiles); on-hardware bit-exact equality is asserted by
scripts/probe_beam_pallas.py and was verified on a v5e (20 randomized
trials, docs/DECODE_PROFILE.md).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ssnt_tts_tpu.ops import beam_pallas, beam_v1
from ssnt_tts_tpu.parallel import decode as decode_lib


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(beam_pallas, "_INTERPRET", True)


def _rand_case(trial, B, W, T):
    r = np.random.default_rng(trial)
    h = r.normal(0, 1, (B, W, 2)).astype(np.float32)
    if trial % 2:
        h = np.round(h * 2) / 2  # force log-prob ties
    lp = np.round(r.normal(0, 1, (B, W)), 1).astype(np.float32)
    fin = r.random((B, W)) < 0.2
    t = r.integers(0, T + 1, (B, W)).astype(np.int32)
    u = r.integers(0, 10, (B, W)).astype(np.int32)
    return h, lp, fin, t, u


NAMES = ["prediction", "log_prob", "next_t", "next_u", "is_finished",
         "beam_branch"]


def test_matches_xla_randomized():
    B, W, T = 8, 8, 20
    il = jnp.full((B,), T, jnp.int32)
    for trial in range(30):
        h, lp, fin, t, u = _rand_case(trial, B, W, T)
        a = beam_v1.beam_search_decode_batched(
            jnp.asarray(h), jnp.asarray(lp), jnp.asarray(fin),
            jnp.asarray(t), jnp.asarray(u), il,
        )
        b = beam_pallas.beam_search_step_batched(
            jnp.asarray(h), jnp.asarray(lp), jnp.asarray(fin),
            jnp.asarray(t), jnp.asarray(u), il,
        )
        for k, xa, xb in zip(NAMES, a, b):
            np.testing.assert_array_equal(
                np.asarray(xa), np.asarray(xb),
                err_msg=f"trial {trial} {k}",
            )


def test_matches_xla_widening():
    """max_beam_width > W exercises pad-by-repetition of survivors."""
    B, W, T = 4, 3, 12
    il = jnp.full((B,), T, jnp.int32)
    for trial in range(10):
        h, lp, fin, t, u = _rand_case(trial, B, W, T)
        a = beam_v1.beam_search_decode_batched(
            jnp.asarray(h), jnp.asarray(lp), jnp.asarray(fin),
            jnp.asarray(t), jnp.asarray(u), il, max_beam_width=W + 5,
        )
        b = beam_pallas.beam_search_step_batched(
            jnp.asarray(h), jnp.asarray(lp), jnp.asarray(fin),
            jnp.asarray(t), jnp.asarray(u), il, max_beam_width=W + 5,
        )
        for k, xa, xb in zip(NAMES, a, b):
            np.testing.assert_array_equal(
                np.asarray(xa), np.asarray(xb),
                err_msg=f"trial {trial} {k}",
            )


def test_negative_zero_tie():
    """The -0.0/+0.0 tie case (see test_beam_v1) through the kernel.

    The kernel's one-hot log_prob sum may legitimately return +0.0 for a
    selected -0.0 (IEEE -0.0 + +0.0 = +0.0; every consumer compares with
    ==), so equality here is IEEE, exact otherwise.
    """
    B, W, T = 1, 2, 10
    h = jnp.asarray([[[0.0, 0.0], [1.5, -5.0]]], jnp.float32)
    lp = jnp.asarray([[-0.0, -1.5]], jnp.float32)
    fin = jnp.asarray([[True, False]])
    t = jnp.asarray([[3, 4]], jnp.int32)
    u = jnp.asarray([[2, 2]], jnp.int32)
    il = jnp.full((B,), T, jnp.int32)
    a = beam_v1.beam_search_decode_batched(h, lp, fin, t, u, il)
    b = beam_pallas.beam_search_step_batched(h, lp, fin, t, u, il)
    for k, xa, xb in zip(NAMES, a, b):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb),
                                      err_msg=k)
    assert np.asarray(b[5])[0, 0] == 0 and bool(np.asarray(b[4])[0, 0])


def test_decode_pipeline_equal():
    """Full beam_decode: use_pallas=True (interpret) == XLA path."""
    from ssnt_tts_tpu.models import SSNTModel
    from ssnt_tts_tpu.parallel import train as train_lib
    from ssnt_tts_tpu.utils.config import TrainConfig, tiny_model_config

    cfg = tiny_model_config()
    model = SSNTModel(cfg)
    B, T, U, W = 2, 6, 10, 3
    r = np.random.default_rng(0)
    tokens = jnp.asarray(r.integers(1, cfg.vocab_size, (B, T)), jnp.int32)
    il = jnp.full((B,), T, jnp.int32)
    batch = {
        "tokens": tokens,
        "mel": jnp.asarray(r.normal(0, 1, (B, U, cfg.mel_dim)), jnp.float32),
        "input_length": il,
        "output_length": jnp.full((B,), U, jnp.int32),
    }
    state = train_lib.init_train_state(
        model, jax.random.PRNGKey(0), batch, TrainConfig(warmup_steps=2)
    )
    kw = dict(max_frames=U, beam_width=W)
    a = decode_lib.beam_decode(
        model, state.params, tokens, il, use_pallas=False, **kw
    )
    b = decode_lib.beam_decode(
        model, state.params, tokens, il, use_pallas=True, **kw
    )
    for k in a:
        np.testing.assert_array_equal(
            np.asarray(a[k]), np.asarray(b[k]), err_msg=k
        )


def _rand_v2_case(trial, B, W, D):
    r = np.random.default_rng(trial)
    T = int(r.integers(3, 12))
    il = np.asarray(r.integers(2, T + 1, (B,)), np.int32)
    ol = np.asarray(r.integers(5, 40, (B,)), np.int32)
    dtab = np.concatenate([[0], r.integers(1, 6, (D - 1,))]).astype(np.int32)
    h = r.normal(0, 1, (B, W, D)).astype(np.float32)
    if trial % 2:
        h = np.round(h * 2) / 2
    lp = np.round(r.normal(0, 1, (B, W)), 1).astype(np.float32)
    fin = r.random((B, W)) < 0.25
    t = r.integers(0, T + 1, (B, W)).astype(np.int32)
    u = r.integers(0, 10, (B, W)).astype(np.int32)
    tot = r.integers(0, 30, (B, W)).astype(np.int32)
    return h, lp, fin, tot, dtab, t, u, il, ol


V2_NAMES = ["prediction", "log_prob", "next_t", "next_u", "is_finished",
            "total_duration", "beam_branch", "num_survivors"]


def test_v2_matches_xla_randomized():
    """Randomized conformance incl. test_mode, allow_skip, empty beams,
    diagonal re-injection (fires whenever a survivor is near-diagonal)."""
    from ssnt_tts_tpu.ops import beam_v2

    B, W, D = 4, 5, 7
    for trial in range(40):
        h, lp, fin, tot, dtab, t, u, il, ol = _rand_v2_case(trial, B, W, D)
        kw = dict(
            zero_duration_id=0,
            allow_skip=bool(trial % 3 == 0),
            test_mode=bool(trial % 4 == 0),
            return_num_survivors=True,
        )
        a = beam_v2.beam_search_decode(
            jnp.asarray(h), jnp.asarray(lp), jnp.asarray(fin),
            jnp.asarray(tot), jnp.asarray(dtab), jnp.asarray(t),
            jnp.asarray(u), jnp.asarray(il), jnp.asarray(ol), **kw,
        )
        b = beam_pallas.v2_beam_search_decode(
            jnp.asarray(h), jnp.asarray(lp), jnp.asarray(fin),
            jnp.asarray(tot), jnp.asarray(dtab), jnp.asarray(t),
            jnp.asarray(u), jnp.asarray(il), jnp.asarray(ol), **kw,
        )
        for k, xa, xb in zip(V2_NAMES, a, b):
            np.testing.assert_array_equal(
                np.asarray(xa), np.asarray(xb),
                err_msg=f"trial {trial} {k}",
            )


def test_v2_pipeline_equal():
    """Full v2_duration_decode: use_pallas=True (interpret) == XLA path."""
    from ssnt_tts_tpu.models import SSNTModel
    from ssnt_tts_tpu.parallel import train as train_lib
    from ssnt_tts_tpu.utils.config import TrainConfig, tiny_model_config

    cfg = tiny_model_config()
    model = SSNTModel(cfg)
    B, T, U, W = 2, 6, 12, 3
    r = np.random.default_rng(0)
    tokens = jnp.asarray(r.integers(1, cfg.vocab_size, (B, T)), jnp.int32)
    il = jnp.full((B,), T, jnp.int32)
    batch = {
        "tokens": tokens,
        "mel": jnp.asarray(r.normal(0, 1, (B, U, cfg.mel_dim)), jnp.float32),
        "input_length": il,
        "output_length": jnp.full((B,), U, jnp.int32),
    }
    state = train_lib.init_train_state(
        model, jax.random.PRNGKey(0), batch, TrainConfig(warmup_steps=2)
    )
    dtab = jnp.arange(cfg.duration_class_size, dtype=jnp.int32)
    kw = dict(
        beam_width=W, max_frames=U,
    )
    a = decode_lib.v2_duration_decode(
        model, state.params, tokens, il, jnp.full((B,), U, jnp.int32),
        dtab, use_pallas=False, **kw,
    )
    b = decode_lib.v2_duration_decode(
        model, state.params, tokens, il, jnp.full((B,), U, jnp.int32),
        dtab, use_pallas=True, **kw,
    )
    for k in a:
        np.testing.assert_array_equal(
            np.asarray(a[k]), np.asarray(b[k]), err_msg=k
        )


def test_step_reorder_matches_compose():
    """Fused step+reorder == step then take_along_axis."""
    B, W, T, F = 6, 4, 15, 13
    il = jnp.full((B,), T, jnp.int32)
    for trial in range(10):
        h, lp, fin, t, u = _rand_case(trial, B, W, T)
        r = np.random.default_rng(trial + 999)
        state = jnp.asarray(r.normal(0, 1, (B, W, F)), jnp.float32)
        a = beam_v1.beam_search_decode_batched(
            jnp.asarray(h), jnp.asarray(lp), jnp.asarray(fin),
            jnp.asarray(t), jnp.asarray(u), il,
        )
        a_state = jnp.take_along_axis(
            state, a[5][..., None].astype(jnp.int32), axis=1
        )
        b = beam_pallas.beam_search_step_reorder(
            jnp.asarray(h), jnp.asarray(lp), jnp.asarray(fin),
            jnp.asarray(t), jnp.asarray(u), il, state,
        )
        for k, xa, xb in zip(NAMES, a, b[:6]):
            np.testing.assert_array_equal(
                np.asarray(xa), np.asarray(xb),
                err_msg=f"trial {trial} {k}",
            )
        np.testing.assert_array_equal(
            np.asarray(a_state), np.asarray(b[6]),
            err_msg=f"trial {trial} state",
        )


def test_tone_matches_xla_randomized():
    """Fused tone kernel vs ops.tone_latent XLA: randomized trials with
    tie-heavy log-probs, finished/out-of-range beams, non-divisible C."""
    from ssnt_tts_tpu.ops import tone_latent

    for B, W, K in [(4, 5, 7), (2, 4, 8)]:  # C=35 (untiled) and 32 (tiled)
        for trial in range(20):
            r = np.random.default_rng(100 * K + trial)
            h = r.normal(0, 1, (B, W, K)).astype(np.float32)
            if trial % 2:
                h = np.round(h * 2) / 2
            lp = np.round(r.normal(0, 1, (B, W)), 1).astype(np.float32)
            fin = r.random((B, W)) < 0.25
            T = 6
            t = r.integers(0, T + 1, (B, W)).astype(np.int32)
            u = r.integers(0, 10, (B, W)).astype(np.int32)
            il = np.full((B,), T, np.int32)
            a = tone_latent.beam_search_decode(
                jnp.asarray(h), jnp.asarray(lp), jnp.asarray(fin),
                jnp.asarray(t), jnp.asarray(u), jnp.asarray(il),
                empty_tone_id=2,
            )
            b = beam_pallas.tone_beam_search_decode(
                jnp.asarray(h), jnp.asarray(lp), jnp.asarray(fin),
                jnp.asarray(t), jnp.asarray(u), jnp.asarray(il),
                empty_tone_id=2,
            )
            names = ["pred", "log_prob", "next_t", "next_u", "fin",
                     "branch"]
            for k, xa, xb in zip(names, a, b):
                np.testing.assert_array_equal(
                    np.asarray(xa), np.asarray(xb),
                    err_msg=f"B{B}W{W}K{K} trial {trial} {k}",
                )


def test_tone_pipeline_equal():
    """Full tone_decode: use_pallas=True (interpret) == XLA path."""
    from ssnt_tts_tpu.models import SSNTModel
    from ssnt_tts_tpu.parallel import decode as decode_lib
    from ssnt_tts_tpu.parallel import train as train_lib
    from ssnt_tts_tpu.utils.config import TrainConfig, tiny_model_config

    cfg = tiny_model_config()
    model = SSNTModel(cfg)
    B, T, U, W = 2, 6, 12, 3
    r = np.random.default_rng(0)
    tokens = jnp.asarray(r.integers(1, cfg.vocab_size, (B, T)), jnp.int32)
    il = jnp.asarray([T, T - 2], jnp.int32)
    batch = {
        "tokens": tokens,
        "mel": jnp.asarray(r.normal(0, 1, (B, U, cfg.mel_dim)), jnp.float32),
        "input_length": il,
        "output_length": jnp.full((B,), U, jnp.int32),
    }
    state = train_lib.init_train_state(
        model, jax.random.PRNGKey(0), batch, TrainConfig(warmup_steps=2)
    )
    out_x = decode_lib.tone_decode(
        model, state.params, tokens, il, beam_width=W, use_pallas=False
    )
    out_p = decode_lib.tone_decode(
        model, state.params, tokens, il, beam_width=W, use_pallas=True
    )
    for k in ["tones", "prediction", "beam_branch", "log_prob"]:
        np.testing.assert_array_equal(
            np.asarray(out_x[k]), np.asarray(out_p[k]), err_msg=k
        )


def test_tone_widening_beam():
    """max_beam_width > W pad-by-repetition through the fused tone kernel
    equals the XLA path."""
    from ssnt_tts_tpu.ops import tone_latent

    B, W, K, T = 3, 3, 4, 6
    r = np.random.default_rng(9)
    h = r.normal(0, 1, (B, W, K)).astype(np.float32)
    lp = np.round(r.normal(0, 1, (B, W)), 1).astype(np.float32)
    fin = r.random((B, W)) < 0.3
    t = r.integers(0, T + 1, (B, W)).astype(np.int32)
    u = r.integers(0, 6, (B, W)).astype(np.int32)
    il = np.full((B,), T, np.int32)
    # The batched XLA wrapper pins max_beam_width = W (reference FFI
    # parity, ssnt_tts_c/src/lib.rs:342); widen via the per-utterance
    # step vmapped.
    a = jax.vmap(
        lambda h_, lp_, fin_, t_, u_, il_: tone_latent.beam_search_step(
            h_, lp_, fin_, t_, u_, il_, empty_tone_id=1, max_beam_width=7,
        )
    )(
        jnp.asarray(h), jnp.asarray(lp), jnp.asarray(fin),
        jnp.asarray(t), jnp.asarray(u), jnp.asarray(il),
    )
    b = beam_pallas.tone_beam_search_decode(
        jnp.asarray(h), jnp.asarray(lp), jnp.asarray(fin),
        jnp.asarray(t), jnp.asarray(u), jnp.asarray(il),
        empty_tone_id=1, max_beam_width=7,
    )
    for xa, xb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_v2_kernel_state_reorder():
    """v2 kernel's folded state reorder == step + take_along_axis."""
    from ssnt_tts_tpu.ops import beam_v2

    B, W, D = 4, 5, 7
    for trial in range(10):
        h, lp, fin, tot, dtab, t, u, il, ol = _rand_v2_case(trial, B, W, D)
        r = np.random.default_rng(1000 + trial)
        state = r.normal(0, 1, (B, W, 13)).astype(np.float32)
        kw = dict(zero_duration_id=0, allow_skip=False, test_mode=False,
                  return_num_survivors=True)
        a = beam_v2.beam_search_decode(
            jnp.asarray(h), jnp.asarray(lp), jnp.asarray(fin),
            jnp.asarray(tot), jnp.asarray(dtab), jnp.asarray(t),
            jnp.asarray(u), jnp.asarray(il), jnp.asarray(ol), **kw,
        )
        b = beam_pallas.v2_beam_search_decode(
            jnp.asarray(h), jnp.asarray(lp), jnp.asarray(fin),
            jnp.asarray(tot), jnp.asarray(dtab), jnp.asarray(t),
            jnp.asarray(u), jnp.asarray(il), jnp.asarray(ol),
            state=jnp.asarray(state), **kw,
        )
        branch = np.asarray(a[6]).astype(np.int64)
        want = np.take_along_axis(state, branch[..., None], axis=1)
        np.testing.assert_array_equal(np.asarray(b[8]), want,
                                      err_msg=f"trial {trial}")
        for xa, xb in zip(a[:7], b[:7]):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_tone_kernel_state_reorder():
    """Tone kernel's folded state reorder == step + take_along_axis."""
    from ssnt_tts_tpu.ops import tone_latent

    B, W, K, T = 3, 4, 8, 6
    for trial in range(8):
        r = np.random.default_rng(2000 + trial)
        h = r.normal(0, 1, (B, W, K)).astype(np.float32)
        lp = np.round(r.normal(0, 1, (B, W)), 1).astype(np.float32)
        fin = r.random((B, W)) < 0.3
        t = r.integers(0, T + 1, (B, W)).astype(np.int32)
        u = r.integers(0, 6, (B, W)).astype(np.int32)
        il = np.full((B,), T, np.int32)
        state = r.normal(0, 1, (B, W, 11)).astype(np.float32)
        a = tone_latent.beam_search_decode(
            jnp.asarray(h), jnp.asarray(lp), jnp.asarray(fin),
            jnp.asarray(t), jnp.asarray(u), jnp.asarray(il),
            empty_tone_id=0,
        )
        b = beam_pallas.tone_beam_search_decode(
            jnp.asarray(h), jnp.asarray(lp), jnp.asarray(fin),
            jnp.asarray(t), jnp.asarray(u), jnp.asarray(il),
            empty_tone_id=0, state=jnp.asarray(state),
        )
        branch = np.asarray(a[5]).astype(np.int64)
        want = np.take_along_axis(state, branch[..., None], axis=1)
        np.testing.assert_array_equal(np.asarray(b[6]), want,
                                      err_msg=f"trial {trial}")
        for xa, xb in zip(a[:6], b[:6]):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_select_bitonic_equals_sort_free():
    """Round 5: the bitonic selection must produce the IDENTICAL hit
    one-hot and survivor count as the pairwise sort-free forms, across
    random inputs engineered to contain ties, duplicates (equal eq-keys),
    invalid lanes, empty beams, and diagonal re-injections."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ssnt_tts_tpu.ops import beam_pallas as bp

    rng = np.random.default_rng(7)
    for trial in range(20):
        B = int(rng.integers(1, 5))
        W_out = int(rng.integers(2, 9))
        C = int(rng.choice([16, 20, 64, 80, 128]))
        # Coarse-quantized log-probs force plenty of exact ties.
        clp = jnp.asarray(
            np.round(rng.normal(0, 1, (B, C)) * 4) / 4, jnp.float32
        )
        valid = jnp.asarray(rng.random((B, C)) < 0.7)
        if trial % 5 == 0:
            valid = valid.at[0].set(False)  # empty beam row
        ek1 = jnp.asarray(rng.integers(0, 3, (B, C)), jnp.int32)
        ek2 = jnp.asarray(
            rng.integers(0, 3, (B, C)) * 131072
            + rng.integers(0, 2, (B, C)),
            jnp.int32,
        )
        gen = jnp.broadcast_to(
            jnp.arange(C, dtype=jnp.int32)[None], (B, C)
        )
        diag = (
            jnp.asarray(rng.random((B, C)) < 0.2)
            if trial % 2
            else None
        )
        h_ref, n_ref = jax.jit(
            lambda a, v, k1, k2, g: bp._select_sort_free(
                a, v, [k1, k2], g, W_out, diag_mask=diag
            )
        )(clp, valid, ek1, ek2, gen)
        h_bit, n_bit = jax.jit(
            lambda a, v, k1, k2, g: bp._select_bitonic(
                a, v, [k1, k2], g, W_out, diag_mask=diag
            )
        )(clp, valid, ek1, ek2, gen)
        np.testing.assert_array_equal(
            np.asarray(n_ref), np.asarray(n_bit), err_msg=f"trial {trial}"
        )
        np.testing.assert_array_equal(
            np.asarray(h_ref), np.asarray(h_bit), err_msg=f"trial {trial}"
        )
