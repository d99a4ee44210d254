"""Model-fused decode kernels (ops/beam_fused.py, VERDICT r4 #1).

Strategy:
  - stepmath bit-equality: the extracted-weight step math IS the flax
    modules' math (same casts, same operand order) — asserted bitwise.
  - fused-vs-XLA decode equality in interpret mode with an f32-dtype
    model: every discrete output identical, log-probs bitwise equal
    (f32 model => no dtype rounding anywhere; any deviation is a logic
    bug in the kernel, the path precompute, or the carry wiring).
  - bf16 model: discrete outputs still equal on fixed seeds; log-probs
    allclose (the fused path computes the same bf16 ops at different
    batch shapes, so 1-ulp dot differences are expected).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ssnt_tts_tpu.ops.beam_pallas as beam_pallas
from ssnt_tts_tpu.models import SSNTModel, stepmath
from ssnt_tts_tpu.parallel import decode as decode_lib
from ssnt_tts_tpu.utils.config import tiny_model_config


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(beam_pallas, "_INTERPRET", True)


def _setup(dtype="float32", seed=1):
    cfg = tiny_model_config(dtype=dtype)
    model = SSNTModel(cfg)
    rng = np.random.default_rng(seed)
    B, T, U = 4, 12, 24
    toks = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, T)), jnp.int32)
    il = jnp.asarray([12, 9, 12, 5], jnp.int32)
    ol = jnp.asarray([20, 16, 24, 10], jnp.int32)
    mel = jnp.asarray(rng.normal(0, 1, (B, U, cfg.mel_dim)), jnp.float32)
    dd = jnp.zeros((B, T), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), toks, mel, il, ol, dd, dd,
        method=model.loss,
    )
    return cfg, model, params, toks, il, ol, U, rng


def test_stepmath_bitexact_vs_flax():
    cfg, model, params, toks, il, ol, U, rng = _setup()
    T = toks.shape[1]
    W = 8
    enc = model.apply(params, toks, il, method=model.encode)
    state = jnp.asarray(
        rng.normal(0, 1, (4, W, cfg.decoder_dim)), jnp.float32
    )
    t = jnp.asarray(rng.integers(0, T, (4, W)), jnp.int32)
    enc_t = jnp.take_along_axis(
        enc, jnp.clip(t, 0, T - 1)[..., None], axis=1
    )
    for head, ar, method, K in [
        ("duration_head", "duration_ar", model.duration_decode_step,
         cfg.duration_class_size),
        ("tone_head", "tone_ar", model.tone_decode_step,
         cfg.tone_class_size),
    ]:
        pc = jnp.asarray(rng.integers(0, K, (4, W)), jnp.int32)
        h_ref, ns_ref = model.apply(params, enc, t, state, pc,
                                    method=method)
        w = stepmath.extract_class_step_weights(params, head, ar)
        h_my, ns_my = stepmath.class_step_math(
            w, enc_t, state, pc, jnp.dtype(cfg.dtype)
        )
        np.testing.assert_array_equal(np.asarray(ns_ref), np.asarray(ns_my))
        # head runs 3D in flax vs 3D here -> bitwise; GRU runs 2D in flax
        # (reshape) vs 3D here, so allow 1-ulp dot-shape wiggle on h.
        np.testing.assert_allclose(
            np.asarray(h_ref), np.asarray(h_my), rtol=0, atol=2e-6
        )


def test_decode_paths_index_formula():
    """xin/base path rows equal the per-step gathered projections."""
    cfg, model, params, toks, il, ol, U, rng = _setup()
    B, T = toks.shape
    enc = model.apply(params, toks, il, method=model.encode)
    for kind, head, ar in [
        ("v2", "duration_head", "duration_ar"),
        ("tone", "tone_head", "tone_ar"),
    ]:
        w = stepmath.extract_class_step_weights(params, head, ar)
        xin_path, base_path = stepmath.class_decode_paths(
            w, enc, il, kind=kind, dtype=jnp.dtype(cfg.dtype)
        )
        assert xin_path.shape[0] == T and base_path.shape[0] == T
        for s in [0, 3, T - 1]:
            tshared = (
                jnp.minimum(jnp.full((B,), s), il - 1)
                if kind == "v2"
                else jnp.minimum(jnp.full((B,), s), il)
            )
            enc_s = enc[jnp.arange(B), jnp.clip(tshared, 0, T - 1)]
            np.testing.assert_array_equal(
                np.asarray(xin_path[s]),
                np.asarray(stepmath.enc_in_proj(
                    w, enc_s, jnp.dtype(cfg.dtype))),
            )
            np.testing.assert_array_equal(
                np.asarray(base_path[s]),
                np.asarray(stepmath.head_base(
                    w, enc_s, jnp.dtype(cfg.dtype))),
            )


@pytest.mark.parametrize("beam_width", [8, 4])
@pytest.mark.parametrize("allow_skip,test_mode", [
    (False, False), (True, False), (False, True),
])
def test_fused_v2_decode_equals_xla(beam_width, allow_skip, test_mode):
    cfg, model, params, toks, il, ol, U, rng = _setup()
    dtab = jnp.asarray(cfg.duration_table, jnp.int32)
    kw = dict(beam_width=beam_width, max_frames=U,
              allow_skip=allow_skip, test_mode=test_mode)
    out_x = decode_lib.v2_duration_decode(
        model, params, toks, il, ol, dtab,
        fuse_model=False, use_pallas=False, **kw,
    )
    out_f = decode_lib.v2_duration_decode(
        model, params, toks, il, ol, dtab, fuse_model=True, **kw,
    )
    for k in ["prediction", "beam_branch", "durations", "output_length",
              "total_duration", "beam_emptied", "is_finished",
              "source_indexes", "ordered_beam_branch", "log_prob"]:
        np.testing.assert_array_equal(
            np.asarray(out_x[k]), np.asarray(out_f[k]), err_msg=k
        )


@pytest.mark.parametrize("beam_width", [8, 4])
def test_fused_tone_decode_equals_xla(beam_width):
    cfg, model, params, toks, il, ol, U, rng = _setup()
    out_x = decode_lib.tone_decode(
        model, params, toks, il, beam_width=beam_width,
        fuse_model=False, use_pallas=False,
    )
    out_f = decode_lib.tone_decode(
        model, params, toks, il, beam_width=beam_width, fuse_model=True,
    )
    for k in ["tones", "prediction", "beam_branch", "log_prob"]:
        np.testing.assert_array_equal(
            np.asarray(out_x[k]), np.asarray(out_f[k]), err_msg=k
        )


def test_fused_v2_bf16_model():
    """bf16 compute dtype: discrete decode outputs still match the XLA
    path on a fixed seed; log-probs agree to bf16-accumulation noise."""
    cfg, model, params, toks, il, ol, U, rng = _setup(dtype="bfloat16")
    dtab = jnp.asarray(cfg.duration_table, jnp.int32)
    kw = dict(beam_width=8, max_frames=U)
    out_x = decode_lib.v2_duration_decode(
        model, params, toks, il, ol, dtab,
        fuse_model=False, use_pallas=False, **kw,
    )
    out_f = decode_lib.v2_duration_decode(
        model, params, toks, il, ol, dtab, fuse_model=True, **kw,
    )
    np.testing.assert_array_equal(
        np.asarray(out_x["prediction"]), np.asarray(out_f["prediction"])
    )
    np.testing.assert_array_equal(
        np.asarray(out_x["output_length"]),
        np.asarray(out_f["output_length"]),
    )
    np.testing.assert_allclose(
        np.asarray(out_x["log_prob"]), np.asarray(out_f["log_prob"]),
        rtol=0, atol=0.02,
    )


def test_fused_v2_under_jit_and_grad_free():
    """The fused decode jits (static shapes, no host syncs)."""
    cfg, model, params, toks, il, ol, U, rng = _setup()
    dtab = jnp.asarray(cfg.duration_table, jnp.int32)

    @jax.jit
    def run(p, tk, il_, ol_):
        return decode_lib.v2_duration_decode(
            model, p, tk, il_, ol_, dtab,
            beam_width=8, max_frames=U, fuse_model=True,
        )["output_length"]

    out = run(params, toks, il, ol)
    assert out.shape == (4, 8)


@pytest.mark.parametrize("beam_width", [8, 4])
def test_fused_v1_decode_equals_xla(beam_width):
    """Round-5 v1 model fusion: discrete outputs equal, mel bit-exact,
    log-probs within f32 dot-shape association noise (~1 ulp)."""
    cfg, model, params, toks, il, ol, U, rng = _setup()
    kw = dict(max_frames=U, beam_width=beam_width)
    out_x = decode_lib.beam_decode(
        model, params, toks, il, fuse_model=False, use_pallas=False, **kw
    )
    out_f = decode_lib.beam_decode(
        model, params, toks, il, fuse_model=True, **kw
    )
    for k in ["alignment", "beam_branch", "t_history", "prediction",
              "num_frames", "mel"]:
        np.testing.assert_array_equal(
            np.asarray(out_x[k]), np.asarray(out_f[k]), err_msg=k
        )
    np.testing.assert_allclose(
        np.asarray(out_x["log_prob"]), np.asarray(out_f["log_prob"]),
        rtol=0, atol=2e-6,
    )


def test_v1_step_math_matches_flax():
    """stepmath.v1_step_math + v1_enc_pack reproduce
    SSNTModel.decode_step on gathered rows (f32 model: exact up to
    dot-shape association; state/mel bitwise)."""
    cfg, model, params, toks, il, ol, U, rng = _setup()
    B, T = toks.shape
    W = 8
    enc = model.apply(params, toks, il, method=model.encode)
    dt = jnp.dtype(cfg.dtype)
    w = stepmath.extract_v1_step_weights(params)
    pack = stepmath.v1_enc_pack(w, enc, dt)
    state = jnp.asarray(
        rng.normal(0, 1, (B, W, cfg.decoder_dim)), jnp.float32
    )
    pm = jnp.asarray(rng.normal(0, 1, (B, W, cfg.mel_dim)), jnp.float32)
    t = jnp.asarray(rng.integers(0, T, (B, W)), jnp.int32)
    h_ref, ns_ref, mel_ref = model.apply(
        params, enc, jnp.clip(t, 0, T - 1), state, pm,
        method=model.decode_step,
    )
    gath = jnp.take_along_axis(
        pack, jnp.clip(t, 0, T - 1)[..., None], axis=1
    ).reshape(B * W, -1)
    he, hs, mel, ns = stepmath.v1_step_math(
        w, gath, state.reshape(B * W, -1), pm.reshape(B * W, -1), dt
    )
    np.testing.assert_array_equal(
        np.asarray(ns_ref), np.asarray(ns.reshape(B, W, -1))
    )
    np.testing.assert_array_equal(
        np.asarray(mel_ref), np.asarray(mel.reshape(B, W, -1))
    )
    h_my = jnp.concatenate([he, hs], axis=1).reshape(B, W, 2)
    np.testing.assert_allclose(
        np.asarray(h_ref), np.asarray(h_my), rtol=0, atol=2e-6
    )
