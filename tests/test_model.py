"""End-to-end model layer: loss computes/differentiates, train step runs,
full beam decode produces well-formed monotone alignments (BASELINE.json
configs[2]/[3] shapes, shrunk for CPU CI).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ssnt_tts_tpu.models import SSNTModel
from ssnt_tts_tpu.parallel import decode as decode_lib
from ssnt_tts_tpu.parallel import train as train_lib
from ssnt_tts_tpu.utils.config import TrainConfig, tiny_model_config

B, T, U = 2, 6, 14


@pytest.fixture(scope="module")
def model_and_state():
    cfg = tiny_model_config()
    model = SSNTModel(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "tokens": jnp.asarray(
            rng.integers(1, cfg.vocab_size, (B, T)), jnp.int32
        ),
        "mel": jnp.asarray(rng.normal(0, 1, (B, U, cfg.mel_dim)), jnp.float32),
        "input_length": jnp.asarray([T, T - 2], jnp.int32),
        "output_length": jnp.asarray([U, U - 3], jnp.int32),
    }
    tcfg = TrainConfig(warmup_steps=2, batch_size=B)
    state = train_lib.init_train_state(
        model, jax.random.PRNGKey(0), batch, tcfg
    )
    return model, state, batch, tcfg


def test_forward_loss_finite(model_and_state):
    model, state, batch, _ = model_and_state
    nll = jax.jit(model.apply)(
        state.params, batch["tokens"], batch["mel"],
        batch["input_length"], batch["output_length"],
    )
    nll = np.asarray(nll)
    assert nll.shape == (B,)
    assert np.isfinite(nll).all()


def test_loss_with_aux_heads(model_and_state):
    model, state, batch, _ = model_and_state
    rng = np.random.default_rng(1)
    dur = jnp.asarray(rng.integers(0, 5, (B, T)), jnp.int32)
    tone = jnp.asarray(rng.integers(0, 4, (B, T)), jnp.int32)
    loss, metrics = jax.jit(
        lambda p: model.apply(
            p, batch["tokens"], batch["mel"], batch["input_length"],
            batch["output_length"], dur, tone, method=model.loss,
        )
    )(state.params)
    assert np.isfinite(float(loss))
    assert {"nll_per_frame", "duration_nll", "tone_nll", "loss"} <= set(
        metrics
    )


def test_train_step_decreases_loss(model_and_state):
    model, state, batch, tcfg = model_and_state
    tx = train_lib.make_optimizer(tcfg)
    step = jax.jit(lambda s, b: train_lib.train_step(model, tx, s, b))
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # tiny overfit sanity


def test_grads_finite(model_and_state):
    model, state, batch, _ = model_and_state
    f = lambda p: jnp.sum(
        model.apply(
            p, batch["tokens"], batch["mel"], batch["input_length"],
            batch["output_length"],
        )
    )
    grads = jax.jit(jax.grad(f))(state.params)
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)


def test_beam_decode_shapes_and_monotone_alignment(model_and_state):
    model, state, batch, _ = model_and_state
    W, max_frames = 4, U
    fn = jax.jit(
        lambda p, tok, il: decode_lib.beam_decode(
            model, p, tok, il, max_frames=max_frames, beam_width=W
        )
    )
    out = fn(state.params, batch["tokens"], batch["input_length"])
    mel = np.asarray(out["mel"])
    align = np.asarray(out["alignment"])
    assert mel.shape == (B, max_frames, model.config.mel_dim)
    assert align.shape == (B, max_frames)
    assert np.isfinite(mel).all()
    for b in range(B):
        Tb = int(batch["input_length"][b])
        a = align[b]
        # Monotone with steps of 0/1, within range.
        assert a[0] == 0
        assert ((np.diff(a) == 0) | (np.diff(a) == 1)).all()
        assert (a < Tb).all()
    lp = np.asarray(out["log_prob"])
    # Beams sorted desc per step.
    assert (np.diff(lp, axis=1) <= 1e-6).all()


def test_greedy_decode(model_and_state):
    model, state, batch, _ = model_and_state
    fn = jax.jit(
        lambda p, tok, il: decode_lib.greedy_decode(
            model, p, tok, il, max_frames=U
        )
    )
    out = fn(state.params, batch["tokens"], batch["input_length"])
    assert np.asarray(out["mel"]).shape == (B, U, model.config.mel_dim)


def test_duration_and_tone_heads(model_and_state):
    model, state, batch, _ = model_and_state
    dlp = jax.jit(
        lambda p: model.apply(
            p, batch["tokens"], batch["input_length"],
            method=model.duration_log_probs,
        )
    )(state.params)
    klp = jax.jit(
        lambda p: model.apply(
            p, batch["tokens"], batch["input_length"],
            method=model.tone_log_probs,
        )
    )(state.params)
    dlp, klp = np.asarray(dlp), np.asarray(klp)
    assert dlp.shape == (B, T, model.config.duration_class_size)
    assert klp.shape == (B, T, model.config.tone_class_size)
    # log-softmax: rows normalize.
    np.testing.assert_allclose(np.exp(dlp).sum(-1), 1.0, rtol=1e-4)
    np.testing.assert_allclose(np.exp(klp).sum(-1), 1.0, rtol=1e-4)
