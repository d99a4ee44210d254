"""Pallas lattice kernels vs the XLA reference implementation.

Runs in interpreter mode on the CPU backend (same kernel code path the TPU
compiles); bench.py exercises the compiled kernels on hardware.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ssnt_tts_tpu.ops import lattice, lattice_pallas


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(lattice_pallas, "_INTERPRET", True)


def rand_inputs(rng, B, T, U):
    le = np.log(rng.uniform(0.1, 0.9, (B, T, U))).astype(np.float32)
    ls = np.log1p(-np.exp(le)).astype(np.float32)
    lf = rng.normal(0, 0.5, (B, T, U)).astype(np.float32)
    return le, ls, lf


def test_forward_matches_xla():
    rng = np.random.default_rng(0)
    B, T, U = 4, 8, 37  # non-multiple of chunk exercises padding
    le, ls, lf = rand_inputs(rng, B, T, U)
    T_b = np.array([8, 6, 8, 5], np.int32)
    U_b = np.array([37, 30, 20, 11], np.int32)
    got = np.asarray(
        lattice_pallas.ssnt_loss_pallas(le, ls, lf, T_b, U_b, chunk=8)
    )
    want = np.asarray(lattice.ssnt_loss(le, ls, lf, T_b, U_b))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_grads_match_xla():
    rng = np.random.default_rng(1)
    B, T, U = 3, 6, 24
    le, ls, lf = rand_inputs(rng, B, T, U)
    T_b = np.array([6, 5, 4], np.int32)
    U_b = np.array([24, 16, 9], np.int32)

    g_pallas = jax.grad(
        lambda a, b, c: jnp.sum(
            lattice_pallas.ssnt_loss_pallas(a, b, c, T_b, U_b, chunk=8)
        ),
        argnums=(0, 1, 2),
    )(le, ls, lf)
    g_xla = jax.grad(
        lambda a, b, c: jnp.sum(lattice.ssnt_loss(a, b, c, T_b, U_b)),
        argnums=(0, 1, 2),
    )(le, ls, lf)
    for gp, gx, name in zip(g_pallas, g_xla, ["emit", "shift", "frame"]):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), rtol=1e-4, atol=1e-6,
            err_msg=name,
        )


def test_alphas_betas_directly():
    rng = np.random.default_rng(2)
    B, T, U = 2, 5, 16
    le, ls, lf = rand_inputs(rng, B, T, U)
    T_b = np.full(B, T, np.int32)
    U_b = np.full(B, U, np.int32)
    lev = jnp.transpose(jnp.asarray(le), (2, 0, 1))
    lsv = jnp.transpose(jnp.asarray(ls), (2, 0, 1))
    lfv = jnp.transpose(jnp.asarray(lf), (2, 0, 1))

    a_pallas = np.asarray(
        lattice_pallas.forward_alphas_pallas(lev, lsv, lfv, chunk=8)
    )
    a_xla = np.asarray(lattice._forward_alphas(lev, lsv, lfv))
    np.testing.assert_allclose(a_pallas, a_xla, rtol=1e-5, atol=1e-5)

    b_pallas = np.asarray(
        lattice_pallas.backward_betas_pallas(
            lev, lsv, lfv, jnp.asarray(T_b), jnp.asarray(U_b), chunk=8
        )
    )
    b_xla = np.asarray(
        lattice._backward_betas(
            lev, lsv, lfv, jnp.asarray(T_b), jnp.asarray(U_b)
        )
    )
    np.testing.assert_allclose(b_pallas, b_xla, rtol=1e-5, atol=1e-5)

    a_fused, b_fused = lattice_pallas.fused_alphas_betas_pallas(
        lev, lsv, lfv, jnp.asarray(T_b), jnp.asarray(U_b), chunk=8
    )
    np.testing.assert_allclose(np.asarray(a_fused), a_xla, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(b_fused), b_xla, rtol=1e-5,
                               atol=1e-5)


def test_exp_variant_loss_and_grads_match():
    """Exp-domain short-chain kernels: loss and grads agree with the XLA
    implementation to f32 accuracy (values below the logaddexp contribution
    horizon may differ, which is invisible at these tolerances)."""
    rng = np.random.default_rng(5)
    B, T, U = 3, 7, 24
    le, ls, lf = rand_inputs(rng, B, T, U)
    T_b = np.array([7, 5, 6], np.int32)
    U_b = np.array([24, 14, 20], np.int32)

    loss_exp, g_exp = jax.value_and_grad(
        lambda a, b, c: jnp.sum(
            lattice_pallas.ssnt_loss_pallas(
                a, b, c, T_b, U_b, chunk=8, variant="exp"
            )
        ),
        argnums=(0, 1, 2),
    )(le, ls, lf)
    loss_xla, g_xla = jax.value_and_grad(
        lambda a, b, c: jnp.sum(lattice.ssnt_loss(a, b, c, T_b, U_b)),
        argnums=(0, 1, 2),
    )(le, ls, lf)
    np.testing.assert_allclose(float(loss_exp), float(loss_xla), rtol=5e-4)
    for ge, gx, name in zip(g_exp, g_xla, ["emit", "shift", "frame"]):
        np.testing.assert_allclose(
            np.asarray(ge), np.asarray(gx), rtol=5e-3, atol=5e-5,
            err_msg=name,
        )


@pytest.mark.parametrize("variant", ["banded2", "banded4", "banded8",
                                     "banded16"])
def test_banded_k_variants_match_xla(variant):
    """K-banded chain kernels (U/K sequential depth): loss and all three
    grads agree with the XLA reference on ragged batches for every K."""
    rng = np.random.default_rng(11)
    B, T, U = 4, 6, 48
    le, ls, lf = rand_inputs(rng, B, T, U)
    T_b = np.array([6, 5, 4, 6], np.int32)
    U_b = np.array([48, 33, 29, 40], np.int32)

    loss_b, g_b = jax.value_and_grad(
        lambda a, b, c: jnp.sum(
            lattice_pallas.ssnt_loss_pallas(
                a, b, c, T_b, U_b, chunk=16, variant=variant
            )
        ),
        argnums=(0, 1, 2),
    )(le, ls, lf)
    loss_x, g_x = jax.value_and_grad(
        lambda a, b, c: jnp.sum(lattice.ssnt_loss(a, b, c, T_b, U_b)),
        argnums=(0, 1, 2),
    )(le, ls, lf)
    np.testing.assert_allclose(float(loss_b), float(loss_x), rtol=1e-5)
    for gb, gx, name in zip(g_b, g_x, ["emit", "shift", "frame"]):
        np.testing.assert_allclose(
            np.asarray(gb), np.asarray(gx), rtol=1e-4, atol=1e-5,
            err_msg=f"{variant} {name}",
        )


def test_scan_variant_dispatch_matches_xla():
    """variant="scan" routes to the blocked parallel scan and agrees with
    the XLA reference (loss + grads) on ragged batches."""
    rng = np.random.default_rng(13)
    B, T, U = 3, 6, 40
    le, ls, lf = rand_inputs(rng, B, T, U)
    T_b = np.array([6, 5, 4], np.int32)
    U_b = np.array([40, 23, 31], np.int32)
    loss_s, g_s = jax.value_and_grad(
        lambda a, b, c: jnp.sum(
            lattice_pallas.ssnt_loss_pallas(
                a, b, c, T_b, U_b, variant="scan"
            )
        ),
        argnums=(0, 1, 2),
    )(le, ls, lf)
    loss_x, g_x = jax.value_and_grad(
        lambda a, b, c: jnp.sum(lattice.ssnt_loss(a, b, c, T_b, U_b)),
        argnums=(0, 1, 2),
    )(le, ls, lf)
    np.testing.assert_allclose(float(loss_s), float(loss_x), rtol=1e-5)
    for gs, gx, name in zip(g_s, g_x, ["emit", "shift", "frame"]):
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gx), rtol=1e-4, atol=1e-5,
            err_msg=name,
        )


def test_bf16_variant_tracks_f32():
    """variant="bf16" (bf16 HBM storage for inputs+grads, f32 VMEM compute):
    loss and gradients track the f32 path to mixed-precision accuracy.
    Input log-probs carry ~2^-8 relative rounding that accumulates ~sqrt(U)
    along lattice paths, so the contract is loose-but-bounded: ~1e-2
    relative on the loss, grads allclose at rtol=0.1/atol=0.02 (posteriors
    live in [0, 1])."""
    rng = np.random.default_rng(17)
    B, T, U = 4, 8, 40
    le, ls, lf = rand_inputs(rng, B, T, U)
    T_b = np.array([8, 6, 5, 8], np.int32)
    U_b = np.array([40, 28, 22, 33], np.int32)

    loss16, g16 = jax.value_and_grad(
        lambda a, b, c: jnp.sum(
            lattice_pallas.ssnt_loss_pallas(
                a, b, c, T_b, U_b, chunk=8, variant="bf16"
            )
        ),
        argnums=(0, 1, 2),
    )(le, ls, lf)
    loss32, g32 = jax.value_and_grad(
        lambda a, b, c: jnp.sum(lattice.ssnt_loss(a, b, c, T_b, U_b)),
        argnums=(0, 1, 2),
    )(le, ls, lf)
    np.testing.assert_allclose(float(loss16), float(loss32), rtol=1e-2)
    for ga, gb, name in zip(g16, g32, ["emit", "shift", "frame"]):
        assert ga.dtype == jnp.float32  # cast VJP restores caller dtype
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), rtol=0.1, atol=0.02,
            err_msg=name,
        )


def test_large_batch_separate_pass_regime():
    """B * Tpad above the fused threshold takes the fwd + grad-fused-bwd
    path; all grads and ragged masking must match the XLA implementation."""
    rng = np.random.default_rng(7)
    B, T, U = 80, 4, 8  # 80 * 128 > 8192 -> separate passes
    le, ls, lf = rand_inputs(rng, B, T, U)
    T_b = np.full(B, T, np.int32)
    T_b[1::3] = 3
    U_b = np.full(B, U, np.int32)
    U_b[::2] = 5
    g_p = jax.grad(
        lambda a, b, c: jnp.sum(
            lattice_pallas.ssnt_loss_pallas(a, b, c, T_b, U_b)
        ),
        argnums=(0, 1, 2),
    )(le, ls, lf)
    g_x = jax.grad(
        lambda a, b, c: jnp.sum(lattice.ssnt_loss(a, b, c, T_b, U_b)),
        argnums=(0, 1, 2),
    )(le, ls, lf)
    for gp, gx, name in zip(g_p, g_x, ["emit", "shift", "frame"]):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=1e-4, atol=1e-6, err_msg=name)


def test_fused_with_ragged_lengths():
    rng = np.random.default_rng(3)
    B, T, U = 3, 6, 24
    le, ls, lf = rand_inputs(rng, B, T, U)
    T_b = jnp.asarray([6, 4, 5], jnp.int32)
    U_b = jnp.asarray([24, 10, 17], jnp.int32)
    lev = jnp.transpose(jnp.asarray(le), (2, 0, 1))
    lsv = jnp.transpose(jnp.asarray(ls), (2, 0, 1))
    lfv = jnp.transpose(jnp.asarray(lf), (2, 0, 1))
    a_fused, b_fused = lattice_pallas.fused_alphas_betas_pallas(
        lev, lsv, lfv, T_b, U_b, chunk=8
    )
    b_xla = np.asarray(lattice._backward_betas(lev, lsv, lfv, T_b, U_b))
    a_xla = np.asarray(lattice._forward_alphas(lev, lsv, lfv))
    # Compare only within each example's valid region.
    for b in range(B):
        Ub, Tb = int(U_b[b]), int(T_b[b])
        np.testing.assert_allclose(
            np.asarray(a_fused)[:Ub, b, :Tb], a_xla[:Ub, b, :Tb],
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(b_fused)[:Ub, b, :Tb], b_xla[:Ub, b, :Tb],
            rtol=1e-5, atol=1e-5,
        )


def test_ubt_layout_matches_btu():
    """Time-major layout (the framework-native path the model uses) must be
    loss- and grad-identical to the reference (B, T, U) layout, for both the
    Pallas and the XLA implementations."""
    rng = np.random.default_rng(7)
    B, T, U = 3, 7, 29
    le, ls, lf = rand_inputs(rng, B, T, U)
    T_b = np.array([7, 5, 6], np.int32)
    U_b = np.array([29, 17, 23], np.int32)
    leu, lsu, lfu = (np.transpose(x, (2, 0, 1)) for x in (le, ls, lf))

    for impl, kw in (
        (lattice_pallas.ssnt_loss_pallas, dict(chunk=8)),
        (lattice.ssnt_loss, {}),
    ):
        loss_btu, grads_btu = jax.value_and_grad(
            lambda a, b, c: jnp.sum(impl(a, b, c, T_b, U_b, **kw)),
            argnums=(0, 1, 2),
        )(le, ls, lf)
        loss_ubt, grads_ubt = jax.value_and_grad(
            lambda a, b, c: jnp.sum(
                impl(a, b, c, T_b, U_b, layout="ubt", **kw)
            ),
            argnums=(0, 1, 2),
        )(leu, lsu, lfu)
        np.testing.assert_allclose(
            np.asarray(loss_ubt), np.asarray(loss_btu), rtol=1e-6
        )
        for g_b, g_u in zip(grads_btu, grads_ubt):
            np.testing.assert_allclose(
                np.transpose(np.asarray(g_u), (1, 2, 0)),
                np.asarray(g_b),
                rtol=1e-5,
                atol=1e-6,
            )


def test_packed_bidir_bit_equal_and_grads():
    """The packed-lane bidirectional kernel (variant="fusedpack") is
    bit-exact vs the unpacked fused kernel (same op order: min-max
    logaddexp == abs-form; virtual-carry init == select init), and the
    full grad path matches XLA on a ragged batch."""
    rng = np.random.default_rng(11)
    B, T, U = 16, 16, 24  # B*T = 256 = 2 packed rows
    le = np.log(rng.uniform(0.1, 0.9, (U, B, T))).astype(np.float32)
    ls = np.log1p(-np.exp(le)).astype(np.float32)
    lf = rng.normal(0, 0.5, (U, B, T)).astype(np.float32)
    T_b = rng.integers(2, T + 1, B).astype(np.int32)
    U_b = rng.integers(2, U + 1, B).astype(np.int32)

    a_ref, b_ref = lattice_pallas.fused_alphas_betas_pallas(
        jnp.asarray(le), jnp.asarray(ls), jnp.asarray(lf),
        jnp.asarray(T_b), jnp.asarray(U_b), chunk=8,
    )
    a_pk, b_pk = lattice_pallas.fused_alphas_betas_pallas_packed(
        jnp.asarray(le), jnp.asarray(ls), jnp.asarray(lf),
        jnp.asarray(T_b), jnp.asarray(U_b), chunk=8,
    )
    np.testing.assert_array_equal(np.asarray(a_ref), np.asarray(a_pk))
    np.testing.assert_array_equal(np.asarray(b_ref), np.asarray(b_pk))

    loss_p, g_p = jax.value_and_grad(
        lambda a, b, c: jnp.sum(
            lattice_pallas.ssnt_loss_pallas(
                a, b, c, T_b, U_b, chunk=8, variant="fusedpack",
                layout="ubt",
            )
        ),
        argnums=(0, 1, 2),
    )(jnp.asarray(le), jnp.asarray(ls), jnp.asarray(lf))
    loss_x, g_x = jax.value_and_grad(
        lambda a, b, c: jnp.sum(
            lattice.ssnt_loss(a, b, c, T_b, U_b, layout="ubt")
        ),
        argnums=(0, 1, 2),
    )(jnp.asarray(le), jnp.asarray(ls), jnp.asarray(lf))
    np.testing.assert_allclose(float(loss_p), float(loss_x), rtol=1e-5)
    for gp, gx, name in zip(g_p, g_x, ["emit", "shift", "frame"]):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), rtol=1e-4, atol=1e-5,
            err_msg=name,
        )


def test_fusedpack_is_the_headline_dispatch():
    """The headline B=32 x T=80 shape must auto-dispatch to the packed
    kernel (B*T = 2560 -> 20 rows >= 8); tiny unpackable shapes fall back."""
    assert lattice_pallas._grad_mode("log", 32, 80) == ("fusedpack", 0)
    assert lattice_pallas._grad_mode("log", 4, 8) == ("fused", 0)


def test_expin_matches_log_path():
    """Exp-native loss (ssnt_loss_expin on E, S, F, mcol) == log path to
    f32 accuracy: loss, chain-ruled grads (d_le = E*dE, d_ls = S*dS,
    d_lf = F*dF — the max-route terms cancel exactly), the dmcol/dF sum
    identity, and finite differences on mcol."""
    rng = np.random.default_rng(3)
    U, B, T = 24, 3, 8
    le = np.log(rng.uniform(0.1, 0.9, (U, B, T))).astype(np.float32)
    ls = np.log1p(-np.exp(le)).astype(np.float32)
    lf = rng.normal(0, 0.5, (U, B, T)).astype(np.float32)
    il = np.array([8, 6, 5], np.int32)
    ol = np.array([24, 17, 11], np.int32)

    E = jnp.exp(jnp.asarray(le))
    S = jnp.exp(jnp.asarray(ls))
    mcol = jnp.max(jnp.asarray(lf), axis=2)
    F = jnp.exp(lf - mcol[:, :, None])

    loss_e, g_e = jax.value_and_grad(
        lambda E_, S_, F_, m_: jnp.sum(
            lattice_pallas.ssnt_loss_expin(E_, S_, F_, m_, il, ol,
                                           chunk=8)
        ), argnums=(0, 1, 2, 3),
    )(E, S, F, mcol)
    loss_x, g_x = jax.value_and_grad(
        lambda a, b, c: jnp.sum(
            lattice.ssnt_loss(a, b, c, il, ol, layout="ubt")
        ),
        argnums=(0, 1, 2),
    )(jnp.asarray(le), jnp.asarray(ls), jnp.asarray(lf))
    np.testing.assert_allclose(float(loss_e), float(loss_x), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(E * g_e[0]), np.asarray(g_x[0]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(S * g_e[1]), np.asarray(g_x[1]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(F * g_e[2]), np.asarray(g_x[2]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_e[3]), np.asarray((F * g_e[2]).sum(2)), rtol=1e-4,
        atol=1e-6,
    )

    def loss_at(mc):
        return float(jnp.sum(lattice_pallas.ssnt_loss_expin(
            E, S, F, jnp.asarray(mc), il, ol, chunk=8)))

    mc0 = np.asarray(mcol).copy()
    for (uu, bb) in [(0, 0), (5, 1), (10, 2)]:
        eps = 1e-3
        mp = mc0.copy()
        mp[uu, bb] += eps
        mm = mc0.copy()
        mm[uu, bb] -= eps
        fd = (loss_at(mp) - loss_at(mm)) / (2 * eps)
        an = float(np.asarray(g_e[3])[uu, bb])
        assert abs(fd - an) < 5e-2, (uu, bb, fd, an)


def test_packed_kernel_extreme_ragged():
    """Packed kernel on degenerate lengths (T_b=1, U_b=1 rows mixed with
    full-length rows) stays bit-equal to the unpacked kernel and the
    grad path matches XLA."""
    rng = np.random.default_rng(23)
    B, T, U = 16, 16, 16
    le = np.log(rng.uniform(0.1, 0.9, (U, B, T))).astype(np.float32)
    ls = np.log1p(-np.exp(le)).astype(np.float32)
    lf = rng.normal(0, 0.5, (U, B, T)).astype(np.float32)
    T_b = np.full(B, T, np.int32)
    T_b[0] = 1
    T_b[3] = 2
    U_b = np.full(B, U, np.int32)
    U_b[0] = 1
    U_b[5] = 2

    a_ref, b_ref = lattice_pallas.fused_alphas_betas_pallas(
        jnp.asarray(le), jnp.asarray(ls), jnp.asarray(lf),
        jnp.asarray(T_b), jnp.asarray(U_b), chunk=8,
    )
    a_pk, b_pk = lattice_pallas.fused_alphas_betas_pallas_packed(
        jnp.asarray(le), jnp.asarray(ls), jnp.asarray(lf),
        jnp.asarray(T_b), jnp.asarray(U_b), chunk=8,
    )
    np.testing.assert_array_equal(np.asarray(a_ref), np.asarray(a_pk))
    np.testing.assert_array_equal(np.asarray(b_ref), np.asarray(b_pk))

    g_p = jax.grad(
        lambda a, b, c: jnp.sum(
            lattice_pallas.ssnt_loss_pallas(
                a, b, c, T_b, U_b, chunk=8, variant="fusedpack",
                layout="ubt",
            )
        ),
        argnums=(0, 1, 2),
    )(le, ls, lf)
    g_x = jax.grad(
        lambda a, b, c: jnp.sum(
            lattice.ssnt_loss(a, b, c, T_b, U_b, layout="ubt")
        ),
        argnums=(0, 1, 2),
    )(le, ls, lf)
    for gp, gx, name in zip(g_p, g_x, ["emit", "shift", "frame"]):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), rtol=1e-4, atol=1e-5,
            err_msg=name,
        )


def test_expin_degenerate_path_zero_grads():
    """When the final cell's emit probability underflows to exactly 0 the
    exp-native loss reports the degenerate sentinel (NEG) and returns
    zero grads for that example — mirroring the log path's guard —
    while other examples keep finite grads."""
    rng = np.random.default_rng(29)
    U, B, T = 16, 2, 8
    le = np.log(rng.uniform(0.1, 0.9, (U, B, T))).astype(np.float32)
    ls = np.log1p(-np.exp(le)).astype(np.float32)
    lf = rng.normal(0, 0.5, (U, B, T)).astype(np.float32)
    il = np.full(B, T, np.int32)
    ol = np.full(B, U, np.int32)

    E = np.exp(le)
    S = np.exp(ls)
    E[:, 0, :] = 0.0  # example 0: emit impossible everywhere
    S[:, 0, :] = 1.0
    mcol = lf.max(axis=2)
    F = np.exp(lf - mcol[:, :, None])

    loss, g = jax.value_and_grad(
        lambda e, s, f, m: jnp.sum(
            lattice_pallas.ssnt_loss_expin(e, s, f, m, il, ol, chunk=8)
        ),
        argnums=(0, 1, 2, 3),
    )(jnp.asarray(E), jnp.asarray(S), jnp.asarray(F), jnp.asarray(mcol))
    per_ex = lattice_pallas.ssnt_loss_expin(
        jnp.asarray(E), jnp.asarray(S), jnp.asarray(F), jnp.asarray(mcol),
        il, ol, chunk=8,
    )
    assert float(per_ex[0]) > 1e29  # -NEG: degenerate sentinel
    assert np.isfinite(float(per_ex[1]))
    for arr in g[:3]:
        a = np.asarray(arr)
        assert (a[:, 0, :] == 0).all()       # degenerate example: zeros
        assert np.isfinite(a[:, 1, :]).all()
    assert (np.asarray(g[3])[:, 0] == 0).all()
