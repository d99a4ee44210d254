"""T-axis-sharded lattice loss vs the unsharded reference (SURVEY §5
long-context row; ring frontier exchange via shard_map + ppermute)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ssnt_tts_tpu.ops import lattice, lattice_sharded


def _mesh(n, name="model"):
    devs = np.asarray(jax.devices()[:n])
    return Mesh(devs.reshape(n), (name,))


def _inputs(rng, U, B, T):
    le = jnp.asarray(np.log(rng.uniform(0.1, 0.9, (U, B, T))), jnp.float32)
    ls = jnp.log1p(-jnp.exp(le))
    lf = jnp.asarray(rng.normal(0, 0.5, (U, B, T)), jnp.float32)
    return le, ls, lf


def test_tsharded_matches_reference_ragged():
    rng = np.random.default_rng(0)
    U, B, T = 24, 3, 16  # T sharded 8 ways -> Tl = 2
    le, ls, lf = _inputs(rng, U, B, T)
    il = jnp.asarray([16, 11, 7], jnp.int32)
    ol = jnp.asarray([24, 15, 9], jnp.int32)
    mesh = _mesh(8)
    got = lattice_sharded.ssnt_loss_tsharded(le, ls, lf, il, ol, mesh)
    want = lattice.ssnt_loss(le, ls, lf, il, ol, layout="ubt")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_tsharded_gradients_match_reference():
    """Autodiff through scan + ppermute = the mirrored-ring beta pass."""
    rng = np.random.default_rng(1)
    U, B, T = 16, 2, 8  # 4-way shard
    le, ls, lf = _inputs(rng, U, B, T)
    il = jnp.asarray([8, 6], jnp.int32)
    ol = jnp.asarray([16, 10], jnp.int32)
    mesh = _mesh(4)

    g_sh = jax.grad(
        lambda a, b, c: jnp.sum(
            lattice_sharded.ssnt_loss_tsharded(a, b, c, il, ol, mesh)
        ),
        argnums=(0, 1, 2),
    )(le, ls, lf)
    g_ref = jax.grad(
        lambda a, b, c: jnp.sum(
            lattice.ssnt_loss(a, b, c, il, ol, layout="ubt")
        ),
        argnums=(0, 1, 2),
    )(le, ls, lf)
    for gs, gr, name in zip(g_sh, g_ref, ["emit", "shift", "frame"]):
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gr), rtol=1e-4, atol=1e-5,
            err_msg=name,
        )


def test_tsharded_memory_is_column_not_lattice():
    """The jitted sharded loss must not materialize the (U, B, T) alpha
    lattice: its scan carry is one (B, Tl) column. We can't inspect device
    allocations portably, but we CAN check the loss still runs when the
    lattice is much larger than a single column (smoke at U=128)."""
    rng = np.random.default_rng(2)
    U, B, T = 128, 2, 16
    le, ls, lf = _inputs(rng, U, B, T)
    il = jnp.full((B,), T, jnp.int32)
    ol = jnp.full((B,), U, jnp.int32)
    mesh = _mesh(8)
    out = lattice_sharded.ssnt_loss_tsharded(le, ls, lf, il, ol, mesh)
    want = lattice.ssnt_loss(le, ls, lf, il, ol, layout="ubt")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-5
    )
