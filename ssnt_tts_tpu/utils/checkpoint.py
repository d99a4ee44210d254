"""Checkpoint / resume via orbax.

The reference is stateless step kernels — all decode state threads through op
inputs/outputs (SURVEY.md §5). That explicit-state design carries over: the
decode carry and TrainState are plain pytrees, so checkpointing is one
save/restore call. Training checkpoints hold {step, params, opt_state}.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        directory,
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
    )


def save(directory: str, step: int, state: Any, max_to_keep: int = 3):
    """Save a pytree (TrainState or decode carry) at `step`."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    mgr = _manager(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def restore(directory: str, state_like: Any, step: Optional[int] = None):
    """Restore into the structure of `state_like` (shapes/dtypes template).

    step=None restores the latest checkpoint. Returns the restored pytree.
    """
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {directory}")
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape")
        else x,
        state_like,
    )
    restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    return restored


def latest_step(directory: str) -> Optional[int]:
    mgr = _manager(os.path.abspath(directory))
    step = mgr.latest_step()
    mgr.close()
    return step
