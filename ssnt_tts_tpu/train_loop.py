"""End-to-end training driver: data -> sharded step -> metrics -> checkpoints.

Usage (programmatic; scripts/train.py wraps it for the CLI):

    from ssnt_tts_tpu.train_loop import run_training
    run_training(num_steps=100, checkpoint_dir="/tmp/ckpt")

Covers BASELINE config 3 (end-to-end training step, batch data-parallel on
one host) with checkpoint/resume (SURVEY.md §5) and structured metrics.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

from ssnt_tts_tpu import data as data_lib
from ssnt_tts_tpu import data_files as data_files_lib
from ssnt_tts_tpu.models import SSNTModel
from ssnt_tts_tpu.parallel import mesh as mesh_lib
from ssnt_tts_tpu.parallel import multihost
from ssnt_tts_tpu.parallel import train as train_lib
from ssnt_tts_tpu.utils import checkpoint as ckpt_lib
from ssnt_tts_tpu.utils.config import (
    MeshConfig,
    ModelConfig,
    TrainConfig,
)
from ssnt_tts_tpu.utils.metrics import MetricsLogger


def run_training(
    num_steps: int,
    model_config: Optional[ModelConfig] = None,
    train_config: Optional[TrainConfig] = None,
    mesh_config: Optional[MeshConfig] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 1000,
    log_every: int = 50,
    metrics_path: Optional[str] = None,
    seed: int = 0,
    data_dir: Optional[str] = None,
) -> Dict[str, float]:
    """Train for num_steps. With ``data_dir``, batches come from .npz shards
    via data_files.NpzShardDataset (length-bucketed static shapes; one XLA
    compilation per bucket; padding efficiency logged alongside the training
    metrics); otherwise from the synthetic generator."""
    cfg = model_config or ModelConfig()
    tcfg = train_config or TrainConfig()
    model = SSNTModel(cfg)
    mesh = mesh_lib.make_mesh(mesh_config)

    file_ds = None
    if data_dir is not None:
        file_ds = data_files_lib.NpzShardDataset(data_dir)
        raw_batches = file_ds.batches(tcfg.batch_size, shuffle_seed=seed)
        first = next(
            file_ds.batches(tcfg.batch_size, shuffle_seed=seed)
        )
    else:
        ds = data_lib.SyntheticTTSDataset(
            vocab_size=cfg.vocab_size,
            mel_dim=cfg.mel_dim,
            max_input_length=tcfg.max_input_length,
            max_output_length=tcfg.max_output_length,
            duration_class_size=cfg.duration_class_size,
            tone_class_size=cfg.tone_class_size,
            seed=seed,
        )
        raw_batches = (
            {k: v for k, v in b.items() if k != "alignment"}
            for b in ds.batches(tcfg.batch_size)
        )
        first = {
            k: v
            for k, v in ds.batch(tcfg.batch_size).items()
            if k != "alignment"
        }
    state = train_lib.init_train_state(
        model, jax.random.PRNGKey(seed), first, tcfg
    )
    start_step = 0
    if checkpoint_dir and ckpt_lib.latest_step(checkpoint_dir) is not None:
        state = ckpt_lib.restore(checkpoint_dir, state)
        start_step = int(state.step)

    tx = train_lib.make_optimizer(tcfg)
    step_fn, state = train_lib.make_sharded_train_step(model, tx, mesh, state)

    logger = MetricsLogger(metrics_path)
    batches = data_lib.prefetch_to_device(
        raw_batches,
        sharding=mesh_lib.data_sharding(mesh),
    )
    last_metrics: Dict[str, float] = {}
    for i in range(start_step, num_steps):
        batch = next(batches)
        state, metrics = step_fn(state, batch)
        if (i + 1) % log_every == 0 or i + 1 == num_steps:
            last_metrics = {
                k: float(np.asarray(v)) for k, v in metrics.items()
            }
            if file_ds is not None:
                last_metrics["token_padding_efficiency"] = (
                    file_ds.stats.token_efficiency
                )
                last_metrics["frame_padding_efficiency"] = (
                    file_ds.stats.frame_efficiency
                )
            logger.log(i + 1, last_metrics)
        if checkpoint_dir and (
            (i + 1) % checkpoint_every == 0 or i + 1 == num_steps
        ):
            # Multi-host: one writer. jax.device_get of a fully-replicated
            # train state is process-local; every process saving to a shared
            # checkpoint_dir would race (VERDICT r2 weak #6).
            if multihost.is_primary():
                ckpt_lib.save(checkpoint_dir, i + 1, jax.device_get(state))
    logger.close()
    return last_metrics
