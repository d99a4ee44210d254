"""File-backed dataset: shard round-trip, bucketing invariants, and a
train_loop run from a directory of .npz shards (VERDICT r1 #8)."""

import numpy as np
import pytest

from ssnt_tts_tpu import data as data_lib
from ssnt_tts_tpu import data_files as dfl


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("shards")
    # Sizes match tiny_model_config so the train-loop test can consume the
    # same shards (vocab 32, mel 8, durations 5, tones 4).
    ds = data_lib.SyntheticTTSDataset(
        vocab_size=32, mel_dim=8, max_input_length=12, max_output_length=40,
        duration_class_size=5, tone_class_size=4, seed=3,
    )
    paths = dfl.materialize_synthetic(
        ds, num_examples=57, out_dir=str(d), shard_size=16, batch_size=8
    )
    assert len(paths) == 4  # ceil(57/16)
    return str(d)


def test_roundtrip_examples(shard_dir):
    ds = dfl.NpzShardDataset(shard_dir)
    assert len(ds) == 57
    # Spot-check raggedness and dtypes via the internal accessor.
    seen_lengths = set()
    for si, ei, Tb, Ub in ds.index[:20]:
        ex = ds._example(si, ei)
        assert ex["tokens"].shape == (Tb,)
        assert ex["mel"].shape[0] == Ub
        assert ex["tokens"].dtype == np.int32
        assert ex["mel"].dtype == np.float32
        assert ex["duration_target"].shape == (Tb,)
        assert ex["tone_target"].shape == (Tb,)
        # Durations of live tokens sum to the mel length.
        assert ex["duration_target"].sum() <= Ub
        seen_lengths.add((Tb, Ub))
    assert len(seen_lengths) > 1  # genuinely ragged


def test_bucketed_batches_invariants(shard_dir):
    ds = dfl.NpzShardDataset(shard_dir)
    bucket_shapes = {(b.t_pad, b.u_pad) for b in ds.buckets}
    n_seen = 0
    for batch in ds.batches(4, shuffle_seed=1, epochs=1,
                            drop_remainder=True):
        B, T = batch["tokens"].shape
        U = batch["mel"].shape[1]
        assert B == 4 and (T, U) in bucket_shapes
        assert (batch["input_length"] <= T).all()
        assert (batch["output_length"] <= U).all()
        assert (batch["input_length"] > 0).all()
        # Padding regions are zero.
        for i in range(B):
            Tb = batch["input_length"][i]
            Ub = batch["output_length"][i]
            assert (batch["tokens"][i, Tb:] == 0).all()
            assert (batch["mel"][i, Ub:] == 0).all()
        n_seen += B
    assert n_seen >= 4 * (57 // 4 - len(ds.buckets))  # most examples covered
    eff = ds.stats.summary()
    assert 0.3 < eff["token_efficiency"] <= 1.0
    assert 0.3 < eff["frame_efficiency"] <= 1.0


def test_epoch_coverage_without_remainder_drop(shard_dir):
    ds = dfl.NpzShardDataset(shard_dir)
    total = 0
    for batch in ds.batches(8, shuffle_seed=0, epochs=1,
                            drop_remainder=False):
        assert batch["tokens"].shape[0] == 8
        total += 8
    # Every example appears at least once (partial buckets padded by repeats).
    assert total >= len(ds)


def test_bucket_routing_is_minimal(shard_dir):
    ds = dfl.NpzShardDataset(shard_dir)
    for si, ei, Tb, Ub in ds.index:
        b = ds._bucket_for(Tb, Ub)
        # No smaller bucket fits.
        for other in ds.buckets:
            if (other.t_pad, other.u_pad) < (b.t_pad, b.u_pad):
                assert Tb > other.t_pad or Ub > other.u_pad


def test_train_loop_runs_from_files(shard_dir, tmp_path):
    from ssnt_tts_tpu.train_loop import run_training
    from ssnt_tts_tpu.utils.config import (
        MeshConfig, TrainConfig, tiny_model_config,
    )

    metrics = run_training(
        num_steps=3,
        model_config=tiny_model_config(),
        train_config=TrainConfig(
            batch_size=4, warmup_steps=2,
            max_input_length=12, max_output_length=40,
        ),
        mesh_config=MeshConfig(data=1, model=1),
        data_dir=shard_dir,
        log_every=1,
        metrics_path=str(tmp_path / "metrics.jsonl"),
    )
    assert np.isfinite(metrics["loss"])
    assert 0.0 < metrics["token_padding_efficiency"] <= 1.0
    assert 0.0 < metrics["frame_padding_efficiency"] <= 1.0
