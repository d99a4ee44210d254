"""Structured metrics & throughput counters.

The reference has no observability at all (SURVEY.md §5: tests print only).
This module provides the counters the benchmarks and training loop report:
lattice cells/s, decoded audio-seconds/s, weak-scaling efficiency.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Dict, Optional


@dataclasses.dataclass
class LatticeThroughput:
    """Mcells/s for a (B, T, U) forward[-backward] lattice pass."""

    batch: int
    input_length: int
    output_length: int

    @property
    def cells(self) -> int:
        return self.batch * self.input_length * self.output_length

    def mcells_per_s(self, seconds: float) -> float:
        return self.cells / seconds / 1e6


@dataclasses.dataclass
class DecodeThroughput:
    """Audio-seconds synthesized per wall-clock second."""

    batch: int
    frames: int
    frame_hop_s: float = 0.0125  # 12.5 ms hop (80 frames/s)

    def audio_seconds(self) -> float:
        return self.batch * self.frames * self.frame_hop_s

    def audio_s_per_s(self, seconds: float) -> float:
        return self.audio_seconds() / seconds


def weak_scaling_efficiency(throughput_1: float, throughput_n: float,
                            n: int) -> float:
    """>= 0.9 is the north-star bar (BASELINE.md)."""
    return throughput_n / (throughput_1 * n)


class MetricsLogger:
    """Minimal JSONL metrics sink (stdout or file)."""

    def __init__(self, path: Optional[str] = None):
        self._fh = open(path, "a") if path else None
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, float]):
        rec = {"step": step, "t": round(time.time() - self._t0, 3)}
        rec.update(
            {
                k: (float(v) if hasattr(v, "item") or isinstance(
                    v, (int, float)) else v)
                for k, v in metrics.items()
            }
        )
        line = json.dumps(rec)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        else:
            print(line)

    def close(self):
        if self._fh:
            self._fh.close()
