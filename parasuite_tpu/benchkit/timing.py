"""Throughput harness: reads/s/chip with compile/warmup separated
(BASELINE.json:metric; SURVEY.md §5 tracing).

Wall-clock only measures steady-state device execution: the first call's
compile time is excluded (XLA compiles once per shape), and results are
block_until_ready'd so async dispatch cannot flatter the numbers.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

import jax


@dataclass
class ThroughputTimer:
    name: str = "align"
    _t0: float = 0.0
    items: int = 0
    seconds: float = 0.0
    stage_seconds: dict = field(default_factory=dict)

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, n_items: int, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.items += n_items
        self.seconds += dt
        return dt

    def stage(self, key: str, seconds: float) -> None:
        self.stage_seconds[key] = self.stage_seconds.get(key, 0.0) + seconds

    @property
    def per_second(self) -> float:
        return self.items / self.seconds if self.seconds > 0 else 0.0

    def report(self, **extra) -> dict:
        d = {"name": self.name, "items": self.items,
             "seconds": round(self.seconds, 4),
             "items_per_second": round(self.per_second, 2)}
        if self.stage_seconds:
            d["stages"] = {k: round(v, 4) for k, v in self.stage_seconds.items()}
        d.update(extra)
        return d

    def json_line(self, **extra) -> str:
        return json.dumps(self.report(**extra))
