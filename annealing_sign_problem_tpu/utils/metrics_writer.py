"""Scalar-metrics logging: JSONL always, TensorBoard when available.

Replaces the reference's SummaryWriter usage (train.py:14,655-675,
1540-1565) and its ad-hoc energy.txt/overlap.txt appends
(square_deep.py:240-251) with one provenance-friendly writer.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

__all__ = ["MetricsWriter"]


class MetricsWriter:
    def __init__(self, output_dir: str, use_tensorboard: bool = True):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=os.path.join(output_dir, "tb"))
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._f.write(
            json.dumps(
                {"tag": tag, "value": float(value), "step": int(step), "time": time.time()}
            )
            + "\n"
        )
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def scalars(self, values: dict, step: int) -> None:
        for tag, value in values.items():
            self.scalar(tag, value, step)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
