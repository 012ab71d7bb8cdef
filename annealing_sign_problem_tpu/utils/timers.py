"""Per-stage wall-clock tracing (the reference's tick/tock pattern,
common.py:139,155-175)."""

from __future__ import annotations

import contextlib
import time

from .log import logger

__all__ = ["Timer", "tick_tock"]


class Timer:
    def __init__(self):
        self.laps = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        start = time.perf_counter()
        yield
        elapsed = time.perf_counter() - start
        self.laps[name] = self.laps.get(name, 0.0) + elapsed
        logger.debug("{} took {:.3f} seconds", name, elapsed)


@contextlib.contextmanager
def tick_tock(name: str):
    start = time.perf_counter()
    yield
    logger.debug("{} took {:.3f} seconds", name, time.perf_counter() - start)
