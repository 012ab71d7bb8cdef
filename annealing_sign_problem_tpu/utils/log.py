"""Structured logging with brace-style formatting.

The reference uses loguru throughout (common.py:15); this is a small
dependency-free equivalent over the stdlib so log call sites read the same
(``logger.info("x = {}", x)``).
"""

from __future__ import annotations

import logging
import os
import sys

__all__ = ["logger"]


class _BraceLogger:
    def __init__(self, name: str = "asp_tpu"):
        self._log = logging.getLogger(name)
        if not self._log.handlers:
            handler = logging.StreamHandler(sys.stderr)
            handler.setFormatter(
                logging.Formatter(
                    "%(asctime)s | %(levelname)-7s | %(name)s - %(message)s",
                    datefmt="%Y-%m-%d %H:%M:%S",
                )
            )
            self._log.addHandler(handler)
            level = os.environ.get("ASP_TPU_LOG_LEVEL", "INFO").upper()
            self._log.setLevel(getattr(logging, level, logging.INFO))
            self._log.propagate = False

    def _emit(self, level, msg, *args, **kwargs):
        if self._log.isEnabledFor(level):
            try:
                text = str(msg).format(*args, **kwargs) if (args or kwargs) else str(msg)
            except (IndexError, KeyError):
                text = str(msg)
            self._log.log(level, text)

    def debug(self, msg, *args, **kwargs):
        self._emit(logging.DEBUG, msg, *args, **kwargs)

    def info(self, msg, *args, **kwargs):
        self._emit(logging.INFO, msg, *args, **kwargs)

    def warning(self, msg, *args, **kwargs):
        self._emit(logging.WARNING, msg, *args, **kwargs)

    def error(self, msg, *args, **kwargs):
        self._emit(logging.ERROR, msg, *args, **kwargs)

    def setLevel(self, level):
        self._log.setLevel(level)


logger = _BraceLogger()
