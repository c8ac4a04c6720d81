r"""Structured logging.

The reference prints to stderr ad hoc (`azula/hub.py:73-76`, SURVEY.md §5.5);
this module provides the minimal structured replacement: a namespaced logger
with a single-line format carrying timestamps and levels, used by long-running
entry points (downloads, benchmarks, training loops).
"""

from __future__ import annotations

__all__ = [
    "get_logger",
]

import logging
import sys

_FORMAT = "%(asctime)s %(levelname)s %(name)s: %(message)s"


def get_logger(name: str = "azula_tpu") -> logging.Logger:
    r"""Returns the package logger, configured once with a stderr handler."""

    logger = logging.getLogger(name)

    root = logging.getLogger("azula_tpu")
    if not root.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
        root.addHandler(handler)
        root.setLevel(logging.INFO)
        root.propagate = False

    return logger
