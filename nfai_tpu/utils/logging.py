"""Structured logging (SURVEY.md §5: replaces the reference's Console.WriteLine
scatter — Parser.cs:116,141,176,305, SamplingUtils.cs:50-54)."""
from __future__ import annotations

import logging
import os
import sys

_CONFIGURED = False


def get_logger(name: str = "nfai_tpu") -> logging.Logger:
    global _CONFIGURED
    if not _CONFIGURED:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter(
                "%(asctime)s %(levelname).1s %(name)s: %(message)s", "%H:%M:%S"
            )
        )
        root = logging.getLogger("nfai_tpu")
        root.addHandler(handler)
        root.setLevel(os.environ.get("NFAI_LOG_LEVEL", "INFO").upper())
        root.propagate = False
        _CONFIGURED = True
    return logging.getLogger(name)
