"""Structured logging — hot loop silent by default.

The reference disables logging globally and prints inside the hot loop
(videocrafter_main.py:12-15, funcs.py:313-314); here the pipeline emits
structured per-stage records at INFO and nothing inside jitted code.
"""

from __future__ import annotations

import logging
import os
import sys
import time
from contextlib import contextmanager

_FORMAT = "%(asctime)s %(name)s %(levelname)s %(message)s"


def get_logger(name: str = "moca_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
        logger.setLevel(os.environ.get("MOCA_TPU_LOGLEVEL", "INFO"))
        logger.propagate = False
    return logger


@contextmanager
def stage_timer(name: str, logger: logging.Logger | None = None,
                sink: dict | None = None):
    """Wall-clock a pipeline stage; optionally record into a metrics dict."""
    log = logger or get_logger()
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if sink is not None:
            sink.setdefault(name, []).append(dt)
        log.info("stage %s: %.3fs", name, dt)
