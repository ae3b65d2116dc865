"""Process-zero logging (reference utils/logger.py ZeroLogger).

On a multi-host TPU pod only process 0 writes; other processes get no-op
loggers (the rank-0 muting of reference __init__.py:5-12).
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional


class _NoOpLogger:
    def __getattr__(self, name):
        return lambda *a, **k: None


def is_main_process() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def ZeroLogger(
    log_file: Optional[str] = None,
    name: str = "xequinet",
    level: int = logging.INFO,
):
    if not is_main_process():
        return _NoOpLogger()
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s [%(levelname)s] %(message)s")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        parent = os.path.dirname(log_file)
        if parent:
            os.makedirs(parent, exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger
