"""Logging setup.

Reference behavior: vllm_omni/logger.py + per-stage VLLM_LOGGING_PREFIX
(reference entrypoints/omni_stage.py:248-250). Here: stdlib logging with an
optional per-process stage prefix picked up from the environment.
"""

import logging
import os
import sys

_FORMAT = "%(levelname)s %(asctime)s [%(name)s:%(lineno)d] %(message)s"
_DATEFMT = "%m-%d %H:%M:%S"

_configured = False


def _configure_root() -> None:
    global _configured
    if _configured:
        return
    prefix = os.environ.get("OMNI_TPU_LOGGING_PREFIX", "")
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter(prefix + _FORMAT, datefmt=_DATEFMT))
    root = logging.getLogger("vllm_omni_tpu")
    root.addHandler(handler)
    root.setLevel(os.environ.get("OMNI_TPU_LOG_LEVEL", "INFO").upper())
    root.propagate = False
    _configured = True


def init_logger(name: str) -> logging.Logger:
    _configure_root()
    return logging.getLogger(name)
