"""Profiling hooks (TPU-native).

Parity with the reference's profiling surface (reference SURVEY §5:
torch profiler per worker via VLLM_TORCH_PROFILER_DIR,
start_profile/stop_profile on the EngineClient protocol
async_omni.py:1189-1193, record_function sections in
gpu_ar_model_runner.py:85-301, diffusion request profile fields
request.py:153-154) — implemented with the JAX profiler: traces land
as TensorBoard/XProf dumps under OMNI_TPU_PROFILER_DIR.
"""

from __future__ import annotations

import os
from typing import Optional

from vllm_omni_tpu.logger import init_logger

logger = init_logger(__name__)

_active_dir: Optional[str] = None


def profiler_dir() -> str:
    return os.environ.get("OMNI_TPU_PROFILER_DIR",
                          "/tmp/omni_tpu_profiles")


def start_profile(trace_dir: Optional[str] = None) -> str:
    """Begin a JAX profiler trace; returns the dump directory."""
    global _active_dir
    import jax

    d = trace_dir or profiler_dir()
    if _active_dir is not None:
        logger.warning("profiler already active at %s", _active_dir)
        return _active_dir
    os.makedirs(d, exist_ok=True)
    jax.profiler.start_trace(d)
    _active_dir = d
    logger.info("profiler trace started -> %s", d)
    return d


def stop_profile() -> Optional[str]:
    """End the active trace; returns where it was written (or None)."""
    global _active_dir
    import jax

    if _active_dir is None:
        logger.warning("no active profiler trace")
        return None
    jax.profiler.stop_trace()
    d, _active_dir = _active_dir, None
    logger.info("profiler trace written -> %s", d)
    return d


def is_profiling() -> bool:
    return _active_dir is not None
