"""Environment-variable knobs.

Mirrors the role of reference vllm_omni/diffusion/envs.py:40-134 (platform
probes + backend selection), reduced to the TPU/CPU axis that matters here.
"""

import os
from functools import lru_cache


def _get(name: str, default: str = "") -> str:
    return os.environ.get(name, default)


@lru_cache(maxsize=None)
def attention_backend() -> str:
    """Attention backend for the AR path: "pallas" or "xla".

    Reference analogue: DIFFUSION_ATTENTION_BACKEND env
    (diffusion/attention/selector.py:18-77).
    """
    return _get("OMNI_TPU_ATTENTION_BACKEND", "auto").lower()


@lru_cache(maxsize=None)
def kv_write_backend() -> str:
    """KV-cache write backend for decode steps: "pallas" (in-place page
    RMW kernel) or "xla" (scatter; copies the cache — debug only)."""
    return _get("OMNI_TPU_KV_WRITE_BACKEND", "pallas").lower()


@lru_cache(maxsize=None)
def diffusion_cache_backend() -> str:
    """Default diffusion cache backend name ('' = disabled)."""
    return _get("OMNI_TPU_DIFFUSION_CACHE_BACKEND", "")


def is_tpu_platform() -> bool:
    import jax

    try:
        return jax.devices()[0].platform.startswith("tpu") or (
            jax.default_backend() not in ("cpu", "gpu")
        )
    except Exception:
        return False
