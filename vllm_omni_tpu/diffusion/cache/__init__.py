"""Diffusion cache-acceleration backends.

Parity: get_cache_backend selector (reference diffusion/cache/
selector.py:9-38) with the TeaCache backend implemented TPU-style:
the skip decision runs host-side between jitted steps (data-dependent
control flow can't live under jit; SURVEY.md §7 hard part).
"""

from vllm_omni_tpu.config.diffusion import DiffusionCacheConfig
from vllm_omni_tpu.diffusion.cache.dbcache import DBCacheBackend
from vllm_omni_tpu.diffusion.cache.teacache import TeaCacheBackend

_BACKENDS = {"teacache": TeaCacheBackend, "dbcache": DBCacheBackend,
             "cache_dit": DBCacheBackend}


def get_cache_backend(config: DiffusionCacheConfig, pipeline):
    name = (config.cache_backend or "").lower()
    if not name:
        return None
    if name not in _BACKENDS:
        raise ValueError(
            f"unknown cache backend {name!r}; known: {sorted(_BACKENDS)}"
        )
    return _BACKENDS[name](config, pipeline)
