"""tpu-omni: a TPU-native omni-modality serving framework.

From-scratch JAX/XLA/Pallas rebuild of the capabilities of
vllm-project/vllm-omni (multi-stage omni pipelines: AR thinker/talker +
diffusion DiT + codec decoders) designed TPU-first: single-controller
orchestration, jit-compiled step functions on per-stage mesh slices,
Pallas ragged paged attention, GSPMD parallelism.
"""

import os as _os


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (first compile of a bucket is
    expensive over the TPU compile service; subsequent engine bring-ups
    hit disk). Disable with OMNI_TPU_NO_COMPILE_CACHE=1."""
    if _os.environ.get("OMNI_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = _os.environ.get(
            "OMNI_TPU_COMPILE_CACHE_DIR",
            _os.path.expanduser("~/.cache/vllm_omni_tpu/jax_cache"),
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is best-effort
        pass


_enable_compilation_cache()

from vllm_omni_tpu.version import __version__
from vllm_omni_tpu.sampling_params import SamplingParams
from vllm_omni_tpu.outputs import (
    CompletionOutput,
    OmniRequestOutput,
    RequestOutput,
)
from vllm_omni_tpu.inputs import OmniTokensPrompt, OmniEmbedsPrompt, TextPrompt

__all__ = [
    "__version__",
    "SamplingParams",
    "CompletionOutput",
    "RequestOutput",
    "OmniRequestOutput",
    "OmniTokensPrompt",
    "OmniEmbedsPrompt",
    "TextPrompt",
]


def __getattr__(name):
    # Lazy heavyweight entrypoints (keep `import vllm_omni_tpu` light).
    if name == "Omni":
        from vllm_omni_tpu.stages.omni import Omni

        return Omni
    if name == "AsyncOmni":
        from vllm_omni_tpu.stages.async_omni import AsyncOmni

        return AsyncOmni
    if name == "LLM":
        from vllm_omni_tpu.engine.llm import LLM

        return LLM
    if name == "OmniDiffusion":
        from vllm_omni_tpu.diffusion.omni_diffusion import OmniDiffusion

        return OmniDiffusion
    raise AttributeError(f"module 'vllm_omni_tpu' has no attribute {name!r}")
