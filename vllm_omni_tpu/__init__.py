"""tpu-omni: a TPU-native omni-modality serving framework.

From-scratch JAX/XLA/Pallas rebuild of the capabilities of
vllm-project/vllm-omni (multi-stage omni pipelines: AR thinker/talker +
diffusion DiT + codec decoders) designed TPU-first: single-controller
orchestration, jit-compiled step functions on per-stage mesh slices,
Pallas ragged paged attention, GSPMD parallelism.
"""

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
