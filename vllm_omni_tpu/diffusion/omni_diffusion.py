"""User-facing diffusion entrypoint.

Parity: OmniDiffusion (reference entrypoints/omni_diffusion.py:32-99):
builds OmniDiffusionConfig from kwargs, resolves the pipeline class from
the model dir's model_index.json, and exposes generate(prompt, **kw).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Union

from vllm_omni_tpu.config.diffusion import OmniDiffusionConfig
from vllm_omni_tpu.diffusion.engine import DiffusionEngine
from vllm_omni_tpu.diffusion.request import OmniDiffusionRequest
from vllm_omni_tpu.outputs import OmniRequestOutput
from vllm_omni_tpu.utils import Counter


def prepare_requests(
    prompt: Union[str, list[str]], counter: Counter, **kwargs
) -> list[OmniDiffusionRequest]:
    """Parity: prepare_requests (reference omni_diffusion.py:20-29)."""
    prompts = prompt if isinstance(prompt, list) else [prompt]
    known = {f.name for f in dataclasses.fields(OmniDiffusionRequest)}
    req_kwargs = {k: v for k, v in kwargs.items() if k in known}
    return [
        OmniDiffusionRequest(
            request_id=str(next(counter)), prompt=p, **req_kwargs
        )
        for p in prompts
    ]


class OmniDiffusion:
    def __init__(
        self,
        model: str = "",
        od_config: Optional[OmniDiffusionConfig] = None,
        pipeline: Optional[Any] = None,
        load_weights: bool = True,
        text_encoder=None,
        **kwargs,
    ):
        if od_config is None:
            known = {f.name for f in dataclasses.fields(OmniDiffusionConfig)}
            cfg_kwargs = {k: v for k, v in kwargs.items() if k in known}
            od_config = OmniDiffusionConfig(model=model, **cfg_kwargs)
        self.od_config = od_config
        self.engine = DiffusionEngine(
            od_config,
            pipeline=pipeline,
            load_weights=load_weights,
            text_encoder=text_encoder,
        )
        self._counter = Counter()

    def generate(
        self, prompt: Union[str, list[str]], **kwargs
    ) -> list[OmniRequestOutput]:
        requests = prepare_requests(prompt, self._counter, **kwargs)
        return self.engine.step(requests)
