"""Request output types.

Parity targets: CompletionOutput/RequestOutput (vLLM surface used by the
reference) and OmniRequestOutput's dual pipeline/diffusion modes
(reference vllm_omni/outputs.py:25-173).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class CompletionOutput:
    index: int
    text: str
    token_ids: list[int]
    cumulative_logprob: Optional[float] = None
    logprobs: Optional[list[dict[int, float]]] = None
    finish_reason: Optional[str] = None
    stop_reason: Optional[Any] = None
    # Omni extension: non-text per-request model output (hidden states,
    # codec codes, waveforms) accumulated across decode steps
    # (reference engine/output_processor.py:99-186).
    multimodal_output: Optional[dict[str, Any]] = None

    @property
    def finished(self) -> bool:
        return self.finish_reason is not None


@dataclass
class RequestMetrics:
    arrival_time: float = 0.0
    first_token_time: Optional[float] = None
    finished_time: Optional[float] = None
    num_prompt_tokens: int = 0
    num_generated_tokens: int = 0

    @property
    def ttft(self) -> Optional[float]:
        if self.first_token_time is None:
            return None
        return self.first_token_time - self.arrival_time

    @property
    def e2e_latency(self) -> Optional[float]:
        if self.finished_time is None:
            return None
        return self.finished_time - self.arrival_time


@dataclass
class RequestOutput:
    request_id: str
    prompt: Optional[str]
    prompt_token_ids: list[int]
    outputs: list[CompletionOutput]
    finished: bool
    metrics: RequestMetrics = field(default_factory=RequestMetrics)

    @property
    def num_generated_tokens(self) -> int:
        return sum(len(o.token_ids) for o in self.outputs)


@dataclass
class DiffusionMetrics:
    e2e_latency: float = 0.0
    denoise_latency: float = 0.0
    vae_latency: float = 0.0
    encode_latency: float = 0.0
    num_steps: int = 0
    steps_skipped: int = 0


@dataclass
class OmniRequestOutput:
    """Unified output for both pipeline (multi-stage) and diffusion modes.

    Parity: reference vllm_omni/outputs.py:25-173.
    """

    request_id: str
    # Pipeline mode ------------------------------------------------------
    stage_id: int = -1
    final_output_type: Optional[str] = None  # "text" | "audio" | "image" | "latent"
    request_output: Optional[RequestOutput] = None
    # Diffusion mode -----------------------------------------------------
    images: Optional[list[Any]] = None  # list of PIL.Image or arrays
    prompt: Optional[str] = None
    latents: Optional[Any] = None
    metrics: Optional[DiffusionMetrics] = None
    error: Optional[str] = None
    # streaming: an incremental emission from a final stage (per token
    # step / per audio chunk), followed eventually by the full output
    partial: bool = False

    @property
    def is_diffusion(self) -> bool:
        return self.images is not None or self.latents is not None

    @classmethod
    def from_diffusion(
        cls,
        request_id: str,
        images: list[Any],
        prompt: Optional[str] = None,
        latents: Any = None,
        metrics: Optional[DiffusionMetrics] = None,
        error: Optional[str] = None,
    ) -> "OmniRequestOutput":
        return cls(
            request_id=request_id,
            stage_id=-1,
            final_output_type="image",
            images=images,
            prompt=prompt,
            latents=latents,
            metrics=metrics,
            error=error,
        )

    @classmethod
    def from_stage(
        cls,
        request_id: str,
        stage_id: int,
        final_output_type: str,
        request_output: RequestOutput,
    ) -> "OmniRequestOutput":
        return cls(
            request_id=request_id,
            stage_id=stage_id,
            final_output_type=final_output_type,
            request_output=request_output,
        )
