"""OpenAI-compatible protocol models.

Parity: the request/response surface the reference serves —
chat completions (serving_chat.py:84-1291), audio speech
(protocol/audio.py:7), image generations with size/format validation
(protocol/images.py:22-104).
"""

from __future__ import annotations

import time
from typing import Any, Literal, Optional, Union

from pydantic import BaseModel, Field, field_validator


class ChatMessage(BaseModel):
    role: str
    content: Union[str, list[dict[str, Any]], None] = None
    audio: Optional[dict[str, Any]] = None
    # assistant tool-call turns and tool-result turns in the
    # conversation history (OpenAI shape)
    tool_calls: Optional[list[dict[str, Any]]] = None
    tool_call_id: Optional[str] = None
    name: Optional[str] = None


class ChatCompletionRequest(BaseModel):
    model: str = ""
    messages: list[ChatMessage]
    max_tokens: Optional[int] = None
    max_completion_tokens: Optional[int] = None
    temperature: Optional[float] = None
    top_p: Optional[float] = None
    top_k: Optional[int] = None
    seed: Optional[int] = None
    stop: Union[str, list[str], None] = None
    presence_penalty: Optional[float] = None
    frequency_penalty: Optional[float] = None
    repetition_penalty: Optional[float] = None
    n: int = 1
    # OpenAI logprobs surface (reference serving_chat.py:634-646
    # out_logprobs -> _create_chat_logprobs): logprobs=true returns each
    # sampled token's logprob; top_logprobs additionally returns the k
    # most likely alternatives per position
    logprobs: bool = False
    top_logprobs: Optional[int] = None
    stream: bool = False
    modalities: Optional[list[str]] = None  # ["text"], ["text", "audio"]
    audio: Optional[dict[str, Any]] = None  # {"voice": ..., "format": ...}
    # structured outputs: OpenAI response_format
    # {"type": "json_schema", "json_schema": {"schema": {...}}} or
    # {"type": "json_object"}; plus the vLLM guided_* aliases
    response_format: Optional[dict[str, Any]] = None
    structured_outputs: Optional[dict[str, Any]] = None
    guided_json: Optional[Any] = None
    guided_regex: Optional[str] = None
    guided_choice: Optional[list[str]] = None
    # tool calling (reference serving_chat.py:617-760: tool_parser +
    # named/required tool_choice) — Hermes-format extraction; named
    # tool_choice grammar-constrains arguments to the tool's schema
    tools: Optional[list[dict[str, Any]]] = None
    tool_choice: Union[str, dict[str, Any], None] = None
    # reasoning content split (<think>...</think>); include_reasoning
    # false drops it from the response (reference serving_chat.py:651)
    include_reasoning: bool = True
    # Omni extension: per-stage sampling overrides keyed by stage id
    # (reference serving_chat.py:459 request-level overrides)
    stage_sampling_params: Optional[dict[str, dict[str, Any]]] = None
    mm_processor_kwargs: Optional[dict[str, Any]] = None
    # diffusion-chat generation params (reference serving_chat.py:1048-1074
    # reads these from extra_body: size/height/width, steps, guidance,
    # true_cfg_scale, negative_prompt, num_outputs_per_prompt, num_frames,
    # guidance_scale_2)
    extra_body: Optional[dict[str, Any]] = None


class ChatCompletionChoice(BaseModel):
    index: int
    message: dict[str, Any]
    # OpenAI format: {"content": [{"token", "logprob", "bytes",
    # "top_logprobs": [...]}, ...]}
    logprobs: Optional[dict[str, Any]] = None
    finish_reason: Optional[str] = None


class UsageInfo(BaseModel):
    prompt_tokens: int = 0
    completion_tokens: int = 0
    total_tokens: int = 0


class ChatCompletionResponse(BaseModel):
    id: str
    object: str = "chat.completion"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: list[ChatCompletionChoice] = []
    usage: UsageInfo = Field(default_factory=UsageInfo)


class CreateSpeechRequest(BaseModel):
    """Parity: OpenAICreateSpeechRequest (reference protocol/audio.py:7)."""

    model: str = ""
    input: str
    voice: Optional[str] = None
    response_format: Literal["wav", "pcm"] = "wav"
    speed: float = 1.0
    sample_rate: int = 24000
    # chunked-transfer streaming of the audio as codec chunks decode
    # (beyond-reference: the reference refuses streaming,
    # serving_speech.py:29-31)
    stream: bool = False


class ImageGenerationRequest(BaseModel):
    """Parity: ImageGenerationRequest (reference protocol/images.py:22-104)."""

    model: str = ""
    prompt: str
    negative_prompt: str = ""
    n: int = 1
    size: str = "512x512"
    response_format: Literal["b64_json", "url"] = "b64_json"
    num_inference_steps: Optional[int] = None
    guidance_scale: Optional[float] = None
    true_cfg_scale: Optional[float] = None
    seed: Optional[int] = None

    @field_validator("size")
    @classmethod
    def _check_size(cls, v: str) -> str:
        try:
            w, h = v.lower().split("x")
            w, h = int(w), int(h)
        except Exception:
            raise ValueError(f"size must be WxH, got {v!r}") from None
        if not (64 <= w <= 4096 and 64 <= h <= 4096):
            raise ValueError(f"size out of range: {v}")
        if w % 16 or h % 16:
            raise ValueError("width/height must be multiples of 16")
        return v

    @property
    def width_height(self) -> tuple[int, int]:
        w, h = self.size.lower().split("x")
        return int(w), int(h)


class ImageData(BaseModel):
    b64_json: Optional[str] = None
    url: Optional[str] = None
    revised_prompt: Optional[str] = None


class ImageGenerationResponse(BaseModel):
    created: int = Field(default_factory=lambda: int(time.time()))
    data: list[ImageData] = []


class ErrorResponse(BaseModel):
    error: dict[str, Any]

    @classmethod
    def make(cls, message: str, err_type: str = "invalid_request_error",
             code: int = 400) -> "ErrorResponse":
        return cls(error={"message": message, "type": err_type, "code": code})


class ModelCard(BaseModel):
    id: str
    object: str = "model"
    created: int = Field(default_factory=lambda: int(time.time()))
    owned_by: str = "vllm-omni-tpu"


class ModelList(BaseModel):
    object: str = "list"
    data: list[ModelCard] = []
