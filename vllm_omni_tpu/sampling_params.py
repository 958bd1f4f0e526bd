"""Per-request sampling parameters.

Behavioral parity with the sampling surface the reference exposes through
vLLM SamplingParams plus the omni per-stage override mechanism
(reference entrypoints/omni_stage.py:49 `prepare_sampling_params`,
serving_chat.py:459 `_build_sampling_params_list_from_request`).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Union


@dataclass
class SamplingParams:
    """Sampling controls for one request on one AR stage."""

    n: int = 1
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0  # 0 or -1 => disabled
    min_p: float = 0.0
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    max_tokens: Optional[int] = 16
    min_tokens: int = 0
    stop: Union[str, list[str], None] = None
    stop_token_ids: Optional[list[int]] = None
    # tokens masked to -inf before sampling (HF suppress_tokens / vLLM
    # bad_words single-token form); at most 8 per request
    suppress_token_ids: Optional[list[int]] = None
    ignore_eos: bool = False
    seed: Optional[int] = None
    logprobs: Optional[int] = None
    # structured (grammar-constrained) outputs: {"json": schema-dict-or-str}
    # | {"regex": pattern} | {"choice": [strings]} — the vLLM
    # StructuredOutputsParams surface the reference plumbs to xgrammar
    structured_outputs: Optional[dict] = None
    detokenize: bool = True
    skip_special_tokens: bool = True
    # Omni extension: which output the stage emits ("text", "latent",
    # "audio", ...). Mirrors engine_output_type routing
    # (reference engine/arg_utils.py:26-177).
    output_kind: str = "text"
    extra_args: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.temperature < 0.0:
            raise ValueError(f"temperature must be >= 0, got {self.temperature}")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1], got {self.top_p}")
        if self.top_k < -1:
            raise ValueError(f"top_k must be >= -1, got {self.top_k}")
        if self.top_k == -1:
            self.top_k = 0
        if self.max_tokens is not None and self.max_tokens < 1:
            raise ValueError(f"max_tokens must be >= 1, got {self.max_tokens}")
        if isinstance(self.stop, str):
            self.stop = [self.stop]
        if self.stop is None:
            self.stop = []
        if self.stop_token_ids is None:
            self.stop_token_ids = []
        if self.suppress_token_ids is None:
            self.suppress_token_ids = []
        if len(self.suppress_token_ids) > 8:
            raise ValueError("at most 8 suppress_token_ids supported")
        if self.structured_outputs is not None:
            keys = set(self.structured_outputs) & {"json", "regex", "choice"}
            if not keys:
                raise ValueError(
                    "structured_outputs needs one of json/regex/choice "
                    f"(got {list(self.structured_outputs)})")

    @property
    def greedy(self) -> bool:
        return self.temperature == 0.0

    def clone(self) -> "SamplingParams":
        return dataclasses.replace(
            self,
            stop=list(self.stop or []),
            stop_token_ids=list(self.stop_token_ids or []),
            suppress_token_ids=list(self.suppress_token_ids or []),
            structured_outputs=(dict(self.structured_outputs)
                                if self.structured_outputs else None),
            extra_args=dict(self.extra_args),
        )

    def with_overrides(self, overrides: dict[str, Any]) -> "SamplingParams":
        """New params with per-request/stage overrides applied.

        Parity: per-stage default_sampling_params merged with request
        overrides (reference omni_stage.py:49, omni.py:302-318).
        """
        out = self.clone()
        for k, v in overrides.items():
            if hasattr(out, k):
                setattr(out, k, v)
            else:
                out.extra_args[k] = v
        out.__post_init__()
        return out

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "SamplingParams":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        extra = {k: v for k, v in d.items() if k not in known}
        sp = cls(**kwargs)
        sp.extra_args.update(extra)
        return sp
