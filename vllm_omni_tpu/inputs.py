"""Prompt input types.

Parity targets: OmniTokensPrompt / OmniEmbedsPrompt with `prompt_embeds` and
`additional_information` side-channel (reference vllm_omni/inputs/data.py:
13-108) — but additional_information here is a plain pytree of host or
device arrays; it is handed to models without serialization because stages
live in one process / one mesh (design: SURVEY.md §7 stance).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Union


@dataclass
class TextPrompt:
    prompt: str
    multi_modal_data: Optional[dict[str, Any]] = None
    mm_processor_kwargs: Optional[dict[str, Any]] = None


@dataclass
class OmniTokensPrompt:
    prompt_token_ids: list[int]
    multi_modal_data: Optional[dict[str, Any]] = None
    mm_processor_kwargs: Optional[dict[str, Any]] = None
    # [seq_len, hidden] array overlaid onto the prefill embeddings
    # (reference gpu_model_runner.py:714-735).
    prompt_embeds: Optional[Any] = None
    # Arbitrary per-request side data consumed by model pre/postprocess
    # hooks (reference inputs/data.py:13-31).
    additional_information: dict[str, Any] = field(default_factory=dict)


@dataclass
class OmniEmbedsPrompt:
    prompt_embeds: Any  # [seq_len, hidden]
    additional_information: dict[str, Any] = field(default_factory=dict)


PromptType = Union[str, TextPrompt, OmniTokensPrompt, OmniEmbedsPrompt]


def parse_prompt(prompt: PromptType) -> Union[TextPrompt, OmniTokensPrompt, OmniEmbedsPrompt]:
    """Normalize user prompt input to one of the dataclasses.

    Parity: parse_singleton_prompt_omni (reference inputs/parse.py:11).
    """
    if isinstance(prompt, str):
        return TextPrompt(prompt=prompt)
    if isinstance(prompt, (TextPrompt, OmniTokensPrompt, OmniEmbedsPrompt)):
        return prompt
    if isinstance(prompt, dict):
        if "prompt_token_ids" in prompt:
            return OmniTokensPrompt(**prompt)
        if "prompt_embeds" in prompt and "prompt_token_ids" not in prompt:
            return OmniEmbedsPrompt(**prompt)
        if "prompt" in prompt:
            return TextPrompt(**prompt)
    raise TypeError(f"Unsupported prompt type: {type(prompt)!r}")
