"""Engine-internal request state.

Parity: OmniRequest (reference vllm_omni/request.py:12-71) — vLLM Request
plus prompt_embeds / additional_information. Status lifecycle mirrors the
vLLM v1 request states the reference schedulers manipulate
(omni_ar_scheduler.py:64-249).
"""

from __future__ import annotations

import enum
import time
from dataclasses import dataclass, field
from typing import Any, Optional

from vllm_omni_tpu.sampling_params import SamplingParams


class RequestStatus(enum.Enum):
    WAITING = enum.auto()
    RUNNING = enum.auto()
    PREEMPTED = enum.auto()
    FINISHED_STOPPED = enum.auto()
    FINISHED_LENGTH_CAPPED = enum.auto()
    FINISHED_ABORTED = enum.auto()

    @property
    def finished(self) -> bool:
        return self in (
            RequestStatus.FINISHED_STOPPED,
            RequestStatus.FINISHED_LENGTH_CAPPED,
            RequestStatus.FINISHED_ABORTED,
        )


FINISH_REASON = {
    RequestStatus.FINISHED_STOPPED: "stop",
    RequestStatus.FINISHED_LENGTH_CAPPED: "length",
    RequestStatus.FINISHED_ABORTED: "abort",
}


@dataclass
class Request:
    request_id: str
    prompt_token_ids: list[int]
    sampling_params: SamplingParams
    prompt: Optional[str] = None
    # [prompt_len, hidden] host or device array overlaid onto prefill
    # embeddings (reference gpu_model_runner.py:714-735).
    prompt_embeds: Optional[Any] = None
    additional_information: dict[str, Any] = field(default_factory=dict)
    arrival_time: float = field(default_factory=time.monotonic)

    # Multimodal rotary positions [3, prompt_len] + decode-time delta
    # (reference mrope.py:415-587); None -> plain 1D positions.
    mrope_positions: Optional[Any] = None
    mrope_delta: int = 0
    # [N, hidden] embeddings ADDED to the token embedding of generated
    # position j (clamped to the last row when j >= N) — the talker's
    # streamed thinker_reply_part (reference qwen3_omni.py:589-898 /
    # HF talker decode semantics).
    decode_embeds: Optional[Any] = None
    # [n_levels, prompt_len, hidden] deepstack visual embeddings added to
    # the hidden states after the first n_levels decoder layers (zeros at
    # non-visual positions; reference qwen3_omni_moe_thinker.py:597-720).
    deepstack_embeds: Optional[Any] = None

    status: RequestStatus = RequestStatus.WAITING
    output_token_ids: list[int] = field(default_factory=list)
    num_computed_tokens: int = 0  # tokens scheduled into the KV cache
    # n-gram speculative decoding state (scheduler-owned)
    spec_tokens: Optional[list[int]] = None
    spec_inflight: bool = False
    last_new_tokens: Optional[list[int]] = None
    logprobs: Optional[list[dict[int, float]]] = None
    # grammar-constrained decoding (structured outputs): a TokenFSM and
    # the current DFA state (advances per sampled token host-side)
    grammar_fsm: Optional[Any] = None
    grammar_state: int = 0
    # epoch guards stale in-flight step results after recompute-preemption
    # (async pipelined scheduling)
    sched_epoch: int = 0
    # positions < replay_until are preserved outputs re-prefilled after a
    # recompute-preemption (device penalty state re-observes them)
    replay_until: int = 0
    # resolved per-request RNG seed: sampling_params.seed when given,
    # fresh host entropy otherwise (set at add_request)
    rng_seed: Optional[int] = None
    batch_row: int = -1  # persistent row in the device batch, -1 = none
    stop_reason: Optional[Any] = None
    # Accumulated non-text outputs keyed by name (hidden states, codes,
    # waveforms) — reference MultimodalOutputProcessor accumulation
    # (engine/output_processor.py:99-186).
    multimodal_outputs: dict[str, list[Any]] = field(default_factory=dict)
    # Host-side runtime info handed to model hooks each step
    # (reference gpu_model_runner.py:882-909 runtime_additional_information).
    runtime_info: dict[str, Any] = field(default_factory=dict)

    @property
    def num_prompt_tokens(self) -> int:
        return len(self.prompt_token_ids)

    @property
    def num_output_tokens(self) -> int:
        return len(self.output_token_ids)

    @property
    def num_tokens(self) -> int:
        return self.num_prompt_tokens + self.num_output_tokens

    @property
    def all_token_ids(self) -> list[int]:
        return self.prompt_token_ids + self.output_token_ids

    @property
    def max_total_tokens(self) -> int:
        mt = self.sampling_params.max_tokens or 2**31
        return self.num_prompt_tokens + mt

    @property
    def finished(self) -> bool:
        return self.status.finished

    @property
    def finish_reason(self) -> Optional[str]:
        return FINISH_REASON.get(self.status)
