"""Fixed-shape batch descriptor emitted by the scheduler.

This is the TPU replacement for vLLM's SchedulerOutput + attention metadata:
every array has a bucketed static shape so the jitted model step compiles
once per (token_bucket,) and is reused (SURVEY.md §7 hard part #1).

Layout convention:
- the "token axis" (T) flattens all new tokens scheduled this step across
  sequences, in row order;
- the "row axis" (S = max_num_seqs) is the persistent batch: each running
  request keeps one row for its lifetime, so per-row device state
  (penalty token counts, RNG counters) never needs re-indexing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np


@dataclass
class BatchDescriptor:
    """Everything the jitted step needs, as numpy (uploaded per step)."""

    # --- token axis, shape [T_pad] ---
    token_ids: np.ndarray  # int32, new tokens to embed this step
    positions: np.ndarray  # int32, position of each token in its seq
    token_rows: np.ndarray  # int32, persistent row of each token (S for pad)
    slot_mapping: np.ndarray  # int32, flat KV slot; pad -> slot 0 (pad block)
    is_prompt_token: np.ndarray  # bool, token comes from the prompt
    # bool: token value not yet known on host — the step gathers it from
    # the device-resident prev_sampled[row] (async pipelined scheduling)
    use_prev_sampled: np.ndarray
    # --- row axis, shape [S] (or [S+1] for cu) ---
    q_lens: np.ndarray  # int32, tokens scheduled this step per row (0 = idle)
    cu_q_lens: np.ndarray  # int32 [S+1], exclusive cumsum of q_lens
    seq_lens: np.ndarray  # int32, total kv length per row after this step
    block_tables: np.ndarray  # int32 [S, max_blocks]
    logits_indices: np.ndarray  # int32, token-axis idx of each row's last token
    do_sample: np.ndarray  # bool, row produces a token this step
    reset_rows: np.ndarray  # bool, clear per-row device state before step
    # sampling params per row
    temperature: np.ndarray  # f32
    top_p: np.ndarray  # f32
    top_k: np.ndarray  # int32 (0 = off)
    min_p: np.ndarray  # f32
    repetition_penalty: np.ndarray  # f32
    presence_penalty: np.ndarray  # f32
    frequency_penalty: np.ndarray  # f32
    seeds: np.ndarray  # uint32 per-row RNG seed
    step_counters: np.ndarray  # int32 per-row sample counter (for RNG fold)
    # per-row suppressed token ids [S, 8] (-1 = unused slot)
    suppress_ids: Optional[np.ndarray] = None
    # --- scalars ---
    num_tokens: int = 0  # actual (unpadded) token count
    num_reqs: int = 0  # actual scheduled request count
    # host-side static flags (select the compiled step variant):
    # skip the [S,V] count-matrix scatters when no request uses penalties,
    # and the full-vocab sort when every request is greedy
    need_penalties: bool = False
    all_greedy: bool = True
    # --- optional prompt-embeds overlay, shape [T_pad, H] + mask [T_pad] ---
    prompt_embeds: Optional[np.ndarray] = None
    use_embeds: Optional[np.ndarray] = None
    # --- optional M-RoPE position streams [3, T_pad] ---
    mrope_positions: Optional[np.ndarray] = None
    # --- optional ADD-overlay for decode positions [T_pad, H] + mask ---
    add_embeds: Optional[np.ndarray] = None
    use_add_embeds: Optional[np.ndarray] = None
    # --- optional deepstack visual embeds [n_levels, T_pad, H] ---
    deepstack_embeds: Optional[np.ndarray] = None
    # --- multi-step fused decode: K jitted decode steps per dispatch ---
    # (amortizes per-dispatch host/tunnel overhead; see SchedulerConfig.
    # multi_step_decode). extra_slots[k-1] holds each token's KV slot at
    # sub-step k (block boundaries precomputed host-side).
    num_steps: int = 1
    extra_slots: Optional[np.ndarray] = None  # int32 [num_steps-1, T_pad]
    # speculative chunks present: the step also returns per-position
    # argmax over the whole token axis for host-side verification
    has_spec: bool = False
    # max top-logprobs requested across the batch (0 = off)
    num_logprobs: int = 0
    # any row has suppress_token_ids (compiles the scatter out otherwise)
    has_suppress: bool = False
    # grammar-constrained decoding: packed uint32 allowed-token bitmask
    # [S, ceil(V/32)] (all-ones on unconstrained rows); None = no grammar
    grammar_bits: Optional[np.ndarray] = None
    has_grammar: bool = False
    # bool [T] (optional): known output token re-prefilled after a
    # recompute-preemption; the device re-counts it into the (reset)
    # penalty state. None when no request is recomputing.
    is_output_replay: Optional[np.ndarray] = None
    has_replay: bool = False

    @property
    def padded_num_tokens(self) -> int:
        return int(self.token_ids.shape[0])


@dataclass
class SchedulerOutput:
    """Host-side view of one scheduling step."""

    descriptor: BatchDescriptor
    # request ids scheduled this step, in row order of appearance
    scheduled_req_ids: list[str] = field(default_factory=list)
    # per scheduled request: number of new tokens this step
    num_scheduled_tokens: dict[str, int] = field(default_factory=dict)
    # requests newly admitted this step (for runner-side state init)
    new_req_ids: list[str] = field(default_factory=list)
    finished_req_ids: list[str] = field(default_factory=list)
    # rows of scheduled requests (aligned with scheduled_req_ids)
    rows: dict[str, int] = field(default_factory=dict)
    # per request: end position of this step's chunk + scheduling epoch
    # (async pipelining bookkeeping)
    chunk_ends: dict[str, int] = field(default_factory=dict)
    epochs: dict[str, int] = field(default_factory=dict)
    # per request: does this chunk produce a NEW token? (decided at
    # schedule time; False for mid-prefill and mid-recompute chunks)
    emits: dict[str, bool] = field(default_factory=dict)
    # host-side extra per-request info for model hooks
    runtime_info: dict[str, Any] = field(default_factory=dict)
    # fused decode sub-steps in this dispatch (sampled arrives [K, S])
    num_steps: int = 1
    # request_id -> (token_start, chunk_len, proposed tokens)
    spec_proposals: dict[str, Any] = field(default_factory=dict)

    @property
    def is_empty(self) -> bool:
        return not self.scheduled_req_ids
