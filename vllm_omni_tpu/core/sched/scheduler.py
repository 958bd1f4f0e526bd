"""Continuous-batching scheduler.

Behavioral parity with the loop the reference drives through vLLM v1 +
OmniARScheduler (reference core/sched/omni_ar_scheduler.py:29-249):
chunked prefill under a max_num_batched_tokens budget, decode = 1 token per
running request, stop detection and block freeing in update_from_output.
Also implements the one-shot mode of OmniGenerationScheduler
(omni_generation_scheduler.py:19-148): whole request admitted in a single
step and finished after one forward (diffusion/codec stages).

TPU-specific: emits fixed-shape BatchDescriptors (see core/sched/output.py)
and keeps a persistent-row batch so device-side sampling state survives
across steps without re-indexing.
"""

from __future__ import annotations

from collections import deque
from typing import Any, Optional

import numpy as np

from vllm_omni_tpu.config.cache import CacheConfig
from vllm_omni_tpu.config.scheduler import SchedulerConfig
from vllm_omni_tpu.core.request import Request, RequestStatus
from vllm_omni_tpu.core.sched.output import BatchDescriptor, SchedulerOutput
from vllm_omni_tpu.kv_cache.manager import KVCacheManager
from vllm_omni_tpu.utils import cdiv


def _host_core():
    from vllm_omni_tpu.native import get_host_core

    return get_host_core()


class Scheduler:
    def __init__(
        self,
        scheduler_config: SchedulerConfig,
        cache_config: CacheConfig,
        num_kv_blocks: int,
        hidden_size_for_embeds: Optional[int] = None,
        use_mrope: bool = False,
    ) -> None:
        self.use_mrope = use_mrope
        self.config = scheduler_config
        self.block_size = cache_config.block_size
        self.kv = KVCacheManager(
            num_kv_blocks, cache_config.block_size,
            enable_prefix_caching=cache_config.enable_prefix_caching)
        self.max_blocks_per_seq = cdiv(
            scheduler_config.max_model_len, cache_config.block_size
        )
        self.hidden_size_for_embeds = hidden_size_for_embeds

        self.waiting: deque[Request] = deque()
        self.running: list[Request] = []
        self.requests: dict[str, Request] = {}
        # persistent row allocation
        self._free_rows: list[int] = list(
            range(scheduler_config.max_num_seqs - 1, -1, -1)
        )
        self._rows_to_reset: set[int] = set()
        self._finished_this_step: list[str] = []
        self.num_preemptions = 0
        # speculative-decoding accounting (accept-rate observability,
        # reference: vLLM SpecDecodingStats):
        self.spec_proposed = 0
        self.spec_accepted = 0
        # context-parallel prefill (set_cp_prefill): long prompts bypass
        # the token budget — the runner prefills them sequence-sharded
        self._cp_hook = None
        self._cp_threshold = 0
        self._cp_align = 1

    def set_cp_prefill(self, hook, threshold: int, align: int) -> None:
        """Install the engine's context-parallel prefill hook.

        hook(req, n, slot_mapping) runs a ring-attention prefill of the
        request's first n prompt tokens on the mesh "seq" axis and commits
        their KV; the scheduler then treats them as computed and the
        remaining prompt tail (>= 1 token, so logits/sampling stay on the
        standard path) goes through normal chunked prefill.
        """
        self._cp_hook = hook
        self._cp_threshold = threshold
        self._cp_align = align

    # ------------------------------------------------------------------ API
    def add_request(self, request: Request) -> None:
        if request.request_id in self.requests:
            raise ValueError(f"duplicate request id {request.request_id}")
        if request.rng_seed is None:
            sp = request.sampling_params
            # unseeded requests draw fresh host entropy per request (vLLM
            # seed=None semantics); explicit seeds stay deterministic
            request.rng_seed = (
                int(sp.seed) if sp.seed is not None
                else int(np.random.randint(0, 2**31 - 1))
            )
        self.requests[request.request_id] = request
        self.waiting.append(request)

    def abort_request(self, request_id: str) -> None:
        req = self.requests.get(request_id)
        if req is None or req.finished:
            return
        req.status = RequestStatus.FINISHED_ABORTED
        if req in self.running:
            self.running.remove(req)
        else:
            try:
                self.waiting.remove(req)
            except ValueError:
                pass
        # always release: a waiting request can hold refcounted prefix-cache
        # blocks from a failed admission attempt (match_prefix then
        # allocate() -> None)
        self._release(req)
        self._finished_this_step.append(request_id)

    def has_unfinished(self) -> bool:
        return bool(self.waiting or self.running)

    @property
    def num_running(self) -> int:
        return len(self.running)

    # ------------------------------------------------------------- schedule
    def schedule(self) -> SchedulerOutput:
        budget = self.config.max_num_batched_tokens
        scheduled: list[tuple[Request, int]] = []  # (req, num_new_tokens)
        new_req_ids: list[str] = []

        # 1) running requests: decode 1 token, or continue a chunked prefill.
        # num_computed_tokens advances at SCHEDULE time so steps can be
        # scheduled ahead of their results (async pipelining): decode
        # inputs the host hasn't observed yet are gathered on device from
        # prev_sampled.
        for req in list(self.running):
            if req.status is not RequestStatus.RUNNING:
                continue  # preempted as a victim earlier in this pass
            if budget <= 0:
                break
            # prefill target includes preserved outputs after a
            # recompute-preemption (replay_until): prompt + already-
            # generated tokens are re-prefilled, then generation continues
            # (vLLM recompute). NOT `prompt+num_output` — in synced decode
            # the last sampled token always sits one past num_computed.
            target = max(req.num_prompt_tokens, req.replay_until)
            remaining_prompt = target - req.num_computed_tokens
            if remaining_prompt > 0:
                n = min(remaining_prompt, budget)
                if not self.config.enable_chunked_prefill:
                    n = remaining_prompt if remaining_prompt <= budget else 0
                    if n == 0:
                        continue
            else:
                # decode: bound look-ahead so no chunk can sample past
                # max_tokens (chunk ending at prompt+k samples output k)
                if (req.num_computed_tokens >= req.max_total_tokens - 1
                        or req.num_computed_tokens >= self.config.max_model_len):
                    continue
                if getattr(req, "spec_inflight", False):
                    # a speculative chunk is unresolved: scheduling ahead
                    # would assume full acceptance
                    continue
                n = 1
                props = self._ngram_propose(req)
                if props:
                    req.spec_tokens = props
                    req.spec_inflight = True
                    n = 1 + len(props)
            total = req.num_computed_tokens + n
            while True:
                blocks = self.kv.allocate(req.request_id, total)
                if blocks is not None:
                    break
                # Out of KV blocks: preempt the LOWEST-priority (last)
                # running request and retry — vLLM recompute-preemption.
                # Stable victim selection is what guarantees progress: if
                # the failing request preempted itself, two requests could
                # ping-pong forever, each losing its in-flight work.
                if self.running and self.running[-1] is not req:
                    self._preempt(self.running[-1])
                else:
                    self._preempt(req)  # req IS the lowest priority
                    break
            if blocks is None:
                continue
            budget -= n
            scheduled.append((req, n))

        # 2) admit waiting requests.
        while (
            self.waiting
            and budget > 0
            and self._free_rows
            and len(self.running) < self.config.max_num_seqs
        ):
            req = self.waiting[0]
            if (self.kv.enable_prefix_caching
                    and req.num_computed_tokens == 0
                    and req.prompt_embeds is None):
                # automatic prefix caching: leading full prompt blocks
                # already resident are shared, their tokens skipped (at
                # least one prompt token always computes for logits)
                cached = self.kv.match_prefix(
                    req.request_id, req.prompt_token_ids)
                req.num_computed_tokens = min(
                    cached, max(req.num_prompt_tokens - 1, 0))
            sp_req = req.sampling_params
            if (self._cp_hook is not None
                    and req.num_computed_tokens == 0
                    and req.prompt_embeds is None
                    and req.mrope_positions is None
                    # penalty state observes prompt tokens step by step;
                    # CP'd tokens never enter a descriptor, so requests
                    # with penalties keep the exact standard path
                    and sp_req.repetition_penalty == 1.0
                    and sp_req.presence_penalty == 0.0
                    and sp_req.frequency_penalty == 0.0
                    and req.num_prompt_tokens - 1 >= self._cp_threshold):
                cp_n = ((req.num_prompt_tokens - 1) // self._cp_align
                        ) * self._cp_align
                # bucket to align * 2^k: each distinct cp_n jit-compiles
                # a ring-prefill variant, so unbounded lengths would
                # compile per request (remainder goes the chunked path)
                if cp_n >= self._cp_align:
                    b = self._cp_align
                    while b * 2 <= cp_n:
                        b *= 2
                    cp_n = b
                if cp_n >= self._cp_align:
                    if self.kv.allocate(req.request_id, cp_n) is None:
                        break  # memory pressure: retry next schedule()
                    blocks = np.asarray(
                        self.kv.get_blocks(req.request_id), np.int32)
                    pos = np.arange(cp_n)
                    slots = (blocks[pos // self.block_size]
                             * self.block_size
                             + pos % self.block_size).astype(np.int32)
                    self._cp_hook(req, cp_n, slots)
                    req.num_computed_tokens = cp_n
            known = req.num_prompt_tokens + req.num_output_tokens
            remaining = known - req.num_computed_tokens
            if remaining <= 0:
                remaining = 1  # empty prompt → single placeholder token
            if self.config.one_shot:
                # one-shot stages admit whole requests only
                # (reference omni_generation_scheduler.py:19-148)
                if remaining > budget:
                    break
                n = remaining
            else:
                n = min(remaining, budget)
                if not self.config.enable_chunked_prefill and remaining > budget:
                    break
            if self.kv.allocate(req.request_id, req.num_computed_tokens + n) is None:
                break
            if (self.kv.enable_prefix_caching
                    and req.prompt_embeds is None
                    and req.num_computed_tokens + n >= req.num_prompt_tokens):
                # single-chunk prefill: register now so requests admitted
                # later in this same schedule() can already share
                self.kv.register_prompt(req.request_id,
                                        req.prompt_token_ids)
            self.waiting.popleft()
            row = self._free_rows.pop()
            req.batch_row = row
            self._rows_to_reset.add(row)
            req.status = RequestStatus.RUNNING
            self.running.append(req)
            scheduled.append((req, n))
            new_req_ids.append(req.request_id)
            budget -= n

        # multi-step fused decode: when the whole batch is in steady
        # decode (no waiting work, no side channels), schedule K steps in
        # one dispatch — per-dispatch host/tunnel overhead amortizes by K.
        extra_steps = 0
        ms = self.config.multi_step_decode
        # mrope does NOT block fusion: decode-token mrope positions are
        # `pos + delta` on every component (see the descriptor build
        # below), so the runner advances them by +k exactly as the host
        # would per step
        if (ms > 1 and scheduled and not self.waiting
                and not self.config.one_shot):
            eligible = all(
                n == 1
                # steady decode only: past the prompt AND past any
                # preserved-output recompute (post-preemption)
                and req.num_computed_tokens >= req.num_prompt_tokens
                and req.num_computed_tokens >= req.replay_until
                and getattr(req, "decode_embeds", None) is None
                and not req.sampling_params.logprobs
                and getattr(req, "grammar_fsm", None) is None
                for req, n in scheduled
            )
            if eligible:
                room = min(
                    min(req.max_total_tokens - 1, self.config.max_model_len)
                    - (req.num_computed_tokens + 1)
                    for req, _ in scheduled
                )
                # quantize to {ms, 1}: shrinking tail windows would each
                # compile a fresh K-variant program
                extra_steps = ms - 1 if room >= ms - 1 else 0
            if extra_steps > 0:
                # preallocate blocks through the whole window; on pressure
                # fall back to single-step
                for req, _ in scheduled:
                    if self.kv.allocate(
                            req.request_id,
                            req.num_computed_tokens + 1 + extra_steps
                    ) is None:
                        extra_steps = 0
                        break

        out = self._build_output(scheduled, new_req_ids,
                                 extra_steps=extra_steps)
        return out

    # ------------------------------------------------ speculative decoding
    def _ngram_propose(self, req: Request) -> list[int]:
        """n-gram (prompt-lookup) proposal: when the request's state is
        fully observed on host, match the trailing n-gram against the
        context and propose its continuation (vLLM 'ngram' method)."""
        k = self.config.num_speculative_tokens
        if k <= 0:
            return []
        sp = req.sampling_params
        # greedy-only, penalty-free for exact acceptance semantics;
        # suppress_token_ids excluded too: verification argmaxes RAW
        # full_logits, so a suppressed token could leak via the bonus token
        if (sp.temperature != 0.0 or sp.repetition_penalty != 1.0
                or sp.presence_penalty != 0.0
                or sp.frequency_penalty != 0.0 or sp.logprobs
                or sp.suppress_token_ids
                or getattr(req, "grammar_fsm", None) is not None):
            return []
        ids = req.all_token_ids
        # next input token must be host-known (no pipelined unknowns)
        if req.num_computed_tokens != len(ids) - 1:
            return []
        limit = min(req.max_total_tokens - 1, self.config.max_model_len)
        k = min(k, limit - (req.num_computed_tokens + 1))
        if k <= 0:
            return []
        hi = self.config.ngram_prompt_lookup_max
        lo = self.config.ngram_prompt_lookup_min
        for n in range(hi, lo - 1, -1):
            if len(ids) <= n:
                continue
            pattern = ids[-n:]
            for s in range(len(ids) - n - 1, -1, -1):
                if ids[s:s + n] == pattern:
                    cont = ids[s + n:s + n + k]
                    if cont:
                        return list(cont)
        return []

    # -------------------------------------------------------------- update
    def update_from_output(
        self,
        scheduler_output: SchedulerOutput,
        sampled_tokens: np.ndarray,  # int32 [S] per-row sampled token
        eos_token_id: Optional[int] = None,
        spec_tokens_full: Optional[np.ndarray] = None,  # int32 [T]
    ) -> list[Request]:
        """Consume one step's sampled tokens; returns requests that produced
        a new token this step (for output streaming). May lag behind
        schedule() by several steps (async pipelining); results from before
        a preemption are dropped via the epoch guard.

        Parity: OmniARScheduler.update_from_output bookkeeping loop
        (reference omni_ar_scheduler.py:64-249).
        """
        produced: list[Request] = []
        for rid in scheduler_output.scheduled_req_ids:
            req = self.requests.get(rid)
            if req is None or req.finished:
                continue
            if scheduler_output.epochs.get(rid) != req.sched_epoch:
                continue  # stale pre-preemption result
            chunk_end = scheduler_output.chunk_ends[rid]
            if not scheduler_output.emits.get(rid, True):
                # mid-prefill (or mid-recompute-after-preemption) chunk:
                # no NEW token produced (decided at schedule time — the
                # recompute target moves as outputs arrive, so it cannot
                # be re-derived here)
                continue
            if self.config.one_shot:
                # Non-AR stage: finished right after its single forward
                # (reference omni_generation_scheduler.py:236-244).
                req.status = RequestStatus.FINISHED_STOPPED
                self._finish(req)
                produced.append(req)
                continue
            spec = scheduler_output.spec_proposals.get(rid)
            if spec is not None:
                # speculative verification: accept the longest proposal
                # prefix matched by the model's own greedy predictions,
                # plus the bonus token; rewind KV accounting for rejects
                req.spec_inflight = False
                tstart, nrow, props = spec
                if spec_tokens_full is None:
                    continue
                y = spec_tokens_full[tstart:tstart + nrow]
                accepted = 0
                for j in range(len(props)):
                    if int(y[j]) == props[j]:
                        accepted += 1
                    else:
                        break
                self.spec_proposed += len(props)
                self.spec_accepted += accepted
                chunk_start = chunk_end - nrow
                req.num_computed_tokens = chunk_start + 1 + accepted
                produced.append(req)
                emitted = []
                for tok in (int(x) for x in y[:accepted + 1]):
                    req.output_token_ids.append(tok)
                    emitted.append(tok)
                    self._check_stop(req, tok, eos_token_id)
                    if req.finished:
                        break
                req.last_new_tokens = emitted
                if req.finished:
                    self._finish(req)
                continue
            tok = int(sampled_tokens[req.batch_row])
            req.output_token_ids.append(tok)
            req.last_new_tokens = [tok]
            produced.append(req)
            self._check_stop(req, tok, eos_token_id)
            fsm = getattr(req, "grammar_fsm", None)
            if fsm is not None and not req.finished:
                ns = fsm.next_state(req.grammar_state, tok)
                if ns < 0:
                    # only EOS (handled by _check_stop) or a dead state can
                    # land here: terminate cleanly
                    req.status = RequestStatus.FINISHED_STOPPED
                    req.stop_reason = "grammar"
                else:
                    req.grammar_state = ns
            if req.finished:
                self._finish(req)
        return produced

    def needs_sync(self) -> bool:
        """True when scheduling must observe all in-flight results first
        (grammar masks depend on the host-side FSM state, which advances
        per sampled token)."""
        return any(
            getattr(r, "grammar_fsm", None) is not None
            for r in self.running
        ) or any(
            getattr(r, "grammar_fsm", None) is not None
            for r in self.waiting
        )

    def take_finished(self) -> list[str]:
        out = self._finished_this_step
        self._finished_this_step = []
        return out

    # ------------------------------------------------------------ internals
    def _check_stop(self, req: Request, tok: int, eos_token_id: Optional[int]):
        sp = req.sampling_params
        if sp.max_tokens is not None and req.num_output_tokens >= sp.max_tokens:
            req.status = RequestStatus.FINISHED_LENGTH_CAPPED
            return
        if req.num_tokens >= self.config.max_model_len:
            req.status = RequestStatus.FINISHED_LENGTH_CAPPED
            return
        if req.num_output_tokens < sp.min_tokens:
            return
        if not sp.ignore_eos and eos_token_id is not None and tok == eos_token_id:
            req.status = RequestStatus.FINISHED_STOPPED
            req.stop_reason = tok
            return
        if tok in (sp.stop_token_ids or ()):
            req.status = RequestStatus.FINISHED_STOPPED
            req.stop_reason = tok
            return

    def _preempt(self, req: Request) -> None:
        self.num_preemptions += 1
        req.spec_inflight = False
        self.running.remove(req)
        self._release(req)
        req.status = RequestStatus.PREEMPTED
        # recompute-preemption KEEPS already-delivered output tokens:
        # re-admission prefills prompt+output, then generation resumes —
        # re-emitting (or restarting the max_tokens budget) would duplicate
        # text already streamed downstream
        req.num_computed_tokens = 0
        # device-side penalty counts die with the row reset: mark the
        # preserved outputs for re-observation during the recompute prefill
        req.replay_until = req.num_prompt_tokens + req.num_output_tokens
        req.sched_epoch += 1  # drop stale in-flight results
        self.waiting.appendleft(req)

    def _finish(self, req: Request) -> None:
        if req in self.running:
            self.running.remove(req)
        self._release(req)
        self._finished_this_step.append(req.request_id)

    def _release(self, req: Request) -> None:
        self.kv.free(req.request_id)
        if req.batch_row >= 0:
            self._free_rows.append(req.batch_row)
            self._rows_to_reset.discard(req.batch_row)
            req.batch_row = -1

    # ------------------------------------------------------- array building
    def _build_output(
        self, scheduled: list[tuple[Request, int]], new_req_ids: list[str],
        extra_steps: int = 0,
    ) -> SchedulerOutput:
        S = self.config.max_num_seqs
        # Lay tokens out in ascending batch-row order: rows are reused LIFO
        # after requests finish, so running-list order can carry rows out
        # of order — and the pallas ragged kernel derives the rows a q-tile
        # touches from its endpoint tokens, which requires token_rows to be
        # non-decreasing (ops/attention/pallas_ragged.py).
        scheduled = sorted(scheduled, key=lambda rn: rn[0].batch_row)
        num_tokens = sum(n for _, n in scheduled)
        T = self.config.pad_tokens(max(num_tokens, 1))

        token_ids = np.zeros(T, np.int32)
        positions = np.zeros(T, np.int32)
        token_rows = np.full(T, S, np.int32)
        slot_mapping = np.zeros(T, np.int32)
        is_prompt = np.zeros(T, bool)
        use_prev = np.zeros(T, bool)
        q_lens = np.zeros(S, np.int32)
        seq_lens = np.zeros(S, np.int32)
        block_tables = np.zeros((S, self.max_blocks_per_seq), np.int32)
        logits_indices = np.zeros(S, np.int32)
        do_sample = np.zeros(S, bool)
        reset_rows = np.zeros(S, bool)
        temperature = np.ones(S, np.float32)
        top_p = np.ones(S, np.float32)
        top_k = np.zeros(S, np.int32)
        min_p = np.zeros(S, np.float32)
        rep_pen = np.ones(S, np.float32)
        pres_pen = np.zeros(S, np.float32)
        freq_pen = np.zeros(S, np.float32)
        seeds = np.zeros(S, np.uint32)
        step_counters = np.zeros(S, np.int32)
        suppress_ids = np.full((S, 8), -1, np.int32)

        embeds = None
        use_embeds = None
        add_embeds = None
        use_add = None
        deepstack = None
        mrope = np.zeros((3, T), np.float32) if self.use_mrope else None
        extra_slots = (np.zeros((extra_steps, T), np.int32)
                       if extra_steps else None)

        t = 0
        num_logprobs = 0
        has_suppress = False
        grammar_rows: list[tuple[int, Any]] = []  # (row, mask) pairs
        spec_proposals: dict[str, tuple] = {}
        sched_ids: list[str] = []
        num_sched: dict[str, int] = {}
        rows: dict[str, int] = {}
        chunk_ends: dict[str, int] = {}
        epochs: dict[str, int] = {}
        emits: dict[str, bool] = {}
        replay = None  # [T] bool: known output tokens being re-prefilled
        need_penalties = False
        all_greedy = True
        for req, n in scheduled:
            row = req.batch_row
            sched_ids.append(req.request_id)
            num_sched[req.request_id] = n
            rows[req.request_id] = row
            chunk_ends[req.request_id] = req.num_computed_tokens + n
            epochs[req.request_id] = req.sched_epoch
            start = req.num_computed_tokens
            # tokens known on host: prompt + already-emitted outputs (the
            # latter only re-prefill after a recompute-preemption)
            known = req.num_prompt_tokens + req.num_output_tokens
            all_ids = req.all_token_ids
            spec = (req.spec_tokens
                    if getattr(req, "spec_inflight", False) else None)
            for i in range(n):
                pos = start + i
                if pos < len(all_ids):
                    token_ids[t + i] = all_ids[pos]
                elif spec is not None and pos - len(all_ids) < len(spec):
                    # speculative proposal (verified this step)
                    token_ids[t + i] = spec[pos - len(all_ids)]
                else:
                    # token not yet observed on host: device gathers it
                    # from prev_sampled[row] (async pipelining)
                    use_prev[t + i] = True
                positions[t + i] = pos
                token_rows[t + i] = row
                is_prompt[t + i] = pos < req.num_prompt_tokens
                if req.num_prompt_tokens <= pos < req.replay_until:
                    # replayed output token (recompute after preemption,
                    # row state was reset): the device re-counts it into
                    # the penalty state. Normal decode inputs (pos >=
                    # replay_until) were already counted at sample time.
                    if replay is None:
                        replay = np.zeros(T, bool)
                    replay[t + i] = True
                if mrope is not None:
                    if (req.mrope_positions is not None
                            and pos < req.num_prompt_tokens):
                        mrope[:, t + i] = req.mrope_positions[:, pos]
                    else:
                        mrope[:, t + i] = pos + req.mrope_delta
            if spec is not None:
                spec_proposals[req.request_id] = (t, n, list(spec))
            # prompt-embeds overlay for this chunk
            if req.prompt_embeds is not None:
                if embeds is None:
                    H = int(np.asarray(req.prompt_embeds).shape[-1])
                    embeds = np.zeros((T, H), np.float32)
                    use_embeds = np.zeros(T, bool)
                pe = np.asarray(req.prompt_embeds)
                for i in range(n):
                    pos = start + i
                    if pos < pe.shape[0]:
                        embeds[t + i] = pe[pos]
                        use_embeds[t + i] = True
            # deepstack visual embeds for this chunk's prompt positions
            if req.deepstack_embeds is not None:
                de = np.asarray(req.deepstack_embeds)
                if deepstack is None:
                    deepstack = np.zeros((de.shape[0], T, de.shape[-1]),
                                         np.float32)
                for i in range(n):
                    pos = start + i
                    if pos < de.shape[1]:
                        deepstack[:, t + i] = de[:, pos]
            # decode-time ADD overlay (streamed reply embeddings)
            if req.decode_embeds is not None:
                de = np.asarray(req.decode_embeds)
                if add_embeds is None:
                    add_embeds = np.zeros((T, de.shape[-1]), np.float32)
                    use_add = np.zeros(T, bool)
                for i in range(n):
                    pos = start + i
                    j = pos - req.num_prompt_tokens
                    if j >= 0:
                        add_embeds[t + i] = de[min(j, de.shape[0] - 1)]
                        use_add[t + i] = True
            blocks = self.kv.get_blocks(req.request_id)
            if (self.kv.enable_prefix_caching
                    and req.prompt_embeds is None
                    and start < req.num_prompt_tokens <= start + n):
                # this chunk completes the prompt: content-address its
                # full blocks for sharing by later identical prefixes
                self.kv.register_prompt(req.request_id,
                                        req.prompt_token_ids)
            host = _host_core()
            if host is not None:
                blocks_np = np.asarray(blocks, np.int32)
                host.fill_slots(slot_mapping, blocks_np, start, n,
                                self.block_size, t)
                if extra_steps:
                    host.fill_window_slots(
                        extra_slots.reshape(-1), blocks_np, start + n - 1,
                        self.block_size, t + n - 1, T)
            else:
                for i in range(n):
                    pos = start + i
                    b = blocks[pos // self.block_size]
                    slot_mapping[t + i] = (
                        b * self.block_size + pos % self.block_size)
                if extra_steps:
                    # fused-window sub-steps: each row's token advances one
                    # position per sub-step (block crossings resolved here)
                    for k in range(1, extra_steps + 1):
                        pos = start + n - 1 + k
                        b = blocks[pos // self.block_size]
                        extra_slots[k - 1, t + n - 1] = (
                            b * self.block_size + pos % self.block_size)
            q_lens[row] = n
            seq_lens[row] = start + n
            block_tables[row, : len(blocks)] = blocks
            logits_indices[row] = t + n - 1
            # row samples iff this step completes/extends past all KNOWN
            # tokens (prompt + preserved outputs when recomputing)
            do_sample[row] = (start + n) >= known
            emits[req.request_id] = bool(do_sample[row])
            if row in self._rows_to_reset:
                reset_rows[row] = True
                self._rows_to_reset.discard(row)
            sp = req.sampling_params
            if (sp.repetition_penalty != 1.0 or sp.presence_penalty != 0.0
                    or sp.frequency_penalty != 0.0):
                need_penalties = True
            if sp.temperature != 0.0:
                all_greedy = False
            temperature[row] = sp.temperature
            top_p[row] = sp.top_p
            top_k[row] = sp.top_k
            min_p[row] = sp.min_p
            rep_pen[row] = sp.repetition_penalty
            pres_pen[row] = sp.presence_penalty
            freq_pen[row] = sp.frequency_penalty
            seeds[row] = np.uint32(req.rng_seed or 0)
            for si, tok in enumerate((sp.suppress_token_ids or [])[:8]):
                suppress_ids[row, si] = tok
            if sp.logprobs:
                num_logprobs = max(num_logprobs, min(int(sp.logprobs), 8))
            if sp.suppress_token_ids:
                has_suppress = True
            fsm = getattr(req, "grammar_fsm", None)
            if fsm is not None and do_sample[row]:
                grammar_rows.append(
                    (row, fsm.allowed_mask(req.grammar_state)))
            # number of tokens generated before the sample this chunk makes
            step_counters[row] = max(0, start + n - req.num_prompt_tokens)
            # schedule-time accounting (results may arrive steps later)
            req.num_computed_tokens = start + n + extra_steps
            t += n

        cu_q = np.zeros(S + 1, np.int32)
        # cu over rows in row order (attention iterates rows, so cumsum must
        # match token layout order: tokens were laid out in scheduled order,
        # not row order). Build cu from per-row token start offsets instead.
        # We store each row's token-start explicitly via logits_indices and
        # q_lens; for the ragged kernel we need cu_q_lens consistent with
        # token layout. Reorder: record row->start.
        row_start = np.zeros(S, np.int32)
        tt = 0
        for req, n in scheduled:
            row_start[req.batch_row] = tt
            tt += n
        # cu_q_lens[i] = start of row i's tokens; rows with q_len 0 get the
        # previous cumsum value so the kernel sees empty segments.
        # The ragged attention implementation consumes (row_start, q_lens)
        # directly; keep cu for API compat.
        cu = 0
        for r in range(S):
            cu_q[r] = row_start[r] if q_lens[r] > 0 else cu
            cu = cu_q[r] + q_lens[r]
        cu_q[S] = num_tokens

        # block-table width bucketing: slice to the batch's actual max
        # blocks (bucketed to limit retraces). The gather attention path's
        # memory traffic scales with table width, so a 32k-capable table
        # must not ride along on a 256-token decode batch.
        needed = int(max(1, -(-int(seq_lens.max()) // self.block_size)))
        width = 8
        while width < needed:
            width *= 2
        width = min(width, self.max_blocks_per_seq)
        block_tables = block_tables[:, :width]

        grammar_bits = None
        if grammar_rows:
            # packed allowed-token bitmask per row; all-ones (everything
            # allowed) on unconstrained rows
            W = int(grammar_rows[0][1].shape[0])
            grammar_bits = np.full((S, W), 0xFFFFFFFF, np.uint32)
            for row, mask in grammar_rows:
                grammar_bits[row] = mask

        desc = BatchDescriptor(
            token_ids=token_ids,
            positions=positions,
            token_rows=token_rows,
            slot_mapping=slot_mapping,
            is_prompt_token=is_prompt,
            use_prev_sampled=use_prev,
            is_output_replay=replay,
            has_replay=replay is not None,
            q_lens=q_lens,
            cu_q_lens=cu_q,
            seq_lens=seq_lens,
            block_tables=block_tables,
            logits_indices=logits_indices,
            do_sample=do_sample,
            reset_rows=reset_rows,
            temperature=temperature,
            top_p=top_p,
            top_k=top_k,
            min_p=min_p,
            repetition_penalty=rep_pen,
            presence_penalty=pres_pen,
            frequency_penalty=freq_pen,
            seeds=seeds,
            step_counters=step_counters,
            suppress_ids=suppress_ids,
            num_tokens=num_tokens,
            num_reqs=len(scheduled),
            need_penalties=need_penalties,
            all_greedy=all_greedy,
            prompt_embeds=embeds,
            use_embeds=use_embeds,
            mrope_positions=mrope,
            add_embeds=add_embeds,
            use_add_embeds=use_add,
            deepstack_embeds=deepstack,
            num_steps=1 + extra_steps,
            extra_slots=extra_slots,
            has_spec=bool(spec_proposals),
            num_logprobs=num_logprobs,
            has_suppress=has_suppress,
            grammar_bits=grammar_bits,
            has_grammar=grammar_bits is not None,
        )
        out = SchedulerOutput(
            descriptor=desc,
            scheduled_req_ids=sched_ids,
            num_scheduled_tokens=num_sched,
            new_req_ids=new_req_ids,
            rows=rows,
        )
        out.chunk_ends = chunk_ends
        out.epochs = epochs
        out.emits = emits
        out.num_steps = 1 + extra_steps
        out.spec_proposals = spec_proposals
        return out
