"""Engine core: scheduler + model runner step loop.

Single-controller replacement for the reference's process stack (vLLM
EngineCore process + TP workers; SURVEY.md §7 design stance). One step =
schedule → jitted model step → host bookkeeping.

Emits EngineCoreOutput records per request that produced something,
mirroring the reference's EngineCoreOutputs + pooling_output side channel
(reference engine/__init__.py:94, gpu_ar_model_runner.py:377-430).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np

import jax

from vllm_omni_tpu.config.engine import EngineConfig
from vllm_omni_tpu.core.request import Request
from vllm_omni_tpu.core.sched.scheduler import Scheduler
from vllm_omni_tpu.engine.model_runner import ModelRunner
from vllm_omni_tpu.logger import init_logger

# aux keys laid out on the TOKEN axis ([T, H]); all other aux is
# row-axis ([S, ...]) — see ModelRunner.substep
_TOKEN_AXIS_AUX = frozenset(
    {"hidden_tokens", "embed_tokens_full", "capture_tokens"})
# sampling bookkeeping that rides sampled_dev, never the mm payload
_NON_MM_AUX = frozenset(
    {"spec_tokens", "logprob_ids", "logprob_vals", "sampled_logprob"})

logger = init_logger(__name__)


@dataclass
class EngineCoreOutput:
    request_id: str
    new_token_ids: list[int]
    finished: bool
    finish_reason: Optional[str] = None
    stop_reason: Optional[Any] = None
    # engine_output_type != "text": per-step device arrays keyed by name
    # (hidden states, codec codes, waveforms).
    multimodal_output: dict[str, Any] = field(default_factory=dict)


class EngineCore:
    def __init__(
        self,
        config: EngineConfig,
        load_weights: bool = True,
        model: Optional[Any] = None,
        attention_backend: Optional[str] = None,
        pipeline_depth: Optional[int] = None,
        devices: Optional[list] = None,
    ):
        import os
        from collections import deque

        # async pipelined scheduling: keep up to `depth` steps in flight
        # before syncing results (device round-trips dominate decode on
        # remote-attached TPUs); 0 = fully synchronous
        if pipeline_depth is None:
            pipeline_depth = int(os.environ.get("OMNI_TPU_PIPELINE_DEPTH", 4))
        self.pipeline_depth = max(0, pipeline_depth)
        self._inflight: "deque" = deque()
        self.config = config
        self.runner = ModelRunner(
            config,
            load_weights=load_weights,
            model=model,
            attention_backend=attention_backend,
            devices=devices,
        )
        self.scheduler = Scheduler(
            config.scheduler_config,
            config.cache_config,
            num_kv_blocks=self.runner.num_blocks,
            use_mrope=getattr(self.runner.model, "mrope_section", None)
            is not None,
        )
        if self.runner.supports_cp_prefill:
            # long prompts prefill context-parallel over the mesh "seq"
            # axis (ring attention), bypassing the per-step token budget
            sp = config.parallel_config.sequence_parallel_size
            thr = int(os.environ.get("OMNI_TPU_CP_PREFILL_THRESHOLD",
                                     config.scheduler_config
                                     .max_num_batched_tokens))
            self.scheduler.set_cp_prefill(
                lambda req, n, slots: self.runner.cp_prefill(
                    np.asarray(req.prompt_token_ids[:n], np.int32), slots),
                threshold=thr, align=8 * sp,
            )
        mc = config.model_config
        # multi-step windows stack per-substep aux ([K, ...], sliced
        # back apart in _drain_many), so latent stages (thinker/talker
        # hidden-state consumers) fuse too — the batch-1 speech decode
        # path is dispatch-bound, and fusing K steps amortizes the
        # per-dispatch host+tunnel cost by K (VERDICT r3 Weak #3)
        self.eos_token_id = mc.get("eos_token_id")
        if isinstance(self.eos_token_id, list):
            # multiple EOS ids: treat extras as stop tokens at add time
            self._extra_eos = set(self.eos_token_id[1:])
            self.eos_token_id = self.eos_token_id[0]
        else:
            self._extra_eos = set()
        self.output_type = mc.engine_output_type
        # Latent-stage aux placement at drain time. Batch mode fetches
        # aux to host inside the one batched device_get (per-row device
        # slices cost a dispatch each: 3 keys x 32 rows x 256 steps
        # measured 2274 -> 40 tok/s on the remote tunnel); the streaming
        # drive keeps rows on device so the talker feed never leaves HBM
        # (round-3 StreamFeed design).
        self.stream_device_mm = False
        # per-step mm keys the downstream stage reads (None = all
        # row-axis aux); declared by the model — shipping unread hidden
        # rows across the host boundary measured 20x decode loss on a
        # remote-attached chip
        self.step_mm_keys = getattr(
            self.runner.model, "step_mm_keys", None)

    def add_request(self, request: Request) -> None:
        if self._extra_eos and not request.sampling_params.ignore_eos:
            request.sampling_params.stop_token_ids = list(
                set(request.sampling_params.stop_token_ids or [])
                | self._extra_eos
            )
        self.scheduler.add_request(request)

    def abort_request(self, request_id: str) -> None:
        self.scheduler.abort_request(request_id)

    def has_unfinished(self) -> bool:
        return self.scheduler.has_unfinished() or bool(self._inflight)

    def step(self) -> list[EngineCoreOutput]:
        """Schedule + launch one step; drain (sync) results of steps that
        fell out of the pipeline window. Outputs lag schedule by up to
        `pipeline_depth` steps but token streams are identical."""
        outputs: list[EngineCoreOutput] = []
        if self._inflight and self.scheduler.needs_sync():
            # grammar-constrained requests: masks are built from the
            # host-side FSM state, so scheduling must observe every
            # in-flight result first (pipelining suspends while active)
            outputs = self._drain_many(len(self._inflight))
        sched_out = self.scheduler.schedule()
        if not sched_out.is_empty:
            sampled_dev, aux = self.runner.execute(sched_out.descriptor)
            self._collect_full_hidden(sched_out, aux)
            if sched_out.spec_proposals:
                sampled_dev = (sampled_dev, aux["spec_tokens"])
            if "logprob_ids" in aux:
                sampled_dev = (sampled_dev, {
                    "ids": aux["logprob_ids"], "vals": aux["logprob_vals"],
                    "sampled": aux["sampled_logprob"]})
            self._inflight.append((sched_out, sampled_dev, aux))
        if len(self._inflight) > self.pipeline_depth:
            # drain half the window in ONE batched fetch (each device
            # round-trip has a fixed latency cost; amortize it)
            outputs += self._drain_many(max(1, (self.pipeline_depth + 1) // 2))
        elif sched_out.is_empty and self._inflight:
            outputs += self._drain_many(len(self._inflight))
        return outputs

    def _drain_many(self, k: int) -> list[EngineCoreOutput]:
        items = [self._inflight.popleft() for _ in range(k)]
        # one blocking fetch for the whole window; shapes may differ
        # between single steps ([S]) and fused windows ([K, S])
        host_mm = self.output_type != "text" and not self.stream_device_mm
        if host_mm:
            # ship ONLY the per-step mm keys downstream reads, in the
            # SAME fetch: no extra round-trip, and every downstream
            # slice becomes numpy. Token-axis aux (prompt hidden) never
            # crosses here — _collect_full_hidden keeps it on device.
            keys = self.step_mm_keys
            fetched = jax.device_get(tuple(
                (s, {k: v for k, v in a.items()
                     if (k in keys if keys is not None
                         else k not in _TOKEN_AXIS_AUX | _NON_MM_AUX)})
                for _, s, a in items))
            items = [(sched, None, aux_h)
                     for (sched, _, _), (_, aux_h) in zip(items, fetched)]
            fetched = tuple(s for s, _ in fetched)
        else:
            fetched = jax.device_get(tuple(s for _, s, _ in items))
        outputs: list[EngineCoreOutput] = []
        for (sched, _, aux), samp in zip(items, fetched):
            spec_full = None
            logprobs = None
            if isinstance(samp, tuple) and isinstance(samp[1], dict):
                samp, logprobs = samp
            if isinstance(samp, tuple):  # speculative chunk
                samp, spec_full = samp
                spec_full = np.asarray(spec_full)
            samp = np.asarray(samp)
            if samp.ndim == 2:  # fused multi-step window
                want_mm = self.output_type != "text"
                for i, sub in enumerate(samp):
                    # aux is stacked [K, ...]; latent stages consume it
                    # per token, so slice the window apart (device
                    # slices — the rows stay in HBM for downstream
                    # stages). Text engines never read aux here.
                    keys = self.step_mm_keys
                    sub_aux = ({k: v[i] for k, v in aux.items()
                                if keys is None or k in keys}
                               if want_mm else aux)
                    outputs.extend(self._process_results(
                        sched, sub, sub_aux))
            else:
                outputs.extend(self._process_results(
                    sched, samp, aux, spec_full, logprobs))
        return outputs

    def _collect_full_hidden(self, sched_out, aux) -> None:
        # full-prompt hidden accumulation for latent stages (the
        # thinker->talker prompt part; reference gpu_ar_model_runner.py:
        # 388-418 ships these via pooler_output — here they stay on device)
        if "hidden_tokens" not in aux:
            return
        desc = sched_out.descriptor
        if getattr(desc, "extra_slots", None) is not None:
            # fused multi-step window: aux is stacked [K, ...] AND the
            # window is decode-only (no prompt tokens to accumulate)
            return
        for rid in sched_out.scheduled_req_ids:
            req = self.scheduler.requests.get(rid)
            if req is None:
                continue
            row = sched_out.rows[rid]
            start = int(desc.cu_q_lens[row])
            n = int(desc.q_lens[row])
            n_prompt = int(desc.is_prompt_token[start:start + n].sum())
            if n_prompt > 0:
                for src, dst in (
                    ("hidden_tokens", "prompt_hidden"),
                    ("embed_tokens_full", "prompt_embed_tokens"),
                    ("capture_tokens", "prompt_capture_hidden"),
                ):
                    if src in aux:
                        req.multimodal_outputs.setdefault(dst, []).append(
                            aux[src][start:start + n_prompt])

    def _process_results(
        self, sched_out, sampled: np.ndarray, aux, spec_full=None,
        logprobs=None,
    ) -> list[EngineCoreOutput]:
        produced = self.scheduler.update_from_output(
            sched_out, sampled, eos_token_id=self.eos_token_id,
            spec_tokens_full=spec_full,
        )
        outputs: list[EngineCoreOutput] = []
        want_mm = self.output_type != "text"
        finalize = getattr(self.runner.model, "finalize_multimodal", None)
        for req in produced:
            # static per-request extras (e.g. thinker tts embeds) attach
            # at the FIRST emission so streaming consumers see them
            # before the request finishes; merged finals are unchanged
            if (want_mm and finalize is not None
                    and not getattr(req, "_mm_finalized", False)):
                req._mm_finalized = True
                for k, v in finalize(
                    self.runner.params, req.additional_information
                ).items():
                    req.multimodal_outputs.setdefault(k, []).append(v)
            mm: dict[str, Any] = {}
            if want_mm:
                row = sched_out.rows[req.request_id]
                # hidden_tokens/embed_tokens_full/capture_tokens are
                # TOKEN-axis ([T, H]); everything else is row-axis
                # ([S, ...]). Indexing the token axis by row id was only
                # correct while rows were densely packed from 0 — under
                # load (LIFO row reuse, out-of-order finishes) it read
                # the wrong request's hidden rows, silently (jax clamps
                # out-of-range indices on device).
                tok_idx = int(sched_out.descriptor.logits_indices[row])
                keys = self.step_mm_keys
                for key, arr in aux.items():
                    if (key in _NON_MM_AUX
                            or (keys is not None and key not in keys)):
                        continue
                    val = (arr[tok_idx] if key in _TOKEN_AXIS_AUX
                           else arr[row])
                    req.multimodal_outputs.setdefault(key, []).append(val)
                    mm[key] = val
            new_tokens = list(getattr(req, "last_new_tokens", None) or (
                [req.output_token_ids[-1]] if req.output_token_ids else []))
            if (logprobs is not None and req.sampling_params.logprobs
                    and new_tokens):
                row = sched_out.rows[req.request_id]
                k = int(req.sampling_params.logprobs)
                entry = {int(i): float(v) for i, v in zip(
                    np.asarray(logprobs["ids"])[row][:k],
                    np.asarray(logprobs["vals"])[row][:k])}
                tok = new_tokens[-1]
                entry.setdefault(
                    int(tok), float(np.asarray(logprobs["sampled"])[row]))
                if req.logprobs is None:
                    req.logprobs = []
                req.logprobs.append(entry)
            outputs.append(
                EngineCoreOutput(
                    request_id=req.request_id,
                    new_token_ids=new_tokens,
                    finished=req.finished,
                    finish_reason=req.finish_reason,
                    stop_reason=req.stop_reason,
                    multimodal_output=mm,
                )
            )
        return outputs
