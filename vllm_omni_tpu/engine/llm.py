"""User-facing offline AR engine.

Parity: the role OmniLLM plays over vLLM's LLM (reference
entrypoints/omni_llm.py:30-192) — but engine core, scheduler, and runner
are all in-process here (TPU single-controller design, SURVEY.md §7).
"""

from __future__ import annotations

import time
from typing import Any, Optional, Sequence, Union

import numpy as np

import jax

from vllm_omni_tpu.config.engine import EngineArgs, EngineConfig
from vllm_omni_tpu.core.request import Request
from vllm_omni_tpu.engine.core import EngineCore
from vllm_omni_tpu.engine.detokenizer import (
    IncrementalDetokenizer,
    maybe_load_tokenizer,
)
from vllm_omni_tpu.inputs import (
    OmniEmbedsPrompt,
    OmniTokensPrompt,
    PromptType,
    TextPrompt,
    parse_prompt,
)
from vllm_omni_tpu.logger import init_logger
from vllm_omni_tpu.outputs import CompletionOutput, RequestOutput
from vllm_omni_tpu.sampling_params import SamplingParams
from vllm_omni_tpu.utils import Counter

logger = init_logger(__name__)


class LLM:
    def __init__(
        self,
        model: str = "",
        engine_args: Optional[EngineArgs] = None,
        load_weights: bool = True,
        model_impl: Optional[Any] = None,
        attention_backend: Optional[str] = None,
        devices: Optional[list] = None,
        **kwargs,
    ):
        if engine_args is None:
            engine_args = EngineArgs.from_dict({"model": model, **kwargs})
        self.engine_args = engine_args
        self.config: EngineConfig = engine_args.create_engine_config()
        if engine_args.load_format == "random":
            load_weights = False
        self.core = EngineCore(
            self.config,
            load_weights=load_weights,
            model=model_impl,
            attention_backend=attention_backend,
            devices=devices,
        )
        self.tokenizer = maybe_load_tokenizer(self.config.model_config.tokenizer)
        self._counter = Counter()
        # request_id -> (Request, detok, stream state)
        self._active: dict[str, tuple[Request, IncrementalDetokenizer]] = {}
        # finished outputs consumed by a concurrent generate_stream loop,
        # awaiting their own caller
        self._orphaned: dict[str, "RequestOutput"] = {}

    # --------------------------------------------------------------- API
    def generate(
        self,
        prompts: Union[PromptType, Sequence[PromptType]],
        sampling_params: Union[SamplingParams, Sequence[SamplingParams], None] = None,
    ) -> list[RequestOutput]:
        single = not isinstance(prompts, (list, tuple))
        prompt_list = [prompts] if single else list(prompts)
        if sampling_params is None:
            sampling_params = SamplingParams()
        sp_list = (
            [sampling_params] * len(prompt_list)
            if isinstance(sampling_params, SamplingParams)
            else list(sampling_params)
        )
        if len(sp_list) != len(prompt_list):
            raise ValueError("sampling_params length mismatch")

        req_ids = [
            self.add_request(p, sp) for p, sp in zip(prompt_list, sp_list)
        ]
        results = self.run_to_completion(set(req_ids))
        return [results[rid] for rid in req_ids]

    def add_request(
        self,
        prompt: PromptType,
        sampling_params: SamplingParams,
        request_id: Optional[str] = None,
    ) -> str:
        parsed = parse_prompt(prompt)
        request_id = request_id or f"req-{next(self._counter)}"
        prompt_text = None
        prompt_embeds = None
        additional_information: dict[str, Any] = {}
        if isinstance(parsed, TextPrompt):
            if self.tokenizer is None:
                raise ValueError(
                    "text prompt given but no tokenizer available; "
                    "pass prompt_token_ids"
                )
            token_ids = self.tokenizer.encode(parsed.prompt)
            prompt_text = parsed.prompt
        elif isinstance(parsed, OmniTokensPrompt):
            token_ids = list(parsed.prompt_token_ids)
            if not all(isinstance(t, (int, np.integer)) for t in token_ids):
                raise ValueError(
                    "prompt_token_ids must be a list of ints, got "
                    f"{type(parsed.prompt_token_ids).__name__} with "
                    f"element types {set(type(t).__name__ for t in token_ids[:5])}"
                )
            prompt_embeds = parsed.prompt_embeds
            additional_information = parsed.additional_information
        elif isinstance(parsed, OmniEmbedsPrompt):
            n = int(np.asarray(parsed.prompt_embeds).shape[0])
            token_ids = [0] * n
            prompt_embeds = parsed.prompt_embeds
            additional_information = parsed.additional_information
        else:
            raise TypeError(type(parsed))

        # engine-level fields carried through additional_information by
        # stage input processors (thinker->talker handoff)
        decode_embeds = additional_information.pop("decode_embeds", None)
        mrope_positions = additional_information.pop("mrope_positions", None)
        mrope_delta = additional_information.pop("mrope_delta", 0)
        deepstack_embeds = additional_information.pop("deepstack_embeds", None)
        mm_data = getattr(parsed, "multi_modal_data", None)
        if mm_data:
            model = self.core.runner.model
            if not hasattr(model, "process_multimodal"):
                raise ValueError(
                    f"model {type(model).__name__} does not accept "
                    "multi_modal_data"
                )
            mm = model.process_multimodal(
                self.core.runner.params, token_ids, mm_data,
                getattr(parsed, "mm_processor_kwargs", None),
            )
            token_ids = mm.get("token_ids", token_ids)
            prompt_embeds = mm["prompt_embeds"]
            mrope_positions = mm["mrope_positions"]
            mrope_delta = mm["mrope_delta"]
            deepstack_embeds = mm.get("deepstack_embeds")

        req = Request(
            request_id=request_id,
            prompt_token_ids=token_ids,
            prompt=prompt_text,
            prompt_embeds=prompt_embeds,
            additional_information=additional_information,
            mrope_positions=mrope_positions,
            mrope_delta=mrope_delta,
            decode_embeds=decode_embeds,
            deepstack_embeds=deepstack_embeds,
            sampling_params=sampling_params.clone(),
        )
        if sampling_params.structured_outputs is not None:
            req.grammar_fsm = self._compile_grammar(
                sampling_params.structured_outputs)
        detok = IncrementalDetokenizer(
            self.tokenizer if sampling_params.detokenize else None,
            stop=list(sampling_params.stop or []),
            skip_special_tokens=sampling_params.skip_special_tokens,
        )
        self._active[request_id] = (req, detok)
        self.core.add_request(req)
        return request_id

    def _compile_grammar(self, spec: dict):
        """Compile a structured_outputs spec into a TokenFSM (cached:
        DFA construction + the vocab trie walk are one-time costs)."""
        import json as _json

        if self.tokenizer is None:
            raise ValueError("structured_outputs requires a tokenizer")
        key = _json.dumps(spec, sort_keys=True, default=str)
        cache = getattr(self, "_grammar_cache", None)
        if cache is None:
            cache = self._grammar_cache = {}
        fsm = cache.get(key)
        if fsm is None:
            from vllm_omni_tpu.structured import compile_fsm
            from vllm_omni_tpu.structured.fsm import (
                token_bytes_from_tokenizer,
            )

            tb = getattr(self, "_token_bytes", None)
            if tb is None:
                tb = self._token_bytes = token_bytes_from_tokenizer(
                    self.tokenizer)
            eos = self.core.eos_token_id
            if eos is None:
                eos = getattr(self.tokenizer, "eos_token_id", 0) or 0
            fsm = cache[key] = compile_fsm(spec, tb, int(eos))
        return fsm

    def has_unfinished(self) -> bool:
        return self.core.has_unfinished()

    def step(self) -> list[RequestOutput]:
        """One engine step; returns RequestOutputs for requests that
        progressed (finished=True when done)."""
        core_outputs = self.core.step()
        outs: list[RequestOutput] = []
        for co in core_outputs:
            entry = self._active.get(co.request_id)
            if entry is None:
                continue
            req, detok = entry
            detok.add_tokens(co.new_token_ids)
            # core outputs drain in bursts (async pipelined steps), but
            # each one is a per-step record: snapshot the token count and
            # per-step mm so streamed partials advance one step at a time
            req._emitted_tokens = (
                getattr(req, "_emitted_tokens", 0) + len(co.new_token_ids))
            finished = co.finished
            finish_reason = co.finish_reason
            if detok.stopped_on is not None and not finished:
                # stop string hit: abort in scheduler
                self.core.abort_request(co.request_id)
                finished = True
                finish_reason = "stop"
            outs.append(self._make_output(
                req, detok, finished, finish_reason,
                step_mm=co.multimodal_output,
                n_tokens=req._emitted_tokens))
            if finished:
                self._active.pop(co.request_id, None)
        return outs

    def generate_stream(
        self,
        prompt: PromptType,
        sampling_params: Optional[SamplingParams] = None,
    ):
        """Yield a partial RequestOutput per engine step for ONE request
        (finished=True on the last). The streaming path the reference
        refuses over HTTP (reference serving_chat.py:268-269) — SURVEY §7
        targets exceeding it."""
        rid = self.add_request(prompt, sampling_params or SamplingParams())
        done = False
        # streamed latent rows stay on device end-to-end (StreamFeed
        # contract); batch generate() instead host-fetches aux in the
        # drain's one device_get
        prev_mm = self.core.stream_device_mm
        self.core.stream_device_mm = True
        try:
            while not done and self.core.has_unfinished():
                for out in self.step():
                    if out.request_id != rid:
                        if out.finished:
                            # another in-flight request completed during
                            # this stream: park it for its
                            # run_to_completion caller
                            self._orphaned[out.request_id] = out
                        continue
                    yield out
                    done = done or out.finished
        finally:
            self.core.stream_device_mm = prev_mm
        if not done and rid in self._active:
            raise RuntimeError(f"request {rid} never finished")

    def abort_request(self, request_id: str) -> None:
        """Stop generating for a request (client went away)."""
        self.core.abort_request(request_id)
        self._active.pop(request_id, None)
        if not self._active:
            # nothing else live: drain the async pipeline's in-flight
            # steps so the engine returns to idle (dispatched device work
            # completes; its outputs are dropped)
            while self.core.has_unfinished():
                self.core.step()

    def run_to_completion(self, req_ids: set[str]) -> dict[str, RequestOutput]:
        results: dict[str, RequestOutput] = {}
        pending = set(req_ids)
        for rid in list(pending):
            if rid in self._orphaned:
                results[rid] = self._orphaned.pop(rid)
                pending.discard(rid)
        while pending and self.core.has_unfinished():
            for out in self.step():
                if out.finished and out.request_id in pending:
                    results[out.request_id] = out
                    pending.discard(out.request_id)
        if pending:
            raise RuntimeError(f"requests never finished: {pending}")
        return results

    # ----------------------------------------------------------- helpers
    def _make_output(
        self, req: Request, detok: IncrementalDetokenizer,
        finished: bool, finish_reason: Optional[str],
        step_mm: Optional[dict] = None, n_tokens: Optional[int] = None,
    ) -> RequestOutput:
        mm = None
        if req.multimodal_outputs:
            import jax.numpy as jnp

            # deferred concat over steps, parity with the reference's
            # MultimodalOutputProcessor (output_processor.py:99-186):
            # per-step vectors stack to [steps, ...]; chunked [n, ...]
            # slices (e.g. prompt_hidden) concatenate along tokens
            def _merge(v):
                if len(v) == 1:
                    return v[0]
                if getattr(v[0], "ndim", 0) >= 2:
                    return jnp.concatenate(v, axis=0)
                return jnp.stack(v)

            if finished:
                mm = {k: _merge(v) for k, v in req.multimodal_outputs.items()}
            else:
                # partials: prompt-level accumulations whole (tuple of
                # prefill-chunk arrays; no copy, no concat), static
                # finalize extras as-is, and THIS step's aux values
                # (step_mm) — not the newest drained ones, so burst
                # drains still stream one step at a time
                mm = {k: (tuple(v) if k.startswith("prompt_") else v[-1])
                      for k, v in req.multimodal_outputs.items()}
                if step_mm:
                    mm.update(step_mm)
        tok_ids = list(req.output_token_ids)
        if not finished and n_tokens is not None:
            tok_ids = tok_ids[:n_tokens]
        comp = CompletionOutput(
            index=0,
            text=detok.text,
            token_ids=tok_ids,
            finish_reason=finish_reason if finished else None,
            stop_reason=req.stop_reason or detok.stopped_on,
            multimodal_output=mm,
            logprobs=list(req.logprobs) if req.logprobs else None,
        )
        return RequestOutput(
            request_id=req.request_id,
            prompt=req.prompt,
            prompt_token_ids=list(req.prompt_token_ids),
            outputs=[comp],
            finished=finished,
        )
