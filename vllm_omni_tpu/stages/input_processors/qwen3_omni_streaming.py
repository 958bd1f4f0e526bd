"""Incremental (cross-stage streaming) processors for Qwen3-Omni speech.

Beyond-reference: the reference hands off on stage COMPLETION only
(entrypoints/omni_stage.py:819), so speech TTFT is bounded below by
full-thinker + full-talker latency. These processors start the talker
after the thinker's SECOND step and code2wav after the talker's first
`chunk_size` frames, producing bit-identical output to the
completion-handoff path (see stages/streaming.py for the argument).

Edge protocol recap (stages/streaming.py): the orchestrator calls
on_partial/on_final with upstream StageOutput payloads; the processor
returns the consumer-stage prompt exactly once (the orchestrator submits
it with stream=True), and thereafter feeds the live StreamFeed objects
embedded in that prompt.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from vllm_omni_tpu.stages.input_processors.qwen3_omni import (
    _build_talker_prefill,
    _cfg_ids,
    _merge_chunks,
    _pad_capture,
    _resolve_speaker,
    talker2code2wav,
    thinker2talker,
)
from vllm_omni_tpu.stages.streaming import StreamFeed, StreamInputProcessor


class Thinker2TalkerStreaming(StreamInputProcessor):
    """Thinker partial outputs -> talker prefill + live trailing feed.

    The talker prefill (the 9-slot assistant part) needs thinker input
    embeddings only up to position s_last+4 — the prompt plus, when the
    prompt ends with the bare assistant header, the first generated
    token's embedding, which arrives with the thinker's second output
    (last_input_embed = the token that re-entered at that step). All
    later text embeddings are consumed one-per-frame during talker
    decode and stream through the trailing feed.
    """

    def __init__(self, stage, original_prompt):
        super().__init__(stage, original_prompt)
        self.feed = StreamFeed()
        # growing thinker_embed: prompt embeds then one row per re-entered
        # generated token (steps 2..n); see thinker2talker's layout
        self._embeds: Optional[np.ndarray] = None
        self._rows: list[np.ndarray] = []
        self._mm1: dict[str, Any] = {}
        self._next_idx = -1  # next thinker_embed index owed to the feed
        self._n_seen = 0

    # ------------------------------------------------------------ events
    def on_partial(self, src_stage_id: int, output) -> Optional[Any]:
        comp = output.outputs[0]
        mm = comp.multimodal_output or {}
        n = len(comp.token_ids)
        if n <= self._n_seen:  # duplicate/empty step
            return None
        self._n_seen = n
        if n == 1:
            # first output: prompt-level arrays + tts embeds (finalize
            # runs at first emission), last_input_embed here is the last
            # PROMPT embedding (already inside prompt_embed_tokens)
            self._mm1 = dict(mm)
            self._embeds = _merge_chunks(mm["prompt_embed_tokens"])
            return None
        if self._embeds is None:
            return None  # never saw the first partial; fall back at final
        # keep the row AS EMITTED (a device array on TPU): converting
        # here is a device->host roundtrip (~20-30 ms over the remote
        # tunnel) PER TOKEN on the orchestrator's single output-handler
        # thread — it serialized the whole DAG and erased the streaming
        # win. The talker consumes the row on-device (feed rows never
        # leave HBM).
        self._rows.append(mm["last_input_embed"])
        if not self.submitted:
            return self._build(output)
        self._flush()
        return None

    def on_final(self, src_stage_id: int, output) -> Optional[Any]:
        if not self.submitted:
            # thinker finished before the streaming prefill could be
            # built (<= 1 generated token, or partials never flowed):
            # identical batch hand-off
            return thinker2talker(
                self.stage, {src_stage_id: output}, self.original_prompt)
        comp = output.outputs[0]
        mm = comp.multimodal_output or {}
        # the final output carries the last re-entered embedding (the
        # final sampled token never re-enters and is never fed)
        step_embeds = np.asarray(mm["last_input_embed"], np.float32)
        if step_embeds.ndim == 2 and step_embeds.shape[0] > len(
                self._rows) + 1:
            self._rows = list(step_embeds[1:])
        elif step_embeds.ndim == 1:
            self._rows.append(step_embeds)
        self._flush()
        tts_eos = np.asarray(self._mm1["tts_eos_embed"], np.float32)
        self.feed.append(tts_eos[0] if tts_eos.ndim > 1 else tts_eos)
        self.feed.finish()
        return None

    def cancel(self) -> None:
        self.feed.cancel()

    # ----------------------------------------------------------- helpers
    def _thinker_embed(self) -> np.ndarray:
        if self._rows:
            rows = [np.asarray(r, np.float32).reshape(1, -1)
                    for r in self._rows]
            return np.concatenate([self._embeds] + rows)
        return self._embeds

    def _build(self, output) -> dict[str, Any]:
        engine = self.stage.engine
        cfg = self.stage.config.engine_args.hf_config or {}
        talker_cfg = cfg.get("talker_config", cfg)
        prompt_ids = list(output.prompt_token_ids)
        gen_ids = list(output.outputs[0].token_ids)
        sequences = np.asarray(prompt_ids + gen_ids, np.int64)
        P = len(prompt_ids)
        thinker_embed = self._thinker_embed()
        capture = _pad_capture(
            self._mm1.get("prompt_capture_hidden"), thinker_embed)
        tts_bos = np.asarray(engine.project_text(self._mm1["tts_bos_embed"]))
        tts_pad = np.asarray(engine.project_text(self._mm1["tts_pad_embed"]))
        prompt, s_last = _build_talker_prefill(
            self.stage, cfg, sequences, P, thinker_embed, capture,
            tts_bos, tts_pad,
            _resolve_speaker(self.stage, talker_cfg, self.original_prompt),
            self.original_prompt,
        )
        prompt["trailing_feed"] = self.feed
        # raw pad row for feed-exhausted steps (projected in-jit)
        pad_raw = np.asarray(self._mm1["tts_pad_embed"], np.float32)
        prompt["tts_pad_embed_raw"] = (
            pad_raw[0] if pad_raw.ndim > 1 else pad_raw)
        prompt["request_id"] = output.request_id
        self.submitted = True
        self._next_idx = s_last + 4
        self._flush()
        return prompt

    def _flush(self) -> None:
        """Append RAW thinker rows — the talker projects them inside its
        jitted decode step (talker_engine._decode(raw_trail=True)) and
        generated-token rows stay DEVICE arrays end to end (they never
        leave HBM). Host-side per-row work here (project_text, or even a
        bare np.asarray of a device row: one ~20-30 ms tunnel roundtrip
        per token) runs on the orchestrator's single output-handler
        thread and serializes every stage's progress behind it."""
        if self._next_idx < 0:
            return
        n_prompt = self._embeds.shape[0]
        total = n_prompt + len(self._rows)
        while self._next_idx < total:
            i = self._next_idx
            row = (self._embeds[i] if i < n_prompt
                   else self._rows[i - n_prompt])
            self.feed.append(row)
            self._next_idx += 1


class Talker2Code2WavStreaming(StreamInputProcessor):
    """Talker per-frame partials -> live code2wav frame feed."""

    def __init__(self, stage, original_prompt):
        super().__init__(stage, original_prompt)
        self.feed = StreamFeed()
        self._n = 0

    def on_partial(self, src_stage_id: int, output) -> Optional[Any]:
        mm = output.outputs[0].multimodal_output or {}
        frame = mm.get("frame")
        if frame is None:
            return None
        self.feed.append(np.asarray(frame, np.int32))
        self._n += 1
        if not self.submitted:
            self.submitted = True
            return {"frame_feed": self.feed,
                    "request_id": output.request_id}
        return None

    def on_final(self, src_stage_id: int, output) -> Optional[Any]:
        if not self.submitted:
            return talker2code2wav(
                self.stage, {src_stage_id: output}, self.original_prompt)
        mm = output.outputs[0].multimodal_output or {}
        codes = mm.get("codes")
        if codes is not None:
            codes = np.asarray(codes, np.int32)
            for t in range(self._n, codes.shape[1]):  # missed frames
                self.feed.append(codes[:, t])
                self._n += 1
        self.feed.finish()
        return None

    def cancel(self) -> None:
        self.feed.cancel()
