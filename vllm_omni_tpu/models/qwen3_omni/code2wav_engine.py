"""One-shot stage engine for Qwen3-Omni code2wav.

Parity role: the reference's code2wav stage (GPUGenerationModelRunner +
OmniGenerationScheduler, fed by talker2code2wav's flattened [n_q, seq]
RVQ codes; reference stage_input_processors/qwen3_omni.py:124-183)."""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from vllm_omni_tpu.models.qwen3_omni.code2wav import Qwen3OmniMoeCode2Wav
from vllm_omni_tpu.outputs import CompletionOutput, RequestOutput


class Code2WavEngine:
    def __init__(
        self,
        hf_config: dict[str, Any],
        load_weights: bool = True,
        model_path: str = "",
        params: Optional[dict] = None,
        chunked: bool = True,
        chunk_size: int = 300,
        left_context: int = 25,
        dtype=jnp.float32,
    ):
        sub = hf_config.get("code2wav_config", hf_config)
        self.model = Qwen3OmniMoeCode2Wav(sub, dtype=dtype)
        if params is not None:
            self.params = params
        elif load_weights and model_path:
            from vllm_omni_tpu.models.weight_loader import iter_safetensors

            sd = {
                k[len("code2wav."):] if k.startswith("code2wav.") else k: v
                for k, v in iter_safetensors(model_path)
                if k.startswith("code2wav.") or not k.startswith(
                    ("thinker.", "talker."))
            }
            self.params = self.model.load_from_state_dict(sd)
        else:
            self.params = self.model.init_params(jax.random.key(0))
        self.chunked = chunked
        self.chunk_size = chunk_size
        self.left_context = left_context

    def generate(self, prompts, sampling_params) -> list[RequestOutput]:
        nq = self.model.cfg.num_quantizers
        outs = []
        for p in prompts:
            flat = p["prompt_token_ids"] if isinstance(p, dict) else list(p)
            if len(flat) % nq:
                raise ValueError(
                    f"codes length {len(flat)} not a multiple of "
                    f"num_quantizers {nq}")
            codes = jnp.asarray(
                np.asarray(flat, np.int32).reshape(nq, -1))[None]
            if self.chunked and codes.shape[-1] > self.chunk_size:
                wav = self.model.chunked_decode(
                    self.params, codes, self.chunk_size, self.left_context)
            else:
                wav = self.model.forward(self.params, codes)
            out = RequestOutput(
                request_id="c2w", prompt=None, prompt_token_ids=list(flat),
                outputs=[CompletionOutput(
                    index=0, text="", token_ids=[], finish_reason="stop",
                    multimodal_output={"waveform": wav})],
                finished=True,
            )
            # stage-tps work unit for the non-AR stage: codec frames
            # synthesized (the reference's overall_tps counts every
            # stage's tokens, qwen3_omni_moe_transformers.py:182; a
            # waveform carries no token ids so the RequestOutput
            # property alone reports 0)
            out.metrics.num_prompt_tokens = len(flat)
            out.metrics.num_generated_tokens = len(flat) // nq
            outs.append(out)
        return outs

    def generate_stream(self, prompt, sampling_params=None):
        """Yield a partial RequestOutput per decoded waveform chunk (the
        TTFT speech-streaming path: first audio is ready after ONE
        chunk's decode instead of the full utterance).

        Incremental mode: a dict prompt carrying `frame_feed` (a
        stages/streaming.StreamFeed of [NQ] int frames from a
        still-running talker) decodes each chunk as soon as
        `chunk_size` frames exist — chunk boundaries and left context
        match chunked_decode exactly, so the concatenated waveform is
        bit-identical to the completion-handoff path."""
        if isinstance(prompt, dict) and prompt.get("frame_feed") is not None:
            yield from self._stream_from_feed(prompt)
            return
        nq = self.model.cfg.num_quantizers
        flat = (prompt["prompt_token_ids"] if isinstance(prompt, dict)
                else list(prompt))
        if len(flat) % nq:
            raise ValueError(
                f"codes length {len(flat)} not a multiple of "
                f"num_quantizers {nq}")
        codes = jnp.asarray(np.asarray(flat, np.int32).reshape(nq, -1))[None]
        T = codes.shape[-1]
        step = self.chunk_size if self.chunked else T
        start = 0
        parts = []
        while start < T:
            end = min(start + step, T)
            ctx = self.left_context if start - self.left_context > 0 else start
            wav = self.model.forward(self.params, codes[..., start - ctx:end])
            chunk = wav[ctx * self.model.total_upsample:]
            parts.append(chunk)
            start = end
            finished = start >= T
            full = jnp.concatenate(parts) if finished else None
            out = RequestOutput(
                request_id="c2w", prompt=None,
                prompt_token_ids=list(flat) if finished else [],
                outputs=[CompletionOutput(
                    index=0, text="", token_ids=[],
                    finish_reason="stop" if finished else None,
                    multimodal_output={
                        "waveform_chunk": chunk,
                        **({"waveform": full} if finished else {}),
                    })],
                finished=finished,
            )
            if finished:
                out.metrics.num_prompt_tokens = len(flat)
                out.metrics.num_generated_tokens = T
            yield out

    def _stream_from_feed(self, prompt):
        from vllm_omni_tpu.stages.streaming import StreamCancelled

        feed = prompt["frame_feed"]
        rid = str(prompt.get("request_id", "c2w"))
        frames: list[np.ndarray] = []
        parts: list[jax.Array] = []
        start = 0
        aborted = False

        def decode_span(end):
            nonlocal start
            ctx = (self.left_context if start - self.left_context > 0
                   else start)
            codes = jnp.asarray(
                np.stack(frames[start - ctx:end], axis=1))[None]
            wav = self.model.forward(self.params, codes)
            chunk = wav[ctx * self.model.total_upsample:]
            parts.append(chunk)
            start = end
            return chunk

        while True:
            try:
                f = feed.get(len(frames))
            except StreamCancelled:
                aborted = True
                break
            if f is None:
                break
            frames.append(np.asarray(f, np.int32))
            if self.chunked and len(frames) - start >= self.chunk_size:
                chunk = decode_span(start + self.chunk_size)
                yield RequestOutput(
                    request_id=rid, prompt=None, prompt_token_ids=[],
                    outputs=[CompletionOutput(
                        index=0, text="", token_ids=[], finish_reason=None,
                        multimodal_output={"waveform_chunk": chunk})],
                    finished=False,
                )
        tail = None
        if not aborted and len(frames) > start:
            tail = decode_span(len(frames))
        full = (jnp.concatenate(parts) if parts
                else jnp.zeros((0,), self.model.dtype))
        codes = (np.stack(frames, axis=1) if frames
                 else np.zeros((self.model.cfg.num_quantizers, 0), np.int32))
        final = RequestOutput(
            request_id=rid, prompt=None,
            prompt_token_ids=[int(c) for c in codes.reshape(-1)],
            outputs=[CompletionOutput(
                index=0, text="", token_ids=[],
                finish_reason="abort" if aborted else "stop",
                # only a NEW tail chunk rides the final output — chunks
                # already emitted as partials must not replay at the
                # client (SSE sends the final's waveform_chunk verbatim)
                multimodal_output={
                    "waveform": full,
                    **({"waveform_chunk": tail} if tail is not None else {}),
                })],
            finished=True,
        )
        final.metrics.num_prompt_tokens = int(codes.size)
        final.metrics.num_generated_tokens = len(frames)
        yield final
