"""Chat completions over the multi-stage pipeline.

Parity: OmniOpenAIServingChat (reference entrypoints/openai/
serving_chat.py:84-1291): builds per-stage sampling params from request
overrides, runs AsyncOmni.generate, assembles the text choice plus an
audio choice (base64 WAV in message.audio) and/or image choice from the
final-stage outputs. Chat content parts cover text / image (base64 or
local path) / input_audio, mirroring the reference's multimodal content
parser (chat_utils.py:42-127) minus URL downloads (no egress here).
"""

from __future__ import annotations

import base64
import dataclasses
import io
import uuid
from typing import Any, Optional

import numpy as np

from vllm_omni_tpu.entrypoints.audio_utils import waveform_to_base64_wav
from vllm_omni_tpu.entrypoints.openai.protocol import (
    ChatCompletionChoice,
    ChatCompletionRequest,
    ChatCompletionResponse,
    UsageInfo,
)
from vllm_omni_tpu.logger import init_logger
from vllm_omni_tpu.sampling_params import SamplingParams

logger = init_logger(__name__)


def parse_chat_content(
    messages: list,
    mm_processor_kwargs: Optional[dict[str, Any]] = None,
) -> tuple[list[dict[str, str]], dict[str, list]]:
    """-> (text_messages, multi_modal_data {audio/image/video: [...]}).

    Video parity with the reference's content parser
    (chat_utils.py:42-127): `video_url` parts are decoded to sampled
    frames (data:/file: URLs; no http egress here), and when
    mm_processor_kwargs.use_audio_in_video is set the clip's audio
    track is extracted too (librosa path, gated on availability)."""
    mm: dict[str, list] = {}
    use_aiv = bool((mm_processor_kwargs or {}).get("use_audio_in_video"))
    out_msgs: list[dict[str, str]] = []
    for m in messages:
        content = m.content
        if content is None or isinstance(content, str):
            msg: dict[str, Any] = {"role": m.role, "content": content or ""}
            # tool-call turns survive into the chat template (assistant
            # tool_calls + tool-role results)
            if getattr(m, "tool_calls", None):
                msg["tool_calls"] = m.tool_calls
            if getattr(m, "tool_call_id", None):
                msg["tool_call_id"] = m.tool_call_id
            if getattr(m, "name", None):
                msg["name"] = m.name
            out_msgs.append(msg)
            continue
        text_parts: list[str] = []
        for part in content:
            ptype = part.get("type")
            if ptype == "text":
                text_parts.append(part.get("text", ""))
            elif ptype in ("image_url", "image"):
                url = (part.get("image_url") or {}).get("url", part.get("image"))
                img = _load_image(url)
                mm.setdefault("image", []).append(img)
                text_parts.append("<|vision_bos|><|IMAGE|><|vision_eos|>")
            elif ptype == "input_audio":
                data = part.get("input_audio", {})
                wav = _decode_audio_b64(data.get("data", ""))
                mm.setdefault("audio", []).append(wav)
                text_parts.append("<|audio_bos|><|AUDIO|><|audio_eos|>")
            elif ptype in ("audio_url",):
                url = (part.get("audio_url") or {}).get("url", "")
                wav = _load_audio(url)
                mm.setdefault("audio", []).append(wav)
                text_parts.append("<|audio_bos|><|AUDIO|><|audio_eos|>")
            elif ptype in ("video_url", "video"):
                if ptype == "video":
                    # raw frames: [T, H, W, 3] nested lists / arrays
                    frames = np.asarray(part.get("video"))
                    spg = None
                else:
                    url = (part.get("video_url") or {}).get("url", "")
                    frames, spg = _load_video(url)
                mm.setdefault("video", []).append(frames)
                mm.setdefault("second_per_grids", []).append(
                    spg if spg is not None else 1.0)
                if use_aiv:
                    wav = _extract_video_audio(part)
                    mm.setdefault("audio", []).append(wav)
                    # record WHICH audio entry belongs to this video so
                    # downstream pairing survives standalone audio parts
                    # appearing earlier in the message
                    mm.setdefault("video_audio_indices", []).append(
                        len(mm["audio"]) - 1)
                    text_parts.append(
                        "<|vision_bos|><|audio_bos|><|VIDEO|>"
                        "<|audio_eos|><|vision_eos|>")
                else:
                    text_parts.append(
                        "<|vision_bos|><|VIDEO|><|vision_eos|>")
        out_msgs.append({"role": m.role, "content": "".join(text_parts)})
    if use_aiv and mm.get("video"):
        mm["use_audio_in_video"] = True
    return out_msgs, mm


def _decode_audio_b64(data: str) -> np.ndarray:
    raw = base64.b64decode(data)
    # try WAV container first
    try:
        import wave

        with wave.open(io.BytesIO(raw)) as w:
            frames = w.readframes(w.getnframes())
            arr = np.frombuffer(frames, "<i2").astype(np.float32) / 32767.0
            return arr
    except Exception:
        return np.frombuffer(raw, "<i2").astype(np.float32) / 32767.0


def _load_audio(url: str) -> np.ndarray:
    if url.startswith("data:"):
        return _decode_audio_b64(url.split(",", 1)[1])
    if url.startswith("file://"):
        url = url[len("file://"):]
    import wave

    with wave.open(url) as w:
        frames = w.readframes(w.getnframes())
        return np.frombuffer(frames, "<i2").astype(np.float32) / 32767.0


def _load_video(url: str) -> tuple[np.ndarray, float]:
    """-> (frames [T, H, W, 3] uint8 sampled at ~2 fps, second_per_grid).

    data: URLs carry the encoded container; file:// and bare paths read
    from disk (no http egress in this environment — the reference
    additionally downloads http URLs, chat_utils.py:42-127)."""
    from vllm_omni_tpu.multimodal.processor import decode_video_bytes

    if url.startswith("data:"):
        raw = base64.b64decode(url.split(",", 1)[1])
        return decode_video_bytes(raw)
    if url.startswith("file://"):
        url = url[len("file://"):]
    with open(url, "rb") as f:
        return decode_video_bytes(f.read())


def _extract_video_audio(part: dict) -> np.ndarray:
    """Audio track of a video part (use_audio_in_video). Requires an
    audio-capable decoder (librosa); gated on availability — raw 'video'
    frame parts carry no audio track at all."""
    if part.get("type") == "video":
        raise ValueError(
            "use_audio_in_video requires an encoded video (video_url); "
            "raw 'video' frame parts carry no audio track")
    try:
        import librosa  # noqa: F401
    except ImportError as e:
        raise ValueError(
            "use_audio_in_video needs librosa to demux the audio track, "
            "which is unavailable in this environment; pass the track "
            "separately as an input_audio part") from e
    import tempfile

    url = (part.get("video_url") or {}).get("url", "")
    if url.startswith("data:"):
        raw = base64.b64decode(url.split(",", 1)[1])
        with tempfile.NamedTemporaryFile(suffix=".mp4") as f:
            f.write(raw)
            f.flush()
            wav, _sr = librosa.load(f.name, sr=16000)
            return wav
    if url.startswith("file://"):
        url = url[len("file://"):]
    wav, _sr = librosa.load(url, sr=16000)
    return wav


def _load_image(url: str):
    from PIL import Image

    if url and url.startswith("data:"):
        raw = base64.b64decode(url.split(",", 1)[1])
        return Image.open(io.BytesIO(raw)).convert("RGB")
    if url and url.startswith("file://"):
        url = url[len("file://"):]
    return Image.open(url).convert("RGB")


class OmniOpenAIServingChat:
    def __init__(self, engine_client, model_name: str = "omni",
                 tokenizer=None):
        self.engine = engine_client
        self.model_name = model_name
        self.tokenizer = tokenizer

    def _build_sampling(
        self, request: ChatCompletionRequest
    ) -> dict[int, SamplingParams]:
        """Per-stage sampling overrides from the request.

        Parity: _build_sampling_params_list_from_request
        (reference serving_chat.py:459)."""
        base_overrides: dict[str, Any] = {}
        if request.temperature is not None:
            base_overrides["temperature"] = request.temperature
        if request.top_p is not None:
            base_overrides["top_p"] = request.top_p
        if request.top_k is not None:
            base_overrides["top_k"] = request.top_k
        if request.seed is not None:
            base_overrides["seed"] = request.seed
        mt = request.max_completion_tokens or request.max_tokens
        if mt is not None:
            base_overrides["max_tokens"] = mt
        if request.stop is not None:
            base_overrides["stop"] = request.stop
        if request.logprobs:
            # engine-side logprobs: k top alternatives + the sampled
            # token per position (engine/core.py); k=1 when only the
            # sampled token's logprob was asked for
            base_overrides["logprobs"] = max(1, request.top_logprobs or 0)
        for k in ("presence_penalty", "frequency_penalty", "repetition_penalty"):
            v = getattr(request, k)
            if v is not None:
                base_overrides[k] = v
        so = self._structured_spec(request)
        if so is None:
            # named tool_choice: constrain decoding to the tool's
            # parameter schema so arguments always parse (reference
            # serving_chat.py:715-729 wraps the whole content as the
            # call's arguments; we additionally grammar-constrain it)
            from vllm_omni_tpu.entrypoints.openai.tool_parsing import (
                named_tool_schema, tool_choice_mode)

            if tool_choice_mode(request) == "named":
                schema = named_tool_schema(request)
                if schema is not None:
                    so = {"json": schema}
        if so is not None:
            base_overrides["structured_outputs"] = so

        out: dict[int, SamplingParams] = {}
        if base_overrides:
            out[0] = SamplingParams.from_dict(base_overrides)
        for sid, over in (request.stage_sampling_params or {}).items():
            out[int(sid)] = SamplingParams.from_dict(over)
        return out

    @staticmethod
    def _structured_spec(request: ChatCompletionRequest):
        """Normalize the request's constrained-decoding surface to the
        engine's structured_outputs dict: OpenAI response_format
        (json_schema / json_object) and the vLLM guided_* aliases."""
        if request.structured_outputs is not None:
            return request.structured_outputs
        if request.guided_json is not None:
            return {"json": request.guided_json}
        if request.guided_regex is not None:
            return {"regex": request.guided_regex}
        if request.guided_choice is not None:
            return {"choice": request.guided_choice}
        rf = request.response_format
        if rf:
            kind = rf.get("type")
            if kind == "json_schema":
                js = rf.get("json_schema") or {}
                schema = js.get("schema") or js
                return {"json": schema}
            if kind == "json_object":
                # any JSON object: unconstrained values
                return {"json": {"type": "object", "properties": {}}}
        return None

    def _token_str(self, tid: int) -> str:
        if self.tokenizer is not None:
            try:
                toks = self.tokenizer.convert_ids_to_tokens([int(tid)])
                if toks and toks[0] is not None:
                    return str(toks[0])
            except Exception:
                pass
            try:
                return self.tokenizer.decode([int(tid)])
            except Exception:
                pass
        return f"token_id:{tid}"

    def _format_logprobs(self, comp, top_k: int) -> Optional[dict]:
        """Engine logprobs (list of {token_id: logprob} per position,
        sampled token always present) -> the OpenAI chat logprobs object
        (reference _create_chat_logprobs, serving_chat.py:636-646)."""
        if not comp.logprobs:
            return None
        content = []
        for tid, entry in zip(comp.token_ids, comp.logprobs):
            tid = int(tid)
            tok = self._token_str(tid)
            lp = float(entry.get(tid, 0.0))
            item: dict[str, Any] = {
                "token": tok,
                "logprob": lp,
                "bytes": list(tok.encode("utf-8")),
            }
            if top_k > 0:
                alts = sorted(entry.items(), key=lambda kv: -kv[1])[:top_k]
                item["top_logprobs"] = [{
                    "token": self._token_str(int(a_id)),
                    "logprob": float(a_lp),
                    "bytes": list(self._token_str(int(a_id)).encode("utf-8")),
                } for a_id, a_lp in alts]
            content.append(item)
        return {"content": content}

    @staticmethod
    def _sampling_for_index(
        sampling: dict[int, SamplingParams], index: int
    ) -> dict[int, SamplingParams]:
        """Per-choice sampling for n>1: explicit seeds shift by the
        choice index (seed, seed+1, ...) so choices are reproducible yet
        distinct; unseeded requests draw fresh engine entropy per
        sub-request already (scheduler seed=None semantics)."""
        if index == 0:
            return sampling
        out: dict[int, SamplingParams] = {}
        for sid, sp in sampling.items():
            if sp.seed is not None:
                sp = dataclasses.replace(sp, seed=int(sp.seed) + index)
            out[sid] = sp
        return out

    def _render_prompt(self, messages: list[dict[str, str]], tools=None):
        if self.tokenizer is not None:
            kw = {"tools": tools} if tools else {}
            try:
                ids = self.tokenizer.apply_chat_template(
                    messages, add_generation_prompt=True, **kw)
            except TypeError:
                # template/tokenizer without tools support
                ids = self.tokenizer.apply_chat_template(
                    messages, add_generation_prompt=True)
            return {"prompt_token_ids": ids}
        # no tokenizer: plain text prompt (engines may still accept it)
        text = "\n".join(f"{m['role']}: {m['content']}" for m in messages)
        return {"prompt": text}

    async def create_chat_completion_stream(
        self, request: ChatCompletionRequest
    ):
        """SSE streaming (beyond-reference: the reference rejects
        streaming, serving_chat.py:268-269). Yields OpenAI
        `chat.completion.chunk` SSE lines; audio-modality pipelines
        stream per-chunk PCM as `delta.audio.data` (b64) as the codec
        decodes, so time-to-first-audio is one chunk's decode, not the
        full utterance."""
        import asyncio
        import json as _json
        import time as _time

        messages, mm = parse_chat_content(
            request.messages, request.mm_processor_kwargs)
        prompt = self._render_prompt(messages, tools=request.tools)
        if mm:
            prompt["multi_modal_data"] = mm
            if request.mm_processor_kwargs:
                prompt["mm_processor_kwargs"] = request.mm_processor_kwargs
        sampling = self._build_sampling(request)
        modalities = request.modalities or ["text"]
        request_id = f"chatcmpl-{uuid.uuid4().hex[:24]}"
        output_modality = "text" if modalities == ["text"] else None
        created = int(_time.time())
        model = request.model or self.model_name
        n = max(1, int(request.n or 1))

        def chunk(index: int, delta: dict, finish_reason=None,
                  logprobs=None) -> str:
            choice: dict[str, Any] = {"index": index, "delta": delta,
                                      "finish_reason": finish_reason}
            if logprobs is not None:
                choice["logprobs"] = logprobs
            return "data: " + _json.dumps({
                "id": request_id,
                "object": "chat.completion.chunk",
                "created": created,
                "model": model,
                "choices": [choice],
            }) + "\n\n"

        async def stream_one(index: int, emit):
            """One engine request -> per-choice SSE chunks via emit()."""
            await emit(chunk(index, {"role": "assistant"}))
            sent_text = 0
            sent_lp = 0
            finish_reason = None
            async for out in self.engine.generate(
                prompt,
                request_id=(request_id if n == 1
                            else f"{request_id}-{index}"),
                sampling_params=self._sampling_for_index(
                    sampling, index) or None,
                output_modality=output_modality, stream=True,
            ):
                ro = out.request_output
                if ro is None:
                    continue
                comp = ro.outputs[0]
                if out.final_output_type == "text":
                    text = comp.text or ""
                    lp_delta = None
                    if request.logprobs and comp.logprobs:
                        new = comp.logprobs[sent_lp:]
                        if new:
                            from types import SimpleNamespace

                            lp_delta = self._format_logprobs(
                                SimpleNamespace(
                                    token_ids=comp.token_ids[sent_lp:],
                                    logprobs=new),
                                request.top_logprobs or 0)
                            sent_lp += len(new)
                    if len(text) > sent_text or lp_delta is not None:
                        await emit(chunk(
                            index, {"content": text[sent_text:]},
                            logprobs=lp_delta))
                        sent_text = len(text)
                    if not out.partial:
                        finish_reason = comp.finish_reason or "stop"
                elif out.final_output_type == "audio":
                    mmout = comp.multimodal_output or {}
                    wav_chunk = mmout.get("waveform_chunk")
                    if wav_chunk is None and not out.partial:
                        wav_chunk = mmout.get("waveform")
                        if wav_chunk is None:
                            wav_chunk = mmout.get("audio")
                    if wav_chunk is not None:
                        from vllm_omni_tpu.entrypoints.audio_utils import (
                            waveform_to_pcm_bytes,
                        )

                        await emit(chunk(index, {"audio": {
                            "id": f"audio-{uuid.uuid4().hex[:16]}",
                            "data": base64.b64encode(waveform_to_pcm_bytes(
                                np.asarray(wav_chunk))).decode("ascii"),
                            "format": "pcm16",
                        }}))
            await emit(chunk(index, {},
                             finish_reason=finish_reason or "stop"))

        # run the n choices concurrently and interleave their chunks
        # (n == 1 degenerates to a single producer on the same queue)
        q: asyncio.Queue = asyncio.Queue()

        async def runner(i):
            try:
                await stream_one(i, q.put)
            finally:
                await q.put(None)

        tasks = [asyncio.ensure_future(runner(i)) for i in range(n)]
        done = 0
        while done < n:
            item = await q.get()
            if item is None:
                done += 1
                continue
            yield item
        for t in tasks:
            await t  # surface exceptions
        yield "data: [DONE]\n\n"

    @staticmethod
    def _apply_text_parsers(request, message: dict, finish_reason):
        """Reasoning-content split + tool-call extraction over the final
        text (reference serving_chat.py:617-760: reasoning_parser /
        tool_parser / named tool_choice). Mutates `message`, returns the
        possibly-upgraded finish_reason."""
        from vllm_omni_tpu.entrypoints.openai import tool_parsing as tp

        text = message.get("content")
        if not isinstance(text, str):
            return finish_reason
        reasoning, content = tp.extract_reasoning(text)
        if reasoning is not None and request.include_reasoning:
            message["reasoning_content"] = reasoning
        message["content"] = content

        mode = tp.tool_choice_mode(request)
        if mode == "named":
            name = request.tool_choice["function"]["name"]
            message["tool_calls"] = tp.named_tool_call(name, content)
            message["content"] = None
            return "tool_calls"
        if mode == "auto":
            calls, rest = tp.extract_tool_calls(content)
            if calls:
                message["tool_calls"] = calls
                message["content"] = rest
                return "tool_calls"
        return finish_reason

    async def _generate_choice(
        self,
        request: ChatCompletionRequest,
        prompt: dict,
        sampling: dict[int, SamplingParams],
        request_id: str,
        output_modality: Optional[str],
        index: int,
    ) -> tuple[ChatCompletionChoice, UsageInfo]:
        """Run one engine request and assemble one response choice."""
        message: dict[str, Any] = {"role": "assistant", "content": None}
        finish_reason = None
        logprobs_obj = None
        usage = UsageInfo()
        async for out in self.engine.generate(
            prompt, request_id=request_id,
            sampling_params=self._sampling_for_index(sampling, index) or None,
            output_modality=output_modality,
        ):
            ro = out.request_output
            if out.final_output_type == "text" and ro is not None:
                comp = ro.outputs[0]
                message["content"] = comp.text
                finish_reason = comp.finish_reason
                finish_reason = self._apply_text_parsers(
                    request, message, finish_reason)
                usage.prompt_tokens = len(ro.prompt_token_ids)
                usage.completion_tokens = len(comp.token_ids)
                if request.logprobs:
                    logprobs_obj = self._format_logprobs(
                        comp, request.top_logprobs or 0)
            elif out.final_output_type == "audio":
                wavef = None
                if ro is not None and ro.outputs[0].multimodal_output:
                    mmout = ro.outputs[0].multimodal_output
                    wavef = mmout.get("waveform")
                    if wavef is None:
                        wavef = mmout.get("audio")
                if wavef is not None:
                    message["audio"] = {
                        "id": f"audio-{uuid.uuid4().hex[:16]}",
                        "data": waveform_to_base64_wav(np.asarray(wavef)),
                        "transcript": message.get("content"),
                    }
            elif out.final_output_type == "image" and out.images:
                buf = io.BytesIO()
                out.images[0].save(buf, format="PNG")
                message["images"] = [
                    base64.b64encode(buf.getvalue()).decode("ascii")
                ]
        usage.total_tokens = usage.prompt_tokens + usage.completion_tokens
        return ChatCompletionChoice(
            index=index, message=message, logprobs=logprobs_obj,
            finish_reason=finish_reason), usage

    async def create_chat_completion(
        self, request: ChatCompletionRequest
    ) -> ChatCompletionResponse:
        if request.stream:
            raise ValueError(
                "use create_chat_completion_stream for stream=True")
        import asyncio

        messages, mm = parse_chat_content(
            request.messages, request.mm_processor_kwargs)
        prompt = self._render_prompt(messages, tools=request.tools)
        if mm:
            prompt["multi_modal_data"] = mm
            if request.mm_processor_kwargs:
                prompt["mm_processor_kwargs"] = request.mm_processor_kwargs
        sampling = self._build_sampling(request)
        modalities = request.modalities or ["text"]
        request_id = f"chatcmpl-{uuid.uuid4().hex[:24]}"
        output_modality = "text" if modalities == ["text"] else None

        # n>1 = parallel sampling (reference serving_chat.py:630-687
        # iterates final_res.outputs): fan out n engine requests that
        # continuous-batch together; explicit seeds shift per index
        n = max(1, int(request.n or 1))
        results = await asyncio.gather(*[
            self._generate_choice(
                request, prompt, sampling,
                request_id if n == 1 else f"{request_id}-{i}",
                output_modality, i)
            for i in range(n)
        ])
        usage = UsageInfo()
        for _, u in results:
            usage.prompt_tokens = max(usage.prompt_tokens, u.prompt_tokens)
            usage.completion_tokens += u.completion_tokens
        usage.total_tokens = usage.prompt_tokens + usage.completion_tokens
        return ChatCompletionResponse(
            id=request_id,
            model=request.model or self.model_name,
            choices=[c for c, _ in results],
            usage=usage,
        )
