"""OpenAI-compatible HTTP server (aiohttp).

Parity: the reference's FastAPI app surface (reference entrypoints/openai/
api_server.py:64-681): /v1/chat/completions, /v1/audio/speech,
/v1/images/generations, /v1/models, /health; pure-diffusion mode detection
(:253-295) — built on aiohttp because fastapi/uvicorn are not in this
image.
"""

from __future__ import annotations

import base64
import io
import uuid
from typing import Any, Optional

from aiohttp import web
from pydantic import ValidationError

from vllm_omni_tpu.entrypoints.audio_utils import (
    waveform_to_pcm_bytes,
    waveform_to_wav_bytes,
)
from vllm_omni_tpu.entrypoints.openai.protocol import (
    ChatCompletionRequest,
    CreateSpeechRequest,
    ErrorResponse,
    ImageData,
    ImageGenerationRequest,
    ImageGenerationResponse,
    ModelCard,
    ModelList,
)
from vllm_omni_tpu.entrypoints.openai.serving_chat import OmniOpenAIServingChat
from vllm_omni_tpu.logger import init_logger

logger = init_logger(__name__)


def _json_error(message: str, status: int = 400) -> web.Response:
    return web.json_response(
        ErrorResponse.make(message, code=status).model_dump(), status=status
    )


def build_app(
    engine_client: Any = None,
    diffusion_engine: Any = None,
    model_name: str = "omni",
    tokenizer: Any = None,
) -> web.Application:
    """engine_client: AsyncOmni-like (chat/speech); diffusion_engine:
    OmniDiffusion-like (image generations). Pure-diffusion deployments pass
    only diffusion_engine (reference api_server.py:253-295)."""
    app = web.Application(client_max_size=256 * 1024 * 1024)
    serving_chat = (
        OmniOpenAIServingChat(engine_client, model_name, tokenizer)
        if engine_client is not None else None
    )

    async def health(request: web.Request) -> web.Response:
        if engine_client is not None and hasattr(engine_client, "check_health"):
            try:
                await engine_client.check_health()
            except Exception as e:
                return _json_error(f"unhealthy: {e}", 500)
        return web.json_response({"status": "ok"})

    async def models(request: web.Request) -> web.Response:
        return web.json_response(
            ModelList(data=[ModelCard(id=model_name)]).model_dump()
        )

    async def chat_completions(request: web.Request) -> web.Response:
        if serving_chat is None:
            if diffusion_engine is not None:
                # pure-diffusion chat: prompt (+ optional input images
                # for edit pipelines) -> generated image in the
                # assistant message (reference serving_chat.py:1012
                # _create_diffusion_chat_completion /
                # _extract_diffusion_prompt_and_images:1226)
                return await _diffusion_chat(request)
            return _json_error(
                "this deployment serves only /v1/images/generations", 400)
        try:
            req = ChatCompletionRequest(**await request.json())
        except (ValidationError, ValueError) as e:
            return _json_error(str(e))
        if req.stream:
            # SSE streaming (beyond-reference; reference rejects it,
            # serving_chat.py:268-269)
            resp = web.StreamResponse(headers={
                "Content-Type": "text/event-stream",
                "Cache-Control": "no-cache",
            })
            await resp.prepare(request)
            try:
                async for event in serving_chat.create_chat_completion_stream(
                        req):
                    await resp.write(event.encode())
            except Exception as e:
                import json as _json

                logger.exception("streaming chat completion failed")
                await resp.write(
                    ("data: " + _json.dumps({"error": str(e)}) + "\n\n"
                     ).encode())
            await resp.write_eof()
            return resp
        try:
            resp = await serving_chat.create_chat_completion(req)
        except ValueError as e:
            return _json_error(str(e))
        except Exception as e:  # pragma: no cover
            logger.exception("chat completion failed")
            return _json_error(str(e), 500)
        return web.json_response(resp.model_dump())

    async def audio_speech(request: web.Request) -> web.Response:
        # parity: /v1/audio/speech text -> full pipeline -> WAV/PCM
        # (reference serving_speech.py:16-120; no streaming :29-31)
        if engine_client is None:
            return _json_error("no omni engine configured", 400)
        try:
            req = CreateSpeechRequest(**await request.json())
        except (ValidationError, ValueError) as e:
            return _json_error(str(e))
        if req.stream:
            # chunked-transfer audio: PCM16 chunks flushed as the codec
            # decodes them — time-to-first-audio is one chunk's decode.
            # WAV streams get a max-length RIFF header up front (players
            # treat 0xFFFFFFFF as "until EOF").
            import numpy as np

            resp = web.StreamResponse(headers={
                "Content-Type": ("audio/pcm" if req.response_format == "pcm"
                                 else "audio/wav"),
                "Cache-Control": "no-cache",
            })
            resp.enable_chunked_encoding()
            await resp.prepare(request)
            if req.response_format == "wav":
                import struct

                hdr = (b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE"
                       + b"fmt " + struct.pack(
                           "<IHHIIHH", 16, 1, 1, req.sample_rate,
                           req.sample_rate * 2, 2, 16)
                       + b"data" + struct.pack("<I", 0xFFFFFFFF))
                await resp.write(hdr)
            async for out in engine_client.generate(
                {"prompt": req.input},
                request_id=f"speech-{uuid.uuid4().hex[:16]}",
                output_modality="audio", stream=True,
            ):
                ro = out.request_output
                if ro is None or not ro.outputs[0].multimodal_output:
                    continue
                mm = ro.outputs[0].multimodal_output
                chunk = mm.get("waveform_chunk")
                if chunk is None and not out.partial:
                    # non-streaming final stage: emit the whole waveform
                    chunk = mm.get("waveform")
                    if chunk is None:
                        chunk = mm.get("audio")
                if chunk is not None:
                    await resp.write(
                        waveform_to_pcm_bytes(np.asarray(chunk)))
            await resp.write_eof()
            return resp
        waveform = None
        async for out in engine_client.generate(
            {"prompt": req.input}, request_id=f"speech-{uuid.uuid4().hex[:16]}",
            output_modality="audio",
        ):
            ro = out.request_output
            if ro is not None and ro.outputs[0].multimodal_output:
                mm = ro.outputs[0].multimodal_output
                waveform = mm.get("waveform")
                if waveform is None:
                    waveform = mm.get("audio")
        if waveform is None:
            return _json_error("pipeline produced no audio", 500)
        import numpy as np

        wav = np.asarray(waveform)
        if req.response_format == "pcm":
            body = waveform_to_pcm_bytes(wav)
            ctype = "audio/pcm"
        else:
            body = waveform_to_wav_bytes(wav, req.sample_rate, req.speed)
            ctype = "audio/wav"
        return web.Response(body=body, content_type=ctype)

    async def _diffusion_chat(request: web.Request) -> web.Response:
        from vllm_omni_tpu.entrypoints.openai.protocol import (
            ChatCompletionChoice,
            ChatCompletionResponse,
            UsageInfo,
        )
        from vllm_omni_tpu.entrypoints.openai.serving_chat import _load_image

        try:
            req = ChatCompletionRequest(**await request.json())
        except (ValidationError, ValueError) as e:
            return _json_error(str(e))
        if req.stream:
            return _json_error(
                "stream=true is not supported for diffusion chat", 400)
        # prompt = text parts of the LAST user message; image parts
        # become edit-pipeline inputs (OmniDiffusionRequest.image)
        texts: list[str] = []
        images: list[Any] = []
        for msg in req.messages:
            if msg.role != "user":
                continue
            texts, images = [], []
            content = msg.content
            if isinstance(content, str):
                texts.append(content)
                continue
            for part in content or []:
                ptype = part.get("type")
                if ptype == "text":
                    texts.append(part.get("text", ""))
                elif ptype in ("image_url", "image"):
                    url = (part.get("image_url") or {}).get(
                        "url", part.get("image"))
                    images.append(_load_image(url))
        prompt = " ".join(t for t in texts if t)
        if not prompt:
            return _json_error("no text prompt in messages", 400)
        kwargs: dict[str, Any] = {}
        if req.seed is not None:
            kwargs["seed"] = req.seed
        if images:
            kwargs["image"] = images if len(images) > 1 else images[0]
        # generation params via extra_body (reference
        # serving_chat.py:1048-1074: size/height/width,
        # num_inference_steps, guidance knobs, negative_prompt, video
        # frame params); "size" is the "WxH" string form
        extra = req.extra_body or {}
        size = extra.get("size")
        if isinstance(size, str) and "x" in size.lower():
            try:
                w, h = size.lower().split("x")
                kwargs["width"], kwargs["height"] = int(w), int(h)
            except ValueError:
                return _json_error(f"invalid size: {size!r}", 400)
        for key in ("height", "width", "num_inference_steps",
                    "guidance_scale", "true_cfg_scale", "seed",
                    "negative_prompt", "num_frames", "guidance_scale_2"):
            if extra.get(key) is not None:
                kwargs[key] = extra[key]
        n = int(extra.get("num_outputs_per_prompt") or req.n)
        import asyncio

        outs = await asyncio.get_running_loop().run_in_executor(
            None, lambda: diffusion_engine.generate(
                [prompt] * n, **kwargs))
        choices = []
        for i, o in enumerate(outs):
            if o.error:
                return _json_error(o.error, 500)
            b64 = []
            for img in o.images or []:
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                b64.append(base64.b64encode(buf.getvalue()).decode("ascii"))
            choices.append(ChatCompletionChoice(
                index=i,
                message={"role": "assistant", "content": None,
                         "images": b64},
                finish_reason="stop"))
        return web.json_response(ChatCompletionResponse(
            id=f"chatcmpl-{uuid.uuid4().hex[:24]}",
            model=req.model or model_name,
            choices=choices, usage=UsageInfo()).model_dump())

    async def image_generations(request: web.Request) -> web.Response:
        # parity: /v1/images/generations (reference api_server.py:534-681)
        if diffusion_engine is None:
            return _json_error("no diffusion engine configured", 400)
        try:
            req = ImageGenerationRequest(**await request.json())
        except (ValidationError, ValueError) as e:
            return _json_error(str(e))
        w, h = req.width_height
        kwargs: dict[str, Any] = {"height": h, "width": w}
        if req.num_inference_steps is not None:
            kwargs["num_inference_steps"] = req.num_inference_steps
        if req.true_cfg_scale is not None:
            kwargs["true_cfg_scale"] = req.true_cfg_scale
        if req.guidance_scale is not None:
            kwargs["guidance_scale"] = req.guidance_scale
        if req.seed is not None:
            kwargs["seed"] = req.seed
        if req.negative_prompt:
            kwargs["negative_prompt"] = req.negative_prompt
        import asyncio

        outs = await asyncio.get_running_loop().run_in_executor(
            None, lambda: diffusion_engine.generate(
                [req.prompt] * req.n, **kwargs)
        )
        data = []
        for o in outs:
            if o.error:
                return _json_error(o.error, 500)
            for img in o.images or []:
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                data.append(ImageData(
                    b64_json=base64.b64encode(buf.getvalue()).decode("ascii")))
        return web.json_response(ImageGenerationResponse(data=data).model_dump())

    app.router.add_get("/health", health)
    app.router.add_get("/v1/models", models)
    app.router.add_post("/v1/chat/completions", chat_completions)
    app.router.add_post("/v1/audio/speech", audio_speech)
    app.router.add_post("/v1/images/generations", image_generations)
    return app


def run_server(
    host: str = "0.0.0.0",
    port: int = 8000,
    **build_kwargs,
) -> None:
    app = build_app(**build_kwargs)
    logger.info("serving on %s:%d", host, port)
    web.run_app(app, host=host, port=port, print=None)
