"""API-layer tests with mocked engines (parity: reference
tests/entrypoints/openai_api/* run CPU-only with mocked engines)."""

import asyncio
import base64
import io

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from vllm_omni_tpu.entrypoints.openai.api_server import build_app
from vllm_omni_tpu.outputs import (
    CompletionOutput,
    OmniRequestOutput,
    RequestOutput,
)


class FakeAsyncOmni:
    def __init__(self):
        self.last_sampling = None
        self.last_prompt = None

    async def generate(self, prompt, request_id=None, sampling_params=None,
                       output_modality=None, stream=False):
        self.last_sampling = sampling_params
        self.last_prompt = prompt
        ro = RequestOutput(
            request_id=request_id, prompt=None, prompt_token_ids=[1, 2, 3],
            outputs=[CompletionOutput(
                index=0, text="hello there", token_ids=[7, 8],
                finish_reason="stop")],
            finished=True,
        )
        yield OmniRequestOutput.from_stage(request_id, 0, "text", ro)
        if output_modality in (None, "audio"):
            wav_out = RequestOutput(
                request_id=request_id, prompt=None, prompt_token_ids=[],
                outputs=[CompletionOutput(
                    index=0, text="", token_ids=[], finish_reason="stop",
                    multimodal_output={
                        "waveform": np.sin(np.linspace(0, 20, 2400))})],
                finished=True,
            )
            yield OmniRequestOutput.from_stage(request_id, 2, "audio", wav_out)

    async def check_health(self):
        return None


class FakeDiffusion:
    def generate(self, prompts, **kwargs):
        from PIL import Image

        self.kwargs = kwargs
        img = Image.new("RGB", (kwargs.get("width", 64),
                                kwargs.get("height", 64)), (10, 20, 30))
        return [
            OmniRequestOutput.from_diffusion(str(i), [img], p)
            for i, p in enumerate(prompts)
        ]


def make_client(**kw):
    app = build_app(**kw)
    server = TestServer(app)
    return TestClient(server)


def run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


def test_health_and_models():
    async def go():
        async with make_client(engine_client=FakeAsyncOmni(),
                               model_name="test-omni") as c:
            r = await c.get("/health")
            assert r.status == 200
            r = await c.get("/v1/models")
            body = await r.json()
            assert body["data"][0]["id"] == "test-omni"

    run(go())


def test_chat_completion_text_and_audio():
    async def go():
        eng = FakeAsyncOmni()
        async with make_client(engine_client=eng) as c:
            r = await c.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hi"}],
                "temperature": 0.3,
                "max_tokens": 17,
                "modalities": ["text", "audio"],
                "stage_sampling_params": {"1": {"top_k": 5}},
            })
            assert r.status == 200, await r.text()
            body = await r.json()
            msg = body["choices"][0]["message"]
            assert msg["content"] == "hello there"
            assert "audio" in msg and msg["audio"]["data"]
            wav = base64.b64decode(msg["audio"]["data"])
            assert wav[:4] == b"RIFF"
            assert body["usage"]["completion_tokens"] == 2
            # sampling overrides surfaced per stage
            assert eng.last_sampling[0].temperature == 0.3
            assert eng.last_sampling[0].max_tokens == 17
            assert eng.last_sampling[1].top_k == 5

    run(go())


def test_chat_stream_supported():
    # beyond-reference: stream=True now returns SSE (the reference
    # rejects it; full streaming behavior covered in test_streaming.py)
    async def go():
        async with make_client(engine_client=FakeAsyncOmni()) as c:
            r = await c.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hi"}],
                "stream": True,
            })
            assert r.status == 200
            assert r.headers["Content-Type"].startswith("text/event-stream")
            body = await r.text()
            assert body.rstrip().endswith("data: [DONE]")

    run(go())


def test_speech_endpoint_wav_and_pcm():
    async def go():
        async with make_client(engine_client=FakeAsyncOmni()) as c:
            r = await c.post("/v1/audio/speech", json={"input": "say hi"})
            assert r.status == 200
            assert (await r.read())[:4] == b"RIFF"
            r = await c.post("/v1/audio/speech", json={
                "input": "say hi", "response_format": "pcm"})
            body = await r.read()
            assert len(body) == 2400 * 2  # 16-bit PCM

    run(go())


def test_image_generation_and_validation():
    async def go():
        eng = FakeDiffusion()
        async with make_client(diffusion_engine=eng) as c:
            r = await c.post("/v1/images/generations", json={
                "prompt": "a cat", "size": "64x64", "n": 2,
                "num_inference_steps": 4, "seed": 3,
            })
            assert r.status == 200, await r.text()
            body = await r.json()
            assert len(body["data"]) == 2
            from PIL import Image

            img = Image.open(io.BytesIO(
                base64.b64decode(body["data"][0]["b64_json"])))
            assert img.size == (64, 64)
            assert eng.kwargs["num_inference_steps"] == 4
            # invalid size rejected
            r = await c.post("/v1/images/generations", json={
                "prompt": "x", "size": "63x63"})
            assert r.status == 400
            # chat against a diffusion-only deployment generates an
            # image from the last user message's text + input images
            # (reference serving_chat.py:1012)
            buf = io.BytesIO()
            from PIL import Image as PILImage

            PILImage.new("RGB", (8, 8), (1, 2, 3)).save(buf, format="PNG")
            b64 = base64.b64encode(buf.getvalue()).decode()
            r = await c.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": [
                    {"type": "text", "text": "make it sunny"},
                    {"type": "image_url",
                     "image_url": {"url": f"data:image/png;base64,{b64}"}},
                ]}], "seed": 5,
                "extra_body": {"size": "32x48", "num_inference_steps": 3,
                               "negative_prompt": "blurry"}})
            assert r.status == 200, await r.text()
            body = await r.json()
            msg = body["choices"][0]["message"]
            img = Image.open(io.BytesIO(base64.b64decode(msg["images"][0])))
            assert img.size == (32, 48)
            assert eng.kwargs["seed"] == 5
            assert eng.kwargs["image"].size == (8, 8)  # edit input
            # extra_body generation params reach the engine (reference
            # serving_chat.py:1048-1074)
            assert (eng.kwargs["width"], eng.kwargs["height"]) == (32, 48)
            assert eng.kwargs["num_inference_steps"] == 3
            assert eng.kwargs["negative_prompt"] == "blurry"
            # no text prompt -> 400
            r = await c.post("/v1/chat/completions", json={
                "messages": [{"role": "assistant", "content": "hi"}]})
            assert r.status == 400

    run(go())


def test_multimodal_content_parsing():
    from vllm_omni_tpu.entrypoints.openai.protocol import ChatCompletionRequest
    from vllm_omni_tpu.entrypoints.openai.serving_chat import parse_chat_content
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (8, 8)).save(buf, format="PNG")
    img_b64 = base64.b64encode(buf.getvalue()).decode()
    wav = (np.sin(np.linspace(0, 10, 1600)) * 32000).astype("<i2").tobytes()
    req = ChatCompletionRequest(messages=[
        {"role": "user", "content": [
            {"type": "text", "text": "look: "},
            {"type": "image_url",
             "image_url": {"url": f"data:image/png;base64,{img_b64}"}},
            {"type": "input_audio",
             "input_audio": {"data": base64.b64encode(wav).decode()}},
        ]},
    ])
    msgs, mm = parse_chat_content(req.messages)
    assert len(mm["image"]) == 1 and mm["image"][0].size == (8, 8)
    assert len(mm["audio"]) == 1 and len(mm["audio"][0]) == 1600
    assert "<|IMAGE|>" in msgs[0]["content"]
    assert "<|AUDIO|>" in msgs[0]["content"]
