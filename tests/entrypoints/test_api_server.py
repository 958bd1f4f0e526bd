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


class FakeAsyncOmniN:
    """Per-request-distinct fake: records every call's sampling params
    and emits text/logprobs keyed by request id (n>1 + logprobs
    parity: reference serving_chat.py:630-687)."""

    def __init__(self):
        self.calls = []

    async def generate(self, prompt, request_id=None, sampling_params=None,
                       output_modality=None, stream=False):
        self.calls.append((request_id, sampling_params))
        ro = RequestOutput(
            request_id=request_id, prompt=None, prompt_token_ids=[1, 2, 3],
            outputs=[CompletionOutput(
                index=0, text=f"resp-{request_id}", token_ids=[7, 8],
                logprobs=[{7: -0.1, 9: -2.0}, {8: -0.3, 4: -1.5}],
                finish_reason="stop")],
            finished=True,
        )
        yield OmniRequestOutput.from_stage(request_id, 0, "text", ro)

    async def check_health(self):
        return None


def test_chat_n_choices_with_shifted_seeds():
    async def go():
        eng = FakeAsyncOmniN()
        async with make_client(engine_client=eng) as c:
            r = await c.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hi"}],
                "n": 3, "seed": 7, "max_tokens": 4,
                "modalities": ["text"],
            })
            assert r.status == 200, await r.text()
            body = await r.json()
            choices = body["choices"]
            assert [ch["index"] for ch in choices] == [0, 1, 2]
            texts = {ch["message"]["content"] for ch in choices}
            assert len(texts) == 3  # per-index sub-requests, all distinct
            # explicit seed shifts per choice index: 7, 8, 9
            seeds = sorted(sp[0].seed for _, sp in eng.calls)
            assert seeds == [7, 8, 9]
            # usage sums completion tokens over choices
            assert body["usage"]["completion_tokens"] == 6

    run(go())


def test_chat_logprobs_response():
    async def go():
        eng = FakeAsyncOmniN()
        async with make_client(engine_client=eng) as c:
            r = await c.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hi"}],
                "logprobs": True, "top_logprobs": 2,
                "modalities": ["text"],
            })
            assert r.status == 200, await r.text()
            body = await r.json()
            lp = body["choices"][0]["logprobs"]
            assert lp is not None
            content = lp["content"]
            assert len(content) == 2
            assert content[0]["logprob"] == pytest.approx(-0.1)
            assert content[1]["logprob"] == pytest.approx(-0.3)
            assert len(content[0]["top_logprobs"]) == 2
            tops = [t["logprob"] for t in content[0]["top_logprobs"]]
            assert tops == sorted(tops, reverse=True)
            assert isinstance(content[0]["bytes"], list)
            # engine was asked for 2 top logprobs
            assert eng.calls[0][1][0].logprobs == 2

    run(go())


def test_chat_stream_n_choices_and_logprobs():
    import json as _json

    async def go():
        eng = FakeAsyncOmniN()
        async with make_client(engine_client=eng) as c:
            r = await c.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hi"}],
                "n": 2, "stream": True, "logprobs": True,
                "modalities": ["text"],
            })
            assert r.status == 200
            body = await r.text()
            lines = [ln[len("data: "):] for ln in body.splitlines()
                     if ln.startswith("data: ") and "[DONE]" not in ln]
            chunks = [_json.loads(ln) for ln in lines]
            idxs = {ch["choices"][0]["index"] for ch in chunks}
            assert idxs == {0, 1}
            # both choices finish
            finishes = [ch["choices"][0] for ch in chunks
                        if ch["choices"][0].get("finish_reason")]
            assert len(finishes) == 2
            # content chunks carry logprobs entries
            lp_chunks = [ch for ch in chunks
                         if ch["choices"][0].get("logprobs")]
            assert lp_chunks, "no streamed logprobs"
            ent = lp_chunks[0]["choices"][0]["logprobs"]["content"][0]
            assert "logprob" in ent and "token" in ent
            assert body.rstrip().endswith("data: [DONE]")

    run(go())


class FakeAsyncOmniText:
    """Engine whose final text is configurable — for parser tests."""

    def __init__(self, text):
        self.text = text
        self.last_sampling = None

    async def generate(self, prompt, request_id=None, sampling_params=None,
                       output_modality=None, stream=False):
        self.last_sampling = sampling_params
        ro = RequestOutput(
            request_id=request_id, prompt=None, prompt_token_ids=[1, 2],
            outputs=[CompletionOutput(
                index=0, text=self.text, token_ids=[7, 8],
                finish_reason="stop")],
            finished=True,
        )
        yield OmniRequestOutput.from_stage(request_id, 0, "text", ro)

    async def check_health(self):
        return None


WEATHER_TOOL = {
    "type": "function",
    "function": {
        "name": "get_weather",
        "description": "Get weather",
        "parameters": {"type": "object",
                       "properties": {"city": {"type": "string"}},
                       "required": ["city"]},
    },
}


def test_chat_tool_call_auto_extraction():
    """Hermes-format <tool_call> blocks -> tool_calls choices +
    reasoning_content split (reference serving_chat.py:617-760)."""
    async def go():
        text = ("<think>user wants weather</think>Checking.\n"
                '<tool_call>{"name": "get_weather", '
                '"arguments": {"city": "Paris"}}</tool_call>')
        eng = FakeAsyncOmniText(text)
        async with make_client(engine_client=eng) as c:
            r = await c.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "weather?"}],
                "tools": [WEATHER_TOOL], "modalities": ["text"],
            })
            assert r.status == 200, await r.text()
            body = await r.json()
            ch = body["choices"][0]
            assert ch["finish_reason"] == "tool_calls"
            msg = ch["message"]
            assert msg["reasoning_content"] == "user wants weather"
            assert msg["content"] == "Checking."
            tc = msg["tool_calls"][0]
            assert tc["type"] == "function"
            assert tc["function"]["name"] == "get_weather"
            import json as _json

            assert _json.loads(tc["function"]["arguments"]) == {
                "city": "Paris"}
            assert tc["id"].startswith("chatcmpl-tool-")

    run(go())


def test_chat_tool_call_named_choice_schema_constrained():
    """Named tool_choice: whole content becomes the arguments and the
    engine is grammar-constrained to the tool's parameter schema."""
    async def go():
        eng = FakeAsyncOmniText('{"city": "Tokyo"}')
        async with make_client(engine_client=eng) as c:
            r = await c.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "weather?"}],
                "tools": [WEATHER_TOOL],
                "tool_choice": {"type": "function",
                                "function": {"name": "get_weather"}},
                "modalities": ["text"],
            })
            assert r.status == 200, await r.text()
            body = await r.json()
            ch = body["choices"][0]
            assert ch["finish_reason"] == "tool_calls"
            msg = ch["message"]
            assert msg["content"] is None
            assert msg["tool_calls"][0]["function"]["arguments"] == (
                '{"city": "Tokyo"}')
            # decoding was constrained to the tool's parameters schema
            so = eng.last_sampling[0].structured_outputs
            assert so == {"json": WEATHER_TOOL["function"]["parameters"]}

    run(go())


def test_chat_no_tools_passthrough_and_reasoning():
    """Without tools, <tool_call> text passes through untouched but
    reasoning is still split; include_reasoning=false drops it."""
    async def go():
        text = "<think>hmm</think>plain answer"
        eng = FakeAsyncOmniText(text)
        async with make_client(engine_client=eng) as c:
            r = await c.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hi"}],
                "modalities": ["text"],
            })
            body = await r.json()
            msg = body["choices"][0]["message"]
            assert msg["content"] == "plain answer"
            assert msg["reasoning_content"] == "hmm"
            r = await c.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hi"}],
                "modalities": ["text"], "include_reasoning": False,
            })
            body = await r.json()
            msg = body["choices"][0]["message"]
            assert msg["content"] == "plain answer"
            assert "reasoning_content" not in msg

    run(go())
