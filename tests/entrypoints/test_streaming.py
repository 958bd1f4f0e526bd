"""HTTP streaming (SSE chat + chunked audio) — beyond-reference: the
reference rejects streaming outright (reference entrypoints/openai/
serving_chat.py:268-269, serving_speech.py:29-31); SURVEY §7 targets
chunked codec decode → true streaming as a TPU-build north star.
"""

import asyncio
import base64
import json

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from vllm_omni_tpu.entrypoints.openai.api_server import build_app
from vllm_omni_tpu.outputs import (
    CompletionOutput,
    OmniRequestOutput,
    RequestOutput,
)


def _text_out(request_id, text, finished, tokens):
    return OmniRequestOutput(
        request_id=request_id, stage_id=0, final_output_type="text",
        request_output=RequestOutput(
            request_id=request_id, prompt=None, prompt_token_ids=[1, 2],
            outputs=[CompletionOutput(
                index=0, text=text, token_ids=tokens,
                finish_reason="stop" if finished else None)],
            finished=finished),
        partial=not finished,
    )


def _audio_out(request_id, chunk, full=None, finished=False):
    mm = {"waveform_chunk": chunk}
    if full is not None:
        mm["waveform"] = full
    return OmniRequestOutput(
        request_id=request_id, stage_id=2, final_output_type="audio",
        request_output=RequestOutput(
            request_id=request_id, prompt=None, prompt_token_ids=[],
            outputs=[CompletionOutput(
                index=0, text="", token_ids=[],
                finish_reason="stop" if finished else None,
                multimodal_output=mm)],
            finished=finished),
        partial=not finished,
    )


class FakeStreamingOmni:
    def __init__(self):
        self.chunks = [np.full(100, 0.1, np.float32),
                       np.full(100, -0.2, np.float32),
                       np.full(50, 0.3, np.float32)]

    async def generate(self, prompt, request_id=None, sampling_params=None,
                       output_modality=None, stream=False):
        assert stream
        if output_modality == "audio":
            for i, c in enumerate(self.chunks):
                last = i == len(self.chunks) - 1
                yield _audio_out(
                    request_id, c,
                    full=np.concatenate(self.chunks) if last else None,
                    finished=last)
            return
        yield _text_out(request_id, "Hel", False, [7])
        yield _text_out(request_id, "Hello wor", False, [7, 8])
        yield _text_out(request_id, "Hello world", True, [7, 8, 9])

    async def check_health(self):
        return None


def _client(app):
    return TestClient(TestServer(app))


def test_sse_chat_streaming():
    async def run():
        app = build_app(engine_client=FakeStreamingOmni(),
                        model_name="omni-test")
        async with _client(app) as client:
            resp = await client.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hi"}],
                "stream": True,
            })
            assert resp.status == 200
            assert resp.headers["Content-Type"].startswith(
                "text/event-stream")
            body = await resp.text()
        events = [line[len("data: "):] for line in body.splitlines()
                  if line.startswith("data: ")]
        assert events[-1] == "[DONE]"
        chunks = [json.loads(e) for e in events[:-1]]
        assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
        text = "".join(c["choices"][0]["delta"].get("content", "")
                       for c in chunks)
        assert text == "Hello world"
        assert chunks[-1]["choices"][0]["finish_reason"] == "stop"
        assert all(c["object"] == "chat.completion.chunk" for c in chunks)

    asyncio.run(run())


def test_chunked_speech_streaming_pcm_and_wav():
    async def run():
        fake = FakeStreamingOmni()
        app = build_app(engine_client=fake, model_name="omni-test")
        async with _client(app) as client:
            resp = await client.post("/v1/audio/speech", json={
                "input": "say hi", "stream": True,
                "response_format": "pcm",
            })
            assert resp.status == 200
            assert resp.headers["Content-Type"].startswith("audio/pcm")
            body = await resp.read()
            # exactly the concatenated chunks as PCM16 (each chunk written
            # once: partials carry chunks, the final carries the LAST chunk)
            expected = np.clip(np.concatenate(fake.chunks), -1, 1)
            got = np.frombuffer(body, "<i2").astype(np.float32) / 32767.0
            assert got.shape == expected.shape
            np.testing.assert_allclose(got, expected, atol=1e-3)

            resp = await client.post("/v1/audio/speech", json={
                "input": "say hi", "stream": True,
                "response_format": "wav",
            })
            body = await resp.read()
            assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
            pcm = np.frombuffer(body[44:], "<i2")
            assert pcm.shape[0] == 250

    asyncio.run(run())


def test_code2wav_stream_chunks_match_full_decode():
    from vllm_omni_tpu.models.qwen3_omni.code2wav_engine import Code2WavEngine

    cfg = {"code2wav_config": {
        "hidden_size": 32, "num_quantizers": 2, "codebook_size": 64,
        "num_hidden_layers": 1, "upsample_rates": [2, 2],
        "upsampling_ratios": [2, 2], "decoder_dim": 32,
    }}
    eng = Code2WavEngine(cfg, load_weights=False, chunked=True,
                         chunk_size=5, left_context=2)
    rng = np.random.default_rng(0)
    nq = eng.model.cfg.num_quantizers
    codes = rng.integers(0, 8, nq * 12).tolist()
    full = eng.generate([{"prompt_token_ids": codes}], None)[0]
    full_wav = np.asarray(full.outputs[0].multimodal_output["waveform"])
    parts = []
    n_partials = 0
    for out in eng.generate_stream({"prompt_token_ids": codes}):
        parts.append(np.asarray(
            out.outputs[0].multimodal_output["waveform_chunk"]))
        if not out.finished:
            n_partials += 1
        else:
            final_full = np.asarray(
                out.outputs[0].multimodal_output["waveform"])
    assert n_partials >= 1
    np.testing.assert_allclose(np.concatenate(parts), full_wav, atol=1e-5)
    np.testing.assert_allclose(final_full, full_wav, atol=1e-5)


def test_e2e_llm_stage_streaming():
    """Real LLM stage: partial outputs arrive before the final one."""
    from vllm_omni_tpu.config.engine import EngineArgs
    from vllm_omni_tpu.config.stage import StageConfig
    from vllm_omni_tpu.stages.async_omni import AsyncOmni

    tiny = {
        "architectures": ["Qwen2ForCausalLM"], "hidden_size": 64,
        "num_hidden_layers": 2, "num_attention_heads": 2,
        "num_key_value_heads": 2, "vocab_size": 128,
        "max_position_embeddings": 128, "intermediate_size": 128,
        "eos_token_id": 127,
    }
    cfg = StageConfig(
        stage_id=0, stage_type="llm",
        engine_args=EngineArgs(
            model="tiny", hf_config=tiny, dtype="float32",
            max_num_seqs=2, max_num_batched_tokens=64, block_size=8,
            num_kv_cache_blocks=32, load_format="random"),
        final_output=True, final_output_type="text",
        default_sampling_params={
            "temperature": 0.0, "max_tokens": 6, "ignore_eos": True,
            "detokenize": False},
    )

    async def run():
        omni = AsyncOmni(stage_configs=[cfg])
        try:
            partials, finals = [], []
            async for out in omni.generate(
                    {"prompt_token_ids": [3, 4, 5]}, stream=True):
                (partials if out.partial else finals).append(out)
            assert len(finals) == 1
            assert len(partials) >= 2  # per-step emission
            final_toks = finals[0].request_output.outputs[0].token_ids
            assert len(final_toks) == 6
            # partials grow monotonically and prefix the final tokens
            lens = [len(p.request_output.outputs[0].token_ids)
                    for p in partials]
            assert lens == sorted(lens)
            for p in partials:
                pt = p.request_output.outputs[0].token_ids
                assert final_toks[:len(pt)] == pt
            # non-streaming call still works on the same pipeline
            outs = [o async for o in omni.generate(
                {"prompt_token_ids": [3, 4, 5]})]
            assert len(outs) == 1 and not outs[0].partial
            toks = outs[0].request_output.outputs[0].token_ids
            assert toks == final_toks
        finally:
            omni.shutdown()

    asyncio.run(run())


def test_client_disconnect_aborts_generation():
    """Breaking out of a streaming generate (client disconnect) stops the
    stage engine instead of burning the rest of max_tokens."""
    import time

    from vllm_omni_tpu.config.engine import EngineArgs
    from vllm_omni_tpu.config.stage import StageConfig
    from vllm_omni_tpu.stages.async_omni import AsyncOmni

    tiny = {
        "architectures": ["Qwen2ForCausalLM"], "hidden_size": 64,
        "num_hidden_layers": 2, "num_attention_heads": 2,
        "num_key_value_heads": 2, "vocab_size": 128,
        "max_position_embeddings": 2048, "intermediate_size": 128,
        "eos_token_id": 127,
    }
    cfg = StageConfig(
        stage_id=0, stage_type="llm",
        engine_args=EngineArgs(
            model="tiny", hf_config=tiny, dtype="float32",
            max_num_seqs=2, max_num_batched_tokens=64, block_size=8,
            num_kv_cache_blocks=128, load_format="random",
            max_model_len=2048),
        final_output=True, final_output_type="text",
        default_sampling_params={
            "temperature": 0.0, "max_tokens": 1000, "ignore_eos": True,
            "detokenize": False},
    )

    async def run():
        omni = AsyncOmni(stage_configs=[cfg])
        try:
            agen = omni.generate({"prompt_token_ids": [3, 4, 5]},
                                 stream=True)
            seen = 0
            async for out in agen:
                seen += 1
                if seen >= 3:
                    break  # simulate client disconnect
            await agen.aclose()
            stage = omni.stages[0]
            deadline = time.monotonic() + 30
            while time.monotonic() < deadline:
                if not stage.engine.core.has_unfinished():
                    break
                await asyncio.sleep(0.1)
            assert not stage.engine.core.has_unfinished(), (
                "engine still generating after client went away")
        finally:
            omni.shutdown()

    asyncio.run(run())
