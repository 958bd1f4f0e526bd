"""Online serving e2e with a REAL engine behind the HTTP app.

Parity: the reference's online-serving tier (reference
tests/e2e/online_serving/test_qwen3_omni.py — subprocess server + HTTP
client against real models); here the app runs in-process on a tiny
random-weight AR stage with a toy word-level tokenizer, covering the
full path: HTTP → chat template → AsyncOmni → engine → detokenize →
response (and SSE streaming deltas).
"""

import asyncio
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer

from vllm_omni_tpu.config.engine import EngineArgs
from vllm_omni_tpu.config.stage import StageConfig
from vllm_omni_tpu.entrypoints.openai.api_server import build_app
from vllm_omni_tpu.stages.async_omni import AsyncOmni

TINY = {
    "architectures": ["Qwen2ForCausalLM"],
    "hidden_size": 64,
    "num_hidden_layers": 2,
    "num_attention_heads": 2,
    "num_key_value_heads": 2,
    "vocab_size": 128,
    "max_position_embeddings": 128,
    "intermediate_size": 128,
    "eos_token_id": 127,
}


class ToyTokenizer:
    """Word-level codec: id = hash(word) % 100; decode -> t<id> words."""

    def apply_chat_template(self, messages, add_generation_prompt=True):
        words = " ".join(m["content"] for m in messages).split()
        return [abs(hash(w)) % 100 for w in words] or [1]

    def encode(self, text):
        return [abs(hash(w)) % 100 for w in text.split()] or [1]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"t{i}" for i in ids)


def _stage():
    return StageConfig(
        stage_id=0, stage_type="llm",
        engine_args=EngineArgs(
            model="tiny", hf_config=TINY, dtype="float32",
            max_num_seqs=2, max_num_batched_tokens=64, block_size=8,
            num_kv_cache_blocks=32, load_format="random"),
        final_output=True, final_output_type="text",
        default_sampling_params={
            "temperature": 0.0, "max_tokens": 5, "ignore_eos": True},
    )


def test_chat_over_http_with_real_engine():
    async def run():
        omni = AsyncOmni(stage_configs=[_stage()])
        try:
            # the stage engine needs the toy tokenizer for prompt encode
            omni.stages[0].engine.tokenizer = ToyTokenizer()
            app = build_app(engine_client=omni, model_name="tiny-omni",
                            tokenizer=ToyTokenizer())
            async with TestClient(TestServer(app)) as client:
                resp = await client.post("/v1/chat/completions", json={
                    "messages": [{"role": "user", "content": "hello there"}],
                })
                assert resp.status == 200, await resp.text()
                body = await resp.json()
                msg = body["choices"][0]["message"]
                assert msg["content"].startswith("t")  # detokenized toks
                assert body["usage"]["completion_tokens"] == 5
                assert body["choices"][0]["finish_reason"] == "length"

                # streaming against the same live engine
                resp = await client.post("/v1/chat/completions", json={
                    "messages": [{"role": "user", "content": "hello there"}],
                    "stream": True,
                })
                assert resp.status == 200
                text = await resp.text()
                events = [json.loads(line[6:]) for line in text.splitlines()
                          if line.startswith("data: ")
                          and line != "data: [DONE]"]
                deltas = "".join(e["choices"][0]["delta"].get("content", "")
                                 for e in events)
                assert deltas == msg["content"]  # same greedy text
                assert text.rstrip().endswith("data: [DONE]")
        finally:
            omni.shutdown()

    asyncio.run(run())
