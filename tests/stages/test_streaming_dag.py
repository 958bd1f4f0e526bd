"""Cross-stage incremental streaming (stages/streaming.py).

The Qwen3-Omni DAG with stream_input_processors hands off thinker ->
talker -> code2wav INCREMENTALLY (talker starts after the thinker's
second step; code2wav decodes chunks as frames arrive) and must produce
BIT-IDENTICAL output to the completion-handoff pipeline — the talker
blocks until trailing[step] exists, so values and sampling state match
exactly; code2wav chunk boundaries match chunked_decode.

Beyond-reference: the reference only hands off on stage completion
(reference entrypoints/omni_stage.py:819), so its speech TTFT is bounded
below by full-thinker + full-talker latency.
"""

import asyncio

import numpy as np

from tests.stages.test_qwen3_omni_pipeline import (
    ASSISTANT,
    IM_START,
    SYSTEM,
    USER,
    _stage_cfgs,
)
from vllm_omni_tpu.stages.async_omni import AsyncOmni
from vllm_omni_tpu.stages.omni import Omni

PROMPT_IDS = (
    [IM_START, SYSTEM, 5, 6]
    + [IM_START, USER, 10, 11, 12]
    + [IM_START, ASSISTANT, 20]
)

STREAMING_PROCS = {
    1: ("vllm_omni_tpu.stages.input_processors.qwen3_omni_streaming."
        "Thinker2TalkerStreaming"),
    2: ("vllm_omni_tpu.stages.input_processors.qwen3_omni_streaming."
        "Talker2Code2WavStreaming"),
}


def _cfgs(streaming: bool):
    cfgs = _stage_cfgs()
    if streaming:
        for sid, path in STREAMING_PROCS.items():
            cfgs[sid].stream_input_processor = path
    return cfgs


def _run_batch():
    with Omni(stage_configs=_cfgs(False)) as omni:
        # same codec chunking as the streamed run so waveforms are
        # comparable bit-for-bit
        omni.stages[2].engine.chunk_size = 2
        omni.stages[2].engine.left_context = 1
        outs = omni.generate({"prompt_token_ids": PROMPT_IDS})
    by_stage = {o.stage_id: o for o in outs}
    assert not any(o.error for o in outs), [o.error for o in outs]
    text = list(by_stage[0].request_output.outputs[0].token_ids)
    wav = np.asarray(by_stage[2].request_output.outputs[0]
                     .multimodal_output["waveform"]).reshape(-1)
    return text, wav


def _run_streaming():
    async def run():
        omni = AsyncOmni(stage_configs=_cfgs(True))
        try:
            omni.stages[2].engine.chunk_size = 2
            omni.stages[2].engine.left_context = 1
            # spy: the talker must be driven by a live trailing feed
            talker = omni.stages[1].engine
            orig = talker.generate_stream
            feed_calls = []

            def spy(prompt, sp=None):
                feed_calls.append("trailing_feed" in prompt)
                return orig(prompt, sp)

            talker.generate_stream = spy
            partials, finals = [], []
            async for out in omni.generate(
                    {"prompt_token_ids": PROMPT_IDS}, stream=True):
                (partials if out.partial else finals).append(out)
            by_stage = {o.stage_id: o for o in finals}
            assert not any(o.error for o in finals), [
                o.error for o in finals]
            assert set(by_stage) == {0, 2}
            assert feed_calls == [True], feed_calls
            text = list(by_stage[0].request_output.outputs[0].token_ids)
            final_mm = by_stage[2].request_output.outputs[0].multimodal_output
            wav = np.asarray(final_mm["waveform"]).reshape(-1)
            chunks = [np.asarray(p.request_output.outputs[0]
                                 .multimodal_output["waveform_chunk"])
                      for p in partials if p.stage_id == 2]
            chunks.append(np.asarray(final_mm["waveform_chunk"]))
            return text, wav, chunks
        finally:
            omni.shutdown()

    return asyncio.run(run())


def test_streaming_dag_bit_exact_vs_completion_handoff():
    text_ref, wav_ref = _run_batch()
    text, wav, chunks = _run_streaming()
    assert text == text_ref
    # 3 talker frames at chunk_size 2 -> one mid-stream chunk + the tail
    assert len(chunks) >= 2
    np.testing.assert_array_equal(
        np.concatenate([c.reshape(-1) for c in chunks]), wav)
    np.testing.assert_array_equal(wav, wav_ref)


def test_streaming_dag_abort_unblocks_feeds():
    """Client disconnect mid-stream cancels the live feeds so the talker
    and code2wav threads do not block forever."""

    async def run():
        omni = AsyncOmni(stage_configs=_cfgs(True))
        try:
            omni.stages[2].engine.chunk_size = 2
            omni.stages[2].engine.left_context = 1
            gen = omni.generate({"prompt_token_ids": PROMPT_IDS},
                                stream=True)
            saw = 0
            async for out in gen:
                saw += 1
                if saw >= 2:
                    break  # generator close -> abort path
            await gen.aclose()
            # stages must drain back to idle: a fresh request completes
            outs = []
            async for out in omni.generate(
                    {"prompt_token_ids": PROMPT_IDS}, stream=False):
                outs.append(out)
            assert {o.stage_id for o in outs} == {0, 2}, [
                o.error for o in outs]
            assert not any(o.error for o in outs), [o.error for o in outs]
        finally:
            omni.shutdown()

    asyncio.run(run())
