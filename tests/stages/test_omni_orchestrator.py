"""Orchestrator tests with fake engines (reference test strategy:
tests/entrypoints/test_omni_llm.py fake-engine substitution, SURVEY.md §4).
"""

import asyncio
import time

import pytest

from vllm_omni_tpu.config.engine import EngineArgs
from vllm_omni_tpu.config.stage import StageConfig, StageRuntimeConfig
from vllm_omni_tpu.outputs import (
    CompletionOutput,
    OmniRequestOutput,
    RequestOutput,
)
from vllm_omni_tpu.sampling_params import SamplingParams
from vllm_omni_tpu.stages.omni import Omni
from vllm_omni_tpu.stages.async_omni import AsyncOmni


class FakeLLMEngine:
    """Echoes prompt tokens + stage-tagged suffix; records sampling params."""

    def __init__(self, stage_id):
        self.stage_id = stage_id
        self.calls = []

    def generate(self, prompts, sampling_params):
        self.calls.append((prompts, sampling_params))
        outs = []
        for p, sp in zip(prompts, sampling_params):
            ids = list(p["prompt_token_ids"]) if isinstance(p, dict) else [0]
            new = [self.stage_id * 100 + i for i in range(sp.max_tokens or 2)]
            outs.append(RequestOutput(
                request_id="x", prompt=None, prompt_token_ids=ids,
                outputs=[CompletionOutput(
                    index=0, text=f"s{self.stage_id}", token_ids=new,
                    finish_reason="stop")],
                finished=True,
            ))
        return outs


class FakeDiffusionEngine:
    def __init__(self, stage_id):
        self.stage_id = stage_id

    def step(self, requests):
        return [
            OmniRequestOutput.from_diffusion(
                request_id=r.request_id, images=["IMG"], prompt=str(r.prompt))
            for r in requests
        ]


def fake_factory(cfg: StageConfig):
    if cfg.stage_type == "diffusion":
        return FakeDiffusionEngine(cfg.stage_id)
    return FakeLLMEngine(cfg.stage_id)


def three_stage_configs():
    return [
        StageConfig(
            stage_id=0, stage_type="llm", engine_args=EngineArgs(model="a"),
            final_output=True, final_output_type="text",
            default_sampling_params={"max_tokens": 3},
        ),
        StageConfig(
            stage_id=1, stage_type="llm", engine_args=EngineArgs(model="b"),
            engine_input_source=[0],
            default_sampling_params={"max_tokens": 2},
        ),
        StageConfig(
            stage_id=2, stage_type="llm", engine_args=EngineArgs(model="c"),
            engine_input_source=[1], final_output=True,
            final_output_type="audio",
            default_sampling_params={"max_tokens": 2},
        ),
    ]


def test_three_stage_pipeline_flow():
    with Omni(stage_configs=three_stage_configs(),
              engine_factory=fake_factory) as omni:
        outs = omni.generate({"prompt_token_ids": [1, 2, 3]})
        # two final stages -> two outputs
        assert len(outs) == 2
        by_stage = {o.stage_id: o for o in outs}
        assert set(by_stage) == {0, 2}
        assert by_stage[0].final_output_type == "text"
        assert by_stage[2].final_output_type == "audio"
        # stage 1 consumed stage 0's tokens [0,1,2] (0*100+i)
        s1 = omni.stages[1].engine.calls[0][0][0]
        assert s1 == {"prompt_token_ids": [0, 1, 2]}
        # stage 2 consumed stage 1's tokens [100, 101]
        s2 = omni.stages[2].engine.calls[0][0][0]
        assert s2 == {"prompt_token_ids": [100, 101]}


def test_modality_early_exit():
    with Omni(stage_configs=three_stage_configs(),
              engine_factory=fake_factory) as omni:
        outs = omni.generate(
            {"prompt_token_ids": [5]}, output_modality="text")
        assert len(outs) == 1
        assert outs[0].stage_id == 0
        # downstream stages may or may not run; output returns immediately


def test_per_stage_sampling_overrides():
    with Omni(stage_configs=three_stage_configs(),
              engine_factory=fake_factory) as omni:
        sp = {0: SamplingParams(max_tokens=5, detokenize=False)}
        omni.generate({"prompt_token_ids": [1]}, sp)
        used = omni.stages[0].engine.calls[0][1][0]
        assert used.max_tokens == 5
        # stage 1 used stage defaults
        used1 = omni.stages[1].engine.calls[0][1][0]
        assert used1.max_tokens == 2


def test_diffusion_stage_and_custom_edge():
    cfgs = [
        StageConfig(
            stage_id=0, stage_type="llm", engine_args=EngineArgs(model="a"),
            default_sampling_params={"max_tokens": 2},
        ),
        StageConfig(
            stage_id=1, stage_type="diffusion",
            engine_args=EngineArgs(model="d"),
            engine_input_source=[0], final_output=True,
            final_output_type="image",
            custom_process_input_func=
            "tests.stages.test_omni_orchestrator._tokens_to_prompt",
        ),
    ]
    with Omni(stage_configs=cfgs, engine_factory=fake_factory) as omni:
        outs = omni.generate({"prompt_token_ids": [9]})
        assert len(outs) == 1
        assert outs[0].images == ["IMG"]
        assert "tokens:" in outs[0].prompt


def _tokens_to_prompt(stage, upstream, original_prompt):
    assert stage.config.stage_id == 1  # processors get the stage itself
    toks = upstream[0].outputs[0].token_ids
    return {"prompt": f"tokens:{toks}"}


def test_error_propagation():
    class BoomEngine:
        def generate(self, prompts, sps):
            raise RuntimeError("boom")

    cfgs = [StageConfig(
        stage_id=0, engine_args=EngineArgs(model="a"), final_output=True)]
    with Omni(stage_configs=cfgs, engine_factory=lambda c: BoomEngine()) as omni:
        outs = omni.generate({"prompt_token_ids": [1]})
        assert len(outs) == 1
        assert "boom" in outs[0].error


def test_batching_multiple_requests():
    cfgs = three_stage_configs()
    cfgs[0].runtime = StageRuntimeConfig(max_batch_size=4, batch_timeout=0.05)
    with Omni(stage_configs=cfgs, engine_factory=fake_factory) as omni:
        outs = omni.generate(
            [{"prompt_token_ids": [i]} for i in range(4)])
        assert len(outs) == 8  # 4 requests x 2 final stages


def test_async_omni_streams_finals():
    async def run():
        omni = AsyncOmni(stage_configs=three_stage_configs(),
                         engine_factory=fake_factory)
        try:
            got = []
            async for out in omni.generate({"prompt_token_ids": [1, 2]}):
                got.append(out)
            assert {o.stage_id for o in got} == {0, 2}
            # second concurrent request set
            results = await asyncio.gather(*[
                _collect(omni.generate({"prompt_token_ids": [i]}))
                for i in range(3)
            ])
            for r in results:
                assert {o.stage_id for o in r} == {0, 2}
        finally:
            omni.shutdown()

    async def _collect(agen):
        return [o async for o in agen]

    asyncio.run(run())


def test_async_omni_error():
    class BoomEngine:
        def generate(self, prompts, sps):
            raise RuntimeError("kaboom")

    async def run():
        omni = AsyncOmni(
            stage_configs=[StageConfig(
                stage_id=0, engine_args=EngineArgs(model="a"),
                final_output=True)],
            engine_factory=lambda c: BoomEngine(),
        )
        try:
            with pytest.raises(RuntimeError, match="kaboom"):
                async for _ in omni.generate({"prompt_token_ids": [1]}):
                    pass
        finally:
            omni.shutdown()

    asyncio.run(run())
