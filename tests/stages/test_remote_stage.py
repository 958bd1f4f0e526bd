"""Multi-host story: a stage running in a SEPARATE PROCESS (stage host,
stages/remote.py) driven by the orchestrator over the socket protocol.

Parity role: the reference's Ray worker backend places stage workers on
other hosts (reference distributed/ray_utils/utils.py:28-169); here a
stage host is a plain process — two local processes stand in for two
hosts, the same way the reference's multi-GPU-single-host tests stand in
for multi-node (SURVEY §4).
"""

import json
import os
import subprocess
import sys
import time

import pytest

from vllm_omni_tpu.config.engine import EngineArgs
from vllm_omni_tpu.config.stage import StageConfig, StageRuntimeConfig
from vllm_omni_tpu.stages.omni import Omni

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
ENGINE_D = {
    "model": "tiny", "hf_config": TINY, "dtype": "float32",
    "max_num_seqs": 2, "max_num_batched_tokens": 64, "block_size": 8,
    "num_kv_cache_blocks": 32, "load_format": "random",
}
SP1 = {"temperature": 0.0, "max_tokens": 4, "ignore_eos": True,
       "detokenize": False}


def _stage0() -> StageConfig:
    return StageConfig(
        stage_id=0, stage_type="llm",
        engine_args=EngineArgs.from_dict(dict(ENGINE_D)),
        default_sampling_params=dict(SP1))


def _stage1_local() -> StageConfig:
    return StageConfig(
        stage_id=1, stage_type="llm",
        engine_args=EngineArgs.from_dict(dict(ENGINE_D)),
        engine_input_source=[0], final_output=True,
        final_output_type="text", default_sampling_params=dict(SP1))


@pytest.fixture
def stage_host(tmp_path):
    cfg = {
        "stage_id": 1, "stage_type": "llm",
        "engine_args": dict(ENGINE_D),
        "engine_input_source": [0], "final_output": True,
        "final_output_type": "text",
        "default_sampling_params": dict(SP1),
    }
    cfg_path = tmp_path / "stage1.json"
    cfg_path.write_text(json.dumps(cfg))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.Popen(
        [sys.executable, "-m", "vllm_omni_tpu.stages.remote",
         "--config", str(cfg_path), "--port", "0", "--host", "127.0.0.1",
         "--platform", "cpu"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, env=env,
        cwd="/root/repo", text=True,
    )
    port = None
    deadline = time.monotonic() + 240
    while time.monotonic() < deadline:
        line = proc.stdout.readline()
        if line.startswith("STAGE_READY"):
            port = int(line.split()[1])
            break
        if proc.poll() is not None:
            raise RuntimeError(f"stage host died rc={proc.returncode}")
    assert port is not None, "stage host never became ready"
    yield port
    proc.terminate()
    try:
        proc.wait(timeout=10)
    except subprocess.TimeoutExpired:
        proc.kill()


def test_two_process_pipeline_matches_local(stage_host):
    port = stage_host
    remote_cfgs = [
        _stage0(),
        StageConfig(
            stage_id=1, stage_type="llm",
            runtime=StageRuntimeConfig(remote=f"127.0.0.1:{port}"),
            engine_args=EngineArgs.from_dict(dict(ENGINE_D)),
            engine_input_source=[0], final_output=True,
            final_output_type="text",
            default_sampling_params=dict(SP1)),
    ]
    local = Omni(stage_configs=[_stage0(), _stage1_local()])
    try:
        ref = local.generate({"prompt_token_ids": [3, 4, 5]})
    finally:
        local.shutdown()
    assert len(ref) == 1
    ref_toks = ref[0].request_output.outputs[0].token_ids

    omni = Omni(stage_configs=remote_cfgs)
    try:
        outs = omni.generate([{"prompt_token_ids": [3, 4, 5]},
                              {"prompt_token_ids": [9, 9]}])
        assert len(outs) == 2
        got = outs[0].request_output.outputs[0].token_ids
        # both engines random-init with the same seed -> identical pipeline
        # results whether stage 1 runs in-process or on the stage host
        assert got == ref_toks
        assert len(outs[1].request_output.outputs[0].token_ids) == 4
    finally:
        omni.shutdown()


def test_remote_stage_streams_and_aborts(stage_host):
    """Streaming partials flow back over the socket, and an abort
    propagates to the stage-host process (review fix)."""
    import asyncio

    from vllm_omni_tpu.stages.async_omni import AsyncOmni

    port = stage_host
    cfgs = [
        _stage0(),
        StageConfig(
            stage_id=1, stage_type="llm",
            runtime=StageRuntimeConfig(remote=f"127.0.0.1:{port}"),
            engine_args=EngineArgs.from_dict(dict(ENGINE_D)),
            engine_input_source=[0], final_output=True,
            final_output_type="text",
            default_sampling_params=dict(SP1)),
    ]

    async def run():
        omni = AsyncOmni(stage_configs=cfgs)
        try:
            partials, finals = [], []
            async for out in omni.generate({"prompt_token_ids": [3, 4, 5]},
                                           stream=True):
                (partials if out.partial else finals).append(out)
            # remote final stage streamed per-step partials over the wire
            remote_partials = [p for p in partials if p.stage_id == 1]
            assert len(remote_partials) >= 2
            assert len(finals) == 1
            assert len(finals[0].request_output.outputs[0].token_ids) == 4

            # abort: break a long-running stream; the stage host must
            # return to idle instead of generating the rest
            import dataclasses

            agen = omni.generate(
                {"prompt_token_ids": [7, 8]},
                sampling_params={1: __import__(
                    "vllm_omni_tpu.sampling_params",
                    fromlist=["SamplingParams"]).SamplingParams(
                        temperature=0.0, max_tokens=500, ignore_eos=True,
                        detokenize=False)},
                stream=True)
            seen = 0
            async for out in agen:
                seen += 1
                if seen >= 3:
                    break
            await agen.aclose()  # -> abort message to the stage host
            # completion proof: a fresh request still finishes promptly
            # (the host would otherwise be busy with 500 tokens)
            outs = [o async for o in omni.generate(
                {"prompt_token_ids": [9]})]
            assert len(outs) == 1 and not outs[0].partial
        finally:
            omni.shutdown()

    asyncio.run(run())
