"""Stage-host supervision: spawn from config, crash, restart, re-queue.

Parity intent: Ray actor lifecycle + restart (reference
distributed/ray_utils/utils.py:28-169) — here a supervised subprocess
(`runtime.remote: "auto:cpu"`), killed mid-run and recovered with its
in-flight requests re-submitted. Two local processes stand in for two
hosts (SURVEY §4: the reference tests multi-node the same way).
"""

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
SP = {"temperature": 0.0, "max_tokens": 4, "ignore_eos": True,
      "detokenize": False}


def _cfgs():
    return [
        StageConfig(
            stage_id=0, stage_type="llm",
            engine_args=EngineArgs.from_dict(dict(ENGINE_D)),
            default_sampling_params=dict(SP)),
        StageConfig(
            stage_id=1, stage_type="llm",
            runtime=StageRuntimeConfig(remote="auto:cpu"),
            engine_args=EngineArgs.from_dict(dict(ENGINE_D)),
            engine_input_source=[0], final_output=True,
            final_output_type="text", default_sampling_params=dict(SP)),
    ]


def test_supervised_host_crash_recovery():
    omni = Omni(stage_configs=_cfgs())
    try:
        remote = omni.stages[1]
        sup = remote._supervisor
        assert sup is not None and sup.alive()
        first_pid = sup.proc.pid

        # 1. normal request through the supervised host
        out = omni.generate({"prompt_token_ids": [3, 4, 5]})
        assert len(out) == 1 and out[0].error is None
        ref_toks = list(out[0].request_output.outputs[0].token_ids)

        # 2. kill the host BETWEEN requests: next request must recover
        sup.proc.kill()
        sup.proc.wait(timeout=10)
        out2 = omni.generate({"prompt_token_ids": [3, 4, 5]},
                             timeout=600.0)
        assert len(out2) == 1 and out2[0].error is None, out2[0].error
        assert list(out2[0].request_output.outputs[0].token_ids) == ref_toks
        assert sup.proc.pid != first_pid  # a new host took over
        assert sup.restarts >= 1

        # 3. kill the host MID-FLIGHT: the in-flight request is re-queued
        # on the fresh host and completes
        import threading

        def killer():
            # wait until the request reaches the remote stage's inflight
            deadline = time.monotonic() + 60
            while not remote._inflight and time.monotonic() < deadline:
                time.sleep(0.005)
            sup.proc.kill()

        th = threading.Thread(target=killer, daemon=True)
        th.start()
        out3 = omni.generate({"prompt_token_ids": [3, 4, 5]},
                             timeout=600.0)
        th.join(timeout=60)
        assert len(out3) == 1 and out3[0].error is None, out3[0].error
        assert list(out3[0].request_output.outputs[0].token_ids) == ref_toks
    finally:
        omni.shutdown()
    assert not sup.alive()  # shutdown stops the supervised host


def test_supervisor_gives_up_after_max_restarts(tmp_path):
    """Exceeding the restart budget surfaces per-request errors instead
    of looping forever."""
    from vllm_omni_tpu.stages.supervisor import StageHostSupervisor

    cfg = _cfgs()[1]
    sup = StageHostSupervisor(cfg, platform="cpu", max_restarts=1)
    addr = sup.start()
    assert addr.startswith("127.0.0.1:")
    assert sup.alive()
    sup.kill()
    sup.restart()  # 1st restart allowed
    sup.kill()
    with pytest.raises(RuntimeError, match="exceeded"):
        sup.restart()
    sup.stop()


def test_stage_config_to_dict_roundtrip():
    cfg = _cfgs()[1]
    from vllm_omni_tpu.config.stage import stage_config_from_dict

    d = cfg.to_dict()
    import json

    back = stage_config_from_dict(json.loads(json.dumps(d)))
    assert back.stage_id == 1 and back.stage_type == "llm"
    assert back.engine_input_source == [0]
    assert back.runtime.remote == ""  # the child is the host
    assert back.engine_args.hf_config["hidden_size"] == 64
    assert back.default_sampling_params == SP
