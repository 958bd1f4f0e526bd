"""Native host-core: build, correctness vs the numpy fallback."""

import numpy as np
import pytest

from vllm_omni_tpu.native import get_host_core


def test_native_builds_and_fills():
    host = get_host_core()
    if host is None:
        pytest.skip("no C compiler available")
    slots = np.zeros(16, np.int32)
    blocks = np.asarray([7, 3, 9], np.int32)
    host.fill_slots(slots, blocks, 5, 6, 4, 2)
    # positions 5..10 -> block idx 1,1,1,2,2,2
    ref = np.zeros(16, np.int32)
    for i in range(6):
        pos = 5 + i
        ref[2 + i] = blocks[pos // 4] * 4 + pos % 4
    np.testing.assert_array_equal(slots, ref)

    extra = np.zeros((3, 8), np.int32)
    host.fill_window_slots(extra.reshape(-1), blocks, 6, 4, 5, 8)
    for k in range(1, 4):
        pos = 6 + k
        assert extra[k - 1, 5] == blocks[pos // 4] * 4 + pos % 4

    ids = np.zeros(8, np.int32)
    pos = np.zeros(8, np.int32)
    rows = np.full(8, 99, np.int32)
    src = np.asarray([10, 11, 12, 13], np.int32)
    host.fill_token_range(ids, pos, rows, src, 2, 4, 1, 3)
    np.testing.assert_array_equal(ids[1:5], [12, 13, 0, 0])
    np.testing.assert_array_equal(pos[1:5], [2, 3, 4, 5])
    assert (rows[1:5] == 3).all()


def test_native_oob_raises():
    host = get_host_core()
    if host is None:
        pytest.skip("no C compiler available")
    slots = np.zeros(4, np.int32)
    blocks = np.asarray([1], np.int32)
    with pytest.raises(IndexError):
        host.fill_slots(slots, blocks, 0, 8, 4, 0)


def test_scheduler_native_matches_python(monkeypatch):
    """Engine decode streams identical with native on/off."""
    if get_host_core() is None:
        pytest.skip("no C compiler available")
    from vllm_omni_tpu.config.engine import EngineArgs
    from vllm_omni_tpu.core.request import Request
    from vllm_omni_tpu.engine.core import EngineCore
    from vllm_omni_tpu.sampling_params import SamplingParams

    cfg = {"architectures": ["Qwen2ForCausalLM"], "hidden_size": 64,
           "num_hidden_layers": 2, "num_attention_heads": 4,
           "num_key_value_heads": 2, "vocab_size": 128,
           "max_position_embeddings": 256, "intermediate_size": 128,
           "eos_token_id": 127}

    def run(disable_native):
        import vllm_omni_tpu.native as native

        monkeypatch.setattr(native, "_mod", None if disable_native
                            else native.get_host_core())
        monkeypatch.setattr(native, "_tried", True)
        core = EngineCore(EngineArgs(
            model="t", hf_config=cfg, dtype="float32", max_num_seqs=2,
            max_num_batched_tokens=64, block_size=8,
            num_kv_cache_blocks=32,
            multi_step_decode=4).create_engine_config(),
            load_weights=False, pipeline_depth=0)
        core.add_request(Request(
            request_id="r", prompt_token_ids=list(range(2, 15)),
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=13, ignore_eos=True,
                detokenize=False)))
        for _ in range(60):
            core.step()
            if not core.has_unfinished():
                break
        return list(core.scheduler.requests["r"].output_token_ids)

    assert run(True) == run(False)
