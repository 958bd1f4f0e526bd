import numpy as np
import pytest

from vllm_omni_tpu.config.cache import CacheConfig
from vllm_omni_tpu.config.scheduler import SchedulerConfig
from vllm_omni_tpu.core.request import Request, RequestStatus
from vllm_omni_tpu.core.sched.scheduler import Scheduler
from vllm_omni_tpu.kv_cache.manager import BlockPool, KVCacheManager
from vllm_omni_tpu.sampling_params import SamplingParams


def make_scheduler(
    max_num_seqs=4, max_tokens_per_step=64, num_blocks=64, block_size=8,
    one_shot=False, max_model_len=256,
):
    sc = SchedulerConfig(
        max_num_seqs=max_num_seqs,
        max_num_batched_tokens=max_tokens_per_step,
        max_model_len=max_model_len,
        one_shot=one_shot,
        token_buckets=[16, 32, 64],
    )
    cc = CacheConfig(block_size=block_size)
    return Scheduler(sc, cc, num_kv_blocks=num_blocks)


def make_req(rid, prompt_len=10, max_tokens=5, **sp):
    return Request(
        request_id=rid,
        prompt_token_ids=list(range(1, prompt_len + 1)),
        sampling_params=SamplingParams(max_tokens=max_tokens, temperature=0.0, **sp),
    )


def test_block_pool_reserves_pad_block():
    pool = BlockPool(8)
    got = pool.allocate(7)
    assert 0 not in got
    with pytest.raises(Exception):
        pool.allocate(1)
    pool.free(got)
    assert pool.num_free == 7


def test_kv_manager_grows_tables():
    kv = KVCacheManager(16, 8)
    b1 = kv.allocate("r", 8)
    assert len(b1) == 1
    b2 = kv.allocate("r", 17)
    assert len(b2) == 3 and b2[:1] == b1[:1]
    kv.free("r")
    assert kv.num_free_blocks == 15


def test_prefill_then_decode_lifecycle():
    s = make_scheduler()
    req = make_req("a", prompt_len=10, max_tokens=3)
    s.add_request(req)

    out = s.schedule()
    assert out.scheduled_req_ids == ["a"]
    assert out.num_scheduled_tokens["a"] == 10
    d = out.descriptor
    row = out.rows["a"]
    assert d.q_lens[row] == 10
    assert d.seq_lens[row] == 10
    assert d.do_sample[row]
    assert d.num_tokens == 10
    np.testing.assert_array_equal(
        d.token_ids[:10], np.arange(1, 11, dtype=np.int32))
    np.testing.assert_array_equal(d.positions[:10], np.arange(10))
    assert d.is_prompt_token[:10].all()

    sampled = np.zeros(4, np.int32)
    sampled[row] = 42
    produced = s.update_from_output(out, sampled)
    assert produced == [req]
    assert req.output_token_ids == [42]

    # decode step: 1 token
    out2 = s.schedule()
    d2 = out2.descriptor
    assert out2.num_scheduled_tokens["a"] == 1
    assert d2.token_ids[0] == 42
    assert d2.positions[0] == 10
    assert d2.seq_lens[row] == 11
    assert not d2.is_prompt_token[0]
    s.update_from_output(out2, sampled)

    # finish by max_tokens (every scheduled step must be updated)
    for _ in range(2):
        o = s.schedule()
        s.update_from_output(o, sampled)
    assert req.status == RequestStatus.FINISHED_LENGTH_CAPPED
    assert not s.has_unfinished()
    assert s.kv.num_free_blocks == 63  # all freed


def test_chunked_prefill():
    s = make_scheduler(max_tokens_per_step=16)
    req = make_req("a", prompt_len=40, max_tokens=2)
    s.add_request(req)
    out = s.schedule()
    assert out.num_scheduled_tokens["a"] == 16
    row = out.rows["a"]
    assert not out.descriptor.do_sample[row]
    s.update_from_output(out, np.zeros(4, np.int32))
    assert req.output_token_ids == []  # mid-prefill, no sample
    out2 = s.schedule()
    assert out2.num_scheduled_tokens["a"] == 16
    s.update_from_output(out2, np.zeros(4, np.int32))
    out3 = s.schedule()
    assert out3.num_scheduled_tokens["a"] == 8
    assert out3.descriptor.do_sample[row]
    s.update_from_output(out3, np.full(4, 7, np.int32))
    assert req.output_token_ids == [7]


def test_continuous_batching_mixed_prefill_decode():
    s = make_scheduler(max_tokens_per_step=32)
    a = make_req("a", prompt_len=8, max_tokens=10)
    s.add_request(a)
    o = s.schedule()
    s.update_from_output(o, np.zeros(4, np.int32))
    b = make_req("b", prompt_len=12, max_tokens=10)
    s.add_request(b)
    o2 = s.schedule()
    # a decodes 1, b prefills 12 in the same step
    assert set(o2.scheduled_req_ids) == {"a", "b"}
    assert o2.num_scheduled_tokens["a"] == 1
    assert o2.num_scheduled_tokens["b"] == 12
    d = o2.descriptor
    assert d.num_tokens == 13
    ra, rb = o2.rows["a"], o2.rows["b"]
    assert ra != rb
    assert d.q_lens[ra] == 1 and d.q_lens[rb] == 12
    # token-start bookkeeping consistent with layout
    assert d.cu_q_lens[ra] == 0
    assert d.cu_q_lens[rb] == 1
    assert d.logits_indices[rb] == 12


def test_eos_and_stop_token():
    s = make_scheduler()
    req = make_req("a", prompt_len=4, max_tokens=50)
    req.sampling_params.stop_token_ids = [99]
    s.add_request(req)
    o = s.schedule()
    sampled = np.zeros(4, np.int32)
    sampled[o.rows["a"]] = 99
    s.update_from_output(o, sampled)
    assert req.status == RequestStatus.FINISHED_STOPPED
    assert req.stop_reason == 99

    # eos via eos_token_id arg
    r2 = make_req("b", prompt_len=4, max_tokens=50)
    s.add_request(r2)
    o = s.schedule()
    sampled[o.rows["b"]] = 5
    s.update_from_output(o, sampled, eos_token_id=5)
    assert r2.status == RequestStatus.FINISHED_STOPPED


def test_preemption_on_block_exhaustion():
    # tiny pool: 7 usable blocks of 8 tokens
    s = make_scheduler(num_blocks=8, block_size=8, max_tokens_per_step=64)
    a = make_req("a", prompt_len=24, max_tokens=50)  # 3 blocks
    b = make_req("b", prompt_len=24, max_tokens=50)  # 3 blocks
    s.add_request(a)
    s.add_request(b)
    o = s.schedule()
    assert set(o.scheduled_req_ids) == {"a", "b"}
    sampled = np.zeros(4, np.int32)
    # decode until one of them needs a 4th block and pool is empty;
    # the loser is preempted (recompute-style) and restarted from scratch
    for _ in range(5):
        s.update_from_output(o, sampled)
        o = s.schedule()
        if s.num_preemptions:
            break
    assert s.num_preemptions > 0
    # the preempted request lost its progress and was re-admitted
    assert set(o.scheduled_req_ids) == {"a", "b"}


def test_one_shot_scheduler():
    s = make_scheduler(one_shot=True, max_tokens_per_step=64)
    req = make_req("a", prompt_len=20, max_tokens=1)
    s.add_request(req)
    o = s.schedule()
    assert o.num_scheduled_tokens["a"] == 20
    produced = s.update_from_output(o, np.zeros(4, np.int32))
    assert produced == [req]
    assert req.status == RequestStatus.FINISHED_STOPPED
    assert not s.has_unfinished()


def test_row_reuse_and_reset_flags():
    s = make_scheduler(max_num_seqs=1)
    a = make_req("a", prompt_len=4, max_tokens=1)
    s.add_request(a)
    o = s.schedule()
    assert o.descriptor.reset_rows[o.rows["a"]]
    s.update_from_output(o, np.zeros(1, np.int32))
    assert a.finished
    b = make_req("b", prompt_len=4, max_tokens=1)
    s.add_request(b)
    o2 = s.schedule()
    assert o2.rows["b"] == 0
    assert o2.descriptor.reset_rows[0]


def test_prompt_embeds_overlay_arrays():
    s = make_scheduler()
    req = make_req("a", prompt_len=4, max_tokens=1)
    req.prompt_embeds = np.ones((4, 8), np.float32) * 3.0
    s.add_request(req)
    o = s.schedule()
    d = o.descriptor
    assert d.prompt_embeds is not None
    assert d.use_embeds[:4].all()
    assert not d.use_embeds[4:].any()
    np.testing.assert_allclose(d.prompt_embeds[:4], 3.0)
