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
    sp.setdefault("temperature", 0.0)
    return Request(
        request_id=rid,
        prompt_token_ids=list(range(1, prompt_len + 1)),
        sampling_params=SamplingParams(max_tokens=max_tokens, **sp),
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
    a = make_req("a", prompt_len=24, max_tokens=8)  # 3 blocks + 1 growing
    b = make_req("b", prompt_len=24, max_tokens=8)  # 3 blocks + 1 growing
    s.add_request(a)
    s.add_request(b)
    o = s.schedule()
    assert set(o.scheduled_req_ids) == {"a", "b"}
    sampled = np.zeros(4, np.int32)
    # decode until one of them needs a 4th block and pool is empty;
    # the loser is preempted (recompute-style), KEEPING its outputs
    preempted = None
    for _ in range(5):
        s.update_from_output(o, sampled)
        o = s.schedule()
        if s.num_preemptions:
            preempted = a if a.status == RequestStatus.PREEMPTED else b
            break
    assert s.num_preemptions > 0
    # vLLM recompute semantics: already-emitted tokens are preserved (they
    # were streamed downstream; re-emitting would duplicate text)
    assert preempted.num_output_tokens > 0
    kept = list(preempted.output_token_ids)
    assert preempted.replay_until == (
        preempted.num_prompt_tokens + len(kept))
    # winner runs to completion, freeing blocks; loser then recomputes
    # prompt+outputs and continues to exactly max_tokens total
    winner = b if preempted is a else a
    for _ in range(200):
        if not s.has_unfinished():
            break
        s.update_from_output(o, sampled)
        o = s.schedule()
    assert winner.finished and preempted.finished
    # no duplicated output and no restarted budget
    assert preempted.output_token_ids[: len(kept)] == kept
    assert preempted.num_output_tokens == 8
    assert winner.num_output_tokens == 8


def test_recompute_chunks_do_not_reemit():
    """Mid-recompute chunks (emits=False) must not produce tokens."""
    s = make_scheduler(num_blocks=8, block_size=8, max_tokens_per_step=8)
    a = make_req("a", prompt_len=24, max_tokens=6)
    s.add_request(a)
    sampled = np.arange(100, 104, dtype=np.int32)
    o = s.schedule()
    while a.num_computed_tokens < 24:
        s.update_from_output(o, sampled)
        o = s.schedule()
    s.update_from_output(o, sampled)
    # simulate a preemption mid-decode
    o = s.schedule()
    s.update_from_output(o, sampled)
    n_out = a.num_output_tokens
    assert n_out >= 1
    s._preempt(a)
    assert a.output_token_ids  # preserved
    # recompute: chunked prefill over prompt+outputs, budget 8/step
    outs = []
    for _ in range(50):
        o = s.schedule()
        if not o.scheduled_req_ids and not s.has_unfinished():
            break
        produced = s.update_from_output(o, sampled)
        outs.extend(
            tok for r in produced for tok in (r.last_new_tokens or []))
    assert a.finished
    assert a.num_output_tokens == 6
    # tokens emitted after preemption = only the NEW ones
    assert len(outs) == 6 - n_out


def test_token_rows_non_decreasing_after_row_churn():
    """Rows are reused LIFO; the pallas ragged kernel requires the token
    layout to be non-decreasing in row order (ADVICE r1 #1)."""
    s = make_scheduler(max_num_seqs=4, max_tokens_per_step=64)
    reqs = [make_req(f"r{i}", prompt_len=4, max_tokens=20) for i in range(4)]
    for r in reqs:
        s.add_request(r)
    o = s.schedule()
    sampled = np.zeros(4, np.int32)
    s.update_from_output(o, sampled)
    # finish r1 (row 1) early, admit a new request -> takes row 1 while
    # r2/r3 still hold rows 2/3; running order becomes [r0, r2, r3, new]
    s.abort_request("r1")
    s.add_request(make_req("new", prompt_len=4, max_tokens=20))
    o = s.schedule()
    d = o.descriptor
    rows = d.token_rows[: d.num_tokens]
    assert (np.diff(rows) >= 0).all(), rows


def test_ngram_spec_skips_suppress_token_ids():
    s = make_scheduler()
    s.config.num_speculative_tokens = 4
    s.config.ngram_prompt_lookup_max = 3
    s.config.ngram_prompt_lookup_min = 1
    req = Request(
        request_id="a",
        prompt_token_ids=[1, 2, 3, 1, 2, 3, 1, 2],
        sampling_params=SamplingParams(
            max_tokens=8, temperature=0.0, suppress_token_ids=[3]),
    )
    s.add_request(req)
    o = s.schedule()
    s.update_from_output(o, np.zeros(4, np.int32))
    # decode steps: proposal must be suppressed-aware -> no spec chunks
    for _ in range(3):
        o = s.schedule()
        assert not o.spec_proposals
        s.update_from_output(o, np.zeros(4, np.int32))


def test_unseeded_requests_get_distinct_seeds():
    s = make_scheduler()
    a = make_req("a", prompt_len=4, max_tokens=2, temperature=1.0)
    b = make_req("b", prompt_len=4, max_tokens=2, temperature=1.0)
    c = make_req("c", prompt_len=4, max_tokens=2, temperature=1.0, seed=7)
    for r in (a, b, c):
        s.add_request(r)
    assert a.rng_seed != b.rng_seed  # fresh entropy per request
    assert c.rng_seed == 7  # explicit seed stays deterministic
    o = s.schedule()
    d = o.descriptor
    assert d.seeds[o.rows["a"]] != d.seeds[o.rows["b"]]
    assert d.seeds[o.rows["c"]] == 7


def test_abort_waiting_request_releases_prefix_blocks():
    """A waiting request can hold refcounted prefix-cache blocks after a
    failed admission attempt; aborting it must release them."""
    sc = SchedulerConfig(
        max_num_seqs=2, max_num_batched_tokens=64, max_model_len=256,
        token_buckets=[16, 32, 64],
    )
    cc = CacheConfig(block_size=8, enable_prefix_caching=True)
    s = Scheduler(sc, cc, num_kv_blocks=8)  # 7 usable blocks
    a = make_req("a", prompt_len=24, max_tokens=40)
    s.add_request(a)
    o = s.schedule()
    s.update_from_output(o, np.zeros(2, np.int32))
    # same prompt -> matches a's cached prefix blocks, but allocation of
    # the full prompt fails (pool nearly exhausted by a's decode growth)
    b = make_req("b", prompt_len=24, max_tokens=40)
    free_before = s.kv.num_free_blocks
    s.add_request(b)
    for _ in range(10):
        o = s.schedule()
        s.update_from_output(o, np.zeros(2, np.int32))
        if b.request_id not in o.rows:
            break
    s.abort_request("b")
    s.abort_request("a")
    # every block is reusable again — raw free list + evictable cached
    # blocks (none leaked to b's prefix match refcounts)
    assert "b" not in s.kv.req_blocks
    assert s.kv.num_free_blocks + len(s.kv._evictable) == 7


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
