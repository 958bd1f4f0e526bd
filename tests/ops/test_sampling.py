import numpy as np
import jax.numpy as jnp

from vllm_omni_tpu.ops.sampling import (
    SamplingState,
    apply_penalties,
    compute_logprobs,
    sample,
)


def _meta(S, **kw):
    d = dict(
        temperature=np.ones(S, np.float32),
        top_p=np.ones(S, np.float32),
        top_k=np.zeros(S, np.int32),
        min_p=np.zeros(S, np.float32),
        seeds=np.arange(S, dtype=np.uint32),
        step_counters=np.zeros(S, np.int32),
    )
    d.update({k: np.asarray(v) for k, v in kw.items()})
    return {k: jnp.asarray(v) for k, v in d.items()}


def test_greedy_is_argmax():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(4, 32)).astype(np.float32))
    m = _meta(4, temperature=np.zeros(4, np.float32))
    out = sample(logits, **m)
    np.testing.assert_array_equal(np.asarray(out), np.argmax(np.asarray(logits), -1))


def test_top_k_restricts_support():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(1, 64)).astype(np.float32))
    top2 = set(np.argsort(np.asarray(logits)[0])[-2:])
    m = _meta(1, top_k=[2])
    seen = set()
    for step in range(50):
        m["step_counters"] = jnp.asarray([step], jnp.int32)
        seen.add(int(sample(logits, **m)[0]))
    assert seen <= top2


def test_top_p_restricts_support():
    # one dominant token with p>0.9 → top_p=0.5 must always pick it
    logits = np.full((1, 16), -10.0, np.float32)
    logits[0, 3] = 10.0
    m = _meta(1, top_p=[0.5])
    for step in range(20):
        m["step_counters"] = jnp.asarray([step], jnp.int32)
        assert int(sample(jnp.asarray(logits), **m)[0]) == 3


def test_min_p():
    logits = np.zeros((1, 4), np.float32)
    logits[0] = [5.0, 4.9, -10.0, -10.0]
    m = _meta(1, min_p=[0.5])
    for step in range(30):
        m["step_counters"] = jnp.asarray([step], jnp.int32)
        assert int(sample(jnp.asarray(logits), **m)[0]) in (0, 1)


def test_seeded_determinism_and_stream_independence():
    logits = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 128)).astype(np.float32))
    m = _meta(2, seeds=[7, 7], step_counters=[0, 0])
    a = sample(logits, **m)
    b = sample(logits, **m)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # same seed+counter+logits rows → identical draws
    logits_same = jnp.stack([logits[0], logits[0]])
    out = sample(logits_same, **m)
    assert int(out[0]) == int(out[1])


def test_penalties():
    S, V = 2, 8
    state = SamplingState.init(S, V)
    state = state.observe_input_tokens(
        token_ids=jnp.asarray([1, 2, 1, 5], jnp.int32),
        token_rows=jnp.asarray([0, 0, 1, 2], jnp.int32),  # row 2 OOR -> drop
        is_prompt=jnp.asarray([True, True, True, False]),
    )
    counts = np.asarray(state.all_counts)
    assert counts[0, 1] == 1 and counts[0, 2] == 1 and counts[1, 1] == 1
    assert counts.sum() == 3  # non-prompt and OOR dropped

    logits = jnp.ones((S, V), jnp.float32) * 2.0
    pen = apply_penalties(
        logits, state,
        repetition_penalty=jnp.asarray([2.0, 1.0]),
        presence_penalty=jnp.asarray([0.0, 0.0]),
        frequency_penalty=jnp.asarray([0.0, 0.0]),
    )
    p = np.asarray(pen)
    assert p[0, 1] == 1.0 and p[0, 2] == 1.0 and p[0, 3] == 2.0
    assert (p[1] == 2.0).all()  # rep pen 1.0 = no-op

    # sampled-token tracking + presence/frequency
    state = state.observe_sampled(
        sampled=jnp.asarray([4, 4], jnp.int32),
        do_sample=jnp.asarray([True, False]),
    )
    assert int(state.out_counts[0, 4]) == 1
    assert int(state.out_counts[1, 4]) == 0
    pen2 = apply_penalties(
        logits, state,
        repetition_penalty=jnp.asarray([1.0, 1.0]),
        presence_penalty=jnp.asarray([0.5, 0.5]),
        frequency_penalty=jnp.asarray([0.25, 0.25]),
    )
    p2 = np.asarray(pen2)
    assert abs(p2[0, 4] - (2.0 - 0.5 - 0.25)) < 1e-6
    assert p2[1, 4] == 2.0


def test_reset_rows():
    state = SamplingState.init(2, 4)
    state = state.observe_sampled(jnp.asarray([1, 2]), jnp.asarray([True, True]))
    state = state.reset_rows(jnp.asarray([True, False]))
    assert int(state.all_counts[0].sum()) == 0
    assert int(state.all_counts[1, 2]) == 1


def test_logprobs():
    logits = jnp.asarray([[0.0, float(np.log(3.0))]], jnp.float32)
    lp = compute_logprobs(logits, jnp.asarray([1]))
    assert abs(float(lp[0]) - float(np.log(0.75))) < 1e-5
