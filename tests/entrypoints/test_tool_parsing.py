"""Tool-call / reasoning extraction units (reference
serving_chat.py:617-760 tool_parser + reasoning_parser subset)."""

import json

from vllm_omni_tpu.entrypoints.openai.tool_parsing import (
    extract_reasoning,
    extract_tool_calls,
)


def test_reasoning_split_variants():
    assert extract_reasoning("no think here") == (None, "no think here")
    r, c = extract_reasoning("<think>a plan</think>\nanswer")
    assert r == "a plan" and c == "answer"
    # pre-opened template: close tag only
    r, c = extract_reasoning("thoughts</think>answer")
    assert r == "thoughts" and c == "answer"
    # unclosed: everything is reasoning
    r, c = extract_reasoning("<think>never stopped")
    assert r == "never stopped" and c == ""
    # empty think block
    r, c = extract_reasoning("<think></think>hi")
    assert r is None and c == "hi"


def test_tool_call_extraction_multi():
    text = (
        'lead <tool_call>{"name": "a", "arguments": {"x": 1}}</tool_call>'
        ' mid <tool_call>{"name": "b", "arguments": {}}</tool_call> tail'
    )
    calls, content = extract_tool_calls(text)
    assert [c["function"]["name"] for c in calls] == ["a", "b"]
    assert json.loads(calls[0]["function"]["arguments"]) == {"x": 1}
    assert content == "lead  mid  tail"
    assert len({c["id"] for c in calls}) == 2


def test_tool_call_malformed_json_left_in_content():
    text = "x <tool_call>{not json}</tool_call> y"
    calls, content = extract_tool_calls(text)
    assert calls == []
    assert "<tool_call>" in content  # left untouched


def test_tool_call_none():
    calls, content = extract_tool_calls("plain")
    assert calls == [] and content == "plain"
    calls, content = extract_tool_calls(
        '<tool_call>{"name": "only", "arguments": {}}</tool_call>')
    assert calls[0]["function"]["name"] == "only"
    assert content is None
