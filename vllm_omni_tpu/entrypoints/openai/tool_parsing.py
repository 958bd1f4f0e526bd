"""Tool-call and reasoning-content extraction from AR chat output.

Parity: the reference's serving layer runs a reasoning parser and a tool
parser over the final text and returns `reasoning_content` /
`tool_calls` on the chat message (reference
vllm_omni/entrypoints/openai/serving_chat.py:617-700: harmony path,
reasoning_parser.extract_reasoning_content, tool_parser
.extract_tool_calls, named/required tool_choice branches at :700-760).
This implements the Qwen-family subset TPU-side serving needs:

- reasoning: `<think> ... </think>` prefix split (Qwen3 / DeepSeek-R1
  style). Unclosed think blocks yield reasoning-only output.
- tool calls: Hermes-format `<tool_call>{json}</tool_call>` blocks
  (the format Qwen templates emit), each a {"name", "arguments"} JSON
  object; surrounding prose becomes `content`.
- named tool_choice: the model is grammar-constrained to the tool's
  parameter schema upstream (serving_chat maps it to guided_json), so
  the whole content is the arguments payload (reference
  serving_chat.py:715-729).
"""

from __future__ import annotations

import json
import re
import uuid
from typing import Any, Optional

THINK_OPEN = "<think>"
THINK_CLOSE = "</think>"
_TOOL_RE = re.compile(r"<tool_call>\s*(.*?)\s*</tool_call>", re.DOTALL)


def extract_reasoning(text: str) -> tuple[Optional[str], str]:
    """Split `<think>...</think>` reasoning from the visible content.

    Returns (reasoning_content or None, content). Handles: no think
    block (None, text); a leading think block (reasoning, rest);
    an unclosed think block — everything is reasoning, content ''.
    """
    if text is None:
        return None, text
    stripped = text.lstrip()
    if not stripped.startswith(THINK_OPEN):
        # some templates pre-open the think block so the model emits
        # "reasoning</think>content" with no opening tag
        if THINK_CLOSE in text:
            reasoning, _, content = text.partition(THINK_CLOSE)
            return reasoning.strip() or None, content.lstrip("\n")
        return None, text
    body = stripped[len(THINK_OPEN):]
    if THINK_CLOSE in body:
        reasoning, _, content = body.partition(THINK_CLOSE)
        return reasoning.strip() or None, content.lstrip("\n")
    return body.strip() or None, ""


def make_tool_call_id() -> str:
    return f"chatcmpl-tool-{uuid.uuid4().hex[:24]}"


def extract_tool_calls(
    text: str,
) -> tuple[list[dict[str, Any]], Optional[str]]:
    """Extract Hermes-style `<tool_call>` blocks.

    Returns (tool_calls in OpenAI response shape, remaining content or
    None if empty). Malformed JSON inside a block is left in the
    content untouched (best effort, same stance as the reference's
    Hermes parser on decode errors)."""
    calls: list[dict[str, Any]] = []
    if not text or "<tool_call>" not in text:
        return calls, text

    remainder_parts: list[str] = []
    pos = 0
    for m in _TOOL_RE.finditer(text):
        chunk = m.group(1)
        try:
            obj = json.loads(chunk)
            name = obj["name"]
            args = obj.get("arguments", obj.get("parameters", {}))
        except (ValueError, KeyError, TypeError):
            remainder_parts.append(text[pos:m.end()])
            pos = m.end()
            continue
        if not isinstance(args, str):
            args = json.dumps(args, ensure_ascii=False)
        calls.append({
            "id": make_tool_call_id(),
            "type": "function",
            "function": {"name": str(name), "arguments": args},
        })
        remainder_parts.append(text[pos:m.start()])
        pos = m.end()
    remainder_parts.append(text[pos:])
    content = "".join(remainder_parts).strip()
    return calls, (content or None)


def named_tool_call(name: str, arguments: str) -> list[dict[str, Any]]:
    """tool_choice={"function": {"name": ...}}: the whole (schema-
    constrained) content is the arguments JSON (reference
    serving_chat.py:715-729)."""
    return [{
        "id": make_tool_call_id(),
        "type": "function",
        "function": {"name": name, "arguments": arguments or "{}"},
    }]


def tool_choice_mode(request) -> str:
    """Classify request.tool_choice: none | auto | named."""
    tc = getattr(request, "tool_choice", None)
    tools = getattr(request, "tools", None)
    if not tools or tc == "none":
        return "none"
    if isinstance(tc, dict) and tc.get("function", {}).get("name"):
        return "named"
    return "auto"


def named_tool_schema(request) -> Optional[dict[str, Any]]:
    """For named tool_choice, the tool's JSON-schema parameters — used
    to grammar-constrain decoding (guided_json) so arguments always
    parse. Falls back to a permissive object schema."""
    tc = request.tool_choice
    name = tc["function"]["name"]
    for tool in request.tools or []:
        fn = tool.get("function", tool)
        if fn.get("name") == name:
            return fn.get("parameters") or {"type": "object"}
    return None
