"""JSON schema (practical subset) -> regex for constrained decoding.

Mirrors the guided-json surface the reference exposes through vLLM's
structured outputs (xgrammar compiles the schema; reference
worker/gpu_ar_model_runner.py:268-330 applies the bitmask). We compile
to a regex consumed by regex_dfa.RegexDFA instead.

Supported: type string/integer/number/boolean/null, enum + const,
object (properties + required; additionalProperties ignored), array
(items, minItems/maxItems <= 8), anyOf, $ref to #/$defs|definitions,
string pattern/enum. Generated JSON is whitespace-light (a single
optional space after ':' and ','), which keeps the DFA small.
"""

from __future__ import annotations

import json
from typing import Any

STRING_INNER = r'(?:[^"\\\x00-\x1f]|\\["\\/bfnrt]|\\u[0-9a-fA-F]{4})'
STRING = f'"{STRING_INNER}*"'
INTEGER = r"-?(?:0|[1-9][0-9]*)"
NUMBER = INTEGER + r"(?:\.[0-9]+)?(?:[eE][-+]?[0-9]+)?"
BOOLEAN = r"(?:true|false)"
NULL = r"null"
WS = r"[ ]?"
_SCALAR = f"(?:{STRING}|{NUMBER}|{BOOLEAN}|{NULL})"
_FLAT_ARRAY = r"\[" + WS + f"(?:{_SCALAR}(?:,{WS}{_SCALAR})*)?" + WS + r"\]"
_ANY_VALUE = f"(?:{_SCALAR}|{_FLAT_ARRAY})"
# generic JSON object (response_format json_object): arbitrary string
# keys, scalar or flat-array values — a DFA cannot express unbounded
# nesting, so depth is capped at one level
ANY_OBJECT = (r"\{" + WS
              + f"(?:{STRING}:{WS}{_ANY_VALUE}"
              + f"(?:,{WS}{STRING}:{WS}{_ANY_VALUE})*)?"
              + WS + r"\}")


def _lit(value: Any) -> str:
    """Regex matching the exact JSON encoding of a python value."""
    s = json.dumps(value, ensure_ascii=False)
    return "".join(
        "\\" + c if c in r"\.^$*+?()[]{}|" else c for c in s)


def _resolve_ref(ref: str, root: dict) -> dict:
    if not ref.startswith("#/"):
        raise ValueError(f"unsupported $ref {ref!r}")
    node: Any = root
    for part in ref[2:].split("/"):
        node = node[part]
    return node


def _schema_regex(schema: dict, root: dict, depth: int = 0) -> str:
    if depth > 16:
        raise ValueError("schema nesting too deep")
    if "$ref" in schema:
        return _schema_regex(_resolve_ref(schema["$ref"], root), root,
                             depth + 1)
    if "const" in schema:
        return _lit(schema["const"])
    if "enum" in schema:
        return "(?:" + "|".join(_lit(v) for v in schema["enum"]) + ")"
    if "anyOf" in schema or "oneOf" in schema:
        subs = schema.get("anyOf") or schema.get("oneOf")
        return "(?:" + "|".join(
            _schema_regex(s, root, depth + 1) for s in subs) + ")"

    t = schema.get("type")
    if isinstance(t, list):
        return "(?:" + "|".join(
            _schema_regex({**schema, "type": ti}, root, depth + 1)
            for ti in t) + ")"
    if t == "string":
        if "pattern" in schema:
            # inner pattern, anchored inside the quotes
            return '"' + schema["pattern"] + '"'
        return STRING
    if t == "integer":
        return INTEGER
    if t == "number":
        return NUMBER
    if t == "boolean":
        return BOOLEAN
    if t == "null":
        return NULL
    if t == "array":
        item = schema.get("items", {})
        ir = _schema_regex(item, root, depth + 1) if item else NUMBER
        lo = int(schema.get("minItems", 0))
        hi = schema.get("maxItems")
        if hi is not None and int(hi) <= 8:
            hi = int(hi)
            body = _rep_list(ir, lo, hi)
        else:
            if lo == 0:
                body = f"(?:{ir}(?:,{WS}{ir})*)?"
            else:
                body = ir + f"(?:,{WS}{ir})" + "{" + str(lo - 1) + ",}"
        return r"\[" + WS + body + WS + r"\]"
    if t == "object" or "properties" in schema:
        props = schema.get("properties", {})
        if not props:
            return ANY_OBJECT
        required = set(schema.get("required", list(props.keys())))
        parts = []
        first = True
        for name, sub in props.items():
            pr = (_lit(name) + ":" + WS
                  + _schema_regex(sub, root, depth + 1))
            sep = "" if first else ("," + WS)
            if name in required:
                parts.append(sep + pr)
                first = False
            else:
                # optional property keeps the separator with it
                parts.append("(?:" + sep + pr + ")?")
                if first:
                    # an optional first property would need comma
                    # lookahead; require optional props after a
                    # required one (or make them required)
                    raise ValueError(
                        "optional properties must follow at least one "
                        f"required property (got {name!r} first)")
        return r"\{" + WS + "".join(parts) + WS + r"\}"
    # unconstrained: any scalar
    return f"(?:{STRING}|{NUMBER}|{BOOLEAN}|{NULL})"


def _rep_list(ir: str, lo: int, hi: int) -> str:
    alts = []
    for n in range(lo, hi + 1):
        if n == 0:
            alts.append("")
        else:
            alts.append(ir + ("(?:," + WS + ir + ")") * (n - 1))
    return "(?:" + "|".join(a for a in alts) + ")"


def build_regex_from_schema(schema: Any) -> str:
    """schema: dict or JSON string -> anchored regex."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    return _schema_regex(schema, schema)


def choice_to_regex(choices: list[str]) -> str:
    """guided_choice: the output must be exactly one of the strings."""
    return "(?:" + "|".join(
        "".join("\\" + c if c in r"\.^$*+?()[]{}|" else c for c in ch)
        for ch in choices) + ")"
