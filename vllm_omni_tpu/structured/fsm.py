"""Token-level FSM over a byte DFA (outlines-style trie walk).

For each DFA state we precompute:
  - a packed uint32 bitmask over the vocab: token t is allowed iff
    walking its bytes from this state stays alive;
  - the state each allowed token lands in.

The EOS token is allowed exactly in accepting states; if a state has
no live token transitions at all, EOS is forced so generation
terminates cleanly. The scheduler ships masks[state] rows inside the
batch descriptor; the device masks logits (model_runner has_grammar).

Equivalent role to xgrammar's GrammarMatcher in the reference
(worker/gpu_ar_model_runner.py:268-330).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from vllm_omni_tpu.structured.json_schema import (
    build_regex_from_schema,
    choice_to_regex,
)
from vllm_omni_tpu.structured.regex_dfa import RegexDFA


class _Trie:
    __slots__ = ("children", "token_ids")

    def __init__(self):
        self.children: dict[int, "_Trie"] = {}
        self.token_ids: list[int] = []


def _build_trie(token_bytes: Sequence[Optional[bytes]]) -> _Trie:
    root = _Trie()
    for tid, bs in enumerate(token_bytes):
        if not bs:  # None or b"" — special tokens are never allowed
            continue
        node = root
        for b in bs:
            nxt = node.children.get(b)
            if nxt is None:
                nxt = node.children[b] = _Trie()
            node = nxt
        node.token_ids.append(tid)
    return root


class TokenFSM:
    def __init__(self, dfa: RegexDFA,
                 token_bytes: Sequence[Optional[bytes]],
                 eos_token_id: int):
        self.dfa = dfa
        self.eos_token_id = eos_token_id
        self.vocab_size = len(token_bytes)
        self.num_words = (self.vocab_size + 31) // 32
        n = dfa.num_states
        self.masks = np.zeros((n, self.num_words), np.uint32)
        # next-state per (state, token): dicts built during the walk
        self.trans: list[dict[int, int]] = [dict() for _ in range(n)]

        trie = _build_trie(token_bytes)
        eos_w, eos_b = divmod(eos_token_id, 32)
        for s in range(n):
            # iterative DFS over (trie node, dfa state)
            stack = [(trie, s)]
            any_allowed = False
            while stack:
                node, st = stack.pop()
                for tid in node.token_ids:
                    self.masks[s, tid >> 5] |= np.uint32(1 << (tid & 31))
                    self.trans[s][tid] = st
                    any_allowed = True
                for b, child in node.children.items():
                    nxt = dfa.trans[st].get(b, -1)
                    if nxt >= 0:
                        stack.append((child, nxt))
            if s in dfa.finals or not any_allowed:
                self.masks[s, eos_w] |= np.uint32(1 << eos_b)

    # ------------------------------------------------------------ api
    def allowed_mask(self, state: int) -> np.ndarray:
        """Packed uint32 [num_words] bitmask for this state."""
        return self.masks[state]

    def next_state(self, state: int, token_id: int) -> int:
        """Advance; -1 = token not allowed (or EOS/terminal)."""
        return self.trans[state].get(token_id, -1)

    def is_final(self, state: int) -> bool:
        return state in self.dfa.finals


def token_bytes_from_tokenizer(tokenizer) -> list:
    """Best-effort id -> bytes table from a HF tokenizer: special
    tokens map to None (never allowed inside a constrained region)."""
    size = len(tokenizer)
    special = set(getattr(tokenizer, "all_special_ids", []) or [])
    out: list = [None] * size
    for tid in range(size):
        if tid in special:
            continue
        try:
            s = tokenizer.decode([tid], skip_special_tokens=False,
                                 clean_up_tokenization_spaces=False)
        except Exception:
            continue
        if "�" in s:  # partial UTF-8 (byte-fallback token)
            tok = tokenizer.convert_ids_to_tokens(tid)
            if isinstance(tok, str) and tok.startswith("<0x") \
                    and tok.endswith(">"):
                out[tid] = bytes([int(tok[3:-1], 16)])
            continue
        out[tid] = s.encode("utf-8")
    return out


def compile_fsm(structured: dict, token_bytes: Sequence[Optional[bytes]],
                eos_token_id: int) -> TokenFSM:
    """structured: {"json": ...} | {"regex": ...} | {"choice": [...]}.
    Matches the reference's StructuredOutputsParams field names."""
    if structured.get("json") is not None:
        pattern = build_regex_from_schema(structured["json"])
    elif structured.get("regex") is not None:
        pattern = structured["regex"]
    elif structured.get("choice") is not None:
        pattern = choice_to_regex(list(structured["choice"]))
    else:
        raise ValueError(f"unsupported structured spec: {structured}")
    return TokenFSM(RegexDFA(pattern), token_bytes, eos_token_id)
