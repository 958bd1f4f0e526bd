"""Incremental detokenization + stop-string handling.

Replaces the vLLM detokenizer the reference inherits. Tokenizer is
optional (stages like talker/code2wav run with detokenize=False,
reference qwen3_omni_moe.yaml default_sampling_params).
"""

from __future__ import annotations

import os
from typing import Optional


def maybe_load_tokenizer(path: Optional[str]):
    if not path or not os.path.isdir(path):
        return None
    has_tok = any(
        os.path.isfile(os.path.join(path, f))
        for f in ("tokenizer.json", "tokenizer_config.json", "vocab.json")
    )
    if not has_tok:
        return None
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(path)
    except Exception:
        return None


class IncrementalDetokenizer:
    """Per-request incremental decode with stop-string truncation."""

    def __init__(self, tokenizer, stop: list[str], skip_special_tokens: bool = True):
        self.tokenizer = tokenizer
        self.stop = stop or []
        self.skip_special = skip_special_tokens
        self.token_ids: list[int] = []
        self.text = ""
        self._prefix_len = 0  # decoded chars already emitted
        self.stopped_on: Optional[str] = None

    def add_tokens(self, new_ids: list[int]) -> str:
        """Append tokens; returns the new text delta ('' if none/no tokenizer).
        Sets stopped_on when a stop string appears (text is truncated)."""
        self.token_ids.extend(new_ids)
        if self.tokenizer is None:
            return ""
        full = self.tokenizer.decode(
            self.token_ids, skip_special_tokens=self.skip_special
        )
        delta = full[len(self.text):]
        self.text = full
        for s in self.stop:
            idx = self.text.find(s)
            if idx >= 0:
                self.text = self.text[:idx]
                self.stopped_on = s
                return ""
        return delta
