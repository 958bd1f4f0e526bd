"""Grammar-constrained (structured) decoding.

TPU-native replacement for the reference's xgrammar integration
(reference worker/gpu_ar_model_runner.py:268-451 `sample_tokens` applies a
grammar bitmask before sampling; config plumbing in
entrypoints/omni_llm.py and vllm structured_outputs):

- `regex_dfa`   : regex -> byte-level DFA (Brzozowski derivatives)
- `json_schema` : JSON-schema subset / choice list -> regex
- `fsm`         : DFA x tokenizer -> per-state packed token bitmasks +
                  token transition maps (outlines-style trie walk)

The scheduler ships each step's [S, ceil(V/32)] packed mask inside the
batch descriptor; the jitted step unpacks bits on device and masks
logits to -inf before sampling (model_runner.py `has_grammar`).
"""

from vllm_omni_tpu.structured.fsm import TokenFSM, compile_fsm
from vllm_omni_tpu.structured.json_schema import (
    build_regex_from_schema,
    choice_to_regex,
)
from vllm_omni_tpu.structured.regex_dfa import RegexDFA

__all__ = [
    "TokenFSM",
    "compile_fsm",
    "RegexDFA",
    "build_regex_from_schema",
    "choice_to_regex",
]
