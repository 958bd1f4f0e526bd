"""Scheduler configuration.

Parity: the knobs the reference sets per stage via engine_args
(max_num_batched_tokens / max_num_seqs, e.g. stage_configs/
qwen3_omni_moe.yaml:24). TPU-specific additions: padding buckets so the
jitted step functions see a small closed set of shapes.
"""

from __future__ import annotations

from dataclasses import dataclass, field


def default_token_buckets() -> list[int]:
    return [16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192]


@dataclass
class SchedulerConfig:
    max_num_seqs: int = 64
    max_num_batched_tokens: int = 4096
    max_model_len: int = 8192
    # Non-AR stages admit each request whole in one step
    # (reference OmniGenerationScheduler, omni_generation_scheduler.py:19-148).
    one_shot: bool = False
    enable_chunked_prefill: bool = True
    # fuse up to K decode steps into one device dispatch when the whole
    # batch is in steady decode (amortizes per-dispatch overhead)
    multi_step_decode: int = 1
    # n-gram (prompt-lookup) speculative decoding: propose this many
    # tokens per decode step from context matches (0 = off)
    num_speculative_tokens: int = 0
    ngram_prompt_lookup_max: int = 3
    ngram_prompt_lookup_min: int = 1
    # Token-count padding buckets for jit shape reuse.
    token_buckets: list[int] = field(default_factory=default_token_buckets)

    def __post_init__(self) -> None:
        self.token_buckets = sorted(
            {b for b in self.token_buckets if b <= self.max_num_batched_tokens}
            | {self.max_num_batched_tokens}
        )

    def pad_tokens(self, n: int) -> int:
        for b in self.token_buckets:
            if n <= b:
                return b
        return self.token_buckets[-1]
