"""Orchestrator / stage metrics with JSONL stats files.

Parity: OrchestratorMetrics / StageStats / StageRequestMetrics
(reference entrypoints/log_utils.py:348-570): per-stage generation time,
token counts, rx bytes/decode ms, e2e latency + time-per-token, written as
`*.orchestrator.stats.jsonl` / `*.overall.stats.jsonl` when log_stats is on
(reference benchmarks/README.md "Metrics to watch").
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field, asdict
from typing import Any, Optional


@dataclass
class StageRequestMetrics:
    request_id: str = ""
    stage_id: int = -1
    arrival_ts: float = 0.0
    first_output_ts: Optional[float] = None
    finished_ts: Optional[float] = None
    num_prompt_tokens: int = 0
    num_output_tokens: int = 0
    rx_bytes: int = 0
    rx_decode_ms: float = 0.0
    gen_time_s: float = 0.0

    @property
    def tps(self) -> float:
        if self.gen_time_s <= 0:
            return 0.0
        return self.num_output_tokens / self.gen_time_s


@dataclass
class StageStats:
    stage_id: int
    num_requests: int = 0
    total_gen_time_s: float = 0.0
    total_output_tokens: int = 0
    total_rx_bytes: int = 0
    latencies_s: list[float] = field(default_factory=list)

    @property
    def tps_avg(self) -> float:
        if self.total_gen_time_s <= 0:
            return 0.0
        return self.total_output_tokens / self.total_gen_time_s


class OrchestratorMetrics:
    """Collects per-stage and overall metrics, optionally streaming JSONL."""

    def __init__(
        self,
        num_stages: int,
        log_stats: bool = False,
        stats_path_prefix: str = "omni",
    ) -> None:
        self.log_stats = log_stats
        self.stats_path_prefix = stats_path_prefix
        self.stage_stats = {i: StageStats(stage_id=i) for i in range(num_stages)}
        self.request_start: dict[str, float] = {}
        self.request_end: dict[str, float] = {}
        self.request_tokens: dict[str, int] = {}
        self._stage_file = None
        self._overall_file = None
        if log_stats:
            self._stage_file = open(
                f"{stats_path_prefix}.orchestrator.stats.jsonl", "a"
            )
            self._overall_file = open(
                f"{stats_path_prefix}.overall.stats.jsonl", "a"
            )

    def on_request_start(self, request_id: str) -> None:
        self.request_start[request_id] = time.monotonic()

    def on_stage_metrics(self, m: StageRequestMetrics) -> None:
        ss = self.stage_stats.setdefault(m.stage_id, StageStats(stage_id=m.stage_id))
        ss.num_requests += 1
        ss.total_gen_time_s += m.gen_time_s
        ss.total_output_tokens += m.num_output_tokens
        ss.total_rx_bytes += m.rx_bytes
        if m.finished_ts and m.arrival_ts:
            ss.latencies_s.append(m.finished_ts - m.arrival_ts)
        if self._stage_file:
            self._stage_file.write(json.dumps(asdict(m)) + "\n")
            self._stage_file.flush()

    def on_request_finish(self, request_id: str, num_tokens: int) -> None:
        self.request_end[request_id] = time.monotonic()
        self.request_tokens[request_id] = num_tokens
        if self._overall_file:
            start = self.request_start.get(request_id)
            rec = {
                "request_id": request_id,
                "e2e_latency_s": (
                    self.request_end[request_id] - start if start else None
                ),
                "num_tokens": num_tokens,
            }
            self._overall_file.write(json.dumps(rec) + "\n")
            self._overall_file.flush()

    def summary(self) -> dict[str, Any]:
        done = [
            (self.request_end[r] - self.request_start[r], self.request_tokens.get(r, 0))
            for r in self.request_end
            if r in self.request_start
        ]
        total_time = max((self.request_end.get(r, 0) for r in self.request_end), default=0) - min(
            (self.request_start.get(r, 0) for r in self.request_start), default=0
        )
        total_tokens = sum(t for _, t in done)
        return {
            "num_requests": len(done),
            "overall_tps": (total_tokens / total_time) if total_time > 0 else 0.0,
            "e2e_latency_avg_s": (sum(l for l, _ in done) / len(done)) if done else 0.0,
            "stages": {
                i: {
                    "num_requests": s.num_requests,
                    "tps_avg": s.tps_avg,
                    "latency_avg_s": (
                        sum(s.latencies_s) / len(s.latencies_s) if s.latencies_s else 0.0
                    ),
                }
                for i, s in self.stage_stats.items()
            },
        }

    def close(self) -> None:
        for f in (self._stage_file, self._overall_file):
            if f:
                f.close()
        self._stage_file = self._overall_file = None
