"""Cross-stage incremental streaming primitives.

Beyond-reference design: the reference orchestrates stage hand-offs on
COMPLETION only — a downstream stage starts after the upstream's full
output exists (reference entrypoints/omni_stage.py:819 enqueues the next
stage when a request finishes, and its code2wav chunking is a memory
knob, not a latency one). Speech TTFT there is therefore bounded below
by full-thinker + full-talker latency.

Here, stages hand off INCREMENTALLY: the talker starts after the
thinker's second step (its prefill needs only the prompt plus the first
generated token's embedding — see input_processors/qwen3_omni.py
thinker2talker: the 9-slot assistant part reads a_hidden[3:4], every
later text embedding is consumed one-per-frame during talker decode),
and code2wav decodes waveform chunks as talker frames accumulate. The
streamed results are BIT-IDENTICAL to the completion-handoff path: the
talker blocks until trailing[step] exists (same values, same order;
sampling state is timing-independent), and chunk boundaries match
chunked_decode exactly.

A StreamFeed is the edge primitive: the producer side (an incremental
input processor fed by upstream partial StageOutputs) appends items;
the consumer side (an engine's generate_stream running in the consumer
stage's thread) blocks in get(i) until item i exists, the feed is
finished (None = past end), or it is cancelled (client abort).
"""

from __future__ import annotations

import threading
from typing import Any, Optional


class StreamCancelled(Exception):
    """The request was aborted while an engine waited on a feed."""


class StreamFeed:
    """Append-only, thread-safe, blocking-indexable sequence."""

    def __init__(self):
        self._items: list[Any] = []
        self._finished = False
        self._cancelled = False
        self._cond = threading.Condition()

    def append(self, item: Any) -> None:
        with self._cond:
            if self._finished:
                raise RuntimeError("append after finish")
            self._items.append(item)
            self._cond.notify_all()

    def finish(self) -> None:
        with self._cond:
            self._finished = True
            self._cond.notify_all()

    def cancel(self) -> None:
        with self._cond:
            self._cancelled = True
            self._cond.notify_all()

    def __len__(self) -> int:
        with self._cond:
            return len(self._items)

    @property
    def finished(self) -> bool:
        with self._cond:
            return self._finished

    def get(self, i: int, timeout: Optional[float] = None) -> Any:
        """Block until item i exists; None once the feed is finished and
        i is past the end. Raises StreamCancelled on cancel()."""
        with self._cond:
            while True:
                if self._cancelled:
                    raise StreamCancelled()
                if i < len(self._items):
                    return self._items[i]
                if self._finished:
                    return None
                if not self._cond.wait(timeout):
                    raise TimeoutError(f"feed item {i} not produced")


class StreamInputProcessor:
    """Incremental edge: consumes upstream partial/final StageOutputs and
    decides when to submit the consumer stage.

    Subclasses implement on_partial / on_final; both return either None
    (nothing to submit yet / already submitted and now fed) or a prompt
    object — the orchestrator submits it to the consumer stage exactly
    once, with stream=True.

    Instances are per (request, consumer-stage edge); `stage` is the
    consumer OmniStage (engine ready by the time outputs flow)."""

    #: upstream partial outputs are required for this processor to engage
    needs_upstream_stream = True

    def __init__(self, stage, original_prompt):
        self.stage = stage
        self.original_prompt = original_prompt
        self.submitted = False

    def on_partial(self, src_stage_id: int, output) -> Optional[Any]:
        raise NotImplementedError

    def on_final(self, src_stage_id: int, output) -> Optional[Any]:
        raise NotImplementedError

    def cancel(self) -> None:
        """Abort: unblock any engine waiting on this edge's feeds."""
