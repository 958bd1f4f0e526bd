"""Async orchestrator for online serving.

Parity: AsyncOmni (reference entrypoints/async_omni.py:72-1237):
per-request asyncio flow — `generate()` is an async generator yielding an
OmniRequestOutput per final stage; a background output-handler routes
stage results to per-request queues (reference :1059) and forwards
intermediate results along the DAG; EngineClient-protocol surface
(pause/resume, abort, stats).
"""

from __future__ import annotations

import asyncio
import queue
import threading
from typing import Any, AsyncGenerator, Optional, Sequence, Union

from vllm_omni_tpu.config.stage import StageConfig, get_final_stage_id_for_e2e
from vllm_omni_tpu.logger import init_logger
from vllm_omni_tpu.outputs import OmniRequestOutput
from vllm_omni_tpu.sampling_params import SamplingParams
from vllm_omni_tpu.stages.omni import Omni, _RequestState
from vllm_omni_tpu.stages.omni_stage import StageOutput, StageTask
from vllm_omni_tpu.utils import Counter

logger = init_logger(__name__)


class _ClientRequestState(_RequestState):
    """Parity: ClientRequestState with a per-request result queue
    (reference async_omni.py)."""

    def __init__(self, request_id, prompt, num_stages, loop):
        super().__init__(request_id, prompt, num_stages)
        self.queue: asyncio.Queue = asyncio.Queue()
        self.loop = loop
        self.sps: dict[int, Optional[SamplingParams]] = {}

    def push(self, item) -> None:
        self.loop.call_soon_threadsafe(self.queue.put_nowait, item)


class AsyncOmni(Omni):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._active: dict[str, _ClientRequestState] = {}
        self._lock = threading.Lock()
        self._paused = threading.Event()
        self._handler = threading.Thread(
            target=self._run_output_handler, name="omni-output-handler",
            daemon=True,
        )
        self._running = True
        self._handler.start()

    # ----------------------------------------------------- output handler
    def _run_output_handler(self) -> None:
        """Drain stage out-queues, forward along the DAG, route final
        outputs to per-request queues (reference async_omni.py:1059)."""
        while self._running:
            try:
                so: StageOutput = self.out_q.get(timeout=0.2)
            except queue.Empty:
                continue
            with self._lock:
                st = self._active.get(so.request_id)
            if st is None:
                continue
            if so.metrics:
                self.metrics.on_stage_metrics(so.metrics)
            if so.error is not None:
                st.error = so.error
                st.cancel_streams()  # unblock engines waiting on feeds
                st.push(RuntimeError(so.error))
                continue
            if so.partial:
                # incremental cross-stage edges: feed downstream
                # stream processors (stages/streaming.py)
                for nxt_id in self.consumers.get(so.stage_id, []):
                    proc = st.stream_procs.get(nxt_id)
                    if proc is None:
                        continue
                    try:
                        next_input = proc.on_partial(so.stage_id, so.output)
                    except Exception as e:
                        import traceback

                        logger.error(
                            "stream processor for stage %d failed on "
                            "%s: %s", nxt_id, st.request_id, e)
                        st.error = (
                            f"stage {nxt_id} stream processor: {e}\n"
                            f"{traceback.format_exc()}")
                        st.cancel_streams()
                        st.push(RuntimeError(st.error))
                        break
                    if next_input is not None:
                        proc.submitted = True
                        self.stages[nxt_id].submit(StageTask(
                            st.request_id, next_input, st.sps.get(nxt_id),
                            stream=self._stream_flag(
                                st, nxt_id, st.pending_final_all)))
                if st.error is not None:
                    continue
                # incremental emission from a final stage -> stream to the
                # client; never advances pipeline state
                if st.stream and so.stage_id in st.pending_final_all:
                    cfg = self.stages[so.stage_id].config
                    st.push(OmniRequestOutput(
                        request_id=st.request_id, stage_id=so.stage_id,
                        final_output_type=cfg.final_output_type,
                        request_output=so.output, partial=True,
                    ))
                continue
            before = len(st.final_outputs)
            self._handle_stage_output(st, so, st.sps, st.pending_final_all)
            for out in st.final_outputs[before:]:
                st.push(out)
            if st.done:
                st.push(None)  # completion sentinel
                with self._lock:
                    self._active.pop(st.request_id, None)

    # --------------------------------------------------------------- API
    async def generate(
        self,
        prompt: Any,
        request_id: Optional[str] = None,
        sampling_params: Union[
            SamplingParams, Sequence[SamplingParams], dict, None
        ] = None,
        output_modality: Optional[str] = None,
        stream: bool = False,
    ) -> AsyncGenerator[OmniRequestOutput, None]:
        loop = asyncio.get_running_loop()
        request_id = request_id or f"omni-{next(self._counter)}"
        final_ids = set(self.final_stage_ids)
        if output_modality is not None:
            final_ids = {
                get_final_stage_id_for_e2e(self.stage_configs, output_modality)
            }
        st = _ClientRequestState(request_id, prompt, len(self.stages), loop)
        st.pending_final = set(final_ids)
        st.pending_final_all = final_ids
        st.sps = self._normalize_sampling(sampling_params, 1)[0]
        st.stream = stream
        if stream:
            st.stream_procs, st.stream_sources = self._make_stream_procs(
                prompt, request_id=request_id, sps=st.sps,
                final_ids=final_ids)
        with self._lock:
            self._active[request_id] = st
        self.metrics.on_request_start(request_id)
        first_stage = self.stage_configs[0].stage_id
        self.stages[first_stage].submit(
            StageTask(request_id, prompt, st.sps.get(first_stage),
                      stream=self._stream_flag(st, first_stage, final_ids))
        )
        completed = False
        try:
            while True:
                item = await st.queue.get()
                if item is None:
                    completed = True
                    break
                if isinstance(item, BaseException):
                    completed = True
                    raise item
                yield item
        finally:
            if not completed:
                # consumer went away mid-request (HTTP disconnect /
                # generator close): stop the stages from burning cycles
                st.cancel_streams()
                for stage in self.stages.values():
                    if hasattr(stage, "abort"):
                        stage.abort(request_id)
            self.metrics.on_request_finish(request_id, 0)
            with self._lock:
                self._active.pop(request_id, None)

    async def abort(self, request_id: str) -> None:
        with self._lock:
            st = self._active.pop(request_id, None)
        if st is not None:
            st.cancel_streams()
        for stage in self.stages.values():
            if hasattr(stage, "abort"):
                stage.abort(request_id)
        if st is not None:
            st.push(None)

    # EngineClient-protocol parity (reference async_omni.py:1105-1237)
    async def pause_generation(self) -> None:
        self._paused.set()

    async def resume_generation(self) -> None:
        self._paused.clear()

    def is_tracing_enabled(self) -> bool:
        from vllm_omni_tpu.utils.profiling import is_profiling

        return is_profiling()

    async def start_profile(self) -> None:
        """Begin a JAX profiler trace (parity: EngineClient.start_profile,
        reference async_omni.py:1189-1193)."""
        from vllm_omni_tpu.utils.profiling import start_profile

        start_profile()

    async def stop_profile(self) -> None:
        from vllm_omni_tpu.utils.profiling import stop_profile

        stop_profile()

    async def reset_prefix_cache(self) -> None:
        """Drop all content-addressed (evictable) prefix blocks in every
        LLM stage (parity: EngineClient.reset_prefix_cache)."""
        for stage in self.stages.values():
            kv = getattr(
                getattr(getattr(stage.engine, "core", None), "scheduler",
                        None), "kv", None)
            if kv is None or not getattr(kv, "enable_prefix_caching", False):
                continue
            for blk, h in list(kv._evictable.items()):
                kv._cached.pop(h, None)
                kv._hash_of.pop(blk, None)
                kv.pool.free([blk])
            kv._evictable.clear()
            # forget addresses of still-referenced blocks too: new
            # requests must not match stale content
            kv._cached.clear()

    async def check_health(self) -> None:
        for stage in self.stages.values():
            if stage.init_error is not None:
                raise RuntimeError(f"stage {stage.stage_id} unhealthy")

    def shutdown(self) -> None:
        self._running = False
        super().shutdown()
