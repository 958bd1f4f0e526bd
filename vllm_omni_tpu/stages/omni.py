"""Sync multi-stage orchestrator.

Parity: Omni (reference entrypoints/omni.py:59-572): loads stage configs,
builds stages, seeds stage 0, forwards results along the DAG via
connectors/input processors, collects final_output stages, with
modality-based early exit (entrypoints/utils.py:191) and orchestrator
metrics (log_utils.py:366).
"""

from __future__ import annotations

import queue
import time
from typing import Any, Callable, Optional, Sequence, Union

from vllm_omni_tpu.config.stage import (
    StageConfig,
    get_final_stage_id_for_e2e,
    load_stage_configs_from_model,
    load_stage_configs_from_yaml,
)
from vllm_omni_tpu.connectors import build_connectors_for_edges
from vllm_omni_tpu.logger import init_logger
from vllm_omni_tpu.outputs import OmniRequestOutput, RequestOutput
from vllm_omni_tpu.sampling_params import SamplingParams
from vllm_omni_tpu.stages.omni_stage import OmniStage, StageOutput, StageTask
from vllm_omni_tpu.utils import Counter
from vllm_omni_tpu.utils.metrics import OrchestratorMetrics

logger = init_logger(__name__)


class _RequestState:
    def __init__(self, request_id: str, prompt: Any, num_stages: int):
        self.request_id = request_id
        self.prompt = prompt
        self.stage_outputs: dict[int, Any] = {}
        self.final_outputs: list[OmniRequestOutput] = []
        self.pending_final: set[int] = set()
        self.error: Optional[str] = None
        self.stream = False  # client asked for incremental final outputs
        # incremental cross-stage edges (stages/streaming.py):
        # consumer stage id -> live StreamInputProcessor; and the set of
        # upstream stage ids that must emit partials to drive them
        self.stream_procs: dict[int, Any] = {}
        self.stream_sources: set[int] = set()

    def cancel_streams(self) -> None:
        for proc in self.stream_procs.values():
            try:
                proc.cancel()
            except Exception:
                pass

    @property
    def done(self) -> bool:
        return self.error is not None or not self.pending_final


class Omni:
    def __init__(
        self,
        model: str = "",
        stage_configs_path: Optional[str] = None,
        stage_configs: Optional[list[StageConfig]] = None,
        engine_factory: Optional[Callable] = None,
        log_stats: bool = False,
        stats_path_prefix: str = "omni",
        init_timeout: float = 600.0,
        engine_overrides: Optional[dict] = None,
    ):
        if stage_configs is None:
            if stage_configs_path:
                stage_configs = load_stage_configs_from_yaml(
                    stage_configs_path, model=model)
            else:
                stage_configs = load_stage_configs_from_model(model)
        if engine_overrides:
            # serve-surface knobs (tp/dp/ep/sp, batching limits, quant)
            # applied over every LLM stage's engine args
            import dataclasses

            for cfg in stage_configs:
                if cfg.stage_type == "llm":
                    cfg.engine_args = dataclasses.replace(
                        cfg.engine_args, **engine_overrides)
        self.stage_configs = stage_configs
        self.out_q: "queue.Queue[StageOutput]" = queue.Queue()

        def make_stage(cfg):
            if getattr(cfg.runtime, "remote", ""):
                from vllm_omni_tpu.stages.remote import RemoteStage

                return RemoteStage(cfg, self.out_q)
            return OmniStage(cfg, self.out_q, engine_factory)

        self.stages: dict[int, OmniStage] = {
            cfg.stage_id: make_stage(cfg) for cfg in stage_configs
        }
        # downstream adjacency: src stage -> [consumer stage ids]
        self.consumers: dict[int, list[int]] = {}
        for cfg in stage_configs:
            for src in cfg.engine_input_source:
                self.consumers.setdefault(src, []).append(cfg.stage_id)
        self.final_stage_ids = [
            c.stage_id for c in stage_configs if c.final_output
        ]
        self.connectors = build_connectors_for_edges(
            {
                k: v
                for cfg in stage_configs
                for k, v in (cfg.runtime.connectors or {}).items()
            }
        )
        self.metrics = OrchestratorMetrics(
            num_stages=len(stage_configs), log_stats=log_stats,
            stats_path_prefix=stats_path_prefix)
        self._counter = Counter()
        # bring-up (threaded engines; parity with _start_stages +
        # _wait_for_stages_ready, reference omni.py:191-271)
        for stage in self.stages.values():
            stage.init_stage_worker()
        for stage in self.stages.values():
            stage.wait_ready(init_timeout)
        logger.info("Omni ready with %d stages", len(self.stages))

    # --------------------------------------------------------------- API
    def generate(
        self,
        prompts: Union[Any, Sequence[Any]],
        sampling_params_list: Optional[Sequence[Any]] = None,
        output_modality: Optional[str] = None,
        timeout: float = 3600.0,
    ) -> list[OmniRequestOutput]:
        """Run requests through the stage DAG; returns one OmniRequestOutput
        per (request, final stage), grouped by request order."""
        single = not isinstance(prompts, (list, tuple))
        prompt_list = [prompts] if single else list(prompts)
        n = len(prompt_list)
        sp_list = self._normalize_sampling(sampling_params_list, n)

        final_ids = set(self.final_stage_ids)
        if output_modality is not None:
            cut = get_final_stage_id_for_e2e(self.stage_configs, output_modality)
            final_ids = {cut}

        states: dict[str, _RequestState] = {}
        req_sps: dict[str, dict[int, Optional[SamplingParams]]] = {}
        order: list[str] = []
        for prompt, sps in zip(prompt_list, sp_list):
            rid = f"omni-{next(self._counter)}"
            order.append(rid)
            st = _RequestState(rid, prompt, len(self.stages))
            st.pending_final = set(final_ids)
            states[rid] = st
            req_sps[rid] = sps
            self.metrics.on_request_start(rid)
            first_stage = self.stage_configs[0].stage_id
            self.stages[first_stage].submit(
                StageTask(rid, prompt, sps.get(first_stage))
            )

        deadline = time.monotonic() + timeout
        remaining = set(states)
        while remaining:
            try:
                so = self.out_q.get(timeout=max(0.01, deadline - time.monotonic()))
            except queue.Empty:
                raise TimeoutError(
                    f"requests not finished: {sorted(remaining)}") from None
            st = states.get(so.request_id)
            if st is None:
                continue
            if so.metrics:
                self.metrics.on_stage_metrics(so.metrics)
            if so.error is not None:
                st.error = so.error
                remaining.discard(st.request_id)
                continue
            self._handle_stage_output(st, so, req_sps[st.request_id], final_ids)
            if st.done:
                self.metrics.on_request_finish(
                    st.request_id,
                    sum(
                        o.request_output.num_generated_tokens
                        for o in st.final_outputs
                        if o.request_output is not None
                    ),
                )
                remaining.discard(st.request_id)

        results: list[OmniRequestOutput] = []
        for rid in order:
            st = states[rid]
            if st.error is not None:
                results.append(OmniRequestOutput(request_id=rid, error=st.error))
            else:
                results.extend(st.final_outputs)
        return results

    def _handle_stage_output(
        self,
        st: _RequestState,
        so: StageOutput,
        sps: dict[int, Optional[SamplingParams]],
        final_ids: set[int],
    ) -> None:
        sid = so.stage_id
        st.stage_outputs[sid] = so.output
        cfg = self.stages[sid].config
        if sid in final_ids:
            out = so.output
            if isinstance(out, OmniRequestOutput):
                out.stage_id = sid
                st.final_outputs.append(out)
            else:
                st.final_outputs.append(
                    OmniRequestOutput.from_stage(
                        st.request_id, sid, cfg.final_output_type, out
                    )
                )
            st.pending_final.discard(sid)
            if not st.pending_final:
                return
        # forward to consumers whose inputs are all available
        for nxt_id in self.consumers.get(sid, []):
            nxt = self.stages[nxt_id]
            proc = st.stream_procs.get(nxt_id)
            if proc is not None:
                # incremental edge: the consumer is (or will be) driven
                # by live feeds; on_final closes them, or returns the
                # batch prompt if the edge never engaged
                try:
                    next_input = proc.on_final(sid, so.output)
                except Exception as e:
                    import traceback

                    logger.error(
                        "stream processor for stage %d failed on %s: %s",
                        nxt_id, st.request_id, e)
                    st.error = (
                        f"stage {nxt_id} stream processor: {e}\n"
                        f"{traceback.format_exc()}")
                    st.cancel_streams()
                    return
                if next_input is None:
                    continue
                proc.submitted = True
                nxt.submit(StageTask(
                    st.request_id, next_input, sps.get(nxt_id),
                    stream=self._stream_flag(st, nxt_id, final_ids)))
                continue
            needed = nxt.config.engine_input_source
            if not all(s in st.stage_outputs for s in needed):
                continue
            upstream = {s: st.stage_outputs[s] for s in needed}
            try:
                next_input = nxt.process_engine_inputs(upstream, st.prompt)
            except Exception as e:
                # input-processor failures surface as per-request errors
                # (reference omni_stage.py:822-833), never crash the loop
                import traceback

                logger.error(
                    "input processor for stage %d failed on request %s: %s",
                    nxt_id, st.request_id, e)
                st.error = (
                    f"stage {nxt_id} input processor: {e}\n"
                    f"{traceback.format_exc()}")
                return
            nxt.submit(StageTask(
                st.request_id, next_input, sps.get(nxt_id),
                stream=self._stream_flag(st, nxt_id, final_ids)))

    def _stream_flag(self, st: _RequestState, stage_id: int,
                     final_ids: set[int]) -> bool:
        """A stage task streams when the client streams AND its partials
        have a consumer: the client (final stage) or an incremental
        downstream edge (stages/streaming.py)."""
        return st.stream and (stage_id in final_ids
                              or stage_id in st.stream_sources)

    def _make_stream_procs(
        self, prompt: Any, request_id: str = "",
        sps: Optional[dict] = None, final_ids: Optional[set] = None,
    ) -> tuple[dict[int, Any], set[int]]:
        """Instantiate incremental edge processors for a streaming
        request. Local consumers get the processor in-process; REMOTE
        consumers get a RemoteEdgeStreamProxy — the processor runs on
        the stage host and upstream partials relay over the control
        socket (device arrays become numpy at the boundary), so
        disaggregated pipelines keep the incremental-TTFT win. A remote
        UPSTREAM needs nothing special: its partial StageOutputs already
        arrive (deserialized) through the result pump."""
        from vllm_omni_tpu.stages.remote import (
            RemoteEdgeStreamProxy,
            RemoteStage,
        )

        procs: dict[int, Any] = {}
        sources: set[int] = set()
        for cfg in self.stage_configs:
            if len(cfg.engine_input_source) != 1:
                continue
            try:
                cls = cfg.resolve_stream_input_processor()
            except Exception as e:
                logger.warning(
                    "stage %d stream_input_processor unresolvable: %s",
                    cfg.stage_id, e)
                continue
            if cls is None:
                continue
            src = cfg.engine_input_source[0]
            consumer = self.stages[cfg.stage_id]
            if isinstance(consumer, RemoteStage):
                sp = (sps or {}).get(cfg.stage_id)
                # the host-side task streams when its partials have a
                # consumer: the client (final stage) or a further
                # incremental edge off this stage
                downstream_edge = any(
                    c.stream_input_processor
                    and c.engine_input_source == [cfg.stage_id]
                    for c in self.stage_configs)
                task_stream = (cfg.stage_id in (final_ids or set())
                               or downstream_edge)
                procs[cfg.stage_id] = RemoteEdgeStreamProxy(
                    consumer, request_id, prompt, sp, task_stream, src)
                sources.add(src)
                continue
            if consumer.engine is None:
                continue
            procs[cfg.stage_id] = cls(consumer, prompt)
            sources.add(src)
        return procs, sources

    def _normalize_sampling(
        self, sampling_params_list, n: int
    ) -> list[dict[int, Optional[SamplingParams]]]:
        """Each request gets {stage_id: SamplingParams|None}."""
        stage_ids = [c.stage_id for c in self.stage_configs]

        def norm_one(sp) -> dict[int, Optional[SamplingParams]]:
            if sp is None:
                return {}
            if isinstance(sp, SamplingParams):
                return {stage_ids[0]: sp}
            if isinstance(sp, dict):
                return dict(sp)
            if isinstance(sp, (list, tuple)):
                return {sid: p for sid, p in zip(stage_ids, sp)}
            raise TypeError(type(sp))

        if sampling_params_list is None:
            return [{} for _ in range(n)]
        if isinstance(sampling_params_list, (SamplingParams, dict)):
            return [norm_one(sampling_params_list) for _ in range(n)]
        if len(sampling_params_list) != n:
            # one spec per stage, shared across requests
            return [norm_one(list(sampling_params_list)) for _ in range(n)]
        return [norm_one(sp) for sp in sampling_params_list]

    def get_stats(self) -> dict[str, Any]:
        return self.metrics.summary()

    def shutdown(self) -> None:
        for stage in self.stages.values():
            stage.shutdown()
        self.metrics.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()
