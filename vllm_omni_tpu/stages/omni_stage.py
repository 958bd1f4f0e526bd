"""Per-stage lifecycle + worker.

Parity: OmniStage (reference entrypoints/omni_stage.py:78-1273): holds the
stage config (stage_type, engine_args, runtime, engine_input_source,
custom_process_input_func, final_output(_type), default_sampling_params),
runs a worker with batch assembly (max_batch_size/batch_timeout), submits/
collects tasks, and derives next-stage inputs from upstream outputs.

TPU design delta: stages are threads inside ONE controller process, not
spawned processes — jitted engine steps release the GIL during device
execution so stage overlap is real, and stage→stage payloads can stay on
device (SURVEY.md §7 design stance).
"""

from __future__ import annotations

import queue
import threading
import time
import traceback
from typing import Any, Callable, Optional

from vllm_omni_tpu.config.stage import StageConfig
from vllm_omni_tpu.logger import init_logger
from vllm_omni_tpu.sampling_params import SamplingParams
from vllm_omni_tpu.utils.metrics import StageRequestMetrics

logger = init_logger(__name__)

STOP = object()  # queue sentinel


def _output_work_tokens(out: Any) -> int:
    """Per-request token count for stage tps metrics.

    AR stages: generated token ids. Non-AR stages (code2wav) emit
    waveforms with no token ids; their engines record the work unit
    (codec frames synthesized) in RequestOutput.metrics instead — the
    reference's overall_tps counts every stage's tokens
    (qwen3_omni_moe_transformers.py:182)."""
    if out is None:
        return 0
    n = getattr(out, "num_generated_tokens", 0) or 0
    if not n:
        m = getattr(out, "metrics", None)
        n = getattr(m, "num_generated_tokens", 0) or 0
    return n


def prepare_sampling_params(
    defaults: dict[str, Any], override: Optional[SamplingParams]
) -> SamplingParams:
    """Stage defaults merged with per-request overrides.

    Parity: prepare_sampling_params (reference omni_stage.py:49)."""
    base = SamplingParams.from_dict(defaults or {})
    if override is None:
        return base
    return override  # explicit per-stage params win wholesale


class StageTask:
    __slots__ = (
        "request_id", "prompt", "sampling_params", "diffusion_kwargs",
        "submitted_ts", "stream",
    )

    def __init__(self, request_id, prompt, sampling_params=None,
                 diffusion_kwargs=None, stream=False):
        self.request_id = request_id
        self.prompt = prompt
        self.sampling_params = sampling_params
        self.diffusion_kwargs = diffusion_kwargs or {}
        self.submitted_ts = time.monotonic()
        # incremental emission: the stage pushes partial StageOutputs
        # (per token step / per audio chunk) before the final one
        self.stream = stream


class StageOutput:
    __slots__ = ("request_id", "stage_id", "output", "metrics", "error",
                 "partial")

    def __init__(self, request_id, stage_id, output=None, metrics=None,
                 error=None, partial=False):
        self.request_id = request_id
        self.stage_id = stage_id
        self.output = output
        self.metrics = metrics
        self.error = error
        self.partial = partial


class OmniStage:
    def __init__(
        self,
        config: StageConfig,
        out_q: "queue.Queue[StageOutput]",
        engine_factory: Optional[Callable[[StageConfig], Any]] = None,
    ):
        self.config = config
        self.stage_id = config.stage_id
        self.out_q = out_q
        self.in_q: "queue.Queue" = queue.Queue()
        self.engine = None
        self.engine_factory = engine_factory
        self.input_processor = config.resolve_input_processor()
        self.ready = threading.Event()
        self.init_error: Optional[BaseException] = None
        self._threads: list[threading.Thread] = []
        # stage-level DP: data_parallel_size > 1 on an LLM stage runs N
        # full engine replicas pulling from the shared task queue
        # (work-stealing = throughput-balanced routing; parity with the
        # reference's vLLM AR DP, gpu_ar_worker.py:31-57)
        self.n_replicas = 1
        if (config.stage_type == "llm"
                and engine_factory is None
                and config.engine_args.data_parallel_size > 1):
            self.n_replicas = config.engine_args.data_parallel_size
        self.engines: list = []
        self._init_lock = threading.Lock()
        self._ready_count = 0
        # request ids whose client went away: streaming loops stop early
        self._aborted: set[str] = set()
        # disaggregation: runtime.devices pins this stage's engines to a
        # slice of jax.devices(); non-mesh engines run under
        # jax.default_device(slice[0]) and edge payloads are re-homed on
        # entry (reference: per-stage CUDA_VISIBLE_DEVICES pinning,
        # omni_stage.py:403-600 + stage_utils.py:14)
        self._exec_device = None
        self._pinned = False

    def _stage_devices(self):
        idx = self.config.runtime.device_indices()
        if idx is None:
            return None
        import jax

        devs = jax.devices()
        missing = [i for i in idx if i >= len(devs)]
        if missing:
            raise ValueError(
                f"stage {self.stage_id}: runtime.devices {idx} out of "
                f"range, only {len(devs)} visible")
        return [devs[i] for i in idx]

    def _place_prompt(self, obj):
        """Re-home live device arrays crossing the stage edge onto this
        stage's slice (ICI device-to-device; no host round-trip). LLM
        engines re-upload through the packed step descriptor anyway, so
        their inputs are pulled to host instead — both directions keep
        cross-slice hand-offs explicit at the edge."""
        if not self._pinned:
            return obj
        import jax

        to_host = self._exec_device is None  # mesh (LLM) engines

        def put(x):
            if isinstance(x, jax.Array):
                if to_host:
                    import numpy as np

                    return np.asarray(x)
                return jax.device_put(x, self._exec_device)
            return x

        return jax.tree_util.tree_map(put, obj)

    @property
    def _thread(self):  # back-compat alias (single-replica callers)
        return self._threads[0] if self._threads else None

    # ------------------------------------------------------------- setup
    def init_stage_worker(self) -> None:
        """Start the stage worker thread(s) (engines built inside them).

        Parity: init_stage_worker spawning _stage_worker
        (reference omni_stage.py:196-300)."""
        for i in range(self.n_replicas):
            th = threading.Thread(
                target=self._stage_worker, args=(i,),
                name=f"stage-{self.stage_id}.{i}", daemon=True,
            )
            self._threads.append(th)
            th.start()

    def _build_engine(self, replica: int = 0):
        if self.engine_factory is not None:
            return self.engine_factory(self.config)
        devs = self._stage_devices()
        if devs is not None and self.n_replicas == 1:
            self._pinned = True
            if self.config.stage_type == "llm":
                from vllm_omni_tpu.engine.llm import LLM

                # mesh engines build their TP/EP/SP mesh over the slice
                return LLM(engine_args=self.config.engine_args,
                           devices=devs)
            # single-device engines: construct AND run under
            # jax.default_device(slice[0]) (thread-local, see
            # _stage_worker)
            import jax

            self._exec_device = devs[0]
            with jax.default_device(self._exec_device):
                return self._build_engine_unpinned(replica)
        return self._build_engine_unpinned(replica)

    def _build_engine_unpinned(self, replica: int = 0):
        if self.n_replicas > 1:
            # each replica: an independent single-DP engine on its own
            # device slice (slice width = the engine's non-DP world size)
            import dataclasses

            import jax

            args = dataclasses.replace(
                self.config.engine_args, data_parallel_size=1)
            per = (args.tensor_parallel_size * args.expert_parallel_size
                   * args.sequence_parallel_size)
            devs = jax.devices()
            idx = self.config.runtime.device_indices()
            if idx is not None:
                devs = [devs[i] for i in idx]
            lo = replica * per
            if lo + per > len(devs):
                raise ValueError(
                    f"stage {self.stage_id}: DP replica {replica} needs "
                    f"devices [{lo}, {lo + per}), only {len(devs)} visible")
            from vllm_omni_tpu.engine.llm import LLM

            return LLM(engine_args=args, devices=devs[lo:lo + per])
        if self.config.stage_type == "token2wav":
            from vllm_omni_tpu.config.model import ModelConfig
            from vllm_omni_tpu.models.qwen2_5_omni.token2wav_engine import (
                Token2WavEngine,
            )

            args = self.config.engine_args
            mc = ModelConfig(
                model=args.model, hf_config=args.hf_config, dtype=args.dtype,
                engine_output_type="audio",
            )
            return Token2WavEngine(
                mc, load_weights=args.load_format != "random",
                **self.config.diffusion_args)
        if self.config.stage_type == "talker":
            from vllm_omni_tpu.models.qwen3_omni.talker_engine import (
                TalkerEngine,
            )

            args = self.config.engine_args
            accepted = ("dtype", "max_len", "predictor_greedy",
                        "suppress_special", "seed")
            kw = {k: v for k, v in self.config.diffusion_args.items()
                  if k in accepted}
            return TalkerEngine(
                hf_config=args.hf_config or {}, model_path=args.model,
                load_weights=args.load_format != "random", **kw,
            )
        if self.config.stage_type == "code2wav":
            from vllm_omni_tpu.models.qwen3_omni.code2wav_engine import (
                Code2WavEngine,
            )

            args = self.config.engine_args
            return Code2WavEngine(
                hf_config=args.hf_config or {}, model_path=args.model,
                load_weights=args.load_format != "random",
                **self.config.diffusion_args,
            )
        if self.config.stage_type == "diffusion":
            from vllm_omni_tpu.config.diffusion import OmniDiffusionConfig
            from vllm_omni_tpu.diffusion.engine import DiffusionEngine

            dargs = dict(self.config.diffusion_args)
            # component configs for the pipeline constructor (tiny test
            # models / custom component sources, parity with the
            # reference's per-component diffusers sources)
            pipeline_kwargs = dargs.pop("pipeline_kwargs", {})
            od = OmniDiffusionConfig(
                model=self.config.engine_args.model,
                dtype=self.config.engine_args.dtype,
                **dargs,
            )
            return DiffusionEngine(od, devices=self._stage_devices(),
                                   pipeline_kwargs=pipeline_kwargs)
        from vllm_omni_tpu.engine.llm import LLM

        return LLM(engine_args=self.config.engine_args)

    # ------------------------------------------------------------ worker
    def _stage_worker(self, replica: int = 0) -> None:
        try:
            engine = self._build_engine(replica)
        except BaseException as e:  # surfaced by wait_ready
            self.init_error = e
            self.ready.set()
            return
        with self._init_lock:
            self.engines.append(engine)
            if self.engine is None:
                self.engine = engine
            self._ready_count += 1
            if self._ready_count == self.n_replicas:
                self.ready.set()
        max_batch = max(1, self.config.runtime.max_batch_size)
        timeout = self.config.runtime.batch_timeout
        while True:
            task = self.in_q.get()
            if task is STOP:
                return
            batch = [task]
            if getattr(task, "stream", False):
                # streaming tasks run singly (no batch assembly delay)
                self._run_batch(batch, engine)
                continue
            # batch assembly (reference omni_stage.py:605-640)
            deadline = time.monotonic() + timeout
            while len(batch) < max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self.in_q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is STOP:
                    self.in_q.put(STOP)
                    break
                batch.append(nxt)
            self._run_batch(batch, engine)

    def _run_batch(self, batch: list[StageTask], engine=None) -> None:
        engine = engine if engine is not None else self.engine
        t0 = time.monotonic()
        # any abort flag for these requests is consumed by this run
        # (streaming loops check mid-run); drop entries afterwards so
        # disconnected ids do not accumulate for the process lifetime
        try:
            if self._pinned:
                for task in batch:
                    task.prompt = self._place_prompt(task.prompt)
            if self._exec_device is not None:
                import jax

                with jax.default_device(self._exec_device):
                    self._do_run_batch(batch, engine, t0)
            else:
                self._do_run_batch(batch, engine, t0)
        finally:
            for task in batch:
                self._aborted.discard(task.request_id)

    def _do_run_batch(self, batch: list[StageTask], engine, t0) -> None:
        try:
            stream_fn = getattr(engine, "generate_stream", None)
            if (stream_fn is not None and len(batch) == 1
                    and batch[0].stream
                    and self.config.stage_type != "diffusion"):
                self._run_stream(batch[0], engine, t0)
                return
            if self.config.stage_type == "diffusion":
                outputs = self._run_diffusion_batch(batch, engine)
            else:
                outputs = self._run_llm_batch(batch, engine)
            gen_time = time.monotonic() - t0
            for task, out in zip(batch, outputs):
                m = StageRequestMetrics(
                    request_id=task.request_id,
                    stage_id=self.stage_id,
                    arrival_ts=task.submitted_ts,
                    finished_ts=time.monotonic(),
                    gen_time_s=gen_time / max(len(batch), 1),
                    num_output_tokens=_output_work_tokens(out),
                )
                self.out_q.put(StageOutput(
                    request_id=task.request_id, stage_id=self.stage_id,
                    output=out, metrics=m,
                ))
        except BaseException as e:
            # per-request error surface (reference omni_stage.py:822-833)
            tb = traceback.format_exc()
            logger.error("stage %d batch failed: %s\n%s", self.stage_id, e, tb)
            for task in batch:
                self.out_q.put(StageOutput(
                    request_id=task.request_id, stage_id=self.stage_id,
                    error=f"{e}\n{tb}",
                ))

    def _run_stream(self, task: StageTask, engine, t0: float) -> None:
        """Incremental emission for one request: per-step (LLM) or
        per-chunk (code2wav) partial StageOutputs, then the final one.
        Beyond-reference: the reference rejects HTTP streaming
        (serving_chat.py:268-269)."""
        sp = None
        if self.config.stage_type in ("llm", "talker"):
            sp = prepare_sampling_params(
                self.config.default_sampling_params, task.sampling_params)
        last = None
        for out in engine.generate_stream(task.prompt, sp):
            last = out
            if task.request_id in self._aborted:
                self._aborted.discard(task.request_id)
                abort_fn = getattr(engine, "abort_request", None)
                if abort_fn is not None and hasattr(out, "request_id"):
                    abort_fn(out.request_id)
                break
            if not out.finished:
                self.out_q.put(StageOutput(
                    request_id=task.request_id, stage_id=self.stage_id,
                    output=out, partial=True,
                ))
        m = StageRequestMetrics(
            request_id=task.request_id, stage_id=self.stage_id,
            arrival_ts=task.submitted_ts, finished_ts=time.monotonic(),
            gen_time_s=time.monotonic() - t0,
            num_output_tokens=_output_work_tokens(last),
        )
        self.out_q.put(StageOutput(
            request_id=task.request_id, stage_id=self.stage_id,
            output=last, metrics=m,
        ))

    def _run_llm_batch(self, batch: list[StageTask], engine=None):
        engine = engine if engine is not None else self.engine
        sp_list = [
            prepare_sampling_params(
                self.config.default_sampling_params, t.sampling_params
            )
            for t in batch
        ]
        return engine.generate([t.prompt for t in batch], sp_list)

    def _run_diffusion_batch(self, batch: list[StageTask], engine=None):
        engine = engine if engine is not None else self.engine
        import dataclasses

        from vllm_omni_tpu.diffusion.request import OmniDiffusionRequest

        # engine-level diffusion_args (pipeline_class, parallel_config,
        # pipeline_kwargs, cache knobs, ...) are not request fields —
        # only per-request keys flow into OmniDiffusionRequest
        req_fields = {f.name for f in dataclasses.fields(OmniDiffusionRequest)}
        reqs = []
        for t in batch:
            kwargs = {k: v for k, v in self.config.diffusion_args.items()
                      if k in req_fields}
            kwargs.update(t.diffusion_kwargs)
            prompt = t.prompt if isinstance(t.prompt, str) else ""
            if isinstance(t.prompt, dict):
                kwargs.update({k: v for k, v in t.prompt.items()
                               if k in req_fields or k == "prompt"})
                prompt = kwargs.pop("prompt", "")
            reqs.append(OmniDiffusionRequest(
                request_id=t.request_id, prompt=prompt, **kwargs))
        return engine.step(reqs)

    # --------------------------------------------------------------- API
    def submit(self, task: StageTask) -> None:
        self.in_q.put(task)

    def abort(self, request_id: str) -> None:
        """Best-effort cancel: streaming loops stop at the next step and
        release the engine (reference abort surface: EngineClient.abort,
        async_omni.py:1105-1237)."""
        self._aborted.add(request_id)

    def wait_ready(self, timeout: float = 300.0) -> None:
        if not self.ready.wait(timeout):
            raise TimeoutError(
                f"stage {self.stage_id} not ready after {timeout}s"
            )
        if self.init_error is not None:
            raise RuntimeError(
                f"stage {self.stage_id} failed to initialize"
            ) from self.init_error

    def shutdown(self) -> None:
        alive = [t for t in self._threads if t.is_alive()]
        for _ in alive:
            self.in_q.put(STOP)
        for t in alive:
            t.join(timeout=10)

    def process_engine_inputs(
        self,
        upstream_outputs: dict[int, Any],
        original_prompt: Any,
    ) -> Any:
        """Derive this stage's input from upstream stage outputs.

        Parity: process_engine_inputs + custom_process_input_func
        (reference omni_stage.py:352-400)."""
        if self.input_processor is not None:
            # processors receive the stage itself: config via stage.config,
            # and the (ready) engine for model-side embedding lookups
            return self.input_processor(self, upstream_outputs, original_prompt)
        # default edge: pass the (single) upstream's generated tokens on
        src = self.config.engine_input_source[0]
        out = upstream_outputs[src]
        if hasattr(out, "outputs"):  # RequestOutput
            return {"prompt_token_ids": list(out.outputs[0].token_ids)}
        return out
