"""Stage (pipeline DAG) configuration.

Parity: the reference's stage YAML schema — `stage_args` list with
stage_id / stage_type / runtime / engine_args / engine_input_source /
custom_process_input_func / final_output(_type) / default_sampling_params
(reference model_executor/stage_configs/qwen3_omni_moe.yaml:7-100, loaded by
entrypoints/utils.py:141-191). Loaded here with PyYAML (no OmegaConf dep).

TPU mapping: `runtime.devices` selects a slice of jax.devices() for the
stage's mesh instead of CUDA_VISIBLE_DEVICES pinning
(reference stage_utils.py:14 set_stage_devices).
"""

from __future__ import annotations

import importlib
import os
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import yaml

from vllm_omni_tpu.config.engine import EngineArgs


@dataclass
class StageRuntimeConfig:
    devices: str = ""  # "" = all visible; "0,1" = device indices
    # "host:port" of a stage-host process (stages/remote.py) — the
    # orchestrator builds a RemoteStage proxy instead of a local engine
    # (multi-host placement; the reference's Ray backend role)
    remote: str = ""
    # optional shell template to (re)launch the host at `remote`
    # ("ssh {host} python -m vllm_omni_tpu.stages.remote --config ...
    #   --port {port}"); placeholders: {host} {port} {config}. With it,
    # a dead/unresponsive remote host is relaunched and its in-flight
    # requests re-submitted (the reference's Ray actor-restart intent);
    # without it, recovery waits for the address to come back.
    relaunch_cmd: str = ""
    # protocol health-check cadence for remote/supervised hosts: a ping
    # every `ping_interval` seconds; no pong for `ping_timeout` seconds
    # marks the host down (wedged-process detection — a crash is caught
    # faster by the reader's connection error). <=0 disables.
    ping_interval: float = 5.0
    ping_timeout: float = 20.0
    max_batch_size: int = 8
    batch_timeout: float = 0.02
    # edge-keyed connector specs: {"0->1": {"type": "inproc", ...}}
    connectors: dict[str, dict[str, Any]] = field(default_factory=dict)

    def device_indices(self) -> Optional[list[int]]:
        if not self.devices:
            return None
        return [int(x) for x in str(self.devices).split(",") if str(x).strip() != ""]


@dataclass
class StageConfig:
    stage_id: int
    stage_type: str = "llm"  # "llm" | "diffusion"
    runtime: StageRuntimeConfig = field(default_factory=StageRuntimeConfig)
    engine_args: EngineArgs = field(default_factory=EngineArgs)
    # Upstream stage ids whose outputs feed this stage
    # (reference omni_stage.py engine_input_source).
    engine_input_source: list[int] = field(default_factory=list)
    # Dotted path "pkg.mod.fn" mapping upstream outputs -> this stage's
    # prompts (reference stage_input_processors/qwen3_omni.py:51-183).
    custom_process_input_func: Optional[str] = None
    # Dotted path to a stages.streaming.StreamInputProcessor subclass:
    # when the client streams and every stage on the edge is local, the
    # upstream hands off INCREMENTALLY through it (beyond-reference; the
    # reference only hands off on stage completion, omni_stage.py:819).
    stream_input_processor: Optional[str] = None
    final_output: bool = False
    final_output_type: str = "text"
    is_comprehension: bool = False
    default_sampling_params: dict[str, Any] = field(default_factory=dict)
    # Diffusion-stage passthrough kwargs (height/width/steps defaults...).
    diffusion_args: dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        """JSON-safe dict (inverse of stage_config_from_dict) for
        shipping the config to a stage-host subprocess
        (stages/supervisor.py)."""
        import dataclasses

        if callable(self.custom_process_input_func):
            raise TypeError(
                "custom_process_input_func must be a dotted path (not a "
                "callable) for a remote/supervised stage")
        runtime = dataclasses.asdict(self.runtime)
        runtime["remote"] = ""  # the child IS the host
        runtime["relaunch_cmd"] = ""
        return {
            "stage_id": self.stage_id,
            "stage_type": self.stage_type,
            "runtime": runtime,
            "engine_args": dataclasses.asdict(self.engine_args),
            "engine_input_source": list(self.engine_input_source),
            "custom_process_input_func": self.custom_process_input_func,
            "stream_input_processor": self.stream_input_processor,
            "final_output": self.final_output,
            "final_output_type": self.final_output_type,
            "is_comprehension": self.is_comprehension,
            "default_sampling_params": dict(self.default_sampling_params),
            "diffusion_args": dict(self.diffusion_args),
        }

    def resolve_stream_input_processor(self):
        """Resolve stream_input_processor to its class (or None)."""
        if not self.stream_input_processor:
            return None
        if callable(self.stream_input_processor):
            return self.stream_input_processor
        mod_path, _, cls_name = self.stream_input_processor.rpartition(".")
        mod = importlib.import_module(mod_path)
        return getattr(mod, cls_name)

    def resolve_input_processor(self) -> Optional[Callable]:
        if not self.custom_process_input_func:
            return None
        if callable(self.custom_process_input_func):
            return self.custom_process_input_func
        mod_path, _, fn_name = self.custom_process_input_func.rpartition(".")
        mod = importlib.import_module(mod_path)
        return getattr(mod, fn_name)


def _parse_stage(d: dict[str, Any], model: str = "") -> StageConfig:
    d = dict(d)
    runtime = StageRuntimeConfig(**(d.pop("runtime", {}) or {}))
    engine_args_d = dict(d.pop("engine_args", {}) or {})
    engine_args_d.setdefault("model", model)
    engine_args_d.setdefault("stage_id", d.get("stage_id", 0))
    engine_args = EngineArgs.from_dict(engine_args_d)
    known = {
        "stage_id",
        "stage_type",
        "engine_input_source",
        "custom_process_input_func",
        "stream_input_processor",
        "final_output",
        "final_output_type",
        "is_comprehension",
        "default_sampling_params",
        "diffusion_args",
    }
    extra = {k: v for k, v in d.items() if k not in known}
    kwargs = {k: v for k, v in d.items() if k in known}
    cfg = StageConfig(runtime=runtime, engine_args=engine_args, **kwargs)
    if extra:
        cfg.diffusion_args.update(extra)
    return cfg


def stage_config_from_dict(d: dict[str, Any], model: str = "") -> StageConfig:
    """Public alias used by the stage-host CLI (stages/remote.py)."""
    return _parse_stage(d, model)


def load_stage_configs_from_yaml(path: str, model: str = "") -> list[StageConfig]:
    """Parse a stage YAML into StageConfigs.

    Parity: load_stage_configs_from_yaml (reference entrypoints/utils.py:166).
    """
    with open(path) as f:
        doc = yaml.safe_load(f)
    stages = [
        _parse_stage(s, model=model) for s in doc.get("stage_args", [])
    ]
    stages.sort(key=lambda s: s.stage_id)
    _validate_dag(stages)
    return stages


def load_stage_configs_from_model(model_path: str) -> list[StageConfig]:
    """Find a stage YAML shipped inside a model directory, else synthesize.

    Parity: load_stage_configs_from_model + single-diffusion-stage fallback
    (reference entrypoints/utils.py:141, omni.py:121-147).
    """
    for name in ("stage_configs.yaml", "omni_stages.yaml"):
        p = os.path.join(model_path, name)
        if os.path.isfile(p):
            return load_stage_configs_from_yaml(p, model=model_path)
    # Built-in per-architecture default.
    from vllm_omni_tpu.models.registry import default_stage_yaml_for_model

    p = default_stage_yaml_for_model(model_path)
    if p is not None:
        return load_stage_configs_from_yaml(p, model=model_path)
    # Fallback: single LLM stage.
    return [
        StageConfig(
            stage_id=0,
            stage_type="llm",
            engine_args=EngineArgs(model=model_path),
            final_output=True,
            final_output_type="text",
        )
    ]


def _validate_dag(stages: list[StageConfig]) -> None:
    ids = {s.stage_id for s in stages}
    if len(ids) != len(stages):
        raise ValueError("Duplicate stage_id in stage config")
    for s in stages:
        for src in s.engine_input_source:
            if src not in ids:
                raise ValueError(
                    f"stage {s.stage_id} references unknown input stage {src}"
                )
            if src >= s.stage_id:
                raise ValueError(
                    f"stage {s.stage_id} input {src} must be an earlier stage"
                )
    if not any(s.final_output for s in stages):
        raise ValueError("At least one stage must set final_output: true")


def get_final_stage_id_for_e2e(
    stages: list[StageConfig], output_modality: str = "text"
) -> int:
    """Earliest final stage able to produce the requested modality —
    modality-based early exit (reference entrypoints/utils.py:191).
    """
    for s in stages:
        if s.final_output and s.final_output_type == output_modality:
            return s.stage_id
    finals = [s.stage_id for s in stages if s.final_output]
    return max(finals)
