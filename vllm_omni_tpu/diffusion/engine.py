"""Diffusion engine: single-controller pipeline executor.

Parity role: DiffusionEngine + Scheduler + GPUWorker/WorkerProc (reference
diffusion/diffusion_engine.py:56-363, scheduler.py:14-87,
worker/gpu_worker.py:32-314). The reference spawns one process per GPU
with broadcast MessageQueues because torch needs a process per device; on
TPU one controller drives the whole mesh, so the engine IS the worker —
requests execute inline under jit. Like the reference's diffusion
scheduler, requests run one at a time (reference gpu_worker.py:129).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import numpy as np

from vllm_omni_tpu.config.diffusion import (
    OmniDiffusionConfig,
    set_current_omni_diffusion_config,
)
from vllm_omni_tpu.diffusion.request import OmniDiffusionRequest
from vllm_omni_tpu.logger import init_logger
from vllm_omni_tpu.models.registry import (
    pipeline_class_from_model_index,
    resolve_diffusion_pipeline,
)
from vllm_omni_tpu.outputs import OmniRequestOutput

logger = init_logger(__name__)


def tensor_to_pil(image) -> list[Any]:
    """[B,3,H,W] in [-1,1] -> list of PIL images (postprocess parity with
    the reference image_processor.postprocess)."""
    arr = np.asarray(image, np.float32)
    arr = np.clip(arr / 2 + 0.5, 0.0, 1.0)
    arr = (arr * 255).round().astype(np.uint8).transpose(0, 2, 3, 1)
    try:
        from PIL import Image

        return [Image.fromarray(a) for a in arr]
    except ImportError:
        return [a for a in arr]


class DiffusionEngine:
    def __init__(
        self,
        od_config: OmniDiffusionConfig,
        pipeline: Optional[Any] = None,
        load_weights: bool = True,
        text_encoder: Optional[Callable] = None,
        devices: Optional[list] = None,
        pipeline_kwargs: Optional[dict] = None,
    ):
        self.od_config = od_config
        set_current_omni_diffusion_config(od_config)
        if pipeline is not None:
            self.pipeline = pipeline
        else:
            cls_name = od_config.pipeline_class or pipeline_class_from_model_index(
                od_config.model
            )
            if cls_name is None:
                raise ValueError(
                    f"cannot resolve pipeline class for {od_config.model!r}"
                )
            pipe_cls = resolve_diffusion_pipeline(cls_name)
            kw = {"load_weights": load_weights,
                  "text_encoder": text_encoder}
            kw.update(pipeline_kwargs or {})
            self.pipeline = pipe_cls(od_config, **kw)
        if od_config.cache_config.cache_backend:
            from vllm_omni_tpu.diffusion.cache import get_cache_backend

            self.pipeline.cache_backend = get_cache_backend(
                od_config.cache_config, self.pipeline
            )
        pc = od_config.parallel_config
        if (pc.data_parallel_size > 1 or pc.vae_parallel_size > 0
                or pc.sequence_parallel_size > 1):
            from vllm_omni_tpu.diffusion.parallel_placement import (
                setup_parallel_placement,
            )

            setup_parallel_placement(self.pipeline, od_config,
                                     devices=devices)

    def step(self, requests: list[OmniDiffusionRequest]) -> list[OmniRequestOutput]:
        # two phases: LAUNCH every request's denoise+decode (device work
        # is dispatched async; results stay device arrays), then
        # MATERIALIZE outputs in order. With a VAE device slice
        # (parallel_placement.VaeDecoder), request N's VAE decode then
        # genuinely overlaps request N+1's denoise — the reference
        # carves a _VAE group for exactly this
        # (reference parallel_state.py:499-508)
        launched: list[tuple] = []
        for req in requests:
            try:
                if req.profile:
                    # per-request JAX profiler capture around the whole
                    # forward (reference request.py profile fields);
                    # profiled requests materialize inside the capture
                    from vllm_omni_tpu.utils.profiling import (
                        start_profile,
                        stop_profile,
                    )

                    start_profile()
                    try:
                        result, metrics = self.pipeline.forward(req)
                        np.asarray(result)
                    finally:
                        stop_profile()
                else:
                    result, metrics = self.pipeline.forward(req)
                launched.append((req, result, metrics, None))
            except Exception as e:  # error surface parity: engine returns
                # per-request errors instead of crashing (reference
                # omni_stage.py:822-833)
                logger.exception("diffusion request %s failed", req.request_id)
                launched.append((req, None, None, str(e)))

        outputs = []
        for req, result, metrics, err in launched:
            if err is None:
                try:
                    if req.output_type == "latent":
                        out = OmniRequestOutput.from_diffusion(
                            request_id=req.request_id, images=None,
                            latents=result, prompt=str(req.prompt),
                            metrics=metrics,
                        )
                    else:
                        images = tensor_to_pil(result)
                        if req.output_type == "np":
                            images = [np.asarray(im) for im in images]
                        out = OmniRequestOutput.from_diffusion(
                            request_id=req.request_id, images=images,
                            prompt=str(req.prompt), metrics=metrics,
                        )
                except Exception as e:  # deferred device errors surface
                    # at materialization time
                    logger.exception(
                        "diffusion request %s failed", req.request_id)
                    out = OmniRequestOutput.from_diffusion(
                        request_id=req.request_id, images=None,
                        error=str(e),
                    )
            else:
                out = OmniRequestOutput.from_diffusion(
                    request_id=req.request_id, images=None, error=err,
                )
            outputs.append(out)
        return outputs

    def shutdown(self) -> None:
        set_current_omni_diffusion_config(None)
