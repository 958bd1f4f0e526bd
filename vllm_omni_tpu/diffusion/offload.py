"""Component CPU offload for diffusion pipelines.

Parity with the reference's enable_model_cpu_offload-style flags
(reference diffusion/data.py:290-295 dit/text_encoder/image_encoder/
vae_cpu_offload, applied via accelerate hooks in its pipelines).

TPU-native equivalent: an offloaded component's params are pinned to
host memory (numpy); when the component's jitted function runs, XLA
streams them H2D for that call and HBM is released afterwards. No
explicit hook machinery — JAX's host/device placement does the work.
"""

from __future__ import annotations

import contextlib
from typing import Any

import jax
import numpy as np


def offload_to_host(tree: Any) -> Any:
    """Move every array leaf of a param tree to host memory (numpy)."""
    return jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)


def init_device_for(od_config: Any):
    """Device context for param INIT: int8-quantized configs initialize
    on HOST — the full-precision intermediates (QwenImage 40L is ~27 GB
    bf16) would not fit HBM before quantization ships int8."""
    if getattr(od_config, "quantization", None):
        cpus = jax.devices("cpu")
        if cpus:
            return jax.default_device(cpus[0])
    return contextlib.nullcontext()


def apply_offload_policy(params: dict[str, Any], od_config: Any) -> dict:
    """Pin configured components host-side. Keys follow the pipeline
    param conventions: 'transformer'/'transformer_2' (DiT), 'vae',
    'text_encoder', 'image_encoder'.

    Weight-only int8 (`od_config.quantization == "int8"`) applies FIRST
    so offloaded host copies — and any phase-offload H2D puts — move
    int8 bytes, not bf16. This is how QwenImage's real 40L depth fits
    one 16 GB chip (~27 GB bf16 -> ~13.5 GB W8A16)."""
    if getattr(od_config, "quantization", None) == "int8":
        from vllm_omni_tpu.ops.quant import quantize_diffusion_params

        for key in ("transformer", "transformer_2"):
            if params.get(key) is not None:
                params[key] = quantize_diffusion_params(params[key])
    dit_off = (getattr(od_config, "dit_cpu_offload", False)
               or getattr(od_config, "dit_phase_offload", False))
    flags = {
        "transformer": dit_off,
        "transformer_2": dit_off,
        "vae": getattr(od_config, "vae_cpu_offload", False),
        "text_encoder": getattr(
            od_config, "text_encoder_cpu_offload", False),
        "image_encoder": getattr(
            od_config, "image_encoder_cpu_offload", False),
    }
    for key, off in flags.items():
        if off and params.get(key) is not None:
            params[key] = offload_to_host(params[key])
    if getattr(od_config, "quantization", None):
        # quantized configs built EVERYTHING on host (init_device_for);
        # ship each non-offloaded component to the accelerator now —
        # leaving a tree host-committed would stream it H2D on EVERY
        # jitted step
        dev = jax.devices()[0]
        if dev.platform != "cpu":
            for key, off in flags.items():
                if not off and params.get(key) is not None:
                    params[key] = jax.device_put(params[key], dev)
    return params
