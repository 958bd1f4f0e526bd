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

from typing import Any

import jax
import numpy as np


def offload_to_host(tree: Any) -> Any:
    """Move every array leaf of a param tree to host memory (numpy)."""
    return jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)


def apply_offload_policy(params: dict[str, Any], od_config: Any) -> dict:
    """Pin configured components host-side. Keys follow the pipeline
    param conventions: 'transformer'/'transformer_2' (DiT), 'vae',
    'text_encoder', 'image_encoder'."""
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
    return params
