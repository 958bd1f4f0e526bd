"""Device placement for diffusion DP/SP and the VAE-parallel slice.

Parity targets:
- `_DP` batch split (reference diffusion/distributed/
  parallel_state.py:661-668): the request batch axis shards over a
  "data" mesh axis — XLA partitions every step op, no rank bookkeeping.
- USP sequence parallel (reference data.py:38-64): the latent sequence
  axis shards over a "seq" mesh axis; GSPMD partitions patchify,
  attention (compiler-inserted collectives) and unpatchify. The
  explicit all-to-all/ppermute strategies remain at op level
  (parallel/ulysses.py, parallel/ring.py).
- `_VAE` group (reference parallel_state.py:499-508,711-712): the last
  `vae_parallel_size` devices are carved off for VAE decode, which then
  overlaps DiT dispatch on the head devices.

DP and SP share ONE (data, seq) mesh so their shardings compose — a
second device_put must never silently discard the other axis or land
arrays on a different device set (jit rejects mixed device sets).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from vllm_omni_tpu.logger import init_logger

logger = init_logger(__name__)


class DiffusionPlacer:
    """Placement over one (data, seq) mesh.

    `batch(x)`: shard axis 0 over "data" (replicated over "seq").
    `latent(x)`: shard axis 0 over "data" AND `seq_axis` over "seq".
    Axes whose sizes do not divide evenly stay replicated on that axis.
    """

    def __init__(self, devices: list, dp: int, sp: int,
                 seq_axis: Optional[int]) -> None:
        self.dp, self.sp = dp, sp
        self.seq_axis = seq_axis
        self.mesh = Mesh(
            np.asarray(devices[: dp * sp]).reshape(dp, sp), ("data", "seq"))

    def _put(self, x: Any, spec: list) -> Any:
        return jax.device_put(x, NamedSharding(self.mesh,
                                               PartitionSpec(*spec)))

    def batch(self, x: Any) -> Any:
        if x is None or not hasattr(x, "shape") or x.ndim == 0:
            return x
        spec = [None] * x.ndim
        if self.dp > 1 and x.shape[0] % self.dp == 0:
            spec[0] = "data"
        return self._put(x, spec)

    def latent(self, x: Any) -> Any:
        if x is None or not hasattr(x, "shape") or x.ndim == 0:
            return x
        spec = [None] * x.ndim
        if self.dp > 1 and x.shape[0] % self.dp == 0:
            spec[0] = "data"
        sa = self.seq_axis
        if (self.sp > 1 and sa is not None and sa < x.ndim and sa != 0
                and x.shape[sa] % self.sp == 0):
            spec[sa] = "seq"
        return self._put(x, spec)


class VaeDecoder:
    """Runs `decode_fn` on the VAE device slice; params live replicated
    on the same slice so jit never sees mixed device sets."""

    def __init__(self, decode_fn, devices: list) -> None:
        self.decode_fn = decode_fn
        self.devices = devices
        self.mesh = Mesh(np.asarray(devices).reshape(len(devices)),
                         ("vae",))
        self.param_sharding = NamedSharding(self.mesh, PartitionSpec())

    def _target(self, z) -> Any:
        if len(self.devices) > 1 and z.shape[0] % len(self.devices) == 0:
            return NamedSharding(self.mesh, PartitionSpec("vae"))
        return self.param_sharding

    def __call__(self, vae_params, z):
        z = jax.device_put(z, self._target(z))
        return self.decode_fn(vae_params, z)


def _setup_pipeline(pipeline, pc, devices, pp: int, n_vae: int) -> None:
    """Intra-model pipeline parallelism: transformer layer groups over a
    "pipe" mesh axis, GPipe-scheduled (parallel/pipeline.py; parity with
    the reference's PipelineGroupCoordinator, group_coordinator.py:552-908).
    Exclusive with DP/SP on the same device slice (the reference likewise
    multiplies the sizes into disjoint rank groups)."""
    from vllm_omni_tpu.parallel.pipeline import (
        make_pipe_mesh,
        shard_blocks_for_pipeline,
    )

    if pc.data_parallel_size > 1 or pc.sequence_parallel_size > 1:
        logger.warning("pipeline parallel: dp/sp must be 1 — disabled")
        return
    avail = len(devices) - max(n_vae, 0)
    if pp > avail:
        logger.warning("pipeline_parallel_size %d exceeds %d available "
                       "devices — disabled", pp, avail)
        return
    tf = getattr(pipeline, "transformer", None)
    if tf is None or not hasattr(tf, "pp_mesh"):
        logger.warning("pipeline parallel: pipeline has no PP-capable "
                       "transformer — disabled")
        return
    blocks = pipeline.params.get("transformer", {}).get("blocks")
    if blocks is None:
        logger.warning("pipeline parallel: no stacked blocks — disabled")
        return
    n_layers = jax.tree_util.tree_leaves(blocks)[0].shape[0]
    if n_layers % pp:
        logger.warning("pipeline parallel: %d layers %% %d stages != 0 "
                       "— disabled", n_layers, pp)
        return
    mesh = make_pipe_mesh(devices, pp)
    pipeline.params["transformer"] = shard_blocks_for_pipeline(
        pipeline.params["transformer"], "blocks", mesh)
    # Wan2.2 MoE DiT: the low-noise expert shards the same way
    if pipeline.params.get("transformer_2") is not None:
        pipeline.params["transformer_2"] = shard_blocks_for_pipeline(
            pipeline.params["transformer_2"], "blocks", mesh)
    tf.pp_mesh = mesh
    tf.pp_microbatches = pc.pipeline_num_microbatches
    # pp_mesh is read at TRACE time: rebuild the jitted denoise step so a
    # previously traced (scan-path) cache entry can never be reused
    if hasattr(pipeline, "_build_denoise_step"):
        pipeline._denoise_step = pipeline._build_denoise_step()
    logger.info("pipeline parallel: %d stages x %d layers/stage",
                pp, n_layers // pp)


def setup_parallel_placement(pipeline, od_config, devices=None) -> None:
    """Install DP/SP placement hooks and/or the VAE slice on a pipeline.

    Mutates: `pipeline._dp_place` / `pipeline._sp_place` (identity by
    default), and for VAE parallel re-homes `pipeline.params['vae']` +
    wraps `pipeline._decode`.
    """
    pc = od_config.parallel_config
    if devices is None:
        devices = jax.devices()  # else: the stage's pinned slice
    n_vae = pc.vae_parallel_size
    if n_vae > 0:
        if n_vae >= len(devices):
            logger.warning(
                "vae_parallel_size %d needs at least %d devices, have %d "
                "— disabled", n_vae, n_vae + 1, len(devices))
            n_vae = 0
        else:
            vae_devs = devices[-n_vae:]
            decoder = VaeDecoder(pipeline._decode, vae_devs)
            if "vae" in getattr(pipeline, "params", {}):
                pipeline.params["vae"] = jax.device_put(
                    pipeline.params["vae"], decoder.param_sharding)
            pipeline._decode = decoder
            logger.info("VAE-parallel: decode on %s", vae_devs)

    pp = max(getattr(pc, "pipeline_parallel_size", 1), 1)
    if pp > 1:
        _setup_pipeline(pipeline, pc, devices, pp, n_vae)
        return

    dp = max(pc.data_parallel_size, 1)
    sp = max(pc.sequence_parallel_size, 1)
    if dp * sp <= 1:
        return
    avail = len(devices) - max(n_vae, 0)
    seq_axis = getattr(pipeline, "sp_shard_axis", None)
    if sp > 1 and seq_axis is None:
        logger.warning("sequence parallel: no sp_shard_axis on this "
                       "pipeline — seq axis disabled")
        sp = 1
    if dp * sp > avail:
        logger.warning(
            "data*seq parallel %dx%d exceeds %d available devices "
            "— disabled", dp, sp, avail)
        return
    placer = DiffusionPlacer(devices, dp, sp, seq_axis)
    pipeline._dp_place = placer.batch
    pipeline._sp_place = placer.latent
    logger.info("diffusion placement: data=%d x seq=%d over one mesh",
                dp, sp)
