"""Device placement for diffusion DP and the VAE-parallel slice.

Parity targets:
- `_DP` batch split (reference diffusion/distributed/
  parallel_state.py:661-668): the request batch axis shards over the
  leading `data_parallel_size` devices. TPU-first mapping: a "data" mesh
  axis + GSPMD sharding annotations on the latent/text batches — XLA
  partitions every step op, no rank bookkeeping.
- `_VAE` group (reference parallel_state.py:499-508,711-712): the last
  `vae_parallel_size` devices are carved off for VAE decode. TPU-first
  mapping: VAE params + decode inputs are placed on that tail slice, so
  decode executes concurrently with DiT work dispatched to the head
  devices (JAX async dispatch overlaps different devices for free);
  batches divisible by the slice size are additionally batch-sharded
  across it.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from vllm_omni_tpu.logger import init_logger

logger = init_logger(__name__)


class DataParallelPlacer:
    """Shards the leading (batch) axis of arrays over a 'data' mesh."""

    def __init__(self, devices: list) -> None:
        self.mesh = Mesh(np.asarray(devices).reshape(len(devices)),
                         ("data",))
        self.n = len(devices)

    def __call__(self, x: Any) -> Any:
        if x is None or not hasattr(x, "shape") or x.ndim == 0:
            return x
        if x.shape[0] % self.n != 0:
            return jax.device_put(
                x, NamedSharding(self.mesh, PartitionSpec()))
        return jax.device_put(
            x, NamedSharding(self.mesh, PartitionSpec("data")))


class SequenceParallelPlacer:
    """Shards a spatial/temporal axis of the latents over a 'seq' mesh.

    GSPMD mapping of the reference's USP (ulysses x ring) config
    (reference data.py:38-64): annotating the latent sequence axis makes
    XLA partition the whole jitted denoise step — patchify, attention
    (with compiler-inserted collectives), unpatchify — across the seq
    devices. The explicit all-to-all/ppermute strategies remain
    available at op level (parallel/ulysses.py, parallel/ring.py)."""

    def __init__(self, devices: list, array_axis: int) -> None:
        self.mesh = Mesh(np.asarray(devices).reshape(len(devices)),
                         ("seq",))
        self.array_axis = array_axis
        self.n = len(devices)

    def __call__(self, x: Any) -> Any:
        if x is None or not hasattr(x, "shape"):
            return x
        if self.array_axis >= x.ndim:
            return x
        spec = [None] * x.ndim
        spec[self.array_axis] = "seq"
        return jax.device_put(x, NamedSharding(self.mesh,
                                               PartitionSpec(*spec)))


class VaeDecoder:
    """Runs `decode_fn` on the VAE device slice."""

    def __init__(self, decode_fn, devices: list) -> None:
        self.decode_fn = decode_fn
        self.devices = devices
        self.mesh = Mesh(np.asarray(devices).reshape(len(devices)),
                         ("vae",))

    def _target(self, z) -> Any:
        if len(self.devices) > 1 and z.shape[0] % len(self.devices) == 0:
            return NamedSharding(self.mesh, PartitionSpec("vae"))
        return self.devices[0]

    def __call__(self, vae_params, z):
        z = jax.device_put(z, self._target(z))
        return self.decode_fn(vae_params, z)


def setup_parallel_placement(pipeline, od_config) -> None:
    """Install DP batch sharding and/or the VAE slice on a pipeline.

    Mutates: `pipeline._dp_place` (identity by default), and for VAE
    parallel re-homes `pipeline.params['vae']` + wraps
    `pipeline._decode`.
    """
    pc = od_config.parallel_config
    devices = jax.devices()
    n_vae = pc.vae_parallel_size
    if n_vae > 0:
        if n_vae >= len(devices):
            logger.warning(
                "vae_parallel_size %d needs at least %d devices, have %d "
                "— disabled", n_vae, n_vae + 1, len(devices))
        else:
            vae_devs = devices[-n_vae:]
            if "vae" in getattr(pipeline, "params", {}):
                pipeline.params["vae"] = jax.device_put(
                    pipeline.params["vae"], vae_devs[0])
            pipeline._decode = VaeDecoder(pipeline._decode, vae_devs)
            logger.info("VAE-parallel: decode on %s", vae_devs)
    dp = pc.data_parallel_size
    if dp > 1:
        avail = len(devices) - max(n_vae, 0)
        if dp > avail:
            logger.warning(
                "data_parallel_size %d exceeds %d available devices "
                "— disabled", dp, avail)
        else:
            pipeline._dp_place = DataParallelPlacer(devices[:dp])
            logger.info("diffusion DP: batch sharded over %d devices", dp)
    sp = pc.sequence_parallel_size
    if sp > 1:
        avail = len(devices) - max(n_vae, 0)
        axis = getattr(pipeline, "sp_shard_axis", None)
        if sp > avail or axis is None:
            logger.warning(
                "sequence_parallel_size %d: %s — disabled", sp,
                "no sp_shard_axis on this pipeline" if axis is None
                else f"exceeds {avail} available devices")
        else:
            pipeline._sp_place = SequenceParallelPlacer(
                devices[:sp], array_axis=axis)
            logger.info("diffusion SP: latent axis %d sharded over %d "
                        "devices", axis, sp)
