"""Parallelism configuration → JAX device mesh.

Replaces the reference's process-group zoo (diffusion/distributed/
parallel_state.py:391-713: _TP/_PP/_DP/_CFG/_SP/_VAE groups over
torch.distributed) with named mesh axes consumed by GSPMD shardings.
Strategy table: SURVEY.md §2.6.

Axes (any may be 1):
  data    — DP: batch sharding
  seq     — SP (Ulysses/ring): sequence sharding for DiT / long prefill
  model   — TP: hidden/heads sharding
  expert  — EP: MoE expert sharding
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh

AXIS_DATA = "data"
AXIS_SEQ = "seq"
AXIS_MODEL = "model"
AXIS_EXPERT = "expert"

MESH_AXES = (AXIS_DATA, AXIS_SEQ, AXIS_MODEL, AXIS_EXPERT)


@dataclass
class ParallelConfig:
    data_parallel_size: int = 1
    sequence_parallel_size: int = 1
    tensor_parallel_size: int = 1
    expert_parallel_size: int = 1
    # CFG-parallel from the reference (_CFG group, parallel_state.py:670-677)
    # is intentionally mapped onto the data axis: on TPU a batched-CFG
    # forward under one jit beats a dedicated 2-way group (SURVEY.md §2.6).
    cfg_parallel: bool = False

    @property
    def world_size(self) -> int:
        return (
            self.data_parallel_size
            * self.sequence_parallel_size
            * self.tensor_parallel_size
            * self.expert_parallel_size
        )

    def axis_sizes(self) -> tuple[int, int, int, int]:
        return (
            self.data_parallel_size,
            self.sequence_parallel_size,
            self.tensor_parallel_size,
            self.expert_parallel_size,
        )

    def build_mesh(self, devices: Optional[Sequence] = None) -> Mesh:
        if devices is None:
            devices = jax.devices()
        n = self.world_size
        if len(devices) < n:
            raise ValueError(
                f"ParallelConfig needs {n} devices, found {len(devices)}"
            )
        dev = np.asarray(devices[:n]).reshape(self.axis_sizes())
        return Mesh(dev, MESH_AXES)


def single_device_mesh(device=None) -> Mesh:
    if device is None:
        device = jax.devices()[0]
    return Mesh(np.asarray([device]).reshape(1, 1, 1, 1), MESH_AXES)
