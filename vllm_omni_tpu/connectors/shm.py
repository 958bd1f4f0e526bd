"""Shared-memory connector for cross-process stage edges.

Parity: SharedMemoryConnector (reference omni_connectors/connectors/
shm_connector.py:14-120): payloads under `threshold_bytes` travel inline
in the control metadata; larger ones go through a named
multiprocessing.shared_memory block whose name rides in the metadata.
"""

from __future__ import annotations

import uuid
from multiprocessing import shared_memory
from typing import Any

from vllm_omni_tpu.connectors.base import OmniConnectorBase, OmniConnectorFactory
from vllm_omni_tpu.connectors.serialization import deserialize, serialize

DEFAULT_THRESHOLD = 64 * 1024  # reference default 64KB


def _default_threshold() -> int:
    import os

    return int(os.environ.get("OMNI_TPU_SHM_THRESHOLD", DEFAULT_THRESHOLD))


class SharedMemoryConnector(OmniConnectorBase):
    def __init__(self, config=None):
        super().__init__(config)
        self.threshold = int(
            (config or {}).get("threshold_bytes", _default_threshold())
        )
        self._owned: dict[str, shared_memory.SharedMemory] = {}

    def put(self, from_stage, to_stage, request_id, data):
        blob = serialize(data)
        self.tx_count += 1
        self.tx_bytes += len(blob)
        if len(blob) < self.threshold:
            return True, len(blob), {"inline": blob, "connector": "shm"}
        name = f"omni-{uuid.uuid4().hex[:12]}"
        shm = shared_memory.SharedMemory(create=True, size=len(blob), name=name)
        shm.buf[: len(blob)] = blob
        self._owned[name] = shm
        return True, len(blob), {
            "shm_name": name, "size": len(blob), "connector": "shm",
        }

    def get(self, from_stage, to_stage, request_id, metadata):
        self.rx_count += 1
        if "inline" in metadata:
            return deserialize(metadata["inline"])
        name = metadata["shm_name"]
        size = metadata["size"]
        owned = self._owned.pop(name, None)
        shm = owned or shared_memory.SharedMemory(name=name)
        try:
            return deserialize(bytes(shm.buf[:size]))
        finally:
            shm.close()
            try:
                shm.unlink()
            except FileNotFoundError:
                pass

    def cleanup(self, request_id: str) -> None:
        # orphaned blocks are unlinked on get(); nothing keyed by request
        pass


OmniConnectorFactory.register("shm", SharedMemoryConnector)
