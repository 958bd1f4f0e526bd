"""In-process connector: payloads stay as live Python/JAX objects.

This is the default edge type in the single-controller TPU design —
device arrays pass between stages without leaving HBM (an explicit
improvement over the reference's hidden-states→CPU copy,
gpu_ar_model_runner.py:377).
"""

from __future__ import annotations

from typing import Any

from vllm_omni_tpu.connectors.base import OmniConnectorBase, OmniConnectorFactory


class InProcessConnector(OmniConnectorBase):
    def __init__(self, config=None):
        super().__init__(config)
        self._store: dict[str, Any] = {}

    def put(self, from_stage, to_stage, request_id, data):
        key = self.edge_key(from_stage, to_stage, request_id)
        self._store[key] = data
        self.tx_count += 1
        return True, 0, {"key": key, "connector": "inproc"}

    def get(self, from_stage, to_stage, request_id, metadata):
        key = metadata.get("key") or self.edge_key(
            from_stage, to_stage, request_id)
        self.rx_count += 1
        return self._store.pop(key)

    def cleanup(self, request_id: str) -> None:
        stale = [k for k in self._store if k.startswith(f"{request_id}/")]
        for k in stale:
            del self._store[k]


OmniConnectorFactory.register("inproc", InProcessConnector)
