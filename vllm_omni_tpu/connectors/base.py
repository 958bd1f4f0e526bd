"""Cross-stage transport (OmniConnector) abstraction.

Parity: OmniConnectorBase put/get (reference distributed/omni_connectors/
connectors/base.py:12-72) and OmniConnectorFactory (factory.py:24-87).

TPU mapping (SURVEY.md §2.8): stages in one controller process exchange
on-device arrays directly (InProcessConnector — zero copy, arrays stay in
HBM); cross-process/host edges serialize through shared memory.
"""

from __future__ import annotations

import abc
from typing import Any, Optional


class OmniConnectorBase(abc.ABC):
    def __init__(self, config: Optional[dict[str, Any]] = None):
        self.config = config or {}
        self.tx_count = 0
        self.rx_count = 0
        self.tx_bytes = 0

    @abc.abstractmethod
    def put(
        self, from_stage: int, to_stage: int, request_id: str, data: Any
    ) -> tuple[bool, int, dict[str, Any]]:
        """Store payload for an edge; returns (ok, nbytes, metadata) where
        metadata travels on the control channel to the receiving stage."""

    @abc.abstractmethod
    def get(
        self, from_stage: int, to_stage: int, request_id: str,
        metadata: dict[str, Any],
    ) -> Any:
        """Resolve a payload previously stored with put()."""

    def cleanup(self, request_id: str) -> None:  # noqa: B027
        pass

    def health_check(self) -> bool:
        return True

    @staticmethod
    def edge_key(from_stage: int, to_stage: int, request_id: str) -> str:
        return f"{request_id}/{from_stage}->{to_stage}"


class OmniConnectorFactory:
    _registry: dict[str, type[OmniConnectorBase]] = {}

    @classmethod
    def register(cls, name: str, ctor: type[OmniConnectorBase]) -> None:
        cls._registry[name] = ctor

    @classmethod
    def create(
        cls, name: str, config: Optional[dict[str, Any]] = None
    ) -> OmniConnectorBase:
        if name not in cls._registry:
            raise ValueError(
                f"unknown connector {name!r}; known: {sorted(cls._registry)}"
            )
        return cls._registry[name](config)

    @classmethod
    def known(cls) -> list[str]:
        return sorted(cls._registry)
