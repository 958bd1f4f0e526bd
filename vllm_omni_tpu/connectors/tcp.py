"""TCP connector for cross-host (DCN) stage edges.

Parity role: MooncakeConnector (reference omni_connectors/connectors/
mooncake_connector.py:23-165) — the reference's cross-host KV store
(TCP/RDMA via a mooncake master). TPU mapping (SURVEY.md §2.8): DCN
edges keep a host serialization path; this connector is a dependency-
free stdlib-socket store: the producer side runs a small server holding
payloads keyed `request_id/from->to`, the consumer dials in with the
key from the control metadata and streams the blob.

Wire format: 8-byte big-endian length + key bytes, then 8-byte length +
payload. Single round trip per get; payloads are deleted on fetch.
"""

from __future__ import annotations

import socket
import struct
import threading
from typing import Any, Optional

from vllm_omni_tpu.connectors.base import (
    OmniConnectorBase,
    OmniConnectorFactory,
)
from vllm_omni_tpu.connectors.serialization import deserialize, serialize


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(min(1 << 20, n - len(buf)))
        if not chunk:
            raise ConnectionError("socket closed mid-message")
        buf.extend(chunk)
    return bytes(buf)


def _send_msg(sock: socket.socket, payload: bytes) -> None:
    sock.sendall(struct.pack(">Q", len(payload)) + payload)


def _recv_msg(sock: socket.socket) -> bytes:
    (n,) = struct.unpack(">Q", _recv_exact(sock, 8))
    return _recv_exact(sock, n)


class _BlobServer:
    """Accepts GET <key> requests and streams stored blobs (once)."""

    def __init__(self, host: str = "0.0.0.0", port: int = 0):
        self._store: dict[str, bytes] = {}
        self._lock = threading.Lock()
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(16)
        self.port = self._srv.getsockname()[1]
        self._stop = False
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def put(self, key: str, blob: bytes) -> None:
        with self._lock:
            self._store[key] = blob

    def drop(self, prefix: str) -> None:
        with self._lock:
            for k in [k for k in self._store if k.startswith(prefix)]:
                del self._store[k]

    def _serve(self) -> None:
        while not self._stop:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(
                target=self._handle, args=(conn,), daemon=True).start()

    def _handle(self, conn: socket.socket) -> None:
        try:
            key = _recv_msg(conn).decode()
            with self._lock:
                blob = self._store.pop(key, None)
            _send_msg(conn, blob if blob is not None else b"")
        except (ConnectionError, OSError):
            pass
        finally:
            conn.close()

    def close(self) -> None:
        self._stop = True
        try:
            self._srv.close()
        except OSError:
            pass


class TCPConnector(OmniConnectorBase):
    """config: {"host": advertised host, "port": fixed port or 0}."""

    def __init__(self, config: Optional[dict[str, Any]] = None):
        super().__init__(config)
        cfg = config or {}
        self._server: Optional[_BlobServer] = None
        self.advertise_host = cfg.get("host", "127.0.0.1")
        self.listen_port = int(cfg.get("port", 0))

    def _ensure_server(self) -> _BlobServer:
        if self._server is None:
            self._server = _BlobServer(port=self.listen_port)
        return self._server

    def put(self, from_stage, to_stage, request_id, data):
        srv = self._ensure_server()
        key = self.edge_key(from_stage, to_stage, request_id)
        blob = serialize(data)
        srv.put(key, blob)
        self.tx_count += 1
        self.tx_bytes += len(blob)
        return True, len(blob), {
            "connector": "tcp", "host": self.advertise_host,
            "port": srv.port, "key": key, "size": len(blob),
        }

    def get(self, from_stage, to_stage, request_id, metadata):
        self.rx_count += 1
        with socket.create_connection(
                (metadata["host"], metadata["port"]), timeout=60) as sock:
            _send_msg(sock, metadata["key"].encode())
            blob = _recv_msg(sock)
        if not blob:
            raise KeyError(f"tcp connector: no payload for "
                           f"{metadata['key']!r}")
        return deserialize(blob)

    def cleanup(self, request_id: str) -> None:
        if self._server is not None:
            self._server.drop(f"{request_id}/")

    def health_check(self) -> bool:
        return self._server is None or not self._server._stop

    def close(self) -> None:
        if self._server is not None:
            self._server.close()
            self._server = None


OmniConnectorFactory.register("tcp", TCPConnector)
OmniConnectorFactory.register("mooncake", TCPConnector)  # DCN-edge stand-in
