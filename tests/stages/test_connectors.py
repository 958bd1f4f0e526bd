"""Connector round-trips (parity with reference
tests/distributed/omni_connectors/test_basic_connectors.py:13-60)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vllm_omni_tpu.connectors import (
    OmniConnectorFactory,
    build_connectors_for_edges,
)
from vllm_omni_tpu.connectors.serialization import deserialize, serialize


def test_factory_known():
    assert "inproc" in OmniConnectorFactory.known()
    assert "shm" in OmniConnectorFactory.known()
    with pytest.raises(ValueError):
        OmniConnectorFactory.create("nope")


def test_serialization_roundtrip_types():
    payload = {
        "np": np.arange(12, dtype=np.float32).reshape(3, 4),
        "jax": jnp.ones((2, 2), jnp.bfloat16),
        "nested": [1, "x", {"y": np.int64(3)}],
        "t": (1, 2),
    }
    back = deserialize(serialize(payload))
    np.testing.assert_array_equal(back["np"], payload["np"])
    assert str(back["jax"].dtype) == "bfloat16"
    np.testing.assert_array_equal(
        back["jax"].astype(np.float32), np.ones((2, 2), np.float32))
    assert back["nested"][2]["y"] == 3
    assert back["t"] == (1, 2)


def test_serialization_pil_roundtrip():
    from PIL import Image

    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (8, 8, 3), dtype=np.uint8))
    back = deserialize(serialize({"img": img}))
    np.testing.assert_array_equal(np.asarray(back["img"]), np.asarray(img))


@pytest.mark.parametrize("ctype", ["inproc", "shm"])
def test_connector_put_get(ctype):
    conn = OmniConnectorFactory.create(ctype)
    data = {"hidden": np.ones((4, 8), np.float32), "ids": [1, 2, 3]}
    ok, size, meta = conn.put(0, 1, "req-1", data)
    assert ok
    got = conn.get(0, 1, "req-1", meta)
    np.testing.assert_array_equal(np.asarray(got["hidden"]), data["hidden"])
    assert list(got["ids"]) == [1, 2, 3]


def test_shm_large_payload_uses_block():
    conn = OmniConnectorFactory.create("shm", {"threshold_bytes": 1024})
    big = np.zeros((1024, 64), np.float32)  # 256KB > threshold
    ok, size, meta = conn.put(0, 1, "r", {"x": big})
    assert ok and "shm_name" in meta
    got = conn.get(0, 1, "r", meta)
    np.testing.assert_array_equal(got["x"], big)


def test_build_connectors_for_edges():
    conns = build_connectors_for_edges(
        {"0->1": {"type": "shm"}, "1->2": {"type": "inproc"}})
    assert (0, 1) in conns and (1, 2) in conns
    assert type(conns[(0, 1)]).__name__ == "SharedMemoryConnector"


def test_tcp_connector_roundtrip():
    import numpy as np

    import vllm_omni_tpu.connectors.tcp  # noqa: F401 (registers "tcp")
    from vllm_omni_tpu.connectors.base import OmniConnectorFactory

    conn = OmniConnectorFactory.create("tcp", {"host": "127.0.0.1"})
    try:
        payload = {"x": np.arange(100000, dtype=np.float32),
                   "meta": "hello"}
        ok, n, md = conn.put(0, 1, "r1", payload)
        assert ok and n > 0 and md["connector"] == "tcp"
        # a separate connector instance (as the consumer stage would be)
        consumer = OmniConnectorFactory.create("tcp", {})
        out = consumer.get(0, 1, "r1", md)
        np.testing.assert_array_equal(out["x"], payload["x"])
        assert out["meta"] == "hello"
        # payloads are one-shot
        try:
            consumer.get(0, 1, "r1", md)
            raise AssertionError("expected KeyError on double fetch")
        except KeyError:
            pass
    finally:
        conn.close()


def test_tcp_connector_cleanup():
    import vllm_omni_tpu.connectors.tcp  # noqa: F401
    from vllm_omni_tpu.connectors.base import OmniConnectorFactory

    conn = OmniConnectorFactory.create("tcp", {})
    try:
        _, _, md = conn.put(0, 1, "gone", [1, 2, 3])
        conn.cleanup("gone")
        consumer = OmniConnectorFactory.create("tcp", {})
        try:
            consumer.get(0, 1, "gone", md)
            raise AssertionError("expected KeyError after cleanup")
        except KeyError:
            pass
    finally:
        conn.close()
