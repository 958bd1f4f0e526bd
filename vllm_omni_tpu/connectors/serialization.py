"""Payload serialization for host-crossing connector edges.

Typed msgpack codec — NO pickle anywhere, so bytes arriving from a
socket (connectors/tcp.py, stages/remote.py) can never execute code.
Parity: the reference's OmniSerializer msgpack tensor/ndarray/PIL/
RequestOutput codecs (omni_connectors/utils/serialization.py:26-279).

Wire format: msgpack with tagged maps for the non-msgpack-native kinds
(ndarray/jax array, PIL image, tuple, non-str-keyed dict, and an
ALLOWLISTED set of framework dataclasses). Unknown object types fail at
ENCODE time (loud, sender-side); unknown class tags fail at DECODE time
(a hostile peer cannot instantiate anything outside the allowlist).
"""

from __future__ import annotations

import io
from typing import Any

import msgpack
import numpy as np

TAG = "__omni__"


def _registry() -> dict[str, type]:
    """Framework types allowed across the wire (lazy: import cycles)."""
    from vllm_omni_tpu.outputs import (
        CompletionOutput,
        DiffusionMetrics,
        OmniRequestOutput,
        RequestMetrics,
        RequestOutput,
    )
    from vllm_omni_tpu.sampling_params import SamplingParams
    from vllm_omni_tpu.utils.metrics import StageRequestMetrics

    return {
        c.__name__: c
        for c in (
            RequestOutput, CompletionOutput, RequestMetrics,
            OmniRequestOutput, DiffusionMetrics, SamplingParams,
            StageRequestMetrics,
        )
    }


def _obj_state(obj: Any) -> dict[str, Any]:
    if hasattr(obj, "__dict__"):
        return dict(obj.__dict__)
    # slots dataclass
    return {k: getattr(obj, k) for k in obj.__slots__}


def _encode(obj: Any) -> Any:
    import jax

    if obj is None or isinstance(obj, (bool, int, float, str, bytes)):
        return obj
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (jax.Array, np.ndarray)):
        arr = np.asarray(obj)
        # dtype by name: .str mangles extension dtypes like bfloat16
        return {TAG: "nd", "d": str(arr.dtype), "s": list(arr.shape),
                "b": arr.tobytes()}
    try:
        from PIL import Image

        if isinstance(obj, Image.Image):
            buf = io.BytesIO()
            obj.save(buf, format="PNG")
            return {TAG: "pil", "b": buf.getvalue()}
    except ImportError:
        pass
    if isinstance(obj, tuple):
        return {TAG: "tu", "v": [_encode(v) for v in obj]}
    if isinstance(obj, list):
        return [_encode(v) for v in obj]
    if isinstance(obj, dict):
        if all(isinstance(k, str) for k in obj) and TAG not in obj:
            return {k: _encode(v) for k, v in obj.items()}
        return {TAG: "map", "k": [_encode(k) for k in obj],
                "v": [_encode(v) for v in obj.values()]}
    cls = type(obj).__name__
    if cls in _registry():
        return {TAG: "obj", "c": cls,
                "v": {k: _encode(v) for k, v in _obj_state(obj).items()}}
    raise TypeError(
        f"refusing to serialize {type(obj)!r} across a connector edge — "
        f"register it in connectors/serialization.py if it must cross")


def _decode(obj: Any) -> Any:
    if isinstance(obj, list):
        return [_decode(v) for v in obj]
    if not isinstance(obj, dict):
        return obj
    kind = obj.get(TAG)
    if kind is None:
        return {k: _decode(v) for k, v in obj.items()}
    if kind == "nd":
        dtype = obj["d"]
        if dtype == "bfloat16":
            import ml_dtypes

            np_dtype = np.dtype(ml_dtypes.bfloat16)
        else:
            np_dtype = np.dtype(dtype)
        return np.frombuffer(obj["b"], dtype=np_dtype).reshape(obj["s"])
    if kind == "pil":
        from PIL import Image

        return Image.open(io.BytesIO(obj["b"]))
    if kind == "tu":
        return tuple(_decode(v) for v in obj["v"])
    if kind == "map":
        return {
            _hashable(_decode(k)): _decode(v)
            for k, v in zip(obj["k"], obj["v"])
        }
    if kind == "obj":
        cls = _registry().get(obj["c"])
        if cls is None:
            raise ValueError(
                f"connector payload names unknown class {obj['c']!r} — "
                "rejected")
        inst = object.__new__(cls)
        for k, v in obj["v"].items():
            setattr(inst, k, _decode(v))
        return inst
    raise ValueError(f"unknown connector payload tag {kind!r} — rejected")


def _hashable(k: Any) -> Any:
    return tuple(k) if isinstance(k, list) else k


def serialize(obj: Any) -> bytes:
    return msgpack.packb(_encode(obj), use_bin_type=True)


def deserialize(data: bytes) -> Any:
    try:
        raw = msgpack.unpackb(data, raw=False, strict_map_key=False)
    except Exception as e:
        raise ValueError(f"malformed connector payload: {e}") from None
    return _decode(raw)
