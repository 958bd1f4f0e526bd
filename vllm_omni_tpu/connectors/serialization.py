"""Payload serialization for host-crossing connector edges.

Parity: OmniSerializer tensor/ndarray/PIL codecs (reference
omni_connectors/utils/serialization.py:26-279). jax arrays are pulled to
host as numpy; PIL images to PNG bytes; the container format is pickle
(trusted in-process/in-host boundary, mirroring the reference's msgpack
within its own deployment).
"""

from __future__ import annotations

import io
import pickle
from typing import Any

import numpy as np


class _Encoded:
    __slots__ = ("kind", "payload", "meta")

    def __init__(self, kind: str, payload: bytes, meta: tuple):
        self.kind = kind
        self.payload = payload
        self.meta = meta


def _encode(obj: Any) -> Any:
    import jax

    if isinstance(obj, jax.Array):
        arr = np.asarray(obj)
        # dtype by name: .str mangles extension dtypes like bfloat16
        return _Encoded("ndarray", arr.tobytes(), (str(arr.dtype), arr.shape))
    if isinstance(obj, np.ndarray):
        return _Encoded("ndarray", obj.tobytes(), (str(obj.dtype), obj.shape))
    try:
        from PIL import Image

        if isinstance(obj, Image.Image):
            buf = io.BytesIO()
            obj.save(buf, format="PNG")
            return _Encoded("pil", buf.getvalue(), ())
    except ImportError:
        pass
    if isinstance(obj, dict):
        return {k: _encode(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        enc = [_encode(v) for v in obj]
        return tuple(enc) if isinstance(obj, tuple) else enc
    return obj


def _decode(obj: Any) -> Any:
    if isinstance(obj, _Encoded):
        if obj.kind == "ndarray":
            dtype, shape = obj.meta
            if dtype == "bfloat16":
                import ml_dtypes

                np_dtype = np.dtype(ml_dtypes.bfloat16)
            else:
                np_dtype = np.dtype(dtype)
            return np.frombuffer(obj.payload, dtype=np_dtype).reshape(shape)
        if obj.kind == "pil":
            from PIL import Image

            return Image.open(io.BytesIO(obj.payload))
    if isinstance(obj, dict):
        return {k: _decode(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        dec = [_decode(v) for v in obj]
        return tuple(dec) if isinstance(obj, tuple) else dec
    return obj


def serialize(obj: Any) -> bytes:
    return pickle.dumps(_encode(obj), protocol=pickle.HIGHEST_PROTOCOL)


def deserialize(data: bytes) -> Any:
    return _decode(pickle.loads(data))
