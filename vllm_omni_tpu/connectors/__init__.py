from vllm_omni_tpu.connectors.base import (
    OmniConnectorBase,
    OmniConnectorFactory,
)
import vllm_omni_tpu.connectors.inproc  # noqa: F401 (registers "inproc")
import vllm_omni_tpu.connectors.shm  # noqa: F401 (registers "shm")
import vllm_omni_tpu.connectors.tcp  # noqa: F401 (registers "tcp"/"mooncake")


def build_connectors_for_edges(
    edges: dict[str, dict],
    default: str = "inproc",
) -> dict[tuple[int, int], OmniConnectorBase]:
    """Edge-keyed connector construction from stage YAML `runtime.connectors`
    specs ("0->1": {type: shm, ...}); parity with the reference's
    edge-keyed ConnectorSpec init (omni_connectors/utils/initialization.py:
    23-95)."""
    out: dict[tuple[int, int], OmniConnectorBase] = {}
    for key, spec in (edges or {}).items():
        src, _, dst = key.partition("->")
        ctype = (spec or {}).get("type", default)
        out[(int(src), int(dst))] = OmniConnectorFactory.create(
            ctype, spec or {})
    return out


__all__ = [
    "OmniConnectorBase",
    "OmniConnectorFactory",
    "build_connectors_for_edges",
]
