"""Weight-only int8 quantization for AR decode.

Decode on TPU is weight-HBM-bandwidth bound (BASELINE.md: matmuls ~3.3 ms
vs the 2.2 ms bf16 weight-read bound per step at 0.9B/batch 16). Storing
the seven decoder projections as int8 + per-output-channel f32 scales
halves the weight traffic; XLA fuses the dequant (convert * scale) into
the dot's operand pipeline so only int8 ever leaves HBM.

Parity role: the reference inherits weight quantization from vLLM
(engine_args quantization=...); this is the TPU-native W8A16 equivalent.
Activations stay bf16 (accuracy first; the MXU int8 path is the sage
backend's job on the DiT side).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

# the scanned decoder projection weights ([L, in, out] or [in, out])
DEFAULT_QUANT_NAMES = frozenset({
    "q_proj", "k_proj", "v_proj", "o_proj",
    "gate_proj", "up_proj", "down_proj",
    "qkv_proj", "gateup_proj",  # fused variants (qwen2.fuse_projections)
})


def quantize_weight(w: jax.Array) -> dict[str, jax.Array]:
    """[..., in, out] -> {"q": int8, "s": f32 [..., out]} with symmetric
    per-output-channel scales (absmax over the input dim)."""
    wf = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2)
    s = absmax / 127.0 + 1e-12
    q = jnp.clip(jnp.round(wf / s[..., None, :]), -127, 127)
    return {"q": q.astype(jnp.int8), "s": s}


def dequantize_weight(qw: dict[str, jax.Array], dtype) -> jax.Array:
    return (qw["q"].astype(jnp.float32)
            * qw["s"][..., None, :]).astype(dtype)


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


def quantize_params(
    params: dict[str, Any], names=DEFAULT_QUANT_NAMES
) -> dict[str, Any]:
    """Replace named projection weights in a decoder param tree with
    quantized {"q", "s"} entries (embeddings/lm_head/norms untouched)."""

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if (k in names and not isinstance(v, dict)
                    and getattr(v, "ndim", 0) >= 2):
                out[k] = quantize_weight(v)
            else:
                out[k] = walk(v)
        return out

    return walk(params)


def quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-(token, head) symmetric int8 KV quantization.

    x [..., Hkv, D] -> (int8 [..., Hkv, D], f32 scales [..., Hkv]).
    The scale is constant across D, so attention never materializes a
    dequantized K/V tile: q.(k_int8*s) = (q.k_int8)*s folds into the
    score row and sum_t p_t*(v_int8_t*s_t) folds into p — the only
    per-element work left is the int8->bf16 convert feeding the MXU,
    which is VPU-native on v5e (unlike the fp8-e4m3 upcast, which
    lowers to emulated integer ops and made fp8 KV 2.5-3x slower than
    bf16 — BASELINE.md round 3).

    Reference role: the kv_cache_dtype quantization surface of vLLM's
    cache ops consumed by the reference (SURVEY.md §2.10 row 1)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    s = jnp.maximum(amax / 127.0, 1e-10)
    q = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s


def quantize_diffusion_params(
    params: dict[str, Any], min_dim: int = 512
) -> dict[str, Any]:
    """Weight-only int8 for DiT param trees: every projection weight
    stored under a "w" key (the diffusion layers' {"w","b"} convention,
    stacked [L, in, out] included) is replaced with {"q","s"} when both
    matmul dims are >= min_dim. Small heads/patch projections and
    modulation tables stay full precision.

    Reference role: the diffusers quantization config surface
    (W8A16); the dequant fuses into the matmul operand pipeline so
    only int8 weights stream from HBM (measured +16% on the AR decode
    bench at 0.9B; capacity: 40L QwenImage ~27 GB bf16 -> ~13.5 GB)."""

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if (k == "w" and not isinstance(v, dict)
                    and getattr(v, "ndim", 0) >= 2
                    and v.shape[-1] >= min_dim and v.shape[-2] >= min_dim):
                out[k] = quantize_weight(v)
            else:
                out[k] = walk(v)
        return out

    return walk(params)
