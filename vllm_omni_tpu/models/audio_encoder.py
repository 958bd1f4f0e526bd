"""Qwen2.5/Qwen3-Omni audio tower (whisper-style encoder) in JAX.

Behavioral parity with HF Qwen2_5OmniAudioEncoder (the stack the reference
reuses through vLLM; reference qwen2_5_omni_thinker.py / audio tower forced
to FA2, qwen3_omni_moe_thinker.py:636-641):
- mel is cut into chunks of n_window*2 frames; conv1 (k3 s1) gelu +
  conv2 (k3 s2) gelu per chunk; sinusoidal positions restart per chunk;
- bidirectional attention within each chunk only (block-diagonal) —
  realized here as batched dense attention over the chunk axis;
- whisper encoder layers (pre-LN, attn q/v/out bias, k no bias, gelu MLP);
- avg-pool 2 over time -> ln_post -> proj to the LLM hidden size.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from vllm_omni_tpu.models.layers import linear


@dataclass
class AudioEncoderConfig:
    num_mel_bins: int = 128
    d_model: int = 1280
    encoder_layers: int = 32
    encoder_attention_heads: int = 20
    encoder_ffn_dim: int = 5120
    n_window: int = 100
    output_dim: int = 3584
    max_source_positions: int = 1500

    @classmethod
    def from_hf(cls, d: dict[str, Any]) -> "AudioEncoderConfig":
        keys = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in d.items() if k in keys})


def sinusoid_positions(length: int, channels: int) -> np.ndarray:
    """Whisper SinusoidsPositionEmbedding: cat(sin, cos) log-spaced."""
    log_timescale_increment = math.log(10000) / (channels // 2 - 1)
    inv_timescales = np.exp(
        -log_timescale_increment * np.arange(channels // 2, dtype=np.float64)
    )
    scaled = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(
        np.float32
    )


def _layer_norm(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


class AudioEncoder:
    def __init__(self, config: AudioEncoderConfig, dtype=jnp.float32):
        self.cfg = config
        self.dtype = dtype
        self._pos = jnp.asarray(
            sinusoid_positions(config.max_source_positions, config.d_model)
        )

    # ------------------------------------------------------------- params
    def init_params(self, rng: jax.Array) -> dict[str, Any]:
        c, dt = self.cfg, self.dtype
        D, F, L = c.d_model, c.encoder_ffn_dim, c.encoder_layers
        key = [rng]

        def nxt():
            key[0], k = jax.random.split(key[0])
            return k

        def w(*shape, scale=0.02):
            return (jax.random.normal(nxt(), shape, jnp.float32) * scale).astype(dt)

        def lin(i, o, layers=True, bias=True):
            p = {"w": w(L, i, o) if layers else w(i, o)}
            if bias:
                p["b"] = jnp.zeros((L, o) if layers else (o,), dt)
            return p

        layers = {
            "ln1_w": jnp.ones((L, D), dt), "ln1_b": jnp.zeros((L, D), dt),
            "ln2_w": jnp.ones((L, D), dt), "ln2_b": jnp.zeros((L, D), dt),
            "q": lin(D, D), "k": lin(D, D, bias=False), "v": lin(D, D),
            "out": lin(D, D),
            "fc1": lin(D, F), "fc2": lin(F, D),
        }
        return {
            # conv weights [out, in, k]
            "conv1": {"w": w(D, c.num_mel_bins, 3), "b": jnp.zeros((D,), dt)},
            "conv2": {"w": w(D, D, 3), "b": jnp.zeros((D,), dt)},
            "layers": layers,
            "ln_post_w": jnp.ones((D,), dt), "ln_post_b": jnp.zeros((D,), dt),
            "proj": lin(D, c.output_dim, layers=False),
        }

    def load_from_state_dict(self, sd: dict[str, np.ndarray]) -> dict[str, Any]:
        """HF Qwen2_5OmniAudioEncoder state dict -> our param pytree.
        Linear weights transposed to [in, out]; layer tensors stacked."""
        c, dt = self.cfg, self.dtype
        L = c.encoder_layers

        def t(name):
            return jnp.asarray(np.asarray(sd[name]), dt)

        def stack(fmt, transpose=False):
            arrs = [np.asarray(sd[fmt.format(i)]) for i in range(L)]
            out = np.stack([a.T if transpose else a for a in arrs])
            return jnp.asarray(out, dt)

        layers = {
            "ln1_w": stack("layers.{}.self_attn_layer_norm.weight"),
            "ln1_b": stack("layers.{}.self_attn_layer_norm.bias"),
            "ln2_w": stack("layers.{}.final_layer_norm.weight"),
            "ln2_b": stack("layers.{}.final_layer_norm.bias"),
            "q": {"w": stack("layers.{}.self_attn.q_proj.weight", True),
                  "b": stack("layers.{}.self_attn.q_proj.bias")},
            "k": {"w": stack("layers.{}.self_attn.k_proj.weight", True)},
            "v": {"w": stack("layers.{}.self_attn.v_proj.weight", True),
                  "b": stack("layers.{}.self_attn.v_proj.bias")},
            "out": {"w": stack("layers.{}.self_attn.out_proj.weight", True),
                    "b": stack("layers.{}.self_attn.out_proj.bias")},
            "fc1": {"w": stack("layers.{}.fc1.weight", True),
                    "b": stack("layers.{}.fc1.bias")},
            "fc2": {"w": stack("layers.{}.fc2.weight", True),
                    "b": stack("layers.{}.fc2.bias")},
        }
        return {
            "conv1": {"w": t("conv1.weight"), "b": t("conv1.bias")},
            "conv2": {"w": t("conv2.weight"), "b": t("conv2.bias")},
            "layers": layers,
            "ln_post_w": t("ln_post.weight"), "ln_post_b": t("ln_post.bias"),
            "proj": {"w": jnp.asarray(np.asarray(sd["proj.weight"]).T, dt),
                     "b": t("proj.bias")},
        }

    # ------------------------------------------------------------ forward
    def forward(self, params: dict[str, Any], mel: jax.Array) -> jax.Array:
        """mel [n_mels, T] -> audio tokens [T_out, output_dim].

        Host-side chunk bookkeeping (static per mel length), jit-compiled
        compute. Single audio per call; batching happens over chunks.
        """
        c = self.cfg
        T = mel.shape[1]
        chunk = c.n_window * 2
        n_chunks = -(-T // chunk)
        pad = n_chunks * chunk - T
        tail_len = T - (n_chunks - 1) * chunk
        after_cnn_tail = (tail_len - 1) // 2 + 1
        return _audio_forward(
            params, mel, n_chunks=n_chunks, pad=pad, chunk=chunk,
            after_cnn_tail=after_cnn_tail,
            heads=c.encoder_attention_heads, pos=self._pos,
        )


import functools  # noqa: E402


@functools.partial(
    jax.jit,
    static_argnames=("n_chunks", "pad", "chunk", "after_cnn_tail", "heads"),
)
def _audio_forward(params, mel, *, n_chunks, pad, chunk, after_cnn_tail, heads, pos):
    D = params["conv1"]["w"].shape[0]
    mel = jnp.pad(mel, ((0, 0), (0, pad)))
    # [n_chunks, n_mels, chunk]
    x = mel.reshape(mel.shape[0], n_chunks, chunk).transpose(1, 0, 2)
    x = x.astype(params["conv1"]["w"].dtype)

    def conv1d(x, w, b, stride):
        out = jax.lax.conv_general_dilated(
            x, w, (stride,), padding=((1, 1),),
            dimension_numbers=("NCW", "OIW", "NCW"),
        )
        return out + b[None, :, None]

    h = jax.nn.gelu(
        conv1d(x, params["conv1"]["w"], params["conv1"]["b"], 1), approximate=False)
    # mask padded tail before conv2 (HF multiplies by the pad mask)
    frame_idx = jnp.arange(chunk)
    tail_valid = chunk - pad if pad else chunk
    mask = jnp.where(
        jnp.arange(n_chunks)[:, None] == n_chunks - 1,
        frame_idx[None, :] < tail_valid,
        True,
    )
    h = h * mask[:, None, :]
    h = jax.nn.gelu(
        conv1d(h, params["conv2"]["w"], params["conv2"]["b"], 2), approximate=False)
    h = h.transpose(0, 2, 1)  # [n_chunks, L2, D]
    L2 = h.shape[1]
    h = h + pos[:L2][None].astype(h.dtype)

    # valid frames per chunk after cnn
    valid = jnp.where(
        jnp.arange(n_chunks) == n_chunks - 1, after_cnn_tail, L2
    )
    attn_mask = jnp.arange(L2)[None, :] < valid[:, None]  # [n_chunks, L2]

    lp = params["layers"]
    Hd = D // heads

    def layer(h, p):
        res = h
        hn = _layer_norm(h, p["ln1_w"], p["ln1_b"])
        q = linear(hn, p["q"]["w"], p["q"]["b"]).reshape(n_chunks, L2, heads, Hd)
        k = linear(hn, p["k"]["w"]).reshape(n_chunks, L2, heads, Hd)
        v = linear(hn, p["v"]["w"], p["v"]["b"]).reshape(n_chunks, L2, heads, Hd)
        scores = jnp.einsum(
            "blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32
        ) * (Hd ** -0.5)
        scores = jnp.where(attn_mask[:, None, None, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(n_chunks, L2, D)
        h = res + linear(o, p["out"]["w"], p["out"]["b"])
        res = h
        hn = _layer_norm(h, p["ln2_w"], p["ln2_b"])
        ff = linear(
            jax.nn.gelu(
                linear(hn, p["fc1"]["w"], p["fc1"]["b"]).astype(jnp.float32),
                approximate=False,
            ).astype(h.dtype),
            p["fc2"]["w"], p["fc2"]["b"],
        )
        return res + ff, None

    h, _ = jax.lax.scan(layer, h, lp)

    # flatten valid frames: [total_after_cnn, D]
    total = (n_chunks - 1) * L2 + after_cnn_tail
    flat = h.reshape(n_chunks * L2, D)
    keep_idx = jnp.concatenate([
        jnp.arange((n_chunks - 1) * L2),
        (n_chunks - 1) * L2 + jnp.arange(after_cnn_tail),
    ]) if after_cnn_tail != L2 else jnp.arange(n_chunks * L2)
    flat = flat[keep_idx]
    # avg-pool 2 over time (floor)
    T_out = total // 2
    pooled = flat[: T_out * 2].reshape(T_out, 2, D).mean(axis=1)
    pooled = _layer_norm(pooled, params["ln_post_w"], params["ln_post_b"])
    return linear(pooled, params["proj"]["w"], params["proj"]["b"])
