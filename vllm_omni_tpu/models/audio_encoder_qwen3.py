"""Qwen3-Omni audio tower (AuT-style encoder) in JAX.

Behavioral parity with HF Qwen3OmniMoeAudioEncoder (the tower the
reference's Qwen3 thinker consumes, reference qwen3_omni_moe_thinker.py):
- mel cut into chunks of n_window*2 frames; 3x stride-2 2D convs over
  (freq, time) + linear to d_model; sinusoid positions restart per chunk;
- bidirectional attention within windows of n_window_infer frames
  (pairs of chunks at defaults), realized via a segment-id mask over the
  flattened valid frames;
- LayerNorm encoder layers (q/k/v/out all biased), ln_post then
  proj1 -> gelu -> proj2 to the LLM hidden size.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from vllm_omni_tpu.models.audio_encoder import _layer_norm, sinusoid_positions
from vllm_omni_tpu.models.layers import linear


@dataclass
class Qwen3AudioEncoderConfig:
    num_mel_bins: int = 128
    d_model: int = 1280
    encoder_layers: int = 32
    encoder_attention_heads: int = 20
    encoder_ffn_dim: int = 5120
    n_window: int = 100
    n_window_infer: int = 400
    conv_chunksize: int = 500
    downsample_hidden_size: int = 480
    output_dim: int = 3584
    max_source_positions: int = 1500

    @classmethod
    def from_hf(cls, d: dict[str, Any]) -> "Qwen3AudioEncoderConfig":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


def qwen3_audio_output_length(mel_len: int) -> int:
    """Parity: _get_feat_extract_output_lengths (HF qwen3_omni_moe)."""
    leave = mel_len % 100
    feat = (leave - 1) // 2 + 1
    return ((feat - 1) // 2 + 1 - 1) // 2 + 1 + (mel_len // 100) * 13


def _conv_out_len(t: int) -> int:
    for _ in range(3):
        t = (t + 1) // 2
    return t


class Qwen3AudioEncoder:
    def __init__(self, config: Qwen3AudioEncoderConfig, dtype=jnp.float32):
        self.cfg = config
        self.dtype = dtype
        self._pos = jnp.asarray(
            sinusoid_positions(config.max_source_positions, config.d_model))

    # ------------------------------------------------------------- params
    def init_params(self, rng: jax.Array) -> dict[str, Any]:
        c, dt = self.cfg, self.dtype
        D, F, L, C = (c.d_model, c.encoder_ffn_dim, c.encoder_layers,
                      c.downsample_hidden_size)
        key = [rng]

        def nxt():
            key[0], k = jax.random.split(key[0])
            return k

        def w(*shape, scale=0.02):
            return (jax.random.normal(nxt(), shape, jnp.float32) * scale).astype(dt)

        def lin(i, o, layers=True):
            if layers:
                return {"w": w(L, i, o), "b": jnp.zeros((L, o), dt)}
            return {"w": w(i, o), "b": jnp.zeros((o,), dt)}

        f_out = _conv_out_len(c.num_mel_bins)
        layers = {
            "ln1_w": jnp.ones((L, D), dt), "ln1_b": jnp.zeros((L, D), dt),
            "ln2_w": jnp.ones((L, D), dt), "ln2_b": jnp.zeros((L, D), dt),
            "q": lin(D, D), "k": lin(D, D), "v": lin(D, D), "out": lin(D, D),
            "fc1": lin(D, F), "fc2": lin(F, D),
        }
        return {
            "conv1": {"w": w(C, 1, 3, 3), "b": jnp.zeros((C,), dt)},
            "conv2": {"w": w(C, C, 3, 3), "b": jnp.zeros((C,), dt)},
            "conv3": {"w": w(C, C, 3, 3), "b": jnp.zeros((C,), dt)},
            "conv_out": {"w": w(C * f_out, D)},
            "layers": layers,
            "ln_post_w": jnp.ones((D,), dt), "ln_post_b": jnp.zeros((D,), dt),
            "proj1": lin(D, D, layers=False),
            "proj2": lin(D, c.output_dim, layers=False),
        }

    def load_from_state_dict(self, sd: dict[str, np.ndarray]) -> dict[str, Any]:
        c, dt = self.cfg, self.dtype
        L = c.encoder_layers

        def t(name):
            return jnp.asarray(np.asarray(sd[name]), dt)

        def stack(fmt, transpose=False):
            arrs = [np.asarray(sd[fmt.format(i)]) for i in range(L)]
            return jnp.asarray(
                np.stack([a.T if transpose else a for a in arrs]), dt)

        layers = {
            "ln1_w": stack("layers.{}.self_attn_layer_norm.weight"),
            "ln1_b": stack("layers.{}.self_attn_layer_norm.bias"),
            "ln2_w": stack("layers.{}.final_layer_norm.weight"),
            "ln2_b": stack("layers.{}.final_layer_norm.bias"),
            "q": {"w": stack("layers.{}.self_attn.q_proj.weight", True),
                  "b": stack("layers.{}.self_attn.q_proj.bias")},
            "k": {"w": stack("layers.{}.self_attn.k_proj.weight", True),
                  "b": stack("layers.{}.self_attn.k_proj.bias")},
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
            "conv1": {"w": t("conv2d1.weight"), "b": t("conv2d1.bias")},
            "conv2": {"w": t("conv2d2.weight"), "b": t("conv2d2.bias")},
            "conv3": {"w": t("conv2d3.weight"), "b": t("conv2d3.bias")},
            "conv_out": {"w": jnp.asarray(np.asarray(sd["conv_out.weight"]).T, dt)},
            "layers": layers,
            "ln_post_w": t("ln_post.weight"), "ln_post_b": t("ln_post.bias"),
            "proj1": {"w": jnp.asarray(np.asarray(sd["proj1.weight"]).T, dt),
                      "b": t("proj1.bias")},
            "proj2": {"w": jnp.asarray(np.asarray(sd["proj2.weight"]).T, dt),
                      "b": t("proj2.bias")},
        }

    # ------------------------------------------------------------ forward
    def forward(self, params: dict[str, Any], mel: jax.Array) -> jax.Array:
        """mel [n_mels, T] -> audio tokens [T_out, output_dim]."""
        c = self.cfg
        T = int(mel.shape[1])
        chunk = c.n_window * 2
        n_chunks = -(-T // chunk)
        tail_len = T - (n_chunks - 1) * chunk
        L2 = _conv_out_len(chunk)
        tail_l2 = _conv_out_len(tail_len)
        # valid per-chunk frame counts + window segment ids over the
        # flattened valid frames (windows of n_window_infer mel frames)
        valid = [L2] * (n_chunks - 1) + [tail_l2]
        total = sum(valid)
        win_frames = L2 * (c.n_window_infer // chunk)
        seg = np.minimum(np.arange(total) // win_frames,
                         10**9).astype(np.int64)
        keep_idx = np.concatenate([
            np.arange(v) + i * L2 for i, v in enumerate(valid)
        ])
        return _qwen3_audio_forward(
            params, mel,
            n_chunks=n_chunks, chunk=chunk, pad=n_chunks * chunk - T,
            L2=L2, heads=c.encoder_attention_heads, pos=self._pos,
            seg=jnp.asarray(seg), keep_idx=jnp.asarray(keep_idx),
        )


@functools.partial(
    jax.jit, static_argnames=("n_chunks", "chunk", "pad", "L2", "heads"))
def _qwen3_audio_forward(
    params, mel, *, n_chunks, chunk, pad, L2, heads, pos, seg, keep_idx,
):
    mel = jnp.pad(mel, ((0, 0), (0, pad)))
    n_mels = mel.shape[0]
    # [n_chunks, 1, n_mels, chunk]
    x = mel.reshape(n_mels, n_chunks, chunk).transpose(1, 0, 2)[:, None]
    x = x.astype(params["conv1"]["w"].dtype)

    def conv2d(x, p):
        out = jax.lax.conv_general_dilated(
            x, p["w"].astype(x.dtype), (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return out + p["b"].astype(x.dtype)[None, :, None, None]

    h = jax.nn.gelu(conv2d(x, params["conv1"]), approximate=False)
    h = jax.nn.gelu(conv2d(h, params["conv2"]), approximate=False)
    h = jax.nn.gelu(conv2d(h, params["conv3"]), approximate=False)
    b, cch, f, t = h.shape
    h = h.transpose(0, 3, 1, 2).reshape(b, t, cch * f)
    h = jnp.dot(h, params["conv_out"]["w"],
                preferred_element_type=jnp.float32).astype(h.dtype)
    D = h.shape[-1]
    h = h + pos[:t][None].astype(h.dtype)

    # flatten valid frames
    flat = h.reshape(n_chunks * L2, D)[keep_idx]
    N = flat.shape[0]
    mask = seg[:, None] == seg[None, :]

    lp = params["layers"]
    Hd = D // heads

    def layer(hs, p):
        res = hs
        hn = _layer_norm(hs, p["ln1_w"], p["ln1_b"])
        q = linear(hn, p["q"]["w"], p["q"]["b"]).reshape(N, heads, Hd)
        k = linear(hn, p["k"]["w"], p["k"]["b"]).reshape(N, heads, Hd)
        v = linear(hn, p["v"]["w"], p["v"]["b"]).reshape(N, heads, Hd)
        scores = jnp.einsum(
            "lhd,mhd->hlm", q, k, preferred_element_type=jnp.float32
        ) * (Hd ** -0.5)
        scores = jnp.where(mask[None], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        o = jnp.einsum("hlm,mhd->lhd", probs, v).reshape(N, D)
        hs = res + linear(o, p["out"]["w"], p["out"]["b"])
        res = hs
        hn = _layer_norm(hs, p["ln2_w"], p["ln2_b"])
        ff = linear(
            jax.nn.gelu(
                linear(hn, p["fc1"]["w"], p["fc1"]["b"]).astype(jnp.float32),
                approximate=False,
            ).astype(hs.dtype),
            p["fc2"]["w"], p["fc2"]["b"],
        )
        return res + ff, None

    flat, _ = jax.lax.scan(layer, flat, lp)
    flat = _layer_norm(flat, params["ln_post_w"], params["ln_post_b"])
    flat = linear(flat, params["proj1"]["w"], params["proj1"]["b"])
    flat = jax.nn.gelu(flat.astype(jnp.float32), approximate=False).astype(flat.dtype)
    return linear(flat, params["proj2"]["w"], params["proj2"]["b"])
