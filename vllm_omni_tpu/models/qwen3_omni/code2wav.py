"""Qwen3-Omni code2wav: 16-codebook RVQ codes -> waveform (JAX).

Behavioral parity with HF Qwen3OmniMoeCode2Wav (the reference's non-AR
code2wav stage, reference qwen3_omni_code2wav.py:34): summed codebook
embeddings -> causal sliding-window pre-transformer (LayerScale residuals)
-> ConvNeXt upsampling (2x2) -> SnakeBeta/transposed-conv decoder stack
(8*5*4*3 upsample) -> waveform. One-shot stage: the whole code sequence
decodes in a single jitted forward (OmniGenerationScheduler role,
reference omni_generation_scheduler.py:19-148).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from vllm_omni_tpu.models.layers import linear, rms_norm
from vllm_omni_tpu.models.qwen2_5_omni.token2wav import (
    conv1d_plain,
    layer_norm_noaffine,
    snake_beta,
)
from vllm_omni_tpu.ops.rope import rope_table


@dataclass
class Code2WavConfig:
    codebook_size: int = 2048
    num_quantizers: int = 16
    hidden_size: int = 1024
    num_hidden_layers: int = 8
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    intermediate_size: int = 3072
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    sliding_window: int = 72
    max_position_embeddings: int = 8000
    decoder_dim: int = 1536
    upsample_rates: tuple[int, ...] = (8, 5, 4, 3)
    upsampling_ratios: tuple[int, ...] = (2, 2)
    layer_scale_initial_scale: float = 0.01

    @classmethod
    def from_hf(cls, d: dict[str, Any]) -> "Code2WavConfig":
        keys = set(cls.__dataclass_fields__)
        kwargs = {k: (tuple(v) if isinstance(v, list) else v)
                  for k, v in d.items() if k in keys}
        return cls(**kwargs)


def causal_conv1d(x, w, b, stride=1, dilation=1, groups=1):
    """HF Qwen3OmniMoeCausalConvNet: left pad (K_eff - stride), right pad
    to a whole number of frames."""
    K = w.shape[-1]
    k_eff = (K - 1) * dilation + 1
    pad = k_eff - stride
    length = x.shape[-1]
    n_frames = (length - k_eff + pad) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (k_eff - pad)
    extra = ideal - length
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, extra)))
    return conv1d_plain(x, w, b, stride=stride, dilation=dilation,
                        groups=groups)


def causal_trans_conv1d(x, w, b, stride):
    """HF Qwen3OmniMoeCausalTransConvNet: transposed conv then crop
    (K - stride) from both sides."""
    from vllm_omni_tpu.models.qwen2_5_omni.token2wav import conv_transpose1d

    K = w.shape[-1]
    out = conv_transpose1d(x, w, b, stride=stride, padding=0)
    pad = K - stride
    if pad:
        out = out[..., pad:out.shape[-1] - pad]
    return out


class Qwen3OmniMoeCode2Wav:
    def __init__(self, config, dtype=jnp.float32):
        hf = config if isinstance(config, dict) else config.hf_config
        self.cfg = Code2WavConfig.from_hf(hf if isinstance(hf, dict) else {})
        self.dtype = dtype
        c = self.cfg
        self.total_upsample = int(
            np.prod(c.upsample_rates) * np.prod(c.upsampling_ratios))
        self._cos, self._sin = rope_table(
            c.hidden_size // c.num_attention_heads,
            c.max_position_embeddings, c.rope_theta)

    # ------------------------------------------------------------- params
    def init_params(self, rng: jax.Array) -> dict[str, Any]:
        c, dt = self.cfg, self.dtype
        H, I, L = c.hidden_size, c.intermediate_size, c.num_hidden_layers
        key = [rng]

        def nxt():
            key[0], k = jax.random.split(key[0])
            return k

        def w(*shape, scale=0.02):
            return (jax.random.normal(nxt(), shape, jnp.float32) * scale).astype(dt)

        def lin(i, o, layers=True):
            return {"w": w(L, i, o) if layers else w(i, o)}

        def conv(o, i, k):
            return {"w": w(o, i, k, scale=0.05), "b": jnp.zeros((o,), dt)}

        def tconv(i, o, k):
            return {"w": w(i, o, k, scale=0.05), "b": jnp.zeros((o,), dt)}

        Hq = c.num_attention_heads
        Hkv = c.num_key_value_heads
        D = H // Hq
        layers = {
            "input_layernorm": jnp.ones((L, H), dt),
            "post_attention_layernorm": jnp.ones((L, H), dt),
            "q_proj": lin(H, Hq * D)["w"],
            "k_proj": lin(H, Hkv * D)["w"],
            "v_proj": lin(H, Hkv * D)["w"],
            "o_proj": lin(Hq * D, H)["w"],
            "gate_proj": lin(H, I)["w"],
            "up_proj": lin(H, I)["w"],
            "down_proj": lin(I, H)["w"],
            "attn_scale": jnp.full((L, H), c.layer_scale_initial_scale, dt),
            "mlp_scale": jnp.full((L, H), c.layer_scale_initial_scale, dt),
        }
        upsample = []
        for r in c.upsampling_ratios:
            upsample.append({
                "tconv": tconv(H, H, r),  # kernel == stride == factor
                "convnext": {
                    "dwconv": conv(H, 1, 7),  # depthwise: [H,1,7]
                    "norm_w": jnp.ones((H,), dt), "norm_b": jnp.zeros((H,), dt),
                    "pw1": {"w": w(H, 4 * H), "b": jnp.zeros((4 * H,), dt)},
                    "pw2": {"w": w(4 * H, H), "b": jnp.zeros((H,), dt)},
                    "gamma": jnp.full((H,), 1e-6, dt),
                },
            })
        dec_blocks = []
        for i, r in enumerate(c.upsample_rates):
            in_dim = c.decoder_dim // 2 ** i
            out_dim = c.decoder_dim // 2 ** (i + 1)
            units = []
            for dil in (1, 3, 9):
                units.append({
                    "a1": jnp.zeros((out_dim,), dt), "b1": jnp.zeros((out_dim,), dt),
                    "conv1": conv(out_dim, out_dim, 7),
                    "a2": jnp.zeros((out_dim,), dt), "b2": jnp.zeros((out_dim,), dt),
                    "conv2": conv(out_dim, out_dim, 1),
                })
            dec_blocks.append({
                "alpha": jnp.zeros((in_dim,), dt), "beta": jnp.zeros((in_dim,), dt),
                "tconv": tconv(in_dim, out_dim, 2 * r),
                "units": units,
            })
        out_dim = c.decoder_dim // 2 ** len(c.upsample_rates)
        return {
            "code_embedding": w(c.codebook_size * c.num_quantizers, H),
            "layers": layers,
            "norm": jnp.ones((H,), dt),
            "upsample": upsample,
            "conv_in": conv(c.decoder_dim, H, 7),
            "dec_blocks": dec_blocks,
            "post_alpha": jnp.zeros((out_dim,), dt),
            "post_beta": jnp.zeros((out_dim,), dt),
            "conv_out": conv(1, out_dim, 7),
        }

    def load_from_state_dict(self, sd: dict[str, np.ndarray]) -> dict[str, Any]:
        c, dt = self.cfg, self.dtype
        L = c.num_hidden_layers

        def t(name, transpose=False):
            a = np.asarray(sd[name])
            return jnp.asarray(a.T if transpose else a, dt)

        def stack(fmt, transpose=True):
            return jnp.asarray(np.stack([
                np.asarray(sd[fmt.format(i)]).T if transpose
                else np.asarray(sd[fmt.format(i)]) for i in range(L)
            ]), dt)

        def conv(name):
            return {"w": t(f"{name}.weight"), "b": t(f"{name}.bias")}

        layers = {
            "input_layernorm": stack(
                "pre_transformer.layers.{}.input_layernorm.weight", False),
            "post_attention_layernorm": stack(
                "pre_transformer.layers.{}.post_attention_layernorm.weight",
                False),
            "q_proj": stack("pre_transformer.layers.{}.self_attn.q_proj.weight"),
            "k_proj": stack("pre_transformer.layers.{}.self_attn.k_proj.weight"),
            "v_proj": stack("pre_transformer.layers.{}.self_attn.v_proj.weight"),
            "o_proj": stack("pre_transformer.layers.{}.self_attn.o_proj.weight"),
            "gate_proj": stack("pre_transformer.layers.{}.mlp.gate_proj.weight"),
            "up_proj": stack("pre_transformer.layers.{}.mlp.up_proj.weight"),
            "down_proj": stack("pre_transformer.layers.{}.mlp.down_proj.weight"),
            "attn_scale": stack(
                "pre_transformer.layers.{}.self_attn_layer_scale.scale", False),
            "mlp_scale": stack(
                "pre_transformer.layers.{}.mlp_layer_scale.scale", False),
        }
        upsample = []
        for i in range(len(c.upsampling_ratios)):
            p = f"upsample.{i}."
            upsample.append({
                "tconv": conv(p + "0.conv"),
                "convnext": {
                    "dwconv": conv(p + "1.dwconv.conv"),
                    "norm_w": t(p + "1.norm.weight"),
                    "norm_b": t(p + "1.norm.bias"),
                    "pw1": {"w": t(p + "1.pwconv1.weight", True),
                            "b": t(p + "1.pwconv1.bias")},
                    "pw2": {"w": t(p + "1.pwconv2.weight", True),
                            "b": t(p + "1.pwconv2.bias")},
                    "gamma": t(p + "1.gamma"),
                },
            })
        dec_blocks = []
        for i in range(len(c.upsample_rates)):
            p = f"decoder.{i + 1}.block."
            units = []
            for j in range(3):
                u = f"{p}{j + 2}."
                units.append({
                    "a1": t(u + "act1.alpha"), "b1": t(u + "act1.beta"),
                    "conv1": conv(u + "conv1.conv"),
                    "a2": t(u + "act2.alpha"), "b2": t(u + "act2.beta"),
                    "conv2": conv(u + "conv2.conv"),
                })
            dec_blocks.append({
                "alpha": t(p + "0.alpha"), "beta": t(p + "0.beta"),
                "tconv": conv(p + "1.conv"),
                "units": units,
            })
        n_up = len(c.upsample_rates)
        return {
            "code_embedding": t("code_embedding.weight"),
            "layers": layers,
            "norm": t("pre_transformer.norm.weight"),
            "upsample": upsample,
            "conv_in": conv("decoder.0.conv"),
            "dec_blocks": dec_blocks,
            "post_alpha": t(f"decoder.{n_up + 1}.alpha"),
            "post_beta": t(f"decoder.{n_up + 1}.beta"),
            "conv_out": conv(f"decoder.{n_up + 2}.conv"),
        }

    # ------------------------------------------------------------ forward
    def forward(self, params: dict[str, Any], codes: jax.Array) -> jax.Array:
        """codes [1, num_quantizers, T] int32 -> waveform [n_samples]."""
        c = self.cfg
        NQ, T = codes.shape[1], codes.shape[2]
        offsets = (jnp.arange(NQ, dtype=jnp.int32) * c.codebook_size)[None, :, None]
        h = params["code_embedding"][codes + offsets].mean(axis=1)  # [1,T,H]

        # causal sliding-window pre-transformer
        H, Hq = c.hidden_size, c.num_attention_heads
        D = H // Hq
        pos = jnp.arange(T)
        causal = pos[None, :] <= pos[:, None]
        window = pos[None, :] > pos[:, None] - c.sliding_window
        mask = causal & window
        cos = self._cos[pos]
        sin = self._sin[pos]
        cos2 = jnp.concatenate([cos, cos], -1)[None, :, None, :]
        sin2 = jnp.concatenate([sin, sin], -1)[None, :, None, :]

        def rotate_half(x):
            x1, x2 = jnp.split(x, 2, axis=-1)
            return jnp.concatenate([-x2, x1], axis=-1)

        lp = params["layers"]

        def layer(hs, p):
            res = hs
            hn = rms_norm(hs, p["input_layernorm"], c.rms_norm_eps)
            q = jnp.dot(hn, p["q_proj"]).reshape(1, T, Hq, D)
            k = jnp.dot(hn, p["k_proj"]).reshape(1, T, -1, D)
            v = jnp.dot(hn, p["v_proj"]).reshape(1, T, -1, D)
            qf = q.astype(jnp.float32)
            kf = k.astype(jnp.float32)
            q = (qf * cos2 + rotate_half(qf) * sin2).astype(hs.dtype)
            k = (kf * cos2 + rotate_half(kf) * sin2).astype(hs.dtype)
            scores = jnp.einsum(
                "blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32
            ) * (D ** -0.5)
            scores = jnp.where(mask[None, None], scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
            o = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(1, T, Hq * D)
            o = jnp.dot(o, p["o_proj"])
            hs = res + o * p["attn_scale"][None, None, :]
            res = hs
            hn = rms_norm(hs, p["post_attention_layernorm"], c.rms_norm_eps)
            gate = jnp.dot(hn, p["gate_proj"])
            up = jnp.dot(hn, p["up_proj"])
            mlp = jnp.dot(
                jax.nn.silu(gate.astype(jnp.float32)).astype(hs.dtype) * up,
                p["down_proj"])
            hs = res + mlp * p["mlp_scale"][None, None, :]
            return hs, None

        h, _ = jax.lax.scan(layer, h, lp)
        h = rms_norm(h, params["norm"], c.rms_norm_eps)

        # upsampling ConvNeXt stages
        x = jnp.swapaxes(h, 1, 2)  # [1, H, T]
        for st in params["upsample"]:
            x = causal_trans_conv1d(
                x, st["tconv"]["w"], st["tconv"]["b"],
                stride=st["tconv"]["w"].shape[-1])
            cn = st["convnext"]
            res = x
            y = causal_conv1d(x, cn["dwconv"]["w"], cn["dwconv"]["b"],
                              groups=x.shape[1])
            y = jnp.swapaxes(y, 1, 2)
            yf = y.astype(jnp.float32)
            mean = yf.mean(-1, keepdims=True)
            var = yf.var(-1, keepdims=True)
            y = ((yf - mean) * jax.lax.rsqrt(var + 1e-6)
                 * cn["norm_w"].astype(jnp.float32)
                 + cn["norm_b"].astype(jnp.float32)).astype(y.dtype)
            y = linear(y, cn["pw1"]["w"], cn["pw1"]["b"])
            y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(y.dtype)
            y = linear(y, cn["pw2"]["w"], cn["pw2"]["b"])
            y = y * cn["gamma"]
            x = res + jnp.swapaxes(y, 1, 2)

        # decoder stack
        x = causal_conv1d(x, params["conv_in"]["w"], params["conv_in"]["b"])
        for i, blk in enumerate(params["dec_blocks"]):
            r = self.cfg.upsample_rates[i]
            x = snake_beta(x, blk["alpha"], blk["beta"])
            x = causal_trans_conv1d(x, blk["tconv"]["w"], blk["tconv"]["b"],
                                    stride=r)
            for j, u in enumerate(blk["units"]):
                dil = (1, 3, 9)[j]
                res = x
                y = snake_beta(x, u["a1"], u["b1"])
                y = causal_conv1d(y, u["conv1"]["w"], u["conv1"]["b"],
                                  dilation=dil)
                y = snake_beta(y, u["a2"], u["b2"])
                y = causal_conv1d(y, u["conv2"]["w"], u["conv2"]["b"])
                x = res + y
        x = snake_beta(x, params["post_alpha"], params["post_beta"])
        x = causal_conv1d(x, params["conv_out"]["w"], params["conv_out"]["b"])
        return jnp.clip(x, -1.0, 1.0).reshape(-1)

    def chunked_decode(self, params, codes, chunk_size=300, left_context=25):
        """Streaming decode: fixed-size chunks with left context (HF
        chunked_decode parity) — the TTFT path for speech."""
        wavs = []
        start = 0
        T = codes.shape[-1]
        while start < T:
            end = min(start + chunk_size, T)
            ctx = left_context if start - left_context > 0 else start
            chunk = codes[..., start - ctx:end]
            wav = self.forward(params, chunk)
            wavs.append(wav[ctx * self.total_upsample:])
            start = end
        return jnp.concatenate(wavs)
