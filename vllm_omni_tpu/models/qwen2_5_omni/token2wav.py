"""Qwen2.5-Omni token2wav: codec codes -> mel (flow-matching DiT) -> wav
(BigVGAN), fully in JAX.

Behavioral parity with the reference's DiT flow-matching vocoder + BigVGAN
(reference model_executor/models/qwen2_5_omni/qwen2_5_omni_token2wav.py:
298-1830: ECAPA-TDNN speaker encoder :298, kaiser-sinc up/down :703-864,
BigVGAN :985, RK4 ODE solver :1076, DiT model :1164), verified against the
HF implementation in tests/models/test_token2wav_parity.py.

Pipeline: codes [1, N] -> DiT sample (RK4 over sway-warped timesteps,
fused-CFG batch) -> mel [1, 80, N*repeats] -> BigVGAN -> waveform.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from vllm_omni_tpu.models.layers import linear

# ============================================================ configs
@dataclass
class DiTConfig:
    mel_dim: int = 80
    num_embeds: int = 8193
    emb_dim: int = 512
    hidden_size: int = 1024
    num_hidden_layers: int = 22
    num_attention_heads: int = 16
    head_dim: int = 64
    ff_mult: int = 2
    block_size: int = 24
    repeats: int = 2
    look_ahead_layers: tuple[int, ...] = (10,)
    look_backward_layers: tuple[int, ...] = (0, 20)
    enc_dim: int = 128
    enc_emb_dim: int = 192
    enc_channels: tuple[int, ...] = (256, 256, 256, 256, 768)
    enc_kernel_sizes: tuple[int, ...] = (5, 3, 3, 3, 1)
    enc_dilations: tuple[int, ...] = (1, 2, 3, 4, 1)
    enc_res2net_scale: int = 2
    enc_se_channels: int = 64
    enc_attention_channels: int = 64
    rope_theta: float = 10000.0

    @classmethod
    def from_hf(cls, d: dict[str, Any]) -> "DiTConfig":
        keys = set(cls.__dataclass_fields__)
        kwargs = {k: (tuple(v) if isinstance(v, list) else v)
                  for k, v in d.items() if k in keys}
        return cls(**kwargs)


@dataclass
class BigVGANConfig:
    mel_dim: int = 80
    upsample_initial_channel: int = 1536
    upsample_rates: tuple[int, ...] = (5, 3, 2, 2, 2, 2)
    upsample_kernel_sizes: tuple[int, ...] = (11, 7, 4, 4, 4, 4)
    resblock_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: tuple[tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5))

    @classmethod
    def from_hf(cls, d: dict[str, Any]) -> "BigVGANConfig":
        keys = set(cls.__dataclass_fields__)
        kwargs = {}
        for k, v in d.items():
            if k in keys:
                if isinstance(v, list):
                    v = tuple(tuple(x) if isinstance(x, list) else x for x in v)
                kwargs[k] = v
        return cls(**kwargs)


# ====================================================== shared helpers
def conv1d_same_reflect(x, w, b, dilation: int = 1):
    """x [B, C, T], w [O, I, K]; 'same' length, reflect padding."""
    K = w.shape[-1]
    span = dilation * (K - 1)
    pl = span // 2
    pr = span - pl
    x = jnp.pad(x, ((0, 0), (0, 0), (pl, pr)), mode="reflect")
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1,), "VALID", rhs_dilation=(dilation,),
        dimension_numbers=("NCW", "OIW", "NCW"),
    )
    if b is not None:
        out = out + b.astype(x.dtype)[None, :, None]
    return out


def conv1d_plain(x, w, b, stride=1, padding=0, dilation=1, groups=1):
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride,), ((padding, padding),),
        rhs_dilation=(dilation,), feature_group_count=groups,
        dimension_numbers=("NCW", "OIW", "NCW"),
    )
    if b is not None:
        out = out + b.astype(x.dtype)[None, :, None]
    return out


def conv_transpose1d(x, w, b, stride, padding):
    """Matches torch.conv_transpose1d (groups=1): w [I, O, K] via
    zero-stuffing + correlation with the flipped kernel."""
    B, C, T = x.shape
    K = w.shape[-1]
    # zero-stuff to length (T-1)*stride + 1
    if stride > 1:
        xz = jnp.zeros((B, C, (T - 1) * stride + 1), x.dtype)
        xz = xz.at[:, :, ::stride].set(x)
    else:
        xz = x
    # full correlation with flipped kernel, then crop `padding` both sides
    w_corr = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # [O, I, K]
    out = jax.lax.conv_general_dilated(
        xz, w_corr.astype(x.dtype), (1,), ((K - 1, K - 1),),
        dimension_numbers=("NCW", "OIW", "NCW"),
    )
    if padding:
        out = out[..., padding:-padding]
    if b is not None:
        out = out + b.astype(x.dtype)[None, :, None]
    return out


def depthwise_conv_transpose1d(x, filt, stride):
    """Per-channel transposed conv with a shared symmetric filter [K]."""
    B, C, T = x.shape
    K = filt.shape[0]
    xz = jnp.zeros((B, C, (T - 1) * stride + 1), x.dtype)
    xz = xz.at[:, :, ::stride].set(x)
    w = jnp.broadcast_to(
        jnp.flip(filt)[None, None, :], (C, 1, K)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        xz, w, (1,), ((K - 1, K - 1),), feature_group_count=C,
        dimension_numbers=("NCW", "OIW", "NCW"),
    )


def layer_norm_noaffine(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _silu(x):
    return jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)


# ============================================================== ECAPA
def ecapa_forward(p: dict, mel: jax.Array, cfg: DiTConfig) -> jax.Array:
    """mel [B, T, mel_dim] -> speaker vector [B, enc_dim]."""
    x = jnp.swapaxes(mel, 1, 2)  # [B, C, T]

    def tdnn(x, pp, dilation=1):
        return jax.nn.relu(
            conv1d_same_reflect(x, pp["w"], pp["b"], dilation))

    feats = []
    x = tdnn(x, p["block0"], cfg.enc_dilations[0])
    for bi, blk in enumerate(p["se_blocks"]):
        kernel_dilation = cfg.enc_dilations[bi + 1]
        res = x
        h = tdnn(x, blk["tdnn1"])
        # res2net: chunks over channels
        scale = cfg.enc_res2net_scale
        parts = jnp.split(h, scale, axis=1)
        outs = []
        prev = None
        for i, part in enumerate(parts):
            if i == 0:
                o = part
            elif i == 1:
                o = tdnn(part, blk["res2net"][i - 1], kernel_dilation)
            else:
                o = tdnn(part + prev, blk["res2net"][i - 1], kernel_dilation)
            prev = o
            outs.append(o)
        h = jnp.concatenate(outs, axis=1)
        h = tdnn(h, blk["tdnn2"])
        # squeeze-excitation
        m = h.mean(axis=2, keepdims=True)
        m = jax.nn.relu(conv1d_plain(m, blk["se1"]["w"], blk["se1"]["b"]))
        m = jax.nn.sigmoid(conv1d_plain(m, blk["se2"]["w"], blk["se2"]["b"]))
        x = h * m + res
        feats.append(x)

    x = jnp.concatenate(feats, axis=1)
    x = tdnn(x, p["mfa"], cfg.enc_dilations[-1])

    # attentive statistics pooling
    T = x.shape[-1]
    mean = x.mean(axis=2, keepdims=True)
    std = jnp.sqrt(
        jnp.clip(((x - mean) ** 2).mean(axis=2, keepdims=True), 1e-12))
    attn_in = jnp.concatenate([
        x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)
    ], axis=1)
    a = tdnn(attn_in, p["asp_tdnn"])
    a = conv1d_plain(jnp.tanh(a), p["asp_conv"]["w"], p["asp_conv"]["b"])
    a = jax.nn.softmax(a, axis=2)
    mean = (a * x).sum(axis=2)
    std = jnp.sqrt(jnp.clip((a * (x - mean[:, :, None]) ** 2).sum(axis=2), 1e-12))
    pooled = jnp.concatenate([mean, std], axis=1)[:, :, None]
    out = conv1d_plain(pooled, p["fc"]["w"], p["fc"]["b"])
    return out[:, :, 0]


# ================================================================ DiT
def _sinus_time_embed(t: jax.Array, dim: int = 256, scale: float = 1000.0):
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    freqs = jnp.exp(-emb * jnp.arange(half, dtype=jnp.float32))
    args = scale * t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def _dit_rotary(seq_len: int, head_dim: int, theta: float):
    inv = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = jnp.arange(seq_len, dtype=jnp.float32)[:, None] * inv[None, :]
    # interleaved duplication: [f0, f0, f1, f1, ...]
    f2 = jnp.stack([freqs, freqs], axis=-1).reshape(seq_len, head_dim)
    return jnp.cos(f2), jnp.sin(f2)


def _rotate_pairs(x):
    """GPT-J interleaved rotation: (x0, x1) -> (-x1, x0) per pair
    (HF rotate_half_codec in apply_rotary_pos_emb for the DiT)."""
    x2 = x.reshape(*x.shape[:-1], -1, 2)
    out = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1)
    return out.reshape(x.shape)


class DiTModel:
    def __init__(self, config: DiTConfig, dtype=jnp.float32):
        self.cfg = config
        self.dtype = dtype

    # -- forward (one velocity evaluation; batch covers fused CFG) --------
    def forward(
        self, params, noised_mel, spk_vec, ref_mel, code_embed, t,
    ) -> jax.Array:
        """noised_mel [B, T, mel], spk_vec [B, T, enc_emb], ref_mel
        [B, Tr, mel], code_embed [B, T, emb] -> velocity [B, T, mel]."""
        c = self.cfg
        B, T, _ = noised_mel.shape
        temb = _sinus_time_embed(t, 256)
        temb = linear(temb.astype(self.dtype), params["time_mlp1"]["w"],
                      params["time_mlp1"]["b"])
        temb = linear(_silu(temb), params["time_mlp2"]["w"],
                      params["time_mlp2"]["b"])  # [B, H]

        cond = ecapa_forward(params["spk_encoder"], ref_mel, c)  # [B, enc_dim]
        cond = jnp.broadcast_to(cond[:, None, :], (B, T, cond.shape[-1]))
        h = jnp.concatenate(
            [noised_mel, cond.astype(noised_mel.dtype), code_embed, spk_vec],
            axis=-1)
        h = linear(h.astype(self.dtype), params["input_proj"]["w"],
                   params["input_proj"]["b"])  # [B, T, H]

        cos, sin = _dit_rotary(T, c.head_dim, c.rope_theta)
        blocks = jnp.arange(T) // c.block_size
        block_diff = blocks[None, :] - blocks[:, None]  # [T, T] (j - i)

        H, D = c.num_attention_heads, c.head_dim
        temb_act = _silu(temb)

        for li in range(c.num_hidden_layers):
            p = jax.tree_util.tree_map(lambda a: a[li], params["layers"])
            mod = linear(temb_act, p["attn_norm"]["w"], p["attn_norm"]["b"])
            (shift_msa, scale_msa, gate_msa,
             shift_mlp, scale_mlp, gate_mlp) = jnp.split(
                mod.astype(jnp.float32), 6, axis=-1)
            hn = layer_norm_noaffine(h).astype(jnp.float32)
            hn = (hn * (1 + scale_msa[:, None]) + shift_msa[:, None]).astype(h.dtype)

            q = linear(hn, p["to_q"]["w"], p["to_q"]["b"]).reshape(B, T, H, D)
            k = linear(hn, p["to_k"]["w"], p["to_k"]["b"]).reshape(B, T, H, D)
            v = linear(hn, p["to_v"]["w"], p["to_v"]["b"]).reshape(B, T, H, D)
            # training quirk: RoPE applied to head 0 only
            q0 = (q[:, :, 0].astype(jnp.float32) * cos[None]
                  + _rotate_pairs(q[:, :, 0].astype(jnp.float32)) * sin[None])
            k0 = (k[:, :, 0].astype(jnp.float32) * cos[None]
                  + _rotate_pairs(k[:, :, 0].astype(jnp.float32)) * sin[None])
            q = q.at[:, :, 0].set(q0.astype(q.dtype))
            k = k.at[:, :, 0].set(k0.astype(k.dtype))

            la = 1 if li in c.look_ahead_layers else 0
            lb = 1 if li in c.look_backward_layers else 0
            mask = (block_diff >= -lb) & (block_diff <= la)
            scores = jnp.einsum(
                "blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32
            ) * (D ** -0.5)
            scores = jnp.where(mask[None, None], scores, -jnp.inf)
            probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
            o = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(B, T, H * D)
            o = linear(o, p["to_out"]["w"], p["to_out"]["b"])
            h = h + gate_msa[:, None].astype(h.dtype) * o

            hn = layer_norm_noaffine(h).astype(jnp.float32)
            hn = (hn * (1 + scale_mlp[:, None]) + shift_mlp[:, None]).astype(h.dtype)
            ff = linear(hn, p["ff1"]["w"], p["ff1"]["b"])
            ff = jax.nn.gelu(ff.astype(jnp.float32), approximate=True).astype(h.dtype)
            ff = linear(ff, p["ff2"]["w"], p["ff2"]["b"])
            h = h + gate_mlp[:, None].astype(h.dtype) * ff

        mod = linear(temb_act, params["norm_out"]["w"], params["norm_out"]["b"])
        scale, shift = jnp.split(mod.astype(jnp.float32), 2, axis=-1)
        out = layer_norm_noaffine(h).astype(jnp.float32)
        out = (out * (1 + scale[:, None]) + shift[:, None]).astype(h.dtype)
        return linear(out, params["proj_out"]["w"], params["proj_out"]["b"])

    # -------------------------------------------------------------- sample
    def sample(
        self, params, conditioning, ref_mel, code, num_steps=10,
        guidance_scale=0.5, sway_coefficient=-1.0, noise=None,
    ) -> jax.Array:
        """conditioning [1, enc_emb], ref_mel [1, Tr, mel], code [1, N]
        -> mel [1, mel, N*repeats] via RK4 flow matching with fused CFG."""
        c = self.cfg
        N = code.shape[1]
        T = N * c.repeats
        if noise is None:
            noise = jax.random.normal(
                jax.random.key(0), (1, T, c.mel_dim), jnp.float32)
        y = noise[:, :T].astype(self.dtype)
        spk = jnp.broadcast_to(
            conditioning[:, None, :], (1, T, conditioning.shape[-1])
        ).astype(self.dtype)

        # codec embedding (+ repeat_interleave over time)
        emb = params["codec_embed"]
        code_embed = emb[code]  # [1, N, emb]
        code_embed = jnp.repeat(code_embed, c.repeats, axis=1)
        code_embed_uncond = jnp.repeat(emb[jnp.zeros_like(code)], c.repeats, axis=1)

        apply_cfg = guidance_scale >= 1e-5
        if apply_cfg:
            mel_ref2 = jnp.concatenate([ref_mel, jnp.zeros_like(ref_mel)], 0)
            spk2 = jnp.concatenate([spk, jnp.zeros_like(spk)], 0)
            code2 = jnp.concatenate([code_embed, code_embed_uncond], 0)
        else:
            mel_ref2, spk2, code2 = ref_mel, spk, code_embed

        def velocity(t_scalar, y):
            B = 2 if apply_cfg else 1
            y_in = jnp.concatenate([y, y], 0) if apply_cfg else y
            t_vec = jnp.full((B,), t_scalar, jnp.float32)
            pred = self.forward(
                params, y_in, spk2.astype(y.dtype), mel_ref2, code2, t_vec)
            if apply_cfg:
                pos, neg = pred[:1], pred[1:]
                return pos + (pos - neg) * guidance_scale
            return pred

        ts = np.linspace(0.0, 1.0, num_steps)
        if sway_coefficient is not None:
            ts = ts + sway_coefficient * (np.cos(np.pi / 2 * ts) - 1 + ts)

        for t0, t1 in zip(ts[:-1], ts[1:]):
            dt = t1 - t0
            k1 = velocity(t0, y)
            k2 = velocity(t0 + dt / 3, y + dt * k1 / 3)
            k3 = velocity(t0 + 2 * dt / 3, y + dt * (k2 - k1 / 3))
            k4 = velocity(t1, y + dt * (k1 - k2 + k3))
            y = y + (k1 + 3 * (k2 + k3) + k4) * dt / 8

        return jnp.swapaxes(y, 1, 2)  # [1, mel, T]


# ============================================================= BigVGAN
def snake_beta(x, alpha, beta):
    a = jnp.exp(alpha)[None, :, None]
    b = jnp.exp(beta)[None, :, None]
    xf = x.astype(jnp.float32)
    return (xf + (1.0 / (b + 1e-9)) * jnp.sin(xf * a) ** 2).astype(x.dtype)


def _kaiser_sinc_filter(cutoff, half_width, kernel_size) -> np.ndarray:
    is_even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    attenuation = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if attenuation > 50.0:
        beta = 0.1102 * (attenuation - 8.7)
    elif attenuation >= 21.0:
        beta = 0.5842 * (attenuation - 21) ** 0.4 + 0.07886 * (attenuation - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if is_even:
        t = np.arange(-half_size, half_size) + 0.5
    else:
        t = np.arange(kernel_size) - half_size
    f = 2 * cutoff * window * np.sinc(2 * cutoff * t)
    f /= f.sum()
    return f.astype(np.float32)


def _up2(x, filt):
    """Anti-aliased 2x upsample (UpSample1d ratio=2, kernel 12)."""
    ratio, K = 2, len(filt)
    pad = K // ratio - 1
    pad_left = pad * ratio + (K - ratio) // 2
    pad_right = pad * ratio + (K - ratio + 1) // 2
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)), mode="edge")
    out = ratio * depthwise_conv_transpose1d(x, jnp.asarray(filt), ratio)
    return out[..., pad_left:-pad_right]


def _down2(x, filt):
    ratio, K = 2, len(filt)
    even = K % 2 == 0
    pad_left = K // 2 - int(even)
    pad_right = K // 2
    C = x.shape[1]
    x = jnp.pad(x, ((0, 0), (0, 0), (pad_left, pad_right)), mode="edge")
    w = jnp.broadcast_to(jnp.asarray(filt)[None, None, :], (C, 1, K))
    return conv1d_plain(x, w, None, stride=ratio, padding=0, groups=C)


_UP_FILT = _kaiser_sinc_filter(0.5 / 2, 0.6 / 2, 12)
_DOWN_FILT = _kaiser_sinc_filter(0.5 / 2, 0.6 / 2, 12)


def activation1d(x, alpha, beta):
    return _down2(snake_beta(_up2(x, _UP_FILT), alpha, beta), _DOWN_FILT)


class BigVGANModel:
    def __init__(self, config: BigVGANConfig, dtype=jnp.float32):
        self.cfg = config
        self.dtype = dtype

    @staticmethod
    def process_mel(mel):
        amp = jnp.exp(mel.astype(jnp.float32))
        min_level = jnp.exp(-115 / 20.0 * jnp.log(10.0))
        db = 20 * jnp.log10(jnp.clip(amp, min_level)) - 20
        return jnp.clip(2 * ((db + 115) / 115) - 1, -1, 1)

    def forward(self, params, mel) -> jax.Array:
        """mel [1, 80, T] (log scale) -> waveform [n_samples]."""
        c = self.cfg
        h = self.process_mel(mel).astype(self.dtype)
        h = conv1d_plain(h, params["conv_pre"]["w"], params["conv_pre"]["b"],
                         padding=3)
        n_res = len(c.resblock_kernel_sizes)
        for li, (rate, K) in enumerate(
                zip(c.upsample_rates, c.upsample_kernel_sizes)):
            up = params["ups"][li]
            h = conv_transpose1d(h, up["w"], up["b"], stride=rate,
                                 padding=(K - rate) // 2)
            acc = None
            for bi in range(n_res):
                rp = params["resblocks"][li * n_res + bi]
                ksz = c.resblock_kernel_sizes[bi]
                dils = c.resblock_dilation_sizes[bi]
                x = h
                for ci, dil in enumerate(dils):
                    r = x
                    x = activation1d(x, rp["alphas1"][ci], rp["betas1"][ci])
                    x = conv1d_plain(
                        x, rp["convs1"][ci]["w"], rp["convs1"][ci]["b"],
                        dilation=dil, padding=(ksz * dil - dil) // 2)
                    x = activation1d(x, rp["alphas2"][ci], rp["betas2"][ci])
                    x = conv1d_plain(
                        x, rp["convs2"][ci]["w"], rp["convs2"][ci]["b"],
                        padding=(ksz - 1) // 2)
                    x = r + x
                acc = x if acc is None else acc + x
            h = acc / n_res
        h = activation1d(h, params["post_alpha"], params["post_beta"])
        h = conv1d_plain(h, params["conv_post"]["w"], None, padding=3)
        return jnp.clip(h, -1.0, 1.0).reshape(-1)


# ========================================================== full model
class Qwen2_5OmniToken2WavModel:
    """code [1, N] + speaker (conditioning, ref_mel) -> waveform."""

    def __init__(self, config, dtype=jnp.float32):
        hf = config.hf_config if hasattr(config, "hf_config") else config
        self.dit_cfg = DiTConfig.from_hf(hf.get("dit_config", {}))
        self.bigvgan_cfg = BigVGANConfig.from_hf(hf.get("bigvgan_config", {}))
        self.dit = DiTModel(self.dit_cfg, dtype)
        self.bigvgan = BigVGANModel(self.bigvgan_cfg, dtype)

    def forward(
        self, params, code, conditioning, ref_mel,
        num_steps: int = 10, guidance_scale: float = 0.5,
        sway_coefficient: float = -1.0, noise=None,
    ) -> jax.Array:
        mel = self.dit.sample(
            params["dit"], conditioning, ref_mel, code,
            num_steps=num_steps, guidance_scale=guidance_scale,
            sway_coefficient=sway_coefficient, noise=noise,
        )
        return self.bigvgan.forward(params["bigvgan"], mel)

    # weight loading from HF state dict -----------------------------------
    def load_from_state_dict(self, sd: dict[str, np.ndarray]) -> dict[str, Any]:
        from vllm_omni_tpu.models.qwen2_5_omni.token2wav_loader import (
            token2wav_params_from_state_dict,
        )

        return token2wav_params_from_state_dict(self, sd)

    def init_params(self, rng: jax.Array) -> dict[str, Any]:
        """Random init (tests / profiling)."""
        d, b = self.dit_cfg, self.bigvgan_cfg
        key = [rng]

        def nxt():
            key[0], k = jax.random.split(key[0])
            return k

        def w(*shape, scale=0.05):
            return jax.random.normal(nxt(), shape, jnp.float32) * scale

        def lin(i, o):
            return {"w": w(i, o), "b": jnp.zeros((o,))}

        def conv(o, i, k):
            return {"w": w(o, i, k), "b": jnp.zeros((o,))}

        # ECAPA
        ch = d.enc_channels
        se_blocks = []
        for bi in range(1, len(ch) - 1):
            se_blocks.append({
                "tdnn1": conv(ch[bi], ch[bi - 1], 1),
                "res2net": [
                    conv(ch[bi] // d.enc_res2net_scale,
                         ch[bi] // d.enc_res2net_scale,
                         d.enc_kernel_sizes[bi])
                    for _ in range(d.enc_res2net_scale - 1)
                ],
                "tdnn2": conv(ch[bi], ch[bi], 1),
                "se1": conv(d.enc_se_channels, ch[bi], 1),
                "se2": conv(ch[bi], d.enc_se_channels, 1),
            })
        spk = {
            "block0": conv(ch[0], d.mel_dim, d.enc_kernel_sizes[0]),
            "se_blocks": se_blocks,
            "mfa": conv(ch[-1], sum(ch[1:-1]), d.enc_kernel_sizes[-1]),
            "asp_tdnn": conv(d.enc_attention_channels, ch[-1] * 3, 1),
            "asp_conv": conv(ch[-1], d.enc_attention_channels, 1),
            "fc": conv(d.enc_dim, ch[-1] * 2, 1),
        }
        L, H = d.num_hidden_layers, d.hidden_size
        inner = d.head_dim * d.num_attention_heads

        def stack_lin(i, o):
            return {"w": w(L, i, o), "b": jnp.zeros((L, o))}

        dit = {
            "time_mlp1": lin(256, H),
            "time_mlp2": lin(H, H),
            "codec_embed": w(d.num_embeds + 1, d.emb_dim),
            "input_proj": lin(
                d.mel_dim + d.enc_dim + d.enc_emb_dim + d.emb_dim, H),
            "spk_encoder": spk,
            "layers": {
                "attn_norm": stack_lin(H, 6 * H),
                "to_q": stack_lin(H, inner), "to_k": stack_lin(H, inner),
                "to_v": stack_lin(H, inner), "to_out": stack_lin(inner, H),
                "ff1": stack_lin(H, H * d.ff_mult),
                "ff2": stack_lin(H * d.ff_mult, H),
            },
            "norm_out": lin(H, 2 * H),
            "proj_out": lin(H, d.mel_dim),
        }
        # BigVGAN
        n_res = len(b.resblock_kernel_sizes)
        ups, resblocks = [], []
        for li, (rate, K) in enumerate(
                zip(b.upsample_rates, b.upsample_kernel_sizes)):
            ci = b.upsample_initial_channel // (2 ** li)
            co = b.upsample_initial_channel // (2 ** (li + 1))
            ups.append({"w": w(ci, co, K), "b": jnp.zeros((co,))})
            for bi in range(n_res):
                ksz = b.resblock_kernel_sizes[bi]
                n_c = len(b.resblock_dilation_sizes[bi])
                resblocks.append({
                    "convs1": [conv(co, co, ksz) for _ in range(n_c)],
                    "convs2": [conv(co, co, ksz) for _ in range(n_c)],
                    "alphas1": [jnp.zeros((co,)) for _ in range(n_c)],
                    "betas1": [jnp.zeros((co,)) for _ in range(n_c)],
                    "alphas2": [jnp.zeros((co,)) for _ in range(n_c)],
                    "betas2": [jnp.zeros((co,)) for _ in range(n_c)],
                })
        cfinal = b.upsample_initial_channel // (2 ** len(b.upsample_rates))
        bigvgan = {
            "conv_pre": conv(b.upsample_initial_channel, b.mel_dim, 7),
            "ups": ups,
            "resblocks": resblocks,
            "post_alpha": jnp.zeros((cfinal,)),
            "post_beta": jnp.zeros((cfinal,)),
            "conv_post": {"w": w(1, cfinal, 7), "b": None},
        }
        return {"dit": dit, "bigvgan": bigvgan}
