"""2D KL autoencoder (SD3 / Flux / SDXL VAE family) in functional JAX.

TPU-native replacement for the diffusers `AutoencoderKL` the reference
consumes directly (reference diffusion/models/sd3/pipeline_sd3.py:9,178 —
`AutoencoderKL.from_pretrained(model, subfolder="vae")`); the same family
backs Z-Image / Ovis / LongCat (flux-style 16ch) and SDXL (4ch).

Structure (diffusers AutoencoderKL):
  encoder: conv_in -> [DownEncoderBlock2D x len(block_out_channels)]
           (each: layers_per_block ResnetBlock2D + stride-2 Downsample2D,
            no downsample on the last block) -> mid (resnet, attn, resnet)
           -> GroupNorm/silu/conv_out (-> 2*latent moments)
  decoder: conv_in -> mid (resnet, attn, resnet) ->
           [UpDecoderBlock2D x len, reversed channels]
           (each: layers_per_block+1 resnets + 2x nearest Upsample2D conv,
            no upsample on the last block) -> GroupNorm/silu/conv_out.

All convs NCHW 3x3 (pad 1) except shortcuts (1x1) and the downsample conv
(stride 2, asymmetric (0,1) padding). GroupNorm(32) in f32.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp


@dataclass
class AutoencoderKLConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 1.5305
    shift_factor: float = 0.0609
    use_quant_conv: bool = False
    use_post_quant_conv: bool = False

    @classmethod
    def from_hf(cls, d: dict[str, Any]) -> "AutoencoderKLConfig":
        keys = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in d.items() if k in keys and v is not None}
        if "block_out_channels" in kw:
            kw["block_out_channels"] = tuple(kw["block_out_channels"])
        return cls(**kw)

    @property
    def spatial_scale(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


def _conv2d(x, w, b, stride=1, padding=1):
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    out = jax.lax.conv_general_dilated(
        x.astype(w.dtype), w, (stride, stride), padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    return (out + b[None, :, None, None].astype(jnp.float32)).astype(x.dtype)


def _group_norm(x, gamma, beta, groups=32, eps=1e-6):
    B, C, H, W = x.shape
    xf = x.astype(jnp.float32).reshape(B, groups, C // groups, H, W)
    mean = xf.mean(axis=(2, 3, 4), keepdims=True)
    var = xf.var(axis=(2, 3, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(B, C, H, W)
    out = xf * gamma.astype(jnp.float32)[None, :, None, None] + \
        beta.astype(jnp.float32)[None, :, None, None]
    return out.astype(x.dtype)


def _silu(x):
    return jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)


def _resnet(x, p, groups):
    h = _conv2d(_silu(_group_norm(x, p["norm1_g"], p["norm1_b"], groups)),
                p["conv1_w"], p["conv1_b"])
    h = _conv2d(_silu(_group_norm(h, p["norm2_g"], p["norm2_b"], groups)),
                p["conv2_w"], p["conv2_b"])
    if "shortcut_w" in p:
        x = _conv2d(x, p["shortcut_w"], p["shortcut_b"], padding=0)
    return x + h


def _mid_attention(x, p, groups):
    B, C, H, W = x.shape
    h = _group_norm(x, p["norm_g"], p["norm_b"], groups)
    flat = h.reshape(B, C, H * W).transpose(0, 2, 1)  # [B, HW, C]

    def proj(t, w, b):
        return (jnp.dot(t, w.astype(t.dtype)) + b.astype(t.dtype))

    q = proj(flat, p["q_w"], p["q_b"]).astype(jnp.float32)
    k = proj(flat, p["k_w"], p["k_b"]).astype(jnp.float32)
    v = proj(flat, p["v_w"], p["v_b"]).astype(jnp.float32)
    attn = jax.nn.softmax(q @ k.transpose(0, 2, 1) / jnp.sqrt(C), axis=-1)
    o = (attn @ v).astype(flat.dtype)
    o = proj(o, p["o_w"], p["o_b"])
    return x + o.transpose(0, 2, 1).reshape(B, C, H, W)


class AutoencoderKL:
    def __init__(self, config: AutoencoderKLConfig, dtype=jnp.float32):
        self.cfg = config
        self.dtype = dtype

    # ------------------------------------------------------------- params
    def _resnet_init(self, k, cin, cout):
        dt = self.dtype

        def w(key, *shape, scale=0.02):
            return (jax.random.normal(key, shape, jnp.float32) * scale
                    ).astype(dt)

        ks = jax.random.split(k, 3)
        p = {
            "norm1_g": jnp.ones((cin,), dt), "norm1_b": jnp.zeros((cin,), dt),
            "conv1_w": w(ks[0], cout, cin, 3, 3),
            "conv1_b": jnp.zeros((cout,), dt),
            "norm2_g": jnp.ones((cout,), dt), "norm2_b": jnp.zeros((cout,), dt),
            "conv2_w": w(ks[1], cout, cout, 3, 3),
            "conv2_b": jnp.zeros((cout,), dt),
        }
        if cin != cout:
            p["shortcut_w"] = w(ks[2], cout, cin, 1, 1)
            p["shortcut_b"] = jnp.zeros((cout,), dt)
        return p

    def _attn_init(self, k, c):
        dt = self.dtype

        def w(key, *shape, scale=0.02):
            return (jax.random.normal(key, shape, jnp.float32) * scale
                    ).astype(dt)

        ks = jax.random.split(k, 4)
        return {
            "norm_g": jnp.ones((c,), dt), "norm_b": jnp.zeros((c,), dt),
            "q_w": w(ks[0], c, c), "q_b": jnp.zeros((c,), dt),
            "k_w": w(ks[1], c, c), "k_b": jnp.zeros((c,), dt),
            "v_w": w(ks[2], c, c), "v_b": jnp.zeros((c,), dt),
            "o_w": w(ks[3], c, c), "o_b": jnp.zeros((c,), dt),
        }

    def init_params(self, rng: jax.Array) -> dict[str, Any]:
        c, dt = self.cfg, self.dtype
        ch = list(c.block_out_channels)
        k = iter(jax.random.split(rng, 256))

        def w(*shape, scale=0.02):
            return (jax.random.normal(next(k), shape, jnp.float32) * scale
                    ).astype(dt)

        # encoder
        enc: dict[str, Any] = {
            "conv_in_w": w(ch[0], c.in_channels, 3, 3),
            "conv_in_b": jnp.zeros((ch[0],), dt),
            "down": [],
        }
        cin = ch[0]
        for i, cout in enumerate(ch):
            blk = {"resnets": []}
            for _ in range(c.layers_per_block):
                blk["resnets"].append(self._resnet_init(next(k), cin, cout))
                cin = cout
            if i < len(ch) - 1:
                blk["down_w"] = w(cout, cout, 3, 3)
                blk["down_b"] = jnp.zeros((cout,), dt)
            enc["down"].append(blk)
        enc["mid"] = {
            "res1": self._resnet_init(next(k), ch[-1], ch[-1]),
            "attn": self._attn_init(next(k), ch[-1]),
            "res2": self._resnet_init(next(k), ch[-1], ch[-1]),
        }
        enc["norm_out_g"] = jnp.ones((ch[-1],), dt)
        enc["norm_out_b"] = jnp.zeros((ch[-1],), dt)
        enc["conv_out_w"] = w(2 * c.latent_channels, ch[-1], 3, 3)
        enc["conv_out_b"] = jnp.zeros((2 * c.latent_channels,), dt)

        # decoder
        dec: dict[str, Any] = {
            "conv_in_w": w(ch[-1], c.latent_channels, 3, 3),
            "conv_in_b": jnp.zeros((ch[-1],), dt),
            "mid": {
                "res1": self._resnet_init(next(k), ch[-1], ch[-1]),
                "attn": self._attn_init(next(k), ch[-1]),
                "res2": self._resnet_init(next(k), ch[-1], ch[-1]),
            },
            "up": [],
        }
        rev = list(reversed(ch))
        cin = ch[-1]
        for i, cout in enumerate(rev):
            blk = {"resnets": []}
            for _ in range(c.layers_per_block + 1):
                blk["resnets"].append(self._resnet_init(next(k), cin, cout))
                cin = cout
            if i < len(rev) - 1:
                blk["up_w"] = w(cout, cout, 3, 3)
                blk["up_b"] = jnp.zeros((cout,), dt)
            dec["up"].append(blk)
        dec["norm_out_g"] = jnp.ones((ch[0],), dt)
        dec["norm_out_b"] = jnp.zeros((ch[0],), dt)
        dec["conv_out_w"] = w(c.out_channels, ch[0], 3, 3)
        dec["conv_out_b"] = jnp.zeros((c.out_channels,), dt)

        params = {"encoder": enc, "decoder": dec}
        if c.use_quant_conv:
            params["quant_conv_w"] = w(
                2 * c.latent_channels, 2 * c.latent_channels, 1, 1)
            params["quant_conv_b"] = jnp.zeros((2 * c.latent_channels,), dt)
        if c.use_post_quant_conv:
            params["post_quant_conv_w"] = w(
                c.latent_channels, c.latent_channels, 1, 1)
            params["post_quant_conv_b"] = jnp.zeros((c.latent_channels,), dt)
        return params

    # ------------------------------------------------------------ encode
    def encode(self, params: dict[str, Any], x: jax.Array) -> jax.Array:
        """[B, 3, H, W] -> latent moments [B, 2*latent, H/s, W/s]."""
        c = self.cfg
        g = c.norm_num_groups
        p = params["encoder"]
        h = _conv2d(x, p["conv_in_w"], p["conv_in_b"])
        for i, blk in enumerate(p["down"]):
            for rp in blk["resnets"]:
                h = _resnet(h, rp, g)
            if "down_w" in blk:
                # diffusers Downsample2D: asymmetric (0,1,0,1) pad, stride 2
                h = jnp.pad(h, ((0, 0), (0, 0), (0, 1), (0, 1)))
                h = _conv2d(h, blk["down_w"], blk["down_b"], stride=2,
                            padding=0)
        m = p["mid"]
        h = _resnet(h, m["res1"], g)
        h = _mid_attention(h, m["attn"], g)
        h = _resnet(h, m["res2"], g)
        h = _silu(_group_norm(h, p["norm_out_g"], p["norm_out_b"], g))
        h = _conv2d(h, p["conv_out_w"], p["conv_out_b"])
        if c.use_quant_conv:
            h = _conv2d(h, params["quant_conv_w"], params["quant_conv_b"],
                        padding=0)
        return h

    def encode_mode(self, params: dict[str, Any], x: jax.Array) -> jax.Array:
        """Posterior mode (mean) of encode()."""
        moments = self.encode(params, x)
        mean, _ = jnp.split(moments, 2, axis=1)
        return mean

    # ------------------------------------------------------------ decode
    def decode(self, params: dict[str, Any], z: jax.Array) -> jax.Array:
        """[B, latent, h, w] -> [B, 3, H, W] in [-1, 1]."""
        c = self.cfg
        g = c.norm_num_groups
        if c.use_post_quant_conv:
            z = _conv2d(z, params["post_quant_conv_w"],
                        params["post_quant_conv_b"], padding=0)
        p = params["decoder"]
        h = _conv2d(z, p["conv_in_w"], p["conv_in_b"])
        m = p["mid"]
        h = _resnet(h, m["res1"], g)
        h = _mid_attention(h, m["attn"], g)
        h = _resnet(h, m["res2"], g)
        for blk in p["up"]:
            for rp in blk["resnets"]:
                h = _resnet(h, rp, g)
            if "up_w" in blk:
                # nearest 2x upsample + conv
                B, C, H, W = h.shape
                h = jnp.repeat(jnp.repeat(h, 2, axis=2), 2, axis=3)
                h = _conv2d(h, blk["up_w"], blk["up_b"])
        h = _silu(_group_norm(h, p["norm_out_g"], p["norm_out_b"], g))
        return _conv2d(h, p["conv_out_w"], p["conv_out_b"])

    # ------------------------------------------------------------ loading
    def load_from_state_dict(self, sd: dict[str, Any]) -> dict[str, Any]:
        """Map diffusers AutoencoderKL weights onto our param tree."""
        dt = self.dtype

        def t(name):
            return jnp.asarray(np.asarray(sd[name], np.float32)).astype(dt)

        def resnet(prefix, cin, cout):
            p = {
                "norm1_g": t(f"{prefix}.norm1.weight"),
                "norm1_b": t(f"{prefix}.norm1.bias"),
                "conv1_w": t(f"{prefix}.conv1.weight"),
                "conv1_b": t(f"{prefix}.conv1.bias"),
                "norm2_g": t(f"{prefix}.norm2.weight"),
                "norm2_b": t(f"{prefix}.norm2.bias"),
                "conv2_w": t(f"{prefix}.conv2.weight"),
                "conv2_b": t(f"{prefix}.conv2.bias"),
            }
            if f"{prefix}.conv_shortcut.weight" in sd:
                p["shortcut_w"] = t(f"{prefix}.conv_shortcut.weight")
                p["shortcut_b"] = t(f"{prefix}.conv_shortcut.bias")
            return p

        def attn(prefix):
            def lin(n):
                w = np.asarray(sd[f"{prefix}.{n}.weight"], np.float32)
                return (jnp.asarray(w.T).astype(dt),
                        t(f"{prefix}.{n}.bias"))

            qw, qb = lin("to_q")
            kw, kb = lin("to_k")
            vw, vb = lin("to_v")
            ow, ob = lin("to_out.0")
            return {
                "norm_g": t(f"{prefix}.group_norm.weight"),
                "norm_b": t(f"{prefix}.group_norm.bias"),
                "q_w": qw, "q_b": qb, "k_w": kw, "k_b": kb,
                "v_w": vw, "v_b": vb, "o_w": ow, "o_b": ob,
            }

        c = self.cfg
        ch = list(c.block_out_channels)
        enc: dict[str, Any] = {
            "conv_in_w": t("encoder.conv_in.weight"),
            "conv_in_b": t("encoder.conv_in.bias"),
            "down": [],
        }
        cin = ch[0]
        for i, cout in enumerate(ch):
            blk = {"resnets": [
                resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                       cin if j == 0 else cout, cout)
                for j in range(c.layers_per_block)]}
            cin = cout
            if i < len(ch) - 1:
                blk["down_w"] = t(
                    f"encoder.down_blocks.{i}.downsamplers.0.conv.weight")
                blk["down_b"] = t(
                    f"encoder.down_blocks.{i}.downsamplers.0.conv.bias")
            enc["down"].append(blk)
        enc["mid"] = {
            "res1": resnet("encoder.mid_block.resnets.0", ch[-1], ch[-1]),
            "attn": attn("encoder.mid_block.attentions.0"),
            "res2": resnet("encoder.mid_block.resnets.1", ch[-1], ch[-1]),
        }
        enc["norm_out_g"] = t("encoder.conv_norm_out.weight")
        enc["norm_out_b"] = t("encoder.conv_norm_out.bias")
        enc["conv_out_w"] = t("encoder.conv_out.weight")
        enc["conv_out_b"] = t("encoder.conv_out.bias")

        rev = list(reversed(ch))
        dec: dict[str, Any] = {
            "conv_in_w": t("decoder.conv_in.weight"),
            "conv_in_b": t("decoder.conv_in.bias"),
            "mid": {
                "res1": resnet("decoder.mid_block.resnets.0", ch[-1], ch[-1]),
                "attn": attn("decoder.mid_block.attentions.0"),
                "res2": resnet("decoder.mid_block.resnets.1", ch[-1], ch[-1]),
            },
            "up": [],
        }
        cin = ch[-1]
        for i, cout in enumerate(rev):
            blk = {"resnets": [
                resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                       cin if j == 0 else cout, cout)
                for j in range(c.layers_per_block + 1)]}
            cin = cout
            if i < len(rev) - 1:
                blk["up_w"] = t(
                    f"decoder.up_blocks.{i}.upsamplers.0.conv.weight")
                blk["up_b"] = t(
                    f"decoder.up_blocks.{i}.upsamplers.0.conv.bias")
            dec["up"].append(blk)
        dec["norm_out_g"] = t("decoder.conv_norm_out.weight")
        dec["norm_out_b"] = t("decoder.conv_norm_out.bias")
        dec["conv_out_w"] = t("decoder.conv_out.weight")
        dec["conv_out_b"] = t("decoder.conv_out.bias")

        params = {"encoder": enc, "decoder": dec}
        if c.use_quant_conv:
            params["quant_conv_w"] = t("quant_conv.weight")
            params["quant_conv_b"] = t("quant_conv.bias")
        if c.use_post_quant_conv:
            params["post_quant_conv_w"] = t("post_quant_conv.weight")
            params["post_quant_conv_b"] = t("post_quant_conv.bias")
        return params


def decode_with_memory_opts(
    vae: "AutoencoderKL",
    params: dict,
    z,
    use_slicing: bool = False,
    use_tiling: bool = False,
    tile_latent_size: int = 64,
    tile_overlap: int = 8,
    decode_fn=None,
):
    """VAE decode with the reference's memory knobs (reference
    data.py:237-455 `vae_use_slicing` / `vae_use_tiling`; diffusers
    AutoencoderKL.enable_slicing/enable_tiling semantics):

    - slicing: decode batch elements one by one;
    - tiling: decode overlapping latent tiles and linearly blend the
      overlap seams (blend_v/blend_h), bounding peak activation memory
      by the tile size instead of the image size.
    """
    import jax.numpy as jnp

    decode_fn = decode_fn or vae.decode
    if use_slicing and z.shape[0] > 1:
        return jnp.concatenate(
            [decode_with_memory_opts(
                vae, params, z[i:i + 1], False, use_tiling,
                tile_latent_size, tile_overlap, decode_fn)
             for i in range(z.shape[0])], axis=0)
    if not use_tiling:
        return decode_fn(params, z)

    B, C, H, W = z.shape
    t = tile_latent_size
    ov = min(tile_overlap, t // 2)
    stride = t - ov
    s = vae.cfg.spatial_scale
    if H <= t and W <= t:
        return decode_fn(params, z)

    rows = []
    for y0 in range(0, max(H - ov, 1), stride):
        row = []
        for x0 in range(0, max(W - ov, 1), stride):
            tile = z[:, :, y0:y0 + t, x0:x0 + t]
            row.append(decode_fn(params, tile))
        rows.append(row)

    ov_px = ov * s

    def blend_v(a, b):
        # blend bottom of a into top of b over ov_px rows
        n = min(ov_px, a.shape[2], b.shape[2])
        w = (jnp.arange(n, dtype=jnp.float32) / n)[None, None, :, None]
        mixed = a[:, :, -n:] * (1 - w) + b[:, :, :n] * w
        return mixed

    def blend_h(a, b):
        n = min(ov_px, a.shape[3], b.shape[3])
        w = (jnp.arange(n, dtype=jnp.float32) / n)[None, None, None, :]
        return a[:, :, :, -n:] * (1 - w) + b[:, :, :, :n] * w

    out_rows = []
    for i, row in enumerate(rows):
        pieces = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = tile.at[:, :, :ov_px].set(
                    blend_v(rows[i - 1][j], tile))
            if j > 0:
                tile = tile.at[:, :, :, :ov_px].set(
                    blend_h(row[j - 1], tile))
            keep_w = tile.shape[3] if j == len(row) - 1 else stride * s
            pieces.append(tile[:, :, :, :keep_w])
        stitched = jnp.concatenate(pieces, axis=3)
        keep_h = (stitched.shape[2] if i == len(rows) - 1
                  else stride * s)
        out_rows.append(stitched[:, :, :keep_h])
    return jnp.concatenate(out_rows, axis=2)
