"""Qwen2.5-VL/Omni vision tower (window-attention ViT) in JAX.

Behavioral parity with HF Qwen2_5OmniVisionEncoder (the stack the
reference consumes via vLLM; reference qwen3_omni_moe_thinker.py:597-720
uses the same family plus deepstack):
- patchify: [N, C*tp*p*p] -> linear embed (conv-as-matmul);
- 2D rotary (h/w halves of head_dim), neox-style rotation;
- window partition (window_size px), full attention every
  `fullatt_block_indexes` block, RMSNorm + biased SwiGLU MLP blocks;
- 2x2 patch merger: RMSNorm -> MLP -> out_hidden_size, window order
  restored by inverse permutation.

Window/cu-seqlen bookkeeping is host-side numpy (static per image shape);
attention itself is dense with a block-diagonal mask built from segment
ids — XLA-friendly, no gather/scatter in the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from vllm_omni_tpu.models.layers import linear, rms_norm


@dataclass
class VisionEncoderConfig:
    depth: int = 32
    hidden_size: int = 1280
    intermediate_size: int = 3420
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    window_size: int = 112
    fullatt_block_indexes: tuple[int, ...] = (7, 15, 23, 31)
    out_hidden_size: int = 3584

    @classmethod
    def from_hf(cls, d: dict[str, Any]) -> "VisionEncoderConfig":
        keys = set(cls.__dataclass_fields__)
        kwargs = {k: v for k, v in d.items() if k in keys}
        if "fullatt_block_indexes" in kwargs:
            kwargs["fullatt_block_indexes"] = tuple(kwargs["fullatt_block_indexes"])
        return cls(**kwargs)


def _window_index(cfg: VisionEncoderConfig, grid_thw) -> tuple[np.ndarray, np.ndarray]:
    """(window_index [n_merged], window_seg [n_merged]) — permutation of
    merge-units into window order plus a window-segment id per merge unit.
    Parity: get_window_index (HF)."""
    vit_ws = cfg.window_size // cfg.spatial_merge_size // cfg.patch_size
    index_list, seg_list = [], []
    base = 0
    seg_base = 0
    for (t, h, w) in grid_thw:
        lh, lw = h // cfg.spatial_merge_size, w // cfg.spatial_merge_size
        idx = np.arange(t * lh * lw).reshape(t, lh, lw)
        pad_h = (-lh) % vit_ws
        pad_w = (-lw) % vit_ws
        nh, nw = (lh + pad_h) // vit_ws, (lw + pad_w) // vit_ws
        padded = np.full((t, lh + pad_h, lw + pad_w), -100, np.int64)
        padded[:, :lh, :lw] = idx
        padded = padded.reshape(t, nh, vit_ws, nw, vit_ws)
        padded = padded.transpose(0, 1, 3, 2, 4).reshape(t, nh * nw, vit_ws, vit_ws)
        flat = padded.reshape(t * nh * nw, -1)
        for wi, row in enumerate(flat):
            valid = row[row != -100]
            index_list.append(valid + base)
            seg_list.append(np.full(len(valid), seg_base + wi, np.int64))
        base += t * lh * lw
        seg_base += t * nh * nw
    return np.concatenate(index_list), np.concatenate(seg_list)


def _rot_pos_ids(cfg: VisionEncoderConfig, grid_thw) -> np.ndarray:
    """(h, w) position ids per patch in merge-unit order [N, 2]."""
    m = cfg.spatial_merge_size
    out = []
    for (t, h, w) in grid_thw:
        hp = np.broadcast_to(np.arange(h)[:, None], (h, w))
        wp = np.broadcast_to(np.arange(w)[None, :], (h, w))

        def merge_order(x):
            return (
                x.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
            )

        pair = np.stack([merge_order(hp), merge_order(wp)], axis=-1)
        out.append(np.tile(pair, (t, 1)))
    return np.concatenate(out)


class VisionEncoder:
    def __init__(self, config: VisionEncoderConfig, dtype=jnp.float32):
        self.cfg = config
        self.dtype = dtype

    # ------------------------------------------------------------- params
    def init_params(self, rng: jax.Array) -> dict[str, Any]:
        c, dt = self.cfg, self.dtype
        D, I, L = c.hidden_size, c.intermediate_size, c.depth
        patch_in = c.in_channels * c.temporal_patch_size * c.patch_size**2
        merged = D * c.spatial_merge_size**2
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

        layers = {
            "norm1": jnp.ones((L, D), dt),
            "norm2": jnp.ones((L, D), dt),
            "qkv": lin(D, 3 * D),
            "proj": lin(D, D),
            "gate": lin(D, I),
            "up": lin(D, I),
            "down": lin(I, D),
        }
        return {
            "patch_embed": {"w": w(patch_in, D)},
            "layers": layers,
            "merger_ln": jnp.ones((D,), dt),
            "merger_fc1": lin(merged, merged, layers=False),
            "merger_fc2": lin(merged, c.out_hidden_size, layers=False),
        }

    def load_from_state_dict(self, sd: dict[str, np.ndarray]) -> dict[str, Any]:
        c, dt = self.cfg, self.dtype
        L = c.depth

        def stack(fmt, transpose=False):
            arrs = [np.asarray(sd[fmt.format(i)]) for i in range(L)]
            return jnp.asarray(
                np.stack([a.T if transpose else a for a in arrs]), dt)

        def stack_qkv():
            ws, bs = [], []
            for i in range(L):
                w = np.concatenate([
                    np.asarray(sd[f"blocks.{i}.attn.{p}.weight"]).T
                    for p in ("q", "k", "v")
                ], axis=1)
                b = np.concatenate([
                    np.asarray(sd[f"blocks.{i}.attn.{p}.bias"])
                    for p in ("q", "k", "v")
                ])
                ws.append(w)
                bs.append(b)
            return {"w": jnp.asarray(np.stack(ws), dt),
                    "b": jnp.asarray(np.stack(bs), dt)}

        pe = np.asarray(sd["patch_embed.proj.weight"])  # [D, C, tp, p, p]
        params = {
            "patch_embed": {"w": jnp.asarray(pe.reshape(pe.shape[0], -1).T, dt)},
            "layers": {
                "norm1": stack("blocks.{}.norm1.weight"),
                "norm2": stack("blocks.{}.norm2.weight"),
                "qkv": stack_qkv(),
                "proj": {"w": stack("blocks.{}.attn.proj.weight", True),
                         "b": stack("blocks.{}.attn.proj.bias")},
                "gate": {"w": stack("blocks.{}.mlp.gate_proj.weight", True),
                         "b": stack("blocks.{}.mlp.gate_proj.bias")},
                "up": {"w": stack("blocks.{}.mlp.up_proj.weight", True),
                       "b": stack("blocks.{}.mlp.up_proj.bias")},
                "down": {"w": stack("blocks.{}.mlp.down_proj.weight", True),
                         "b": stack("blocks.{}.mlp.down_proj.bias")},
            },
            "merger_ln": jnp.asarray(np.asarray(sd["merger.ln_q.weight"]), dt),
            "merger_fc1": {
                "w": jnp.asarray(np.asarray(sd["merger.mlp.0.weight"]).T, dt),
                "b": jnp.asarray(np.asarray(sd["merger.mlp.0.bias"]), dt)},
            "merger_fc2": {
                "w": jnp.asarray(np.asarray(sd["merger.mlp.2.weight"]).T, dt),
                "b": jnp.asarray(np.asarray(sd["merger.mlp.2.bias"]), dt)},
        }
        return params

    # ------------------------------------------------------------ forward
    def forward(
        self,
        params: dict[str, Any],
        pixel_patches: jax.Array,  # [N, C*tp*p*p] patchified pixels
        grid_thw: list[tuple[int, int, int]],
    ) -> jax.Array:
        """-> [N // merge^2, out_hidden_size] merged vision tokens."""
        c = self.cfg
        unit = c.spatial_merge_size**2
        grid = [tuple(int(v) for v in g) for g in grid_thw]
        win_idx, win_seg = _window_index(c, grid)
        pos_hw = _rot_pos_ids(c, grid)  # [N, 2] already merge-unit ordered
        # full-attention segment id per merge unit: one segment per FRAME
        # (HF cu_seqlens = repeat_interleave(h*w, t).cumsum)
        full_seg_parts = []
        seg = 0
        for (t, h, w) in grid:
            per_frame = (h // c.spatial_merge_size) * (w // c.spatial_merge_size)
            for _ in range(t):
                full_seg_parts.append(np.full(per_frame, seg, np.int64))
                seg += 1
        full_seg = np.concatenate(full_seg_parts)
        inv = np.argsort(win_idx)
        return _vision_forward(
            params, pixel_patches,
            jnp.asarray(win_idx), jnp.asarray(win_seg[..., None] if False else win_seg),
            jnp.asarray(full_seg), jnp.asarray(pos_hw), jnp.asarray(inv),
            unit=unit, heads=c.num_heads,
            fullatt=tuple(c.fullatt_block_indexes),
            merge=c.spatial_merge_size,
        )


import functools  # noqa: E402


@functools.partial(
    jax.jit, static_argnames=("unit", "heads", "fullatt", "merge")
)
def _vision_forward(
    params, patches, win_idx, win_seg, full_seg, pos_hw, inv,
    *, unit, heads, fullatt, merge,
):
    h = jnp.dot(
        patches.astype(params["patch_embed"]["w"].dtype),
        params["patch_embed"]["w"],
        preferred_element_type=jnp.float32,
    ).astype(params["patch_embed"]["w"].dtype)
    N, D = h.shape
    Hd = D // heads
    n_units = N // unit

    # rotary angles per patch: h/w halves of head_dim/2 each
    theta = 10000.0
    dim_q = Hd // 4  # freqs per axis
    inv_freq = 1.0 / (theta ** (jnp.arange(0, dim_q, dtype=jnp.float32) * 2 / (Hd // 2)))
    hpos = pos_hw[:, 0].astype(jnp.float32)
    wpos = pos_hw[:, 1].astype(jnp.float32)
    angles = jnp.concatenate(
        [hpos[:, None] * inv_freq[None, :], wpos[:, None] * inv_freq[None, :]],
        axis=-1,
    )  # [N, Hd/2]

    # reorder patches + angles into window order (by merge units)
    def to_window(x):
        xs = x.reshape(n_units, unit, -1)
        return xs[win_idx].reshape(N, -1)

    h = to_window(h)
    angles = to_window(angles)
    # per-patch segment ids for masks
    win_seg_p = jnp.repeat(win_seg, unit)
    full_seg_p = jnp.repeat(full_seg[win_idx], unit)

    cos = jnp.cos(jnp.concatenate([angles, angles], axis=-1))  # [N, Hd]
    sin = jnp.sin(jnp.concatenate([angles, angles], axis=-1))

    def rotate_half(x):
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-x2, x1], axis=-1)

    win_mask = win_seg_p[:, None] == win_seg_p[None, :]
    full_mask = full_seg_p[:, None] == full_seg_p[None, :]

    lp = params["layers"]

    def block(carry, xs):
        h = carry
        p, use_full = xs
        res = h
        hn = rms_norm(h, p["norm1"], 1e-6)
        qkv = linear(hn, p["qkv"]["w"], p["qkv"]["b"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(N, heads, Hd)
        k = k.reshape(N, heads, Hd)
        v = v.reshape(N, heads, Hd)
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        q = (qf * cos[:, None, :] + rotate_half(qf) * sin[:, None, :]).astype(h.dtype)
        k = (kf * cos[:, None, :] + rotate_half(kf) * sin[:, None, :]).astype(h.dtype)
        scores = jnp.einsum(
            "lhd,mhd->hlm", q, k, preferred_element_type=jnp.float32
        ) * (Hd ** -0.5)
        mask = jnp.where(use_full, full_mask, win_mask)
        scores = jnp.where(mask[None], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        o = jnp.einsum("hlm,mhd->lhd", probs, v).reshape(N, D)
        h = res + linear(o, p["proj"]["w"], p["proj"]["b"])
        res = h
        hn = rms_norm(h, p["norm2"], 1e-6)
        gate = linear(hn, p["gate"]["w"], p["gate"]["b"])
        up = linear(hn, p["up"]["w"], p["up"]["b"])
        act = (jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)
               ).astype(h.dtype)
        h = res + linear(act, p["down"]["w"], p["down"]["b"])
        return h, None

    L = lp["norm1"].shape[0]
    use_full_flags = jnp.asarray(
        [i in fullatt for i in range(L)], bool)
    h, _ = jax.lax.scan(block, h, (lp, use_full_flags))

    # patch merger over merge units
    hn = rms_norm(h, params["merger_ln"], 1e-6)
    merged = hn.reshape(n_units, unit * D)
    m = linear(merged, params["merger_fc1"]["w"], params["merger_fc1"]["b"])
    m = jax.nn.gelu(m.astype(jnp.float32), approximate=False).astype(m.dtype)
    m = linear(m, params["merger_fc2"]["w"], params["merger_fc2"]["b"])
    # restore original merge-unit order
    return m[inv]
