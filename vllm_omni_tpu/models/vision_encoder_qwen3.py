"""Qwen3-Omni vision tower (SigLIP-style ViT with deepstack) in JAX.

Behavioral parity with HF Qwen3OmniMoeVisionEncoder (the tower behind the
reference's deepstack multi-level visual embeds, reference
qwen3_omni_moe_thinker.py:597-720):
- conv patch embed + bilinearly interpolated learned position embeddings
  laid out in merge-unit order;
- LayerNorm blocks, fused qkv, 2D rotary (neox rotate-half), gelu-tanh MLP,
  per-frame full attention;
- a patch merger on the final hidden plus one post-shuffle-norm merger per
  deepstack layer — returns (merged tokens, deepstack feature levels).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from vllm_omni_tpu.models.audio_encoder import _layer_norm
from vllm_omni_tpu.models.layers import linear
from vllm_omni_tpu.models.vision_encoder import _rot_pos_ids


@dataclass
class Qwen3VisionEncoderConfig:
    depth: int = 27
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 16
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    out_hidden_size: int = 3584
    num_position_embeddings: int = 2304
    deepstack_visual_indexes: tuple[int, ...] = (8, 16, 24)

    @classmethod
    def from_hf(cls, d: dict[str, Any]) -> "Qwen3VisionEncoderConfig":
        keys = set(cls.__dataclass_fields__)
        kwargs = {k: v for k, v in d.items() if k in keys}
        if "deepstack_visual_indexes" in kwargs:
            kwargs["deepstack_visual_indexes"] = tuple(
                kwargs["deepstack_visual_indexes"])
        return cls(**kwargs)


def _interp_pos_embed(pos_table: np.ndarray, grid, merge: int) -> np.ndarray:
    """Bilinear interpolation of the learned grid pos embedding to each
    image grid, merge-unit ordered (HF fast_pos_embed_interpolate)."""
    n_side = int(round(len(pos_table) ** 0.5))
    outs = []
    for (t, h, w) in grid:
        h_idx = np.linspace(0, n_side - 1, h)
        w_idx = np.linspace(0, n_side - 1, w)
        hf_ = h_idx.astype(np.int64)
        wf_ = w_idx.astype(np.int64)
        hc = np.clip(hf_ + 1, None, n_side - 1)
        wc = np.clip(wf_ + 1, None, n_side - 1)
        dh = (h_idx - hf_)[:, None]
        dw = (w_idx - wf_)[None, :]
        p = (
            pos_table[(hf_[:, None] * n_side + wf_[None, :])] * ((1 - dh) * (1 - dw))[..., None]
            + pos_table[(hf_[:, None] * n_side + wc[None, :])] * ((1 - dh) * dw)[..., None]
            + pos_table[(hc[:, None] * n_side + wf_[None, :])] * (dh * (1 - dw))[..., None]
            + pos_table[(hc[:, None] * n_side + wc[None, :])] * (dh * dw)[..., None]
        )  # [h, w, D]
        D = p.shape[-1]
        p = np.tile(p.reshape(1, h, w, D), (t, 1, 1, 1))
        p = p.reshape(t, h // merge, merge, w // merge, merge, D)
        p = p.transpose(0, 1, 3, 2, 4, 5).reshape(-1, D)
        outs.append(p)
    return np.concatenate(outs).astype(np.float32)


class Qwen3VisionEncoder:
    def __init__(self, config: Qwen3VisionEncoderConfig, dtype=jnp.float32):
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

        def merger(out):
            return {
                "ln_w": jnp.ones((out,), dt), "ln_b": jnp.zeros((out,), dt),
                "fc1": lin(merged, merged, layers=False),
                "fc2": lin(merged, c.out_hidden_size, layers=False),
            }

        layers = {
            "norm1_w": jnp.ones((L, D), dt), "norm1_b": jnp.zeros((L, D), dt),
            "norm2_w": jnp.ones((L, D), dt), "norm2_b": jnp.zeros((L, D), dt),
            "qkv": lin(D, 3 * D),
            "proj": lin(D, D),
            "fc1": lin(D, I),
            "fc2": lin(I, D),
        }
        return {
            "patch_embed": {"w": w(patch_in, D), "b": jnp.zeros((D,), dt)},
            "pos_embed": w(c.num_position_embeddings, D),
            "layers": layers,
            "merger": merger(D),
            "deepstack_mergers": [
                merger(merged) for _ in c.deepstack_visual_indexes
            ],
        }

    def load_from_state_dict(self, sd: dict[str, np.ndarray]) -> dict[str, Any]:
        c, dt = self.cfg, self.dtype
        L = c.depth

        def stack(fmt, transpose=False):
            arrs = [np.asarray(sd[fmt.format(i)]) for i in range(L)]
            return jnp.asarray(
                np.stack([a.T if transpose else a for a in arrs]), dt)

        def merger(prefix):
            return {
                "ln_w": jnp.asarray(np.asarray(sd[f"{prefix}.ln_q.weight"]), dt),
                "ln_b": jnp.asarray(np.asarray(sd[f"{prefix}.ln_q.bias"]), dt),
                "fc1": {
                    "w": jnp.asarray(np.asarray(sd[f"{prefix}.mlp.0.weight"]).T, dt),
                    "b": jnp.asarray(np.asarray(sd[f"{prefix}.mlp.0.bias"]), dt)},
                "fc2": {
                    "w": jnp.asarray(np.asarray(sd[f"{prefix}.mlp.2.weight"]).T, dt),
                    "b": jnp.asarray(np.asarray(sd[f"{prefix}.mlp.2.bias"]), dt)},
            }

        pe = np.asarray(sd["patch_embed.proj.weight"])
        ds_prefix = ("deepstack_merger_list"
                     if "deepstack_merger_list.0.ln_q.weight" in sd
                     else "merger_list")
        return {
            "patch_embed": {
                "w": jnp.asarray(pe.reshape(pe.shape[0], -1).T, dt),
                "b": jnp.asarray(np.asarray(sd["patch_embed.proj.bias"]), dt)},
            "pos_embed": jnp.asarray(np.asarray(sd["pos_embed.weight"]), dt),
            "layers": {
                "norm1_w": stack("blocks.{}.norm1.weight"),
                "norm1_b": stack("blocks.{}.norm1.bias"),
                "norm2_w": stack("blocks.{}.norm2.weight"),
                "norm2_b": stack("blocks.{}.norm2.bias"),
                "qkv": {"w": stack("blocks.{}.attn.qkv.weight", True),
                        "b": stack("blocks.{}.attn.qkv.bias")},
                "proj": {"w": stack("blocks.{}.attn.proj.weight", True),
                         "b": stack("blocks.{}.attn.proj.bias")},
                "fc1": {"w": stack("blocks.{}.mlp.linear_fc1.weight", True),
                        "b": stack("blocks.{}.mlp.linear_fc1.bias")},
                "fc2": {"w": stack("blocks.{}.mlp.linear_fc2.weight", True),
                        "b": stack("blocks.{}.mlp.linear_fc2.bias")},
            },
            "merger": merger("merger"),
            "deepstack_mergers": [
                merger(f"{ds_prefix}.{i}")
                for i in range(len(c.deepstack_visual_indexes))
            ],
        }

    # ------------------------------------------------------------ forward
    def forward(
        self,
        params: dict[str, Any],
        pixel_patches: jax.Array,  # [N, C*tp*p*p]
        grid_thw: list[tuple[int, int, int]],
    ) -> tuple[jax.Array, list[jax.Array]]:
        """-> (merged tokens [N/m^2, out], deepstack levels list)."""
        c = self.cfg
        grid = [tuple(int(v) for v in g) for g in grid_thw]
        pos_hw = _rot_pos_ids(
            type("c", (), {"spatial_merge_size": c.spatial_merge_size})(), grid)
        pos_embed = _interp_pos_embed(
            np.asarray(params["pos_embed"], np.float32), grid,
            c.spatial_merge_size)
        # per-frame full-attention segments (cu = h*w per t)
        segs = []
        s = 0
        for (t, h, w) in grid:
            for _ in range(t):
                segs.append(np.full(h * w, s, np.int64))
                s += 1
        # frame segments are in row-major patch order; tokens are laid out
        # in merge-unit order — within one frame both cover the same set,
        # and frames are contiguous in both orders
        seg = np.concatenate(segs)
        return _qwen3_vision_forward(
            params, pixel_patches, jnp.asarray(pos_embed),
            jnp.asarray(pos_hw), jnp.asarray(seg),
            heads=c.num_heads, unit=c.spatial_merge_size**2,
            deepstack=tuple(c.deepstack_visual_indexes),
        )


@functools.partial(
    jax.jit, static_argnames=("heads", "unit", "deepstack"))
def _qwen3_vision_forward(
    params, patches, pos_embed, pos_hw, seg, *, heads, unit, deepstack,
):
    pe = params["patch_embed"]
    h = linear(patches.astype(pe["w"].dtype), pe["w"], pe["b"])
    h = h + pos_embed.astype(h.dtype)
    N, D = h.shape
    Hd = D // heads

    theta = 10000.0
    dim_q = Hd // 4
    inv_freq = 1.0 / (theta ** (jnp.arange(dim_q, dtype=jnp.float32) * 2 / (Hd // 2)))
    angles = jnp.concatenate([
        pos_hw[:, 0, None].astype(jnp.float32) * inv_freq[None],
        pos_hw[:, 1, None].astype(jnp.float32) * inv_freq[None],
    ], axis=-1)  # [N, Hd/2]
    cos = jnp.cos(jnp.concatenate([angles, angles], -1))
    sin = jnp.sin(jnp.concatenate([angles, angles], -1))

    def rotate_half(x):
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-x2, x1], axis=-1)

    mask = seg[:, None] == seg[None, :]
    lp = params["layers"]
    L = lp["norm1_w"].shape[0]
    deepstack_features = []

    for li in range(L):
        p = jax.tree_util.tree_map(lambda a: a[li], lp)
        res = h
        hn = _layer_norm(h, p["norm1_w"], p["norm1_b"], eps=1e-6)
        qkv = linear(hn, p["qkv"]["w"], p["qkv"]["b"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(N, heads, Hd)
        k = k.reshape(N, heads, Hd)
        v = v.reshape(N, heads, Hd)
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        q = (qf * cos[:, None] + rotate_half(qf) * sin[:, None]).astype(h.dtype)
        k = (kf * cos[:, None] + rotate_half(kf) * sin[:, None]).astype(h.dtype)
        scores = jnp.einsum(
            "lhd,mhd->hlm", q, k, preferred_element_type=jnp.float32
        ) * (Hd ** -0.5)
        scores = jnp.where(mask[None], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        o = jnp.einsum("hlm,mhd->lhd", probs, v).reshape(N, D)
        h = res + linear(o, p["proj"]["w"], p["proj"]["b"])
        res = h
        hn = _layer_norm(h, p["norm2_w"], p["norm2_b"], eps=1e-6)
        ff = linear(hn, p["fc1"]["w"], p["fc1"]["b"])
        ff = jax.nn.gelu(ff.astype(jnp.float32), approximate=True).astype(h.dtype)
        h = res + linear(ff, p["fc2"]["w"], p["fc2"]["b"])

        if li in deepstack:
            mp = params["deepstack_mergers"][deepstack.index(li)]
            # post-shuffle norm: LN over the merged (unit*D) features
            m = h.reshape(N // unit, unit * D)
            m = _layer_norm(m, mp["ln_w"], mp["ln_b"], eps=1e-6)
            m = linear(m, mp["fc1"]["w"], mp["fc1"]["b"])
            m = jax.nn.gelu(m.astype(jnp.float32), approximate=False).astype(m.dtype)
            deepstack_features.append(
                linear(m, mp["fc2"]["w"], mp["fc2"]["b"]))

    mp = params["merger"]
    hn = _layer_norm(h, mp["ln_w"], mp["ln_b"], eps=1e-6)
    m = hn.reshape(N // unit, unit * D)
    m = linear(m, mp["fc1"]["w"], mp["fc1"]["b"])
    m = jax.nn.gelu(m.astype(jnp.float32), approximate=False).astype(m.dtype)
    out = linear(m, mp["fc2"]["w"], mp["fc2"]["b"])
    return out, deepstack_features
