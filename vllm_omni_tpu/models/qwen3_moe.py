"""Qwen3-MoE causal LM (the Qwen3-Omni thinker/talker text backbone).

Parity: the reference routes Qwen3OmniMoeSparseMoeBlock through vLLM's
fused-MoE kernels (reference model_executor/models/qwen3_omni/
qwen3_moe.py:28,130). Here the decoder inherits the scanned Qwen3
attention stack and swaps the dense MLP for top-k routed experts with
ragged_dot grouped matmuls (ops/moe.py), EP/TP-shardable.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from vllm_omni_tpu.config.model import ModelConfig
from vllm_omni_tpu.models.layers import linear, rms_norm
from vllm_omni_tpu.models.qwen2 import Qwen2ForCausalLM
from vllm_omni_tpu.ops.attention import AttentionMetadata, ragged_paged_attention, write_kv
from vllm_omni_tpu.ops.moe import moe_mlp
from vllm_omni_tpu.ops.rope import apply_rope


class Qwen3MoeForCausalLM(Qwen2ForCausalLM):
    # custom layer body (expert ragged_dot) reads the unfused projections
    supports_fused_projections = False
    qkv_bias = False
    qk_norm = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.E = int(config.get("num_experts", 128))
        self.K = int(config.get("num_experts_per_tok", 8))
        self.moe_I = int(config.get("moe_intermediate_size", self.I))
        self.norm_topk_prob = bool(config.get("norm_topk_prob", True))
        self.moe_impl = "auto"
        # when set, forward() additionally returns the hidden states
        # entering layer `capture_layer` (HF output_hidden_states[k]
        # semantics) — the talker's accept_hidden_layer tap
        self.capture_layer: Optional[int] = None

    # ------------------------------------------------------------- params
    def init_params(self, rng: jax.Array) -> dict[str, Any]:
        params = super().init_params(rng)
        layers = params["layers"]
        # replace dense MLP weights with router + experts
        for k in ("gate_proj", "up_proj", "down_proj"):
            del layers[k]
        dt = self.dtype
        L, H, E, I = self.L, self.H, self.E, self.moe_I
        keys = jax.random.split(jax.random.fold_in(rng, 7), 4)

        def w(key, *shape, scale=0.02):
            # direct-dtype generation: the stacked expert tensors are the
            # largest arrays in the repo — an f32 intermediate doubles
            # their init footprint
            return jax.random.normal(key, shape, dt) * scale

        layers["router"] = w(keys[0], L, H, E)
        layers["experts_gate"] = w(keys[1], L, E, H, I)
        layers["experts_up"] = w(keys[2], L, E, H, I)
        layers["experts_down"] = w(keys[3], L, E, I, H)
        return params

    def load_weights(self, path: str) -> dict[str, Any]:
        from vllm_omni_tpu.models.weight_loader import load_qwen_moe_weights

        return load_qwen_moe_weights(
            path,
            num_layers=self.L,
            num_experts=self.E,
            dtype=self.dtype,
            qk_norm=True,
            tie_embeddings=self.tie_embeddings,
        )

    # ------------------------------------------------------------ forward
    def forward(
        self,
        params: dict[str, Any],
        hidden: jax.Array,
        kv_cache: dict[str, jax.Array],
        meta: AttentionMetadata,
        attention_backend: Optional[str] = None,
        tp_axis: Optional[str] = None,
        ep_axis: Optional[str] = None,
        deepstack_embeds: Optional[jax.Array] = None,  # [n_levels, T, H]
        defer_kv_write: bool = False,
    ) -> tuple[jax.Array, dict[str, jax.Array]]:
        from vllm_omni_tpu.parallel.sharding import psum_if

        T = hidden.shape[0]
        lp = params["layers"]
        cos, sin = self._cos, self._sin
        impl = self.moe_impl

        # deepstack: visual features added to hidden states AFTER the first
        # n_levels decoder layers (reference qwen3_omni_moe_thinker.py:
        # 597-720; DeepStack arXiv:2406.04334)
        if deepstack_embeds is not None:
            ds = jnp.zeros((self.L, T, self.H), hidden.dtype)
            ds = ds.at[: deepstack_embeds.shape[0]].set(
                deepstack_embeds.astype(hidden.dtype))
        else:
            ds = jnp.zeros((self.L, 1, 1), hidden.dtype)

        cap_idx = self.capture_layer

        k_cache_in, v_cache_in = kv_cache["k"], kv_cache["v"]

        def layer(carry, xs):
            h, cap = carry if cap_idx is not None else (carry, None)
            if defer_kv_write:
                # decode windows: the layer scan never touches the cache
                # (read-only closure; per-layer K/V stack out as small
                # ys; ONE in-place pallas commit per step outside) —
                # see Qwen2ForCausalLM.forward docstring
                p, ds_l, li = xs
                k_c, v_c = k_cache_in, v_cache_in
            else:
                p, k_c, v_c, ds_l, li = xs
            res = h
            h_n = rms_norm(h, p["input_layernorm"], self.eps)
            q = linear(h_n, p["q_proj"]).reshape(T, -1, self.D)
            k = linear(h_n, p["k_proj"]).reshape(T, -1, self.D)
            v = linear(h_n, p["v_proj"]).reshape(T, -1, self.D)
            q = rms_norm(q, p["q_norm"], self.eps)
            k = rms_norm(k, p["k_norm"], self.eps)
            rp = meta.rope_pos
            q, k = apply_rope(
                q, k, rp, cos, sin,
                mrope_section=self.mrope_section if rp.ndim > 1 else None,
                interleaved=self.mrope_interleaved,
                theta=self.theta,
            )
            if not defer_kv_write:
                k_c, v_c = write_kv(k_c, v_c, k, v, meta.slot_mapping)
            attn = ragged_paged_attention(
                q, k_c, v_c,
                meta.q_starts, meta.q_lens, meta.seq_lens, meta.block_tables,
                meta.positions, meta.token_rows,
                scale=self.scale,
                backend=attention_backend,
                k_self=k if defer_kv_write else None,
                v_self=v if defer_kv_write else None,
                layer=li if defer_kv_write else None,
            )
            h = res + psum_if(
                linear(attn.reshape(T, -1), p["o_proj"]), tp_axis)
            res = h
            h_n = rms_norm(h, p["post_attention_layernorm"], self.eps)
            moe_out = moe_mlp(
                h_n,
                p["router"], p["experts_gate"], p["experts_up"],
                p["experts_down"],
                top_k=self.K,
                norm_topk_prob=self.norm_topk_prob,
                ep_axis=ep_axis,
                impl=impl,
            )
            if ep_axis is not None and tp_axis is not None:
                moe_out = jax.lax.psum(moe_out, (ep_axis, tp_axis))
            else:
                moe_out = psum_if(moe_out, ep_axis or tp_axis)
            h = res + moe_out
            if deepstack_embeds is not None:
                h = h + ds_l
            ys = (k, v) if defer_kv_write else (k_c, v_c)
            if cap_idx is not None:
                # HF hidden_states[cap_idx] = input to layer cap_idx =
                # output of layer cap_idx-1 (incl. its deepstack add)
                cap = jnp.where(li == cap_idx - 1, h, cap)
                return (h, cap), ys
            return h, ys

        if defer_kv_write:
            xs = (lp, ds, jnp.arange(self.L))
        else:
            xs = (lp, kv_cache["k"], kv_cache["v"], ds, jnp.arange(self.L))
        if cap_idx is not None:
            cap0 = hidden if cap_idx == 0 else jnp.zeros_like(hidden)
            (hidden, captured), (yk, yv) = jax.lax.scan(
                layer, (hidden, cap0), xs)
            hidden = rms_norm(hidden, params["norm"], self.eps)
            if defer_kv_write:
                return hidden, {"k_new": yk, "v_new": yv}, captured
            return hidden, {"k": yk, "v": yv}, captured
        hidden, (yk, yv) = jax.lax.scan(layer, hidden, xs)
        hidden = rms_norm(hidden, params["norm"], self.eps)
        if defer_kv_write:
            return hidden, {"k_new": yk, "v_new": yv}
        return hidden, {"k": yk, "v": yv}
