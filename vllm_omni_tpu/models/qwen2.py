"""Qwen2 decoder (functional JAX), the text backbone of Qwen2.5-Omni.

Covers the architecture the reference's thinker/talker text paths use via
vLLM's Qwen2 stack (reference model_executor/models/qwen2_5_omni/*,
qwen2_old.py:42-465): GQA attention with QKV bias, SwiGLU MLP, RMSNorm,
rotary embeddings (plain or M-RoPE), tied or separate lm_head.

Decoder layers are stacked and scanned; KV caches are paged HBM arrays
updated in place (donated) through the scan.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from vllm_omni_tpu.config.model import ModelConfig
from vllm_omni_tpu.models.layers import embed, linear, rms_norm, swiglu_mlp, unembed
from vllm_omni_tpu.ops.attention import (
    AttentionMetadata,
    ragged_paged_attention,
    write_kv_auto,
)
from vllm_omni_tpu.ops.rope import apply_rope, rope_table


class KVSpec(NamedTuple):
    num_layers: int
    num_kv_heads: int
    head_dim: int


class Qwen2ForCausalLM:
    """Functional Qwen2/Qwen2.5 causal LM."""

    qkv_bias: bool = True
    qk_norm: bool = False

    def __init__(self, config: ModelConfig):
        self.config = config
        self.H = config.hidden_size
        self.L = config.num_layers
        self.Hq = config.num_attention_heads
        self.Hkv = config.num_kv_heads
        self.D = config.head_dim
        self.V = config.vocab_size
        self.I = int(config.get("intermediate_size"))
        self.eps = float(config.get("rms_norm_eps", 1e-6))
        self.theta = float(config.get("rope_theta", 10000.0))
        self.tie_embeddings = bool(config.get("tie_word_embeddings", False))
        self.mrope_section = None
        rs = config.get("rope_scaling") or {}
        if rs and rs.get("mrope_section"):
            self.mrope_section = list(rs["mrope_section"])
        self.mrope_interleaved = bool((rs or {}).get("mrope_interleaved", False))
        self.scale = self.D**-0.5
        self.dtype = config.dtype
        self.sliding_window = 0
        if config.get("use_sliding_window", False):
            self.sliding_window = int(config.get("sliding_window", 0) or 0)
        self._cos, self._sin = rope_table(
            self.D, config.max_model_len, self.theta
        )

    @property
    def kv_spec(self) -> KVSpec:
        return KVSpec(self.L, self.Hkv, self.D)

    # ------------------------------------------------------------- params
    def init_params(self, rng: jax.Array) -> dict[str, Any]:
        """Random init (tests / profiling)."""
        dt = self.dtype
        keys = jax.random.split(rng, 12)

        def w(key, *shape, scale=0.02):
            # direct-dtype generation: f32 stacked-layer intermediates
            # are multi-GB HBM transients at real model scale
            return jax.random.normal(key, shape, dt) * scale

        L, H, Hq, Hkv, D, I, V = (
            self.L, self.H, self.Hq, self.Hkv, self.D, self.I, self.V,
        )
        layers = {
            "input_layernorm": jnp.ones((L, H), dt),
            "post_attention_layernorm": jnp.ones((L, H), dt),
            "q_proj": w(keys[0], L, H, Hq * D),
            "k_proj": w(keys[1], L, H, Hkv * D),
            "v_proj": w(keys[2], L, H, Hkv * D),
            "o_proj": w(keys[3], L, Hq * D, H),
            "gate_proj": w(keys[4], L, H, I),
            "up_proj": w(keys[5], L, H, I),
            "down_proj": w(keys[6], L, I, H),
        }
        if self.qkv_bias:
            layers["q_bias"] = jnp.zeros((L, Hq * D), dt)
            layers["k_bias"] = jnp.zeros((L, Hkv * D), dt)
            layers["v_bias"] = jnp.zeros((L, Hkv * D), dt)
        if self.qk_norm:
            layers["q_norm"] = jnp.ones((L, D), dt)
            layers["k_norm"] = jnp.ones((L, D), dt)
        params = {
            "embed_tokens": w(keys[7], V, H),
            "norm": jnp.ones((H,), dt),
            "layers": layers,
        }
        if not self.tie_embeddings:
            params["lm_head"] = w(keys[8], H, V)
        return params

    def load_weights(self, path: str) -> dict[str, Any]:
        from vllm_omni_tpu.models.weight_loader import load_qwen_decoder_weights

        return load_qwen_decoder_weights(
            path,
            num_layers=self.L,
            dtype=self.dtype,
            qkv_bias=self.qkv_bias,
            qk_norm=self.qk_norm,
            tie_embeddings=self.tie_embeddings,
        )

    supports_fused_projections = True  # subclasses with custom layer
    # bodies that read q_proj/gate_proj directly must opt out

    def fuse_projections(self, params: dict[str, Any]) -> dict[str, Any]:
        """Fuse Q/K/V and gate/up into single matmuls (one weight stream
        + one MXU launch instead of three/two; decode is weight-bandwidth
        bound). Single-device only — Megatron TP column sharding would
        interleave the fused columns across shards. Apply after loading,
        before quantization."""
        lp = dict(params["layers"])
        lp["qkv_proj"] = jnp.concatenate(
            [lp.pop("q_proj"), lp.pop("k_proj"), lp.pop("v_proj")], axis=-1)
        if "q_bias" in lp:
            lp["qkv_bias"] = jnp.concatenate(
                [lp.pop("q_bias"), lp.pop("k_bias"), lp.pop("v_bias")],
                axis=-1)
        lp["gateup_proj"] = jnp.concatenate(
            [lp.pop("gate_proj"), lp.pop("up_proj")], axis=-1)
        return {**params, "layers": lp}

    # ------------------------------------------------------------ forward
    def embed_tokens(self, params, token_ids: jax.Array) -> jax.Array:
        return embed(token_ids, params["embed_tokens"])

    def forward(
        self,
        params: dict[str, Any],
        hidden: jax.Array,  # [T, H] embeddings
        kv_cache: dict[str, jax.Array],  # {"k","v"}: [L, Nblk, Hkv, B, D]
        meta: AttentionMetadata,
        attention_backend: Optional[str] = None,
        tp_axis: Optional[str] = None,
        defer_kv_write: bool = False,
    ) -> tuple[jax.Array, dict[str, jax.Array]]:
        """Decoder forward. When running inside shard_map with column/row-
        sharded params (parallel/sharding.py), `tp_axis` names the mesh axis
        to psum partial o_proj/down_proj results over (Megatron TP).

        defer_kv_write (decode-shaped steps only, one token per row):
        the layer scan never touches the cache — each token's in-flight
        K/V joins attention as an explicit self column, the per-layer
        K/V stack out as small scan ys, and the caller commits them with
        ONE in-place pallas write per step. Threading the cache through
        any loop carry makes XLA round-trip the full cache per iteration
        (measured 1.5-2.9x decode slowdown, see write_kv_auto)."""
        from vllm_omni_tpu.parallel.sharding import psum_if

        T = hidden.shape[0]
        lp = params["layers"]
        cos, sin = self._cos, self._sin
        k_cache_in, v_cache_in = kv_cache["k"], kv_cache["v"]
        # int8 KV cache: per-(slot, head) scales ride alongside the
        # int8 pages ({"k_scale","v_scale"}: [L, N, Hkv, B] f32)
        kv_quant = "k_scale" in kv_cache
        ks_in = kv_cache.get("k_scale")
        vs_in = kv_cache.get("v_scale")

        # prefill-shaped steps: the page-grouped write kernel needs the
        # slot sort — loop-invariant, so compute it ONCE outside the scan
        kv_groups = None
        if not defer_kv_write:
            from vllm_omni_tpu.ops.attention.ragged_paged import (
                uses_grouped_kv_write,
            )

            _, _, hkv_c, b_c, d_c = k_cache_in.shape
            if uses_grouped_kv_write(
                    T, hkv_c, b_c, d_c, k_cache_in.dtype.itemsize):
                from vllm_omni_tpu.ops.attention.pallas_kv_write import (
                    prepare_page_groups,
                )

                kv_groups = prepare_page_groups(meta.slot_mapping, b_c)

        # int8 KV decode: scales are gathered chunk-major per layer
        # inside decode_paged_attention. Two amortization attempts were
        # measured SLOWER at ctx 2300 (BASELINE.md round 4): an
        # all-layer XLA gather hoisted here (1561 tok/s) and a one-hot
        # MXU matmul gather (1479) vs per-layer gathers (2036) — the
        # extra materialization/transpose traffic exceeds what
        # amortizing the gather dispatches saves.

        def layer(carry, xs):
            ks, vs = ks_in, vs_in
            if defer_kv_write:
                h = carry
                k_cache, v_cache = k_cache_in, v_cache_in  # read-only
            elif kv_quant:
                h, k_cache, v_cache, ks, vs = carry
            else:
                h, k_cache, v_cache = carry
            p, li = xs
            res = h
            h_n = rms_norm(h, p["input_layernorm"], self.eps)
            if "qkv_proj" in p:
                qkv = linear(h_n, p["qkv_proj"], p.get("qkv_bias"))
                q, k, v = jnp.split(
                    qkv,
                    [self.Hq * self.D, (self.Hq + self.Hkv) * self.D],
                    axis=-1)
            else:
                q = linear(h_n, p["q_proj"], p.get("q_bias"))
                k = linear(h_n, p["k_proj"], p.get("k_bias"))
                v = linear(h_n, p["v_proj"], p.get("v_bias"))
            # head counts derive from the (possibly TP-sharded) arrays
            q = q.reshape(T, -1, self.D)
            k = k.reshape(T, -1, self.D)
            v = v.reshape(T, -1, self.D)
            if self.qk_norm:
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
                kw, vw = k, v
                if kv_quant:
                    from vllm_omni_tpu.ops.quant import quantize_kv

                    kw, k_s = quantize_kv(k)
                    vw, v_s = quantize_kv(v)
                    bsz = k_cache.shape[3]
                    blk = meta.slot_mapping // bsz
                    off = meta.slot_mapping % bsz
                    # scale scatter: the scale arrays are ~D/itemsize x
                    # smaller than the cache, so the XLA scatter's
                    # whole-operand copy is a few MB, not GB. Layout is
                    # [L, N, B, Hkv] (kernel DMA tile alignment) ->
                    # update shape [T, Hkv] = quantize_kv's scales
                    ks = ks.at[li, blk, off].set(k_s)
                    vs = vs.at[li, blk, off].set(v_s)
                k_cache, v_cache = write_kv_auto(
                    k_cache, v_cache, li, kw, vw, meta.slot_mapping,
                    groups=kv_groups)
            # the FULL cache stack + layer index goes to attention: the
            # pallas decode kernel indexes [layer, block] itself, and a
            # traced-index slice of the stack here would make XLA copy
            # the whole per-layer slice every scan iteration
            attn = ragged_paged_attention(
                q, k_cache, v_cache,
                meta.q_starts, meta.q_lens, meta.seq_lens, meta.block_tables,
                meta.positions, meta.token_rows,
                scale=self.scale,
                sliding_window=self.sliding_window,
                backend=attention_backend,
                k_self=k if defer_kv_write else None,
                v_self=v if defer_kv_write else None,
                layer=li,
                k_scale=ks if kv_quant else None,
                v_scale=vs if kv_quant else None,
            )
            attn_out = linear(attn.reshape(T, -1), p["o_proj"])
            h = res + psum_if(attn_out, tp_axis)
            res = h
            h_n = rms_norm(h, p["post_attention_layernorm"], self.eps)
            if "gateup_proj" in p:
                gate, up = jnp.split(
                    linear(h_n, p["gateup_proj"]), 2, axis=-1)
            else:
                gate = linear(h_n, p["gate_proj"])
                up = linear(h_n, p["up_proj"])
            mlp_out = linear(
                jax.nn.silu(gate.astype(jnp.float32)).astype(h_n.dtype) * up,
                p["down_proj"],
            )
            h = res + psum_if(mlp_out, tp_axis)
            if defer_kv_write:
                return h, (k, v)
            if kv_quant:
                return (h, k_cache, v_cache, ks, vs), None
            return (h, k_cache, v_cache), None

        xs = (lp, jnp.arange(self.L, dtype=jnp.int32))
        if defer_kv_write:
            hidden, (k_all, v_all) = jax.lax.scan(layer, hidden, xs)
            hidden = rms_norm(hidden, params["norm"], self.eps)
            return hidden, {"k_new": k_all, "v_new": v_all}
        if kv_quant:
            (hidden, new_k, new_v, new_ks, new_vs), _ = jax.lax.scan(
                layer, (hidden, k_cache_in, v_cache_in, ks_in, vs_in), xs)
            hidden = rms_norm(hidden, params["norm"], self.eps)
            return hidden, {"k": new_k, "v": new_v,
                            "k_scale": new_ks, "v_scale": new_vs}
        (hidden, new_k, new_v), _ = jax.lax.scan(
            layer, (hidden, k_cache_in, v_cache_in), xs)
        hidden = rms_norm(hidden, params["norm"], self.eps)
        return hidden, {"k": new_k, "v": new_v}

    def forward_cp_prefill(
        self,
        params: dict[str, Any],
        hidden: jax.Array,  # [Ts, H] local sequence shard of embeddings
        positions: jax.Array,  # [Ts] global positions of the shard
        seq_axis: str,
        tp_axis: Optional[str] = None,
    ) -> tuple[jax.Array, jax.Array]:
        """Context-parallel long-prompt prefill: the prompt is sharded on
        the `seq_axis` mesh axis, attention runs as causal ring attention
        (KV shards rotate over ICI, parallel/ring.py) — the sequence-
        parallel long-context prefill the reference only surfaces as
        device accounting (reference omni_stage.py:458
        prefill_context_parallel_size; ring declared-but-unbuilt in
        diffusion/attention/parallel/factory.py:31-45).

        Returns per-layer (k, v) for the LOCAL token shard
        ([L, Ts, Hkv_local, D]); the caller gathers shards and commits
        them to the paged cache. No logits: CP covers prompt tokens whose
        outputs are never sampled (the final prompt token goes through
        the standard chunked path).
        """
        from vllm_omni_tpu.parallel.ring import ring_attention
        from vllm_omni_tpu.parallel.sharding import psum_if

        T = hidden.shape[0]
        lp = params["layers"]
        cos, sin = self._cos, self._sin

        def layer(h, xs):
            p, li = xs
            res = h
            h_n = rms_norm(h, p["input_layernorm"], self.eps)
            q = linear(h_n, p["q_proj"], p.get("q_bias"))
            k = linear(h_n, p["k_proj"], p.get("k_bias"))
            v = linear(h_n, p["v_proj"], p.get("v_bias"))
            q = q.reshape(T, -1, self.D)
            k = k.reshape(T, -1, self.D)
            v = v.reshape(T, -1, self.D)
            if self.qk_norm:
                q = rms_norm(q, p["q_norm"], self.eps)
                k = rms_norm(k, p["k_norm"], self.eps)
            q, k = apply_rope(q, k, positions, cos, sin, theta=self.theta)
            G = q.shape[1] // k.shape[1]
            kr = jnp.repeat(k, G, axis=1) if G > 1 else k
            vr = jnp.repeat(v, G, axis=1) if G > 1 else v
            attn = ring_attention(
                q[None], kr[None], vr[None], axis=seq_axis,
                scale=self.scale, causal=True,
            )[0]
            attn_out = linear(attn.reshape(T, -1), p["o_proj"])
            h = res + psum_if(attn_out, tp_axis)
            res = h
            h_n = rms_norm(h, p["post_attention_layernorm"], self.eps)
            gate = linear(h_n, p["gate_proj"])
            up = linear(h_n, p["up_proj"])
            mlp_out = linear(
                jax.nn.silu(gate.astype(jnp.float32)).astype(h_n.dtype) * up,
                p["down_proj"],
            )
            h = res + psum_if(mlp_out, tp_axis)
            return h, (k, v)

        xs = (lp, jnp.arange(self.L, dtype=jnp.int32))
        _, (k_all, v_all) = jax.lax.scan(layer, hidden, xs)
        return k_all, v_all

    def compute_logits(
        self, params, hidden: jax.Array, tp_axis: Optional[str] = None
    ) -> jax.Array:
        from vllm_omni_tpu.parallel.sharding import all_gather_if

        head = params.get("lm_head")
        if head is None:
            # tied embeddings are replicated -> full logits locally
            return unembed(hidden, params["embed_tokens"].T)
        logits = unembed(hidden, head)
        # vocab-sharded head -> gather shards (tiled, in mesh order)
        return all_gather_if(logits, tp_axis, gather_axis=-1)


class Qwen3ForCausalLM(Qwen2ForCausalLM):
    """Qwen3 dense: no QKV bias, per-head q/k RMSNorm."""

    qkv_bias = False
    qk_norm = True
