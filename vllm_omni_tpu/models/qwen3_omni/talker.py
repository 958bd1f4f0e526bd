"""Qwen3-Omni MoE talker + MTP code predictor.

Parity: Qwen3OmniMoeTalkerForConditionalGeneration (reference
model_executor/models/qwen3_omni/qwen3_omni_moe_talker.py and the HF
orchestration in transformers modeling_qwen3_omni_moe.py):

- the talker is a Qwen3-MoE decoder (every layer sparse, plus a
  sigmoid-gated shared expert) over a codec vocabulary, driven by
  projected thinker states (`text_projection`/`hidden_projection`
  ResizeMLPs) with interleaved M-RoPE;
- each decode step runs the MTP *code predictor* (a small dense
  Qwen3 decoder with per-codebook embeddings/heads) to expand the
  sampled codebook-0 token into a full RVQ frame of `num_code_groups`
  codes, and the next talker input embedding is the SUM of the
  codec embedding of code 0, the predictor embeddings of codes
  1..NQ-1, and the trailing thinker text hidden (or tts_pad).

TPU design: the talker serves exactly one stream at a time in the
omni pipeline (HF asserts batch==1), so instead of routing it through
the paged-KV continuous-batching engine we give it a dense
fixed-capacity KV cache and jit two fixed-shape programs — a bucketed
prefill and a fused decode step that contains the full predictor
rollout (a `lax.fori_loop` over NQ-1 micro-steps of the tiny dense
decoder), the frame-embedding composition, suppression, repetition
penalty and sampling. One host sync per frame (the EOS check).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from vllm_omni_tpu.models.layers import linear, rms_norm
from vllm_omni_tpu.ops.moe import moe_mlp
from vllm_omni_tpu.ops.rope import apply_rope
from vllm_omni_tpu.ops.sampling import sample


# --------------------------------------------------------------------- utils
def _w(key, *shape, dtype, scale=0.02):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def _swiglu(x, gate_w, up_w, down_w):
    g = linear(x, gate_w)
    u = linear(x, up_w)
    return linear(jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u, down_w)


def _dense_attention(q, k, v, scale, q_pos, k_valid):
    """Masked dense GQA attention.

    q: [T, Hq, D]; k/v: [S, Hkv, D]; q_pos: [T] absolute positions;
    key j attends iff j <= q_pos[t] and j < k_valid."""
    T, Hq, D = q.shape
    S, Hkv, _ = k.shape
    G = Hq // Hkv
    qg = q.reshape(T, Hkv, G, D).astype(jnp.float32)
    scores = jnp.einsum("thgd,shd->thgs", qg, k.astype(jnp.float32)) * scale
    j = jnp.arange(S)
    mask = (j[None, :] <= q_pos[:, None]) & (j[None, :] < k_valid)
    scores = jnp.where(mask[:, None, None, :], scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("thgs,shd->thgd", p, v.astype(jnp.float32))
    return out.reshape(T, Hq * D).astype(q.dtype)


# ------------------------------------------------------------ code predictor
class Qwen3OmniTalkerCodePredictor:
    """MTP code predictor: dense Qwen3 decoder with NQ-1 codebook
    embeddings and NQ-1 lm heads (HF
    Qwen3OmniMoeTalkerCodePredictorModelForConditionalGeneration:
    prefill = [talker hidden, codec-0 embed], then codebook i is
    produced by lm_head[i-1] and fed back through codec_embedding[i-1])."""

    def __init__(self, cfg: dict[str, Any], num_code_groups: int, dtype=jnp.float32):
        self.H = int(cfg.get("hidden_size", 1024))
        self.L = int(cfg.get("num_hidden_layers", 5))
        self.Hq = int(cfg.get("num_attention_heads", 16))
        self.Hkv = int(cfg.get("num_key_value_heads", self.Hq))
        self.D = int(cfg.get("head_dim") or self.H // self.Hq)
        self.I = int(cfg.get("intermediate_size", 3072))
        self.eps = float(cfg.get("rms_norm_eps", 1e-6))
        self.theta = float(cfg.get("rope_theta", 10000.0))
        self.V = int(cfg.get("vocab_size", 2048))
        self.NQ = num_code_groups
        self.dtype = dtype
        self.scale = self.D ** -0.5

    def init_params(self, rng: jax.Array) -> dict[str, Any]:
        dt, L, H, D = self.dtype, self.L, self.H, self.D
        ks = jax.random.split(rng, 16)
        layers = {
            "q_proj": _w(ks[0], L, H, self.Hq * D, dtype=dt),
            "k_proj": _w(ks[1], L, H, self.Hkv * D, dtype=dt),
            "v_proj": _w(ks[2], L, H, self.Hkv * D, dtype=dt),
            "o_proj": _w(ks[3], L, self.Hq * D, H, dtype=dt),
            "q_norm": jnp.ones((L, D), dt),
            "k_norm": jnp.ones((L, D), dt),
            "gate_proj": _w(ks[4], L, H, self.I, dtype=dt),
            "up_proj": _w(ks[5], L, H, self.I, dtype=dt),
            "down_proj": _w(ks[6], L, self.I, H, dtype=dt),
            "input_layernorm": jnp.ones((L, H), dt),
            "post_attention_layernorm": jnp.ones((L, H), dt),
        }
        return {
            "layers": layers,
            "norm": jnp.ones((H,), dt),
            # codec_embedding[i] / lm_head[i], i in 0..NQ-2, stacked
            "embeddings": _w(ks[7], self.NQ - 1, self.V, H, dtype=dt),
            "heads": _w(ks[8], self.NQ - 1, H, self.V, dtype=dt),
        }

    def forward(self, params: dict[str, Any], embeds: jax.Array,
                valid_len: jax.Array) -> jax.Array:
        """Full-recompute causal forward over a fixed [S, H] buffer;
        positions = arange(S), keys masked to < valid_len."""
        S = embeds.shape[0]
        pos = jnp.arange(S, dtype=jnp.int32)
        cos, sin = self._tables(S)

        def layer(h, p):
            res = h
            h_n = rms_norm(h, p["input_layernorm"], self.eps)
            q = linear(h_n, p["q_proj"]).reshape(S, self.Hq, self.D)
            k = linear(h_n, p["k_proj"]).reshape(S, self.Hkv, self.D)
            v = linear(h_n, p["v_proj"]).reshape(S, self.Hkv, self.D)
            q = rms_norm(q, p["q_norm"], self.eps)
            k = rms_norm(k, p["k_norm"], self.eps)
            q, k = apply_rope(q, k, pos, cos, sin)
            attn = _dense_attention(q, k, v, self.scale, pos, valid_len)
            h = res + linear(attn, p["o_proj"])
            res = h
            h_n = rms_norm(h, p["post_attention_layernorm"], self.eps)
            h = res + _swiglu(h_n, p["gate_proj"], p["up_proj"], p["down_proj"])
            return h, None

        h, _ = jax.lax.scan(layer, embeds, params["layers"])
        return rms_norm(h, params["norm"], self.eps)

    def _tables(self, max_pos: int):
        from vllm_omni_tpu.ops.rope import rope_table

        return rope_table(self.D, max_pos, self.theta)

    def rollout(
        self,
        params: dict[str, Any],
        past_hidden: jax.Array,  # [H] talker last-layer hidden (prev pos)
        code0_embed: jax.Array,  # [H] talker codec embedding of code 0
        greedy: bool,
        seed: jax.Array,  # uint32 scalar
        top_k: int = 50,
        top_p: float = 0.8,
    ) -> tuple[jax.Array, jax.Array]:
        """AR rollout of codes 1..NQ-1. Returns (codes [NQ-1] int32,
        extra_embed [H] = sum of predictor embeddings of codes 1..NQ-1 —
        exactly `mid_residual_hiddens + last_residual_hidden` in HF)."""
        S = self.NQ + 1
        dt = code0_embed.dtype
        buf = jnp.zeros((S, self.H), dt)
        buf = buf.at[0].set(past_hidden.astype(dt))
        buf = buf.at[1].set(code0_embed)

        def body(i, carry):
            buf, codes, extra = carry
            h = self.forward(params, buf, valid_len=i + 2)
            h_i = jax.lax.dynamic_index_in_dim(h, i + 1, keepdims=False)
            head = jax.lax.dynamic_index_in_dim(
                params["heads"], i, keepdims=False)
            logits = jnp.dot(h_i, head,
                             preferred_element_type=jnp.float32)[None]
            if greedy:
                code = jnp.argmax(logits, axis=-1).astype(jnp.int32)[0]
            else:
                code = sample(
                    logits,
                    jnp.ones((1,), jnp.float32),
                    jnp.full((1,), top_p, jnp.float32),
                    jnp.full((1,), top_k, jnp.int32),
                    jnp.zeros((1,), jnp.float32),
                    jnp.asarray([seed], jnp.uint32),
                    jnp.asarray([i], jnp.int32),
                )[0]
            table = jax.lax.dynamic_index_in_dim(
                params["embeddings"], i, keepdims=False)
            emb = table[code]
            extra = extra + emb
            buf = jax.lax.dynamic_update_slice(buf, emb[None], (i + 2, 0))
            codes = codes.at[i].set(code)
            return buf, codes, extra

        codes0 = jnp.zeros((self.NQ - 1,), jnp.int32)
        extra0 = jnp.zeros((self.H,), dt)
        _, codes, extra = jax.lax.fori_loop(
            0, self.NQ - 1, body, (buf, codes0, extra0))
        return codes, extra

    # -------------------------------------------------------------- loading
    def load_from_state_dict(self, sd: dict[str, Any]) -> dict[str, Any]:
        import numpy as np

        def t(name):
            return jnp.asarray(
                np.asarray(sd[name], np.float32).T).astype(self.dtype)

        def v(name):
            return jnp.asarray(
                np.asarray(sd[name], np.float32)).astype(self.dtype)

        L = self.L
        layers: dict[str, Any] = {}
        for our, hf, vec in (
            ("q_proj", "self_attn.q_proj.weight", False),
            ("k_proj", "self_attn.k_proj.weight", False),
            ("v_proj", "self_attn.v_proj.weight", False),
            ("o_proj", "self_attn.o_proj.weight", False),
            ("q_norm", "self_attn.q_norm.weight", True),
            ("k_norm", "self_attn.k_norm.weight", True),
            ("gate_proj", "mlp.gate_proj.weight", False),
            ("up_proj", "mlp.up_proj.weight", False),
            ("down_proj", "mlp.down_proj.weight", False),
            ("input_layernorm", "input_layernorm.weight", True),
            ("post_attention_layernorm", "post_attention_layernorm.weight",
             True),
        ):
            fn = v if vec else t
            layers[our] = jnp.stack(
                [fn(f"model.layers.{i}.{hf}") for i in range(L)])
        return {
            "layers": layers,
            "norm": v("model.norm.weight"),
            "embeddings": jnp.stack(
                [v(f"model.codec_embedding.{i}.weight")
                 for i in range(self.NQ - 1)]),
            "heads": jnp.stack(
                [t(f"lm_head.{i}.weight") for i in range(self.NQ - 1)]),
        }


# ------------------------------------------------------------------- talker
class Qwen3OmniTalker:
    """Talker decoder + projections + code predictor (functional)."""

    def __init__(self, talker_cfg: dict[str, Any], dtype=jnp.float32):
        self.cfg = talker_cfg
        # MoE impl knob, read at trace time. "auto" = ragged grouped
        # dispatch everywhere: _experts_ragged carries a custom_vmap
        # rule (batch axis folds into the token axis), so the lockstep-
        # batched talker's vmapped programs get real O(T*K) dispatch
        # too. "dense" remains a numerics oracle for tiny test configs.
        self.moe_impl = "auto"
        tc = talker_cfg.get("text_config", talker_cfg)
        self.H = int(tc.get("hidden_size", 1024))
        self.L = int(tc.get("num_hidden_layers", 20))
        self.Hq = int(tc.get("num_attention_heads", 16))
        self.Hkv = int(tc.get("num_key_value_heads", self.Hq))
        self.D = int(tc.get("head_dim") or self.H // self.Hq)
        self.I = int(tc.get("intermediate_size", 2048))
        self.moe_I = int(tc.get("moe_intermediate_size", 384))
        self.shared_I = int(tc.get("shared_expert_intermediate_size", self.I))
        self.E = int(tc.get("num_experts", 128))
        self.K = int(tc.get("num_experts_per_tok", 8))
        self.norm_topk_prob = bool(tc.get("norm_topk_prob", False))
        self.eps = float(tc.get("rms_norm_eps", 1e-6))
        self.theta = float(tc.get("rope_theta", 10000.0))
        self.V = int(tc.get("vocab_size", 3072))
        rs = tc.get("rope_scaling") or {}
        self.mrope_section = list(rs.get("mrope_section", [24, 20, 20]))
        self.thinker_H = int(talker_cfg.get("thinker_hidden_size", 2048))
        self.NQ = int(talker_cfg.get("num_code_groups", 32))
        self.dtype = dtype
        self.scale = self.D ** -0.5
        self.predictor = Qwen3OmniTalkerCodePredictor(
            talker_cfg.get("code_predictor_config", {}),
            num_code_groups=self.NQ, dtype=dtype)

    # ------------------------------------------------------------- params
    def init_params(self, rng: jax.Array) -> dict[str, Any]:
        dt, L, H, D = self.dtype, self.L, self.H, self.D
        ks = jax.random.split(rng, 24)
        layers = {
            "q_proj": _w(ks[0], L, H, self.Hq * D, dtype=dt),
            "k_proj": _w(ks[1], L, H, self.Hkv * D, dtype=dt),
            "v_proj": _w(ks[2], L, H, self.Hkv * D, dtype=dt),
            "o_proj": _w(ks[3], L, self.Hq * D, H, dtype=dt),
            "q_norm": jnp.ones((L, D), dt),
            "k_norm": jnp.ones((L, D), dt),
            "router": _w(ks[4], L, H, self.E, dtype=dt),
            "experts_gate": _w(ks[5], L, self.E, H, self.moe_I, dtype=dt),
            "experts_up": _w(ks[6], L, self.E, H, self.moe_I, dtype=dt),
            "experts_down": _w(ks[7], L, self.E, self.moe_I, H, dtype=dt),
            "shared_gate_proj": _w(ks[8], L, H, self.shared_I, dtype=dt),
            "shared_up_proj": _w(ks[9], L, H, self.shared_I, dtype=dt),
            "shared_down_proj": _w(ks[10], L, self.shared_I, H, dtype=dt),
            "shared_expert_gate": _w(ks[11], L, H, 1, dtype=dt),
            "input_layernorm": jnp.ones((L, H), dt),
            "post_attention_layernorm": jnp.ones((L, H), dt),
        }

        def resize_mlp(key):
            k1, k2 = jax.random.split(key)
            return {
                "fc1": _w(k1, self.thinker_H, self.I, dtype=dt),
                "fc1_b": jnp.zeros((self.I,), dt),
                "fc2": _w(k2, self.I, H, dtype=dt),
                "fc2_b": jnp.zeros((H,), dt),
            }

        return {
            "layers": layers,
            "norm": jnp.ones((H,), dt),
            "codec_embedding": _w(ks[12], self.V, H, dtype=dt),
            "codec_head": _w(ks[13], H, self.V, dtype=dt),
            "text_projection": resize_mlp(ks[14]),
            "hidden_projection": resize_mlp(ks[15]),
            "code_predictor": self.predictor.init_params(ks[16]),
        }

    def init_cache(self, max_len: int) -> dict[str, jax.Array]:
        shape = (self.L, max_len, self.Hkv, self.D)
        return {"k": jnp.zeros(shape, self.dtype),
                "v": jnp.zeros(shape, self.dtype)}

    # ------------------------------------------------------------ modules
    def project(self, params: dict[str, Any], which: str,
                x: jax.Array) -> jax.Array:
        """ResizeMLP thinker-dim -> talker-dim (HF
        Qwen3OmniMoeTalkerResizeMLP: fc2(silu(fc1(x))))."""
        p = params[which]
        h = linear(x.astype(self.dtype), p["fc1"], p["fc1_b"])
        h = jax.nn.silu(h.astype(jnp.float32)).astype(self.dtype)
        return linear(h, p["fc2"], p["fc2_b"])

    def embed_codec(self, params: dict[str, Any], ids: jax.Array) -> jax.Array:
        return params["codec_embedding"][ids]

    def forward(
        self,
        params: dict[str, Any],
        embeds: jax.Array,  # [T, H]
        positions: jax.Array,  # [3, T] mrope positions (may be float)
        kv_cache: dict[str, jax.Array],  # [L, Tmax, Hkv, D]
        cache_len: jax.Array,  # scalar int32: tokens already cached
    ) -> tuple[jax.Array, dict[str, jax.Array]]:
        """Dense-cache decoder forward; returns (post-norm hidden [T, H],
        updated cache). Works for both prefill (cache_len=0) and decode
        (T=1)."""
        from vllm_omni_tpu.ops.rope import rope_table

        T = embeds.shape[0]
        q_pos = cache_len + jnp.arange(T, dtype=jnp.int32)
        valid = cache_len + T
        # interleaved M-RoPE computes angles directly from (possibly
        # fractional) positions; the table only supplies D//2
        cos, sin = rope_table(self.D, 1, self.theta)

        def layer(carry, xs):
            h = carry
            p, k_c, v_c = xs
            res = h
            h_n = rms_norm(h, p["input_layernorm"], self.eps)
            q = linear(h_n, p["q_proj"]).reshape(T, self.Hq, self.D)
            k = linear(h_n, p["k_proj"]).reshape(T, self.Hkv, self.D)
            v = linear(h_n, p["v_proj"]).reshape(T, self.Hkv, self.D)
            q = rms_norm(q, p["q_norm"], self.eps)
            k = rms_norm(k, p["k_norm"], self.eps)
            q, k = apply_rope(
                q, k, positions, cos, sin,
                mrope_section=self.mrope_section,
                interleaved=True, theta=self.theta)
            k_c = jax.lax.dynamic_update_slice(k_c, k, (cache_len, 0, 0))
            v_c = jax.lax.dynamic_update_slice(v_c, v, (cache_len, 0, 0))
            attn = _dense_attention(q, k_c, v_c, self.scale, q_pos, valid)
            h = res + linear(attn, p["o_proj"])
            res = h
            h_n = rms_norm(h, p["post_attention_layernorm"], self.eps)
            moe = moe_mlp(
                h_n, p["router"], p["experts_gate"], p["experts_up"],
                p["experts_down"], top_k=self.K,
                norm_topk_prob=self.norm_topk_prob,
                impl=self.moe_impl)
            shared = _swiglu(h_n, p["shared_gate_proj"], p["shared_up_proj"],
                             p["shared_down_proj"])
            gate = jax.nn.sigmoid(
                linear(h_n, p["shared_expert_gate"]).astype(jnp.float32))
            h = res + moe + (gate * shared.astype(jnp.float32)).astype(h.dtype)
            return h, (k_c, v_c)

        lp = params["layers"]
        hidden, (new_k, new_v) = jax.lax.scan(
            layer, embeds, (lp, kv_cache["k"], kv_cache["v"]))
        hidden = rms_norm(hidden, params["norm"], self.eps)
        return hidden, {"k": new_k, "v": new_v}

    def logits(self, params: dict[str, Any], hidden: jax.Array) -> jax.Array:
        return jnp.dot(hidden, params["codec_head"],
                       preferred_element_type=jnp.float32)

    # -------------------------------------------------------------- loading
    def load_from_state_dict(self, sd: dict[str, Any]) -> dict[str, Any]:
        import numpy as np

        def t(name):
            return jnp.asarray(
                np.asarray(sd[name], np.float32).T).astype(self.dtype)

        def v(name):
            return jnp.asarray(
                np.asarray(sd[name], np.float32)).astype(self.dtype)

        L, E = self.L, self.E
        layers: dict[str, Any] = {}
        for our, hf, vec in (
            ("q_proj", "self_attn.q_proj.weight", False),
            ("k_proj", "self_attn.k_proj.weight", False),
            ("v_proj", "self_attn.v_proj.weight", False),
            ("o_proj", "self_attn.o_proj.weight", False),
            ("q_norm", "self_attn.q_norm.weight", True),
            ("k_norm", "self_attn.k_norm.weight", True),
            ("router", "mlp.gate.weight", False),
            ("shared_gate_proj", "mlp.shared_expert.gate_proj.weight", False),
            ("shared_up_proj", "mlp.shared_expert.up_proj.weight", False),
            ("shared_down_proj", "mlp.shared_expert.down_proj.weight", False),
            ("shared_expert_gate", "mlp.shared_expert_gate.weight", False),
            ("input_layernorm", "input_layernorm.weight", True),
            ("post_attention_layernorm", "post_attention_layernorm.weight",
             True),
        ):
            fn = v if vec else t
            layers[our] = jnp.stack(
                [fn(f"model.layers.{i}.{hf}") for i in range(L)])
        for our, hf in (("experts_gate", "gate_proj"),
                        ("experts_up", "up_proj"),
                        ("experts_down", "down_proj")):
            layers[our] = jnp.stack([
                jnp.stack([t(f"model.layers.{i}.mlp.experts.{e}.{hf}.weight")
                           for e in range(E)])
                for i in range(L)])

        def mlp(prefix):
            return {
                "fc1": t(f"{prefix}.linear_fc1.weight"),
                "fc1_b": v(f"{prefix}.linear_fc1.bias"),
                "fc2": t(f"{prefix}.linear_fc2.weight"),
                "fc2_b": v(f"{prefix}.linear_fc2.bias"),
            }

        pred_sd = {k[len("code_predictor."):]: val for k, val in sd.items()
                   if k.startswith("code_predictor.")}
        return {
            "layers": layers,
            "norm": v("model.norm.weight"),
            "codec_embedding": v("model.codec_embedding.weight"),
            "codec_head": t("codec_head.weight"),
            "text_projection": mlp("text_projection"),
            "hidden_projection": mlp("hidden_projection"),
            "code_predictor": self.predictor.load_from_state_dict(pred_sd),
        }
