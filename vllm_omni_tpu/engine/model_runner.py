"""Model runner: owns params, paged KV caches, and the jitted step.

TPU-native replacement for the reference's GPUARModelRunner /
GPUGenerationModelRunner (reference worker/gpu_ar_model_runner.py:79-451,
gpu_generation_model_runner.py:44-182): instead of CUDA-graph capture +
two-phase execute/sample, ONE jit-compiled function per token-bucket does
embed → scanned decoder forward (KV write + ragged paged attention) →
logits gather → penalties → sample, with the KV caches and sampling state
donated so XLA updates them in place.

Non-text stages get per-row last hidden states back (the thinker→talker
data path, reference gpu_ar_model_runner.py:377-430) — as device arrays,
no host round-trip.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from vllm_omni_tpu.config.engine import EngineConfig
from vllm_omni_tpu.core.sched.output import BatchDescriptor
from vllm_omni_tpu.logger import init_logger
from vllm_omni_tpu.models.registry import resolve_ar_model
from vllm_omni_tpu.ops.attention import AttentionMetadata
from vllm_omni_tpu.ops.sampling import (
    SamplingState,
    apply_penalties,
    sample,
)
from vllm_omni_tpu.utils import cdiv

logger = init_logger(__name__)

DEFAULT_NUM_BLOCKS = 2048


class ModelRunner:
    def __init__(
        self,
        config: EngineConfig,
        load_weights: bool = True,
        rng_seed: int = 0,
        model: Optional[Any] = None,
        attention_backend: Optional[str] = None,
        devices: Optional[list] = None,
    ):
        self.config = config
        mc = config.model_config
        self.model = model if model is not None else resolve_ar_model(
            mc.architecture)(mc)
        self.attention_backend = attention_backend
        pc = config.parallel_config
        self.tp = pc.tensor_parallel_size
        self.mesh = pc.build_mesh(devices) if pc.world_size > 1 else None
        if load_weights and mc.model:
            self.params = self.model.load_weights(mc.model)
        else:
            self.params = self.model.init_params(jax.random.key(rng_seed))
        import os

        if (pc.world_size == 1
                and getattr(self.model, "supports_fused_projections", False)
                and os.environ.get("OMNI_TPU_FUSE_PROJ", "1") == "1"):
            # single-device decode is weight-bandwidth bound: QKV and
            # gate/up fuse into single matmuls (disabled under TP — the
            # fused columns would interleave across Megatron shards)
            self.params = self.model.fuse_projections(self.params)
        if mc.quantization:
            if mc.quantization != "int8":
                raise ValueError(
                    f"unsupported quantization {mc.quantization!r}")
            from vllm_omni_tpu.ops.quant import quantize_params

            self.params = quantize_params(self.params)
            logger.info("weight-only int8 quantization applied")
        self.num_blocks = self._decide_num_blocks()
        spec = self.model.kv_spec
        if self.tp > 1 and spec.num_kv_heads % self.tp != 0:
            raise ValueError(
                f"num_kv_heads {spec.num_kv_heads} not divisible by tp {self.tp}"
            )
        B = config.cache_config.block_size
        # page-major paged layout [L, N, Hkv, B, D]: one page is one
        # contiguous (Hkv*B*D)-byte region, so the attention kernels'
        # page DMAs are single contiguous transfers (~89% of HBM peak
        # on v5e vs ~70% head-major; benchmarks/micro_dma.py)
        shape = (spec.num_layers, self.num_blocks, spec.num_kv_heads, B, spec.head_dim)
        cache_dtype = config.cache_config.cache_dtype
        self.kv_cache = {
            "k": jnp.zeros(shape, cache_dtype),
            "v": jnp.zeros(shape, cache_dtype),
        }
        if cache_dtype == jnp.int8:
            # per-(slot, head) scales for the int8 KV cache (~3% of the
            # int8 pages at D=128; ops/quant.py quantize_kv). B-major
            # [L, N, B, Hkv]: the decode kernel DMAs a page's [B, Hkv]
            # scale slice onto the VMEM sublane dim (tile-aligned)
            s_shape = (shape[0], shape[1], B, spec.num_kv_heads)
            self.kv_cache["k_scale"] = jnp.zeros(s_shape, jnp.float32)
            self.kv_cache["v_scale"] = jnp.zeros(s_shape, jnp.float32)
        S = config.scheduler_config.max_num_seqs
        self.sampling_state = SamplingState.init(S, mc.vocab_size)
        # device-resident last sampled token per row: decode steps scheduled
        # ahead of host observation gather their input token from here
        self.prev_sampled = jnp.zeros(S, jnp.int32)
        if self.mesh is not None:
            self._shard_state()
        elif devices:
            # pinned single-device placement (DP replica: each engine
            # replica owns a device slice, reference gpu_ar_worker.py:31-57
            # local-rank math); jit executes on the operands' device
            dev = devices[0]
            self.params = jax.device_put(self.params, dev)
            self.kv_cache = jax.device_put(self.kv_cache, dev)
            self.sampling_state = jax.device_put(self.sampling_state, dev)
            self.prev_sampled = jax.device_put(self.prev_sampled, dev)
        self._step_fns: dict[Any, Callable] = {}
        logger.info(
            "ModelRunner ready: %s, %d KV blocks x %d tokens, %d rows, tp=%d",
            mc.architecture, self.num_blocks, B, S, self.tp,
        )

    def _shard_state(self) -> None:
        from vllm_omni_tpu.parallel.sharding import (
            REPLICATED,
            kv_cache_specs,
            place,
            qwen_param_specs,
        )

        self.param_specs = qwen_param_specs(self.params)
        self.kv_specs = kv_cache_specs(
            quantized="k_scale" in self.kv_cache)
        self.params = place(self.params, self.param_specs, self.mesh)
        self.kv_cache = place(self.kv_cache, self.kv_specs, self.mesh)
        self.sampling_state = place(
            self.sampling_state,
            SamplingState(REPLICATED, REPLICATED),
            self.mesh,
        )
        self.prev_sampled = place(self.prev_sampled, REPLICATED, self.mesh)

    # ----------------------------------------------------------- sizing
    def _decide_num_blocks(self) -> int:
        cc = self.config.cache_config
        if cc.num_blocks is not None:
            return cc.num_blocks
        mc = self.config.model_config
        spec = self.model.kv_spec
        per_block = cc.bytes_per_block(
            spec.num_kv_heads, spec.head_dim, spec.num_layers
        )
        try:
            stats = jax.devices()[0].memory_stats()
            free = stats["bytes_limit"] * cc.hbm_memory_utilization - stats[
                "bytes_in_use"
            ]
            n = max(int(free // per_block), 16)
        except Exception:
            n = DEFAULT_NUM_BLOCKS
        # never more than every row fully extended
        sc = self.config.scheduler_config
        cap = sc.max_num_seqs * cdiv(sc.max_model_len, cc.block_size) + 1
        return min(n, cap)

    # ------------------------------------------------------------- step
    def _build_step_fn(
        self, has_embeds: bool, has_mrope: bool = False,
        has_add: bool = False, has_deepstack: bool = False,
        donate: bool = True,
        need_penalties: bool = True, all_greedy: bool = False,
        maxb: int = 0, num_steps: int = 1, has_spec: bool = False,
        num_logprobs: int = 0, has_suppress: bool = True,
        grammar_words: int = 0, has_replay: bool = False,
    ) -> Callable:
        import inspect

        model = self.model
        backend = self.attention_backend
        tp_axis = "model" if (self.mesh is not None and self.tp > 1) else None
        ep = self.config.parallel_config.expert_parallel_size
        fwd_params = inspect.signature(model.forward).parameters
        fwd_kwargs = {}
        if "ep_axis" in fwd_params:
            fwd_kwargs["ep_axis"] = (
                "expert" if (self.mesh is not None and ep > 1) else None
            )

        # multi-step windows stack per-substep aux ([K, ...]) — latent /
        # emit_full_hidden stages fuse too (engine/core._drain_many
        # slices the window apart)
        # deferred KV writes: decode windows keep the cache out of every
        # loop carry (see qwen2.Qwen2ForCausalLM.forward docstring)
        defer_kv = num_steps > 1 and "defer_kv_write" in fwd_params
        S = self.config.scheduler_config.max_num_seqs
        # block tables arrive width-bucketed from the scheduler; the
        # packed-int layout (and thus the trace) is keyed by the width
        MAXB = maxb or cdiv(
            self.config.scheduler_config.max_model_len,
            self.config.cache_config.block_size,
        )

        def unpack(d: dict) -> dict:
            """Rehydrate the packed descriptor (ONE int32 + ONE float32
            upload per step — per-transfer latency on the device tunnel
            dominates decode otherwise)."""
            ints = d["ints"]
            floats = d["floats"]
            per_tok = 5 + num_steps + (1 if has_replay else 0)
            T = (ints.shape[0] - (17 * S + 1) - S * MAXB
                 - S * grammar_words) // per_tok
            o = 0

            def take(n):
                nonlocal o
                out = ints[o:o + n]
                o += n
                return out

            u = {
                "token_ids": take(T),
                "positions": take(T),
                "token_rows": take(T),
                "slot_mapping": take(T),
                "is_prompt_token": take(T).astype(bool),
                "use_prev_sampled": take(T).astype(bool),
                **({"is_output_replay": take(T).astype(bool)}
                   if has_replay else {}),
                "q_lens": take(S),
                "cu_q_lens": take(S + 1),
                "seq_lens": take(S),
                "logits_indices": take(S),
                "do_sample": take(S).astype(bool),
                "reset_rows": take(S).astype(bool),
                "top_k": take(S),
                "seeds": take(S).astype(jnp.uint32),
                "step_counters": take(S),
                "suppress_ids": take(S * 8).reshape(S, 8),
                "block_tables": take(S * MAXB).reshape(S, MAXB),
            }
            if grammar_words:
                u["grammar_bits"] = take(
                    S * grammar_words).reshape(S, grammar_words)
            if num_steps > 1:
                u["extra_slots"] = take(
                    (num_steps - 1) * T).reshape(num_steps - 1, T)
            (u["temperature"], u["top_p"], u["min_p"],
             u["repetition_penalty"], u["presence_penalty"],
             u["frequency_penalty"]) = jnp.split(floats, 6)
            for k in ("prompt_embeds", "use_embeds", "add_embeds",
                      "use_add_embeds", "mrope_positions",
                      "deepstack_embeds"):
                if k in d:
                    u[k] = d[k]
            return u

        def substep(params, kv_cache, state, prev_sampled, d, k, slot_k):
            """One decode/prefill step; in fused multi-step windows k > 0
            sub-steps source every token from prev_sampled and advance
            positions/seq_lens/counters by k."""
            rows_clip = jnp.clip(d["token_rows"], 0, S - 1)
            token_ids = jnp.where(
                d["use_prev_sampled"] | (k > 0),
                prev_sampled[rows_clip],
                d["token_ids"],
            )
            embeds = model.embed_tokens(params, token_ids)
            if d.get("prompt_embeds") is not None:
                overlay = d["prompt_embeds"].astype(embeds.dtype)
                embeds = jnp.where(d["use_embeds"][:, None], overlay, embeds)
            if d.get("add_embeds") is not None:
                add = d["add_embeds"].astype(embeds.dtype)
                embeds = embeds + jnp.where(
                    d["use_add_embeds"][:, None], add, 0.0)
            active = (d["q_lens"] > 0).astype(jnp.int32)
            mrope_pos = d.get("mrope_positions")
            if mrope_pos is not None:
                # fused windows: generated tokens are text, so every
                # mrope component advances by 1 per sub-step (the host
                # computes the same for the next dispatch)
                mrope_pos = mrope_pos + k
            meta = AttentionMetadata(
                q_starts=d["cu_q_lens"][:-1],
                q_lens=d["q_lens"],
                seq_lens=d["seq_lens"] + active * k,
                block_tables=d["block_tables"],
                positions=d["positions"] + k,
                token_rows=d["token_rows"],
                slot_mapping=slot_k,
                rope_positions=mrope_pos,
            )
            step_fwd_kwargs = dict(fwd_kwargs)
            if d.get("deepstack_embeds") is not None:
                step_fwd_kwargs["deepstack_embeds"] = d["deepstack_embeds"]
            if defer_kv:
                step_fwd_kwargs["defer_kv_write"] = True
                kv_cache_in = kv_cache
            # profiler section markers (parity: record_function sections,
            # reference gpu_ar_model_runner.py:85-301) — visible in
            # jax.profiler/XProf traces
            with jax.named_scope("omni_forward"):
                fwd_out = model.forward(
                    params, embeds, kv_cache, meta,
                    attention_backend=backend, tp_axis=tp_axis,
                    **step_fwd_kwargs,
                )
            captured = None
            if getattr(model, "capture_layer", None) is not None:
                hidden, kv_cache, captured = fwd_out
            else:
                hidden, kv_cache = fwd_out
            if defer_kv:
                from vllm_omni_tpu.ops.attention.ragged_paged import (
                    commit_kv_all_layers,
                )

                kv_new = kv_cache
                k_all, v_all = kv_new["k_new"], kv_new["v_new"]
                with jax.named_scope("omni_kv_commit"):
                    if "k_scale" in kv_cache_in:
                        # int8 KV: quantize the step's [L, T, Hkv, D]
                        # K/V, commit int8 pages via the pallas write,
                        # scatter the tiny scale entries via XLA
                        from vllm_omni_tpu.ops.quant import quantize_kv

                        k_all, k_s = quantize_kv(k_all)
                        v_all, v_s = quantize_kv(v_all)
                        bsz = kv_cache_in["k"].shape[3]
                        blk = slot_k // bsz
                        off = slot_k % bsz
                        # adjacent advanced indices (axes 1, 2) keep
                        # their position: update shape [L, T, Hkv] = k_s
                        ks_c = kv_cache_in["k_scale"].at[
                            :, blk, off].set(k_s)
                        vs_c = kv_cache_in["v_scale"].at[
                            :, blk, off].set(v_s)
                    k_c, v_c = commit_kv_all_layers(
                        kv_cache_in["k"], kv_cache_in["v"],
                        k_all, v_all, slot_k)
                kv_cache = {"k": k_c, "v": v_c}
                if "k_scale" in kv_cache_in:
                    kv_cache["k_scale"] = ks_c
                    kv_cache["v_scale"] = vs_c
            rows_hidden = hidden[d["logits_indices"]]  # [S, H]
            logits = model.compute_logits(
                params, rows_hidden, tp_axis=tp_axis
            )  # [S, V] f32
            logits = logits.astype(jnp.float32)

            # the [S,V] count-matrix bookkeeping costs ~15ms/step on v5e;
            # compiled out entirely when no scheduled request penalizes
            if need_penalties:
                state = state.reset_rows(d["reset_rows"])
                state = state.observe_input_tokens(
                    token_ids, d["token_rows"], d["is_prompt_token"],
                    d.get("is_output_replay"),
                )
                logits = apply_penalties(
                    logits, state,
                    d["repetition_penalty"], d["presence_penalty"],
                    d["frequency_penalty"],
                )
            if has_suppress:
                # per-row suppressed tokens (HF suppress_tokens parity)
                sup = d["suppress_ids"]
                rows_i = jnp.arange(S)[:, None]
                logits = logits.at[
                    rows_i, jnp.clip(sup, 0, logits.shape[-1] - 1)
                ].add(jnp.where(sup >= 0, -1e30, 0.0))
            if grammar_words:
                # grammar-constrained decoding: unpack the per-row packed
                # allowed-token bitmask and mask disallowed logits
                # (reference gpu_ar_model_runner.py:268-330 xgrammar path)
                V = logits.shape[-1]
                ids = jnp.arange(V, dtype=jnp.int32)
                words = d["grammar_bits"][:, ids >> 5]  # [S, V] int32
                bit = (words >> (ids & 31)) & 1
                logits = jnp.where(bit == 1, logits, -1e30)
            with jax.named_scope("omni_sample"):
                if all_greedy:
                    sampled = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                else:
                    sampled = sample(
                        logits,
                        d["temperature"], d["top_p"], d["top_k"], d["min_p"],
                        d["seeds"], d["step_counters"] + k,
                    )
            sampled = jnp.where(d["do_sample"], sampled, 0)
            if need_penalties:
                state = state.observe_sampled(sampled, d["do_sample"])
            prev_sampled = jnp.where(d["do_sample"], sampled, prev_sampled)
            aux = {
                "last_hidden": rows_hidden,
                # embedding that ENTERED the step at each row's last token
                # (the thinker_reply_part "token embeds" component)
                "last_input_embed": embeds[d["logits_indices"]],
            }
            if has_spec:
                # per-position greedy predictions over the whole token
                # axis for host-side speculative verification
                full_logits = model.compute_logits(
                    params, hidden, tp_axis=tp_axis)
                aux["spec_tokens"] = jnp.argmax(
                    full_logits, axis=-1).astype(jnp.int32)
            if num_logprobs > 0:
                logz = jax.nn.logsumexp(logits, axis=-1)  # [S]
                top_vals, top_ids = jax.lax.top_k(logits, num_logprobs)
                aux["logprob_ids"] = top_ids.astype(jnp.int32)
                aux["logprob_vals"] = top_vals - logz[:, None]
                aux["sampled_logprob"] = (
                    jnp.take_along_axis(
                        logits, sampled[:, None], axis=-1)[:, 0] - logz)
            if getattr(model, "emit_full_hidden", False):
                aux["hidden_tokens"] = hidden  # [T, H] all tokens
                aux["embed_tokens_full"] = embeds  # [T, H] input embeds
                if captured is not None:
                    # mid-layer tap (talker accept_hidden_layer)
                    aux["capture_tokens"] = captured  # [T, H]
            if hasattr(model, "aux_outputs"):
                aux.update(model.aux_outputs(params, rows_hidden, sampled))
            return sampled, kv_cache, state, prev_sampled, aux

        def step(params, kv_cache, state: SamplingState, prev_sampled, d: dict):
            d = unpack(d)
            if num_steps == 1:
                return substep(params, kv_cache, state, prev_sampled, d,
                               jnp.int32(0), d["slot_mapping"])
            # fused multi-step decode window: K sub-steps per dispatch,
            # UNROLLED — a lax.scan carry forces XLA to round-trip the
            # whole KV cache through the loop boundary every iteration
            # (measured ~30% decode loss at 2 GB cache on v5e); only the
            # final sub-step's aux survives (text-only engines)
            slots = jnp.concatenate(
                [d["slot_mapping"][None], d["extra_slots"]], axis=0)
            sampled_ks = []
            aux_ks = []
            for k in range(num_steps):
                sampled, kv_cache, state, prev_sampled, aux = substep(
                    params, kv_cache, state, prev_sampled, d,
                    jnp.int32(k), slots[k])
                sampled_ks.append(sampled)
                aux_ks.append(aux)
            sampled_k = jnp.stack(sampled_ks)
            # per-substep aux stacks to [K, ...]: latent stages (thinker/
            # talker) consume hidden states PER TOKEN, so a fused window
            # must surface every substep's aux, not just the last —
            # engine/core._drain_many slices the window back apart
            aux = {key: jnp.stack([a[key] for a in aux_ks])
                   for key in aux_ks[0]}
            return sampled_k, kv_cache, state, prev_sampled, aux

        donate_argnums = (1, 2, 3) if donate else ()
        if self.mesh is None:
            return jax.jit(step, donate_argnums=donate_argnums)

        # SPMD over the stage mesh: params column/row-sharded, KV heads
        # sharded; everything else replicated. Explicit psums live inside
        # the model forward (Megatron TP).
        from vllm_omni_tpu.parallel.sharding import REPLICATED

        rep = REPLICATED
        d_spec = {"ints": rep, "floats": rep}
        if has_embeds:
            d_spec["prompt_embeds"] = rep
            d_spec["use_embeds"] = rep
        if has_mrope:
            d_spec["mrope_positions"] = rep
        if has_add:
            d_spec["add_embeds"] = rep
            d_spec["use_add_embeds"] = rep
        if has_deepstack:
            d_spec["deepstack_embeds"] = rep
        aux_spec = {"last_hidden": rep, "last_input_embed": rep}
        if has_spec:
            aux_spec["spec_tokens"] = rep
        if getattr(self.model, "emit_full_hidden", False):
            aux_spec["hidden_tokens"] = rep
            aux_spec["embed_tokens_full"] = rep
            if getattr(self.model, "capture_layer", None) is not None:
                aux_spec["capture_tokens"] = rep
        aux_spec.update(getattr(self.model, "aux_out_specs", {}))
        sharded = jax.shard_map(
            step,
            mesh=self.mesh,
            in_specs=(
                self.param_specs,
                self.kv_specs,
                SamplingState(rep, rep),
                rep,
                d_spec,
            ),
            out_specs=(
                rep, self.kv_specs, SamplingState(rep, rep), rep, aux_spec),
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=donate_argnums)

    # ------------------------------------------------- CP (long prefill)
    @property
    def supports_cp_prefill(self) -> bool:
        pc = self.config.parallel_config
        return (
            self.mesh is not None
            and pc.sequence_parallel_size > 1
            and hasattr(self.model, "forward_cp_prefill")
            and not getattr(self.model, "sliding_window", 0)
        )

    def cp_prefill(self, token_ids: np.ndarray, slot_mapping: np.ndarray,
                   ) -> None:
        """Prefill `token_ids` (global positions 0..n-1) context-parallel
        over the mesh "seq" axis and commit their K/V into the paged
        cache. n must be a multiple of the seq-axis size."""
        n = int(token_ids.shape[0])
        fn = self._cp_fns.get(n) if hasattr(self, "_cp_fns") else None
        if not hasattr(self, "_cp_fns"):
            self._cp_fns = {}
        if fn is None:
            fn = self._cp_fns[n] = self._build_cp_fn()
        self.kv_cache = fn(
            self.params, self.kv_cache,
            jnp.asarray(token_ids, jnp.int32),
            jnp.asarray(slot_mapping, jnp.int32),
            jnp.arange(n, dtype=jnp.int32),
        )

    def _build_cp_fn(self) -> Callable:
        from vllm_omni_tpu.ops.attention.ragged_paged import (
            commit_kv_all_layers,
        )
        from vllm_omni_tpu.parallel.sharding import REPLICATED

        model = self.model
        tp_axis = "model" if self.tp > 1 else None
        seq_spec = jax.sharding.PartitionSpec("seq")

        def body(params, kv_cache, tokens, slots, positions):
            embeds = model.embed_tokens(params, tokens)
            k_all, v_all = model.forward_cp_prefill(
                params, embeds, positions, seq_axis="seq", tp_axis=tp_axis)
            # gather the token shards -> full-prompt K/V on every device
            # (one-shot prefill cost; the paged cache stays head-sharded
            # over the model axis exactly as in the standard path)
            k_full = jax.lax.all_gather(k_all, "seq", axis=1, tiled=True)
            v_full = jax.lax.all_gather(v_all, "seq", axis=1, tiled=True)
            out = dict(kv_cache)
            if "k_scale" in kv_cache:
                from vllm_omni_tpu.ops.quant import quantize_kv

                k_full, k_s = quantize_kv(k_full)
                v_full, v_s = quantize_kv(v_full)
                bsz = kv_cache["k"].shape[3]
                blk, off = slots // bsz, slots % bsz
                out["k_scale"] = kv_cache["k_scale"].at[
                    :, blk, off].set(k_s)
                out["v_scale"] = kv_cache["v_scale"].at[
                    :, blk, off].set(v_s)
            k_c, v_c = commit_kv_all_layers(
                kv_cache["k"], kv_cache["v"], k_full, v_full, slots)
            out["k"], out["v"] = k_c, v_c
            return out

        sharded = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(self.param_specs, self.kv_specs, seq_spec,
                      REPLICATED, seq_spec),
            out_specs=self.kv_specs,
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(1,))

    def desc_to_device_dict(self, desc: BatchDescriptor) -> dict[str, Any]:
        ints = np.concatenate([
            desc.token_ids, desc.positions, desc.token_rows,
            desc.slot_mapping, desc.is_prompt_token.astype(np.int32),
            desc.use_prev_sampled.astype(np.int32),
        ] + ([desc.is_output_replay.astype(np.int32)]
             if getattr(desc, "is_output_replay", None) is not None else []
        ) + [
            desc.q_lens, desc.cu_q_lens, desc.seq_lens,
            desc.logits_indices, desc.do_sample.astype(np.int32),
            desc.reset_rows.astype(np.int32), desc.top_k,
            desc.seeds.view(np.int32), desc.step_counters,
            (desc.suppress_ids if desc.suppress_ids is not None
             else np.full((desc.q_lens.shape[0], 8), -1, np.int32)
             ).reshape(-1),
            desc.block_tables.reshape(-1),
        ] + ([desc.grammar_bits.view(np.int32).reshape(-1)]
             if getattr(desc, "grammar_bits", None) is not None else []
        ) + ([desc.extra_slots.reshape(-1)]
             if desc.extra_slots is not None else [])
        ).astype(np.int32, copy=False)
        floats = np.concatenate([
            desc.temperature, desc.top_p, desc.min_p,
            desc.repetition_penalty, desc.presence_penalty,
            desc.frequency_penalty,
        ]).astype(np.float32, copy=False)
        d = {"ints": ints, "floats": floats}
        if desc.prompt_embeds is not None:
            d["prompt_embeds"] = desc.prompt_embeds
            d["use_embeds"] = desc.use_embeds
        if desc.mrope_positions is not None:
            d["mrope_positions"] = desc.mrope_positions
        if desc.add_embeds is not None:
            d["add_embeds"] = desc.add_embeds
            d["use_add_embeds"] = desc.use_add_embeds
        if desc.deepstack_embeds is not None:
            d["deepstack_embeds"] = desc.deepstack_embeds
        return d

    def execute(self, desc: BatchDescriptor) -> tuple[Any, dict[str, Any]]:
        """Launch one step asynchronously; returns (sampled [S] DEVICE
        array, aux device arrays). The caller decides when to sync —
        fetching every step costs a full device round-trip."""
        d = self.desc_to_device_dict(desc)
        has_embeds = "prompt_embeds" in d
        has_mrope = "mrope_positions" in d
        has_add = "add_embeds" in d
        has_deepstack = "deepstack_embeds" in d
        maxb = int(desc.block_tables.shape[1])
        num_steps = int(getattr(desc, "num_steps", 1))
        has_spec = bool(getattr(desc, "has_spec", False))
        num_logprobs = int(getattr(desc, "num_logprobs", 0))
        has_suppress = bool(getattr(desc, "has_suppress", True))
        gb = getattr(desc, "grammar_bits", None)
        grammar_words = int(gb.shape[1]) if gb is not None else 0
        has_replay = getattr(desc, "is_output_replay", None) is not None
        key = (has_embeds, has_mrope, has_add, has_deepstack,
               desc.need_penalties, desc.all_greedy, maxb, num_steps,
               has_spec, num_logprobs, has_suppress, grammar_words,
               has_replay)
        step_fn = self._step_fns.get(key)
        if step_fn is None:
            step_fn = self._step_fns[key] = self._build_step_fn(
                has_embeds, has_mrope, has_add,
                has_deepstack=has_deepstack,
                need_penalties=desc.need_penalties,
                all_greedy=desc.all_greedy, maxb=maxb,
                num_steps=num_steps, has_spec=has_spec,
                num_logprobs=num_logprobs, has_suppress=has_suppress,
                grammar_words=grammar_words, has_replay=has_replay)
        (sampled, self.kv_cache, self.sampling_state,
         self.prev_sampled, aux) = step_fn(
            self.params, self.kv_cache, self.sampling_state,
            self.prev_sampled, d,
        )
        return sampled, aux
