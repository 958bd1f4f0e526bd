"""One-shot stage engine for the Qwen3-Omni talker.

Parity role: the reference serves the talker as an AR stage
(stage_configs/qwen3_omni_moe.yaml stage 1) whose HF semantics are
`Qwen3OmniMoeTalkerForConditionalGeneration.generate`: sample a
codebook-0 token per frame, expand it to a full RVQ frame with the MTP
code predictor, and feed the summed codec/trailing-text embedding back
as the next step's input (transformers modeling_qwen3_omni_moe.py,
`prepare_inputs_for_generation`).

TPU design: one jitted bucketed prefill + ONE jitted decode step that
fuses the predictor rollout, frame-embedding composition, suppression,
repetition penalty and sampling; the only per-frame host sync is the
EOS check (frame codes + next token fetched together).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from vllm_omni_tpu.models.qwen3_omni.talker import Qwen3OmniTalker
from vllm_omni_tpu.ops.sampling import sample
from vllm_omni_tpu.outputs import CompletionOutput, RequestOutput

_PREFILL_BUCKETS = (128, 256, 512, 1024, 2048, 4096, 8192)


def _bucket(n: int) -> int:
    for b in _PREFILL_BUCKETS:
        if n <= b:
            return b
    return ((n + 1023) // 1024) * 1024


class TalkerEngine:
    def __init__(
        self,
        hf_config: dict[str, Any],
        load_weights: bool = True,
        model_path: str = "",
        params: Optional[dict] = None,
        dtype=jnp.float32,
        max_len: int = 8192,
        predictor_greedy: bool = False,
        suppress_special: bool = True,
        seed: int = 0,
    ):
        talker_cfg = hf_config.get("talker_config", hf_config)
        self.cfg = talker_cfg
        self.model = Qwen3OmniTalker(talker_cfg, dtype=dtype)
        self.eos_id = int(talker_cfg.get("codec_eos_token_id", 4198))
        self.max_len = max_len
        self.predictor_greedy = predictor_greedy
        self.seed = seed
        if params is not None:
            self.params = params
        elif load_weights and model_path:
            from vllm_omni_tpu.models.weight_loader import iter_safetensors

            sd = {k[len("talker."):]: v for k, v in
                  iter_safetensors(model_path) if k.startswith("talker.")}
            self.params = self.model.load_from_state_dict(sd)
        else:
            self.params = self.model.init_params(jax.random.key(seed))
        # suppress the special-token tail of the codec vocab except EOS
        # (HF generate: talker_supppressed_tokens)
        V = self.model.V
        mask = np.zeros((V,), bool)
        if suppress_special:
            mask[max(0, V - 1024):] = True
            if 0 <= self.eos_id < V:
                mask[self.eos_id] = False
        self.suppress_mask = jnp.asarray(mask)
        self._prefill_fns: dict[int, Any] = {}
        self._decode_fns: dict[bool, Any] = {}

    # ---------------------------------------------------- processor helpers
    def project_text(self, x) -> jax.Array:
        return self.model.project(self.params, "text_projection",
                                  jnp.asarray(x))

    def project_hidden(self, x) -> jax.Array:
        return self.model.project(self.params, "hidden_projection",
                                  jnp.asarray(x))

    def embed_codec(self, ids) -> jax.Array:
        return self.model.embed_codec(
            self.params, jnp.asarray(np.asarray(ids, np.int32)))

    # ------------------------------------------------------------ programs
    def _prefill(self, P: int):
        if P not in self._prefill_fns:
            model = self.model

            def fn(params, embeds, positions, kv, valid_len, counts,
                   temp, top_p, top_k, rp, sseed, suppress):
                hidden, kv = model.forward(
                    params, embeds, positions, kv, jnp.int32(0))
                last = hidden[valid_len - 1]
                logits = model.logits(params, last)
                code, counts = self._sample(
                    params, logits, counts, temp, top_p, top_k, rp,
                    sseed, jnp.int32(0), suppress)
                return code, last, kv, counts

            self._prefill_fns[P] = jax.jit(fn, donate_argnums=(3,))
        return self._prefill_fns[P]

    def _sample(self, params, logits, counts, temp, top_p, top_k, rp,
                sseed, step, suppress):
        # HF RepetitionPenaltyLogitsProcessor over previously sampled codes
        pen = jnp.where(logits > 0, logits / rp, logits * rp)
        logits = jnp.where(counts > 0, pen, logits)
        logits = jnp.where(suppress, -jnp.inf, logits)
        code = sample(
            logits[None], temp[None], top_p[None],
            top_k[None].astype(jnp.int32), jnp.zeros((1,), jnp.float32),
            sseed[None].astype(jnp.uint32), step[None],
        )[0]
        counts = counts.at[code].add(1)
        return code, counts

    def _decode(self, raw_trail: bool = False):
        """raw_trail=True: `trail_embed` is a RAW thinker hidden row and
        the text projection runs INSIDE the jitted step (same
        `model.project` call as project_text, so values are bit-identical
        to projecting on the host first). Incremental streaming feeds
        raw rows so the orchestrator's output-handler thread never
        touches the device — a per-token host-side project_text was a
        device roundtrip (~20-30 ms over the remote tunnel) that
        serialized the whole DAG behind one thread."""
        if raw_trail not in self._decode_fns:
            model = self.model

            def fn(params, kv, cache_len, prev_code, past_hidden,
                   trail_embed, position, counts, temp, top_p, top_k, rp,
                   sseed, step, suppress):
                last_id_hidden = model.embed_codec(params, prev_code)
                codes, extra = model.predictor.rollout(
                    params["code_predictor"], past_hidden, last_id_hidden,
                    greedy=self.predictor_greedy,
                    seed=(sseed.astype(jnp.uint32)
                          + step.astype(jnp.uint32) * jnp.uint32(7919)))
                # f32 upcast first: bit-identical to the batch path,
                # which projects host-side f32 rows (bf16->f32 is exact)
                trail = (model.project(params, "text_projection",
                                       trail_embed.astype(jnp.float32))
                         if raw_trail else trail_embed)
                inputs = (last_id_hidden + extra
                          + trail.astype(last_id_hidden.dtype))[None]
                pos3 = jnp.broadcast_to(
                    position.astype(jnp.float32), (3, 1))
                hidden, kv = model.forward(
                    params, inputs, pos3, kv, cache_len)
                logits = model.logits(params, hidden[-1])
                next_code, counts = self._sample(
                    params, logits, counts, temp, top_p, top_k, rp,
                    sseed, step, suppress)
                frame = jnp.concatenate([prev_code[None], codes])
                return frame, next_code, hidden[-1], kv, counts

            self._decode_fns[raw_trail] = jax.jit(fn, donate_argnums=(1,))
        return self._decode_fns[raw_trail]

    # ------------------------------------------------------------ generate
    def generate(self, prompts, sampling_params) -> list[RequestOutput]:
        if not isinstance(sampling_params, (list, tuple)):
            sampling_params = [sampling_params] * len(prompts)
        if len(prompts) == 1:
            return [self._generate_one(prompts[0], sampling_params[0])]
        # concurrent serving: LOCKSTEP-BATCHED decode — the jitted
        # prefill/decode step vmaps over requests, so a whole batch
        # advances one frame per dispatch with ONE host sync (the
        # sequential path cost a dispatch + tunnel round-trip per frame
        # PER REQUEST, which serialized the talker stage at ~batch-1
        # rate under the concurrency benchmark)
        return self._generate_batched(list(prompts),
                                      list(sampling_params))

    def generate_stream(self, prompt: dict[str, Any], sp=None):
        """Yield a partial RequestOutput per codec frame (mm "frame"),
        then the final one with the full [NQ, T] "codes". The prompt may
        carry a live `trailing_feed` (stages/streaming.StreamFeed of
        projected text embeddings) instead of `trailing_text_hidden`:
        decode step k blocks until trailing[k] exists, so frames are
        bit-identical to the completion-handoff path while the upstream
        thinker is still generating."""
        yield from self._run(prompt, sp, stream=True)

    # --------------------------------------------------- batched programs
    def _batched_prefill(self, P: int, Sb: int):
        key = ("bp", P, Sb)
        if key not in self._prefill_fns:
            model = self.model

            def one(params, embeds, positions, kv, valid_len, counts,
                    temp, top_p, top_k, rp, sseed, suppress):
                hidden, kv = model.forward(
                    params, embeds, positions, kv, jnp.int32(0))
                last = hidden[valid_len - 1]
                logits = model.logits(params, last)
                code, counts = self._sample(
                    params, logits, counts, temp, top_p, top_k, rp,
                    sseed, jnp.int32(0), suppress)
                return code, last, kv, counts

            self._prefill_fns[key] = jax.jit(
                jax.vmap(one, in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0, 0,
                                       0, None)),
                donate_argnums=(3,))
        return self._prefill_fns[key]

    def _batched_decode(self, Sb: int):
        key = ("bd", Sb)
        if key not in self._decode_fns:
            model = self.model

            def one(params, kv, cache_len, prev_code, past_hidden,
                    trail_embed, position, counts, temp, top_p, top_k,
                    rp, sseed, step, suppress):
                last_id_hidden = model.embed_codec(params, prev_code)
                codes, extra = model.predictor.rollout(
                    params["code_predictor"], past_hidden, last_id_hidden,
                    greedy=self.predictor_greedy,
                    seed=(sseed.astype(jnp.uint32)
                          + step.astype(jnp.uint32) * jnp.uint32(7919)))
                inputs = (last_id_hidden + extra
                          + trail_embed.astype(last_id_hidden.dtype))[None]
                pos3 = jnp.broadcast_to(
                    position.astype(jnp.float32), (3, 1))
                hidden, kv = model.forward(
                    params, inputs, pos3, kv, cache_len)
                logits = model.logits(params, hidden[-1])
                next_code, counts = self._sample(
                    params, logits, counts, temp, top_p, top_k, rp,
                    sseed, step, suppress)
                frame = jnp.concatenate([prev_code[None], codes])
                return frame, next_code, hidden[-1], kv, counts

            self._decode_fns[key] = jax.jit(
                jax.vmap(one, in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0, 0,
                                       0, 0, 0, None, None)),
                donate_argnums=(1,))
        return self._decode_fns[key]

    def _batched_decode_window(self, Sb: int, K: int, Tt: int):
        """K lockstep frames per dispatch (Python-unrolled — a scan
        carry would round-trip the KV cache per iteration). Trails ride
        a single pre-uploaded [Sb, Tt, H] buffer indexed on device; the
        host drains codes/frames once per window and replays the
        per-frame EOS/collection bookkeeping exactly (RNG counters,
        positions, and repetition counts advance identically to the
        1-frame path)."""
        key = ("bdw", Sb, K, Tt)
        if key not in self._decode_fns:
            model = self.model

            def one(params, kv, cache_len, prev_code, past_hidden,
                    trail_embed, position, counts, temp, top_p, top_k,
                    rp, sseed, step, suppress):
                last_id_hidden = model.embed_codec(params, prev_code)
                codes, extra = model.predictor.rollout(
                    params["code_predictor"], past_hidden, last_id_hidden,
                    greedy=self.predictor_greedy,
                    seed=(sseed.astype(jnp.uint32)
                          + step.astype(jnp.uint32) * jnp.uint32(7919)))
                inputs = (last_id_hidden + extra
                          + trail_embed.astype(last_id_hidden.dtype))[None]
                pos3 = jnp.broadcast_to(
                    position.astype(jnp.float32), (3, 1))
                hidden, kv = model.forward(
                    params, inputs, pos3, kv, cache_len)
                logits = model.logits(params, hidden[-1])
                next_code, counts = self._sample(
                    params, logits, counts, temp, top_p, top_k, rp,
                    sseed, step, suppress)
                frame = jnp.concatenate([prev_code[None], codes])
                return frame, next_code, hidden[-1], kv, counts

            vone = jax.vmap(one, in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0,
                                          0, 0, 0, 0, None, None))

            def window(params, kv, cache_len, code, hidden, trails,
                       trail_lens, pads, deltas, counts, temp, top_p,
                       top_k, rp, sseed, step0, suppress):
                frames_k = []
                codes_k = []
                for k in range(K):
                    step = step0 + k
                    t = jax.lax.dynamic_index_in_dim(
                        trails, jnp.clip(step, 0, Tt - 1), axis=1,
                        keepdims=False)
                    trail = jnp.where(
                        (step < trail_lens)[:, None], t, pads)
                    pos = (cache_len.astype(jnp.float32) + deltas)
                    frame, code, hidden, kv, counts = vone(
                        params, kv, cache_len, code, hidden, trail, pos,
                        counts, temp, top_p, top_k, rp, sseed,
                        step + 1, suppress)
                    cache_len = cache_len + 1
                    frames_k.append(frame)
                    codes_k.append(code)
                return (jnp.stack(frames_k), jnp.stack(codes_k), code,
                        hidden, kv, counts, cache_len)

            self._decode_fns[key] = jax.jit(window, donate_argnums=(1,))
        return self._decode_fns[key]

    @staticmethod
    def _batch_bucket(n: int) -> int:
        for b in (2, 4, 8, 16, 32):
            if n <= b:
                return b
        return ((n + 31) // 32) * 32

    def _generate_batched(self, prompts, sps) -> list[RequestOutput]:
        # batched programs use the ragged MoE path too: _experts_ragged
        # carries a custom_vmap rule that flattens the request axis into
        # the token axis (one grouped dispatch over B*T tokens), so the
        # old dense one-hot fallback (O(T*E) expert FLOPs) is gone
        return self._generate_batched_inner(prompts, sps)

    def _generate_batched_inner(self, prompts, sps) -> list[RequestOutput]:
        model = self.model
        n = len(prompts)
        Sb = self._batch_bucket(n)
        H = np.asarray(prompts[0]["inputs_embeds"]).shape[1]
        Ts = [np.asarray(p["inputs_embeds"]).shape[0] for p in prompts]
        P = _bucket(max(Ts))
        embeds = np.zeros((Sb, P, H), np.float32)
        positions = np.zeros((Sb, 3, P), np.float32)
        valid = np.ones((Sb,), np.int32)
        deltas = np.zeros((Sb,), np.float32)
        trails = []  # per row: [n_trail, H] projected text rows
        pads = np.zeros((Sb, H), np.float32)
        max_frames = np.full((Sb,), 1, np.int32)
        temp = np.full((Sb,), 0.9, np.float32)
        top_p = np.ones((Sb,), np.float32)
        top_k = np.full((Sb,), 50, np.int32)
        rp = np.full((Sb,), 1.05, np.float32)
        sseed = np.full((Sb,), self.seed, np.uint32)
        for i, (p, sp) in enumerate(zip(prompts, sps)):
            e = np.asarray(p["inputs_embeds"], np.float32)
            T = e.shape[0]
            embeds[i, :T] = e
            pos = np.asarray(p["mrope_positions"], np.float32)
            positions[i, :, :T] = pos
            positions[i, :, T:] = pos[:, -1:] + np.arange(1, P - T + 1)[None]
            valid[i] = T
            deltas[i] = float(p.get("mrope_delta", 0))
            trails.append(np.asarray(p["trailing_text_hidden"], np.float32))
            tp = np.asarray(p["tts_pad_embed"], np.float32)
            pads[i] = tp[0] if tp.ndim > 1 else tp
            max_frames[i] = int(getattr(sp, "max_tokens", None) or 2048)
            temp[i] = getattr(sp, "temperature", 0.9)
            top_p[i] = getattr(sp, "top_p", 1.0) or 1.0
            top_k[i] = getattr(sp, "top_k", 50) or 50
            rp[i] = getattr(sp, "repetition_penalty", 1.05) or 1.0
            sseed[i] = getattr(sp, "seed", None) or self.seed
        for i in range(n, Sb):  # pad rows: 1-token prompt, 1 frame
            embeds[i, 0] = pads[0]
            valid[i] = 1

        # K-1 frames of KV headroom: a decode window always runs K
        # frames even when the budget ends mid-window (collection stops
        # at `limit`; the extra writes must still land inside the cache)
        _K = max(1, int(os.environ.get("OMNI_TPU_TALKER_WINDOW", "8")))
        kv0 = model.init_cache(self.max_len + _K)
        kvb = jax.tree.map(
            lambda x: jnp.zeros((Sb,) + x.shape, x.dtype), kv0)
        counts = jnp.zeros((Sb, model.V), jnp.int32)
        code, hidden, kvb, counts = self._batched_prefill(P, Sb)(
            self.params, jnp.asarray(embeds, model.dtype),
            jnp.asarray(positions), kvb, jnp.asarray(valid), counts,
            jnp.asarray(temp), jnp.asarray(top_p), jnp.asarray(top_k),
            jnp.asarray(rp), jnp.asarray(sseed), self.suppress_mask)

        code_host = np.asarray(jax.device_get(code))
        cache_len = valid.copy()
        done = np.zeros((Sb,), bool)
        done[n:] = True
        end_reason = np.array(["length"] * Sb, object)
        frames_per_row: list[list[np.ndarray]] = [[] for _ in range(Sb)]
        # frame budget: per-request max_frames, capped so KV writes stay
        # inside the cache (same bound as the 1-frame loop's
        # cache_len.max()+1 >= max_len break)
        limit = min(int(max_frames[:n].max()),
                    self.max_len - int(valid.max()) - 1)
        K = max(1, min(
            int(os.environ.get("OMNI_TPU_TALKER_WINDOW", "8")), limit))
        # trails ride ONE device buffer (the 1-frame loop uploaded a
        # [Sb, H] trail per frame — ~33 MB of host->device per batch);
        # model-dtype cast here is the same cast the step applies
        Tt = _bucket(max([t.shape[0] for t in trails] + [1]))
        trails_arr = np.zeros((Sb, Tt, H), np.float32)
        trail_lens = np.ones((Sb,), np.int32)
        for i in range(n):
            trails_arr[i, : trails[i].shape[0]] = trails[i]
            trail_lens[i] = trails[i].shape[0]
        trails_dev = jnp.asarray(trails_arr, model.dtype)
        pads_dev = jnp.asarray(pads, model.dtype)
        window = self._batched_decode_window(Sb, K, Tt)
        step = 0
        while not done.all() and step < limit:
            done |= (code_host == self.eos_id)
            for i in range(n):
                if done[i] and end_reason[i] == "length" \
                        and code_host[i] == self.eos_id:
                    end_reason[i] = "stop"
            if done.all():
                break
            frames_w, codes_w, code, hidden, kvb, counts, _ = window(
                self.params, kvb, jnp.asarray(cache_len, jnp.int32),
                code, hidden, trails_dev, jnp.asarray(trail_lens),
                pads_dev, jnp.asarray(deltas, jnp.float32), counts,
                jnp.asarray(temp), jnp.asarray(top_p),
                jnp.asarray(top_k), jnp.asarray(rp), jnp.asarray(sseed),
                jnp.int32(step), self.suppress_mask)
            frames_host, codes_host = jax.device_get((frames_w, codes_w))
            frames_host = np.asarray(frames_host, np.int32)
            codes_host = np.asarray(codes_host)
            # replay the 1-frame bookkeeping over the window
            for k in range(K):
                if k > 0:
                    done |= (code_host == self.eos_id)
                    for i in range(n):
                        if done[i] and end_reason[i] == "length" \
                                and code_host[i] == self.eos_id:
                            end_reason[i] = "stop"
                if step + k < limit:
                    for i in range(n):
                        if not done[i] and step + k < max_frames[i]:
                            frames_per_row[i].append(frames_host[k, i])
                    done |= ((np.arange(Sb) < n)
                             & (step + k + 1 >= max_frames))
                code_host = codes_host[k]
            cache_len = cache_len + K
            step += K

        outs = []
        for i in range(n):
            fr = frames_per_row[i]
            codes = (np.stack(fr, axis=1) if fr
                     else np.zeros((model.NQ, 0), np.int32))
            outs.append(RequestOutput(
                request_id=str(prompts[i].get("request_id", f"talker-{i}")),
                prompt=None, prompt_token_ids=[],
                outputs=[CompletionOutput(
                    index=0, text="",
                    token_ids=[int(c) for c in codes[0]],
                    finish_reason=str(end_reason[i]),
                    multimodal_output={"codes": codes})],
                finished=True,
            ))
        return outs

    def _generate_one(self, prompt: dict[str, Any], sp) -> RequestOutput:
        out = None
        for out in self._run(prompt, sp, stream=False):
            pass
        return out

    def _run(self, prompt: dict[str, Any], sp, stream: bool):
        model = self.model
        embeds = np.asarray(prompt["inputs_embeds"], np.float32)
        T = embeds.shape[0]
        positions = np.asarray(prompt["mrope_positions"], np.float32)
        delta = float(prompt.get("mrope_delta", 0))
        feed = prompt.get("trailing_feed")
        trailing = (np.zeros((0, embeds.shape[1]), np.float32)
                    if feed is not None
                    else np.asarray(prompt["trailing_text_hidden"],
                                    np.float32))
        # feeds carry RAW thinker rows (projection folds into the
        # jitted decode step); the batch path passes projected rows
        raw_trail = feed is not None
        tts_pad = np.asarray(
            prompt["tts_pad_embed_raw" if raw_trail else "tts_pad_embed"],
            np.float32)
        if tts_pad.ndim > 1:
            tts_pad = tts_pad[0]
        max_frames = int(getattr(sp, "max_tokens", None) or 2048)

        temp = jnp.float32(getattr(sp, "temperature", 0.9))
        top_p = jnp.float32(getattr(sp, "top_p", 1.0) or 1.0)
        top_k = jnp.int32(getattr(sp, "top_k", 50) or 50)
        rp = jnp.float32(getattr(sp, "repetition_penalty", 1.05) or 1.0)
        sseed = jnp.uint32(getattr(sp, "seed", None) or self.seed)

        P = _bucket(T)
        pad_e = np.zeros((P, embeds.shape[1]), np.float32)
        pad_e[:T] = embeds
        pad_p = np.zeros((3, P), np.float32)
        pad_p[:, :T] = positions
        # pad positions monotonically so rope stays in-range
        pad_p[:, T:] = positions[:, -1:] + np.arange(1, P - T + 1)[None]

        kv = model.init_cache(self.max_len)
        counts = jnp.zeros((model.V,), jnp.int32)
        code, hidden, kv, counts = self._prefill(P)(
            self.params, jnp.asarray(pad_e, model.dtype), jnp.asarray(pad_p),
            kv, jnp.int32(T), counts, temp, top_p, top_k, rp, sseed,
            self.suppress_mask)

        from vllm_omni_tpu.stages.streaming import StreamCancelled

        rid = str(prompt.get("request_id", "talker"))
        frames: list[np.ndarray] = []
        decode = self._decode(raw_trail)
        code_host = int(jax.device_get(code))
        cache_len = T
        step = 0
        aborted = False
        while code_host != self.eos_id and step < max_frames:
            if feed is not None:
                try:
                    trail = feed.get(step)
                except StreamCancelled:
                    aborted = True
                    break
                if trail is None:  # past the feed's end: text exhausted
                    trail = tts_pad
                # feed rows may be DEVICE arrays (thinker emits them on
                # device; they never leave HBM) — do NOT np.asarray here
                if getattr(trail, "ndim", 1) > 1:
                    trail = trail[0]
            else:
                trail = trailing[step] if step < trailing.shape[0] else tts_pad
            frame, code, hidden, kv, counts = decode(
                self.params, kv, jnp.int32(cache_len), code, hidden,
                jnp.asarray(trail), jnp.float32(cache_len + delta), counts,
                temp, top_p, top_k, rp, sseed, jnp.int32(step + 1),
                self.suppress_mask)
            frame_host, code_host = jax.device_get((frame, code))
            frame_host = np.asarray(frame_host, np.int32)
            frames.append(frame_host)
            code_host = int(code_host)
            cache_len += 1
            step += 1
            if stream:
                yield RequestOutput(
                    request_id=rid, prompt=None, prompt_token_ids=[],
                    outputs=[CompletionOutput(
                        index=0, text="",
                        token_ids=[int(f[0]) for f in frames],
                        finish_reason=None,
                        multimodal_output={"frame": frame_host})],
                    finished=False,
                )
            if cache_len >= self.max_len:
                break

        codes = (np.stack(frames, axis=1) if frames
                 else np.zeros((model.NQ, 0), np.int32))  # [NQ, n_frames]
        yield RequestOutput(
            request_id=rid, prompt=None,
            prompt_token_ids=[],
            outputs=[CompletionOutput(
                index=0, text="", token_ids=[int(c) for c in codes[0]],
                finish_reason=(
                    "abort" if aborted
                    else "stop" if code_host == self.eos_id else "length"),
                multimodal_output={"codes": codes})],
            finished=True,
        )
