"""JAX sampler: penalties → temperature → top-k/top-p/min-p → gumbel sample.

TPU-native replacement for the vLLM sampler CUDA ops the reference's
runners call (SURVEY.md §2.10 row 3; reference gpu_ar_model_runner.py:268
`sample_tokens`). Fully batched over the persistent-row axis; per-row
deterministic RNG derived from (seed, num_generated) so a request's stream
is independent of batch composition.

Penalty semantics match HF/vLLM:
- repetition_penalty over all seen tokens (prompt + output),
- presence/frequency penalties over output tokens only.
Token presence/counts are maintained on-device as [S, V] count matrices
updated by scatter-add each step (see SamplingState).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SamplingState(NamedTuple):
    """Per-row on-device token statistics (persistent across steps)."""

    all_counts: jax.Array  # [S, V] int32 — prompt + output occurrences
    out_counts: jax.Array  # [S, V] int32 — output occurrences

    @classmethod
    def init(cls, num_rows: int, vocab_size: int) -> "SamplingState":
        # two distinct buffers — they are donated separately in the step fn
        return cls(
            all_counts=jnp.zeros((num_rows, vocab_size), jnp.int32),
            out_counts=jnp.zeros((num_rows, vocab_size), jnp.int32),
        )

    def reset_rows(self, reset_mask: jax.Array) -> "SamplingState":
        keep = (~reset_mask)[:, None].astype(jnp.int32)
        return SamplingState(self.all_counts * keep, self.out_counts * keep)

    def observe_input_tokens(
        self,
        token_ids: jax.Array,
        token_rows: jax.Array,
        is_prompt: jax.Array,
        is_replay: jax.Array | None = None,
    ) -> "SamplingState":
        """Scatter this step's prompt tokens into all_counts; replayed
        output tokens (recompute after preemption, row state was reset)
        re-count into BOTH all_counts and out_counts."""
        S, V = self.all_counts.shape
        obs = is_prompt if is_replay is None else (is_prompt | is_replay)
        rows = jnp.where(obs, token_rows, S)  # out-of-range rows drop
        all_counts = self.all_counts.at[rows, token_ids].add(
            1, mode="drop", unique_indices=False
        )
        out_counts = self.out_counts
        if is_replay is not None:
            orows = jnp.where(is_replay, token_rows, S)
            out_counts = out_counts.at[orows, token_ids].add(
                1, mode="drop", unique_indices=False
            )
        return SamplingState(all_counts, out_counts)

    def observe_sampled(
        self, sampled: jax.Array, do_sample: jax.Array
    ) -> "SamplingState":
        S, V = self.all_counts.shape
        rows = jnp.where(do_sample, jnp.arange(S), S)
        all_counts = self.all_counts.at[rows, sampled].add(1, mode="drop")
        out_counts = self.out_counts.at[rows, sampled].add(1, mode="drop")
        return SamplingState(all_counts, out_counts)


def apply_penalties(
    logits: jax.Array,  # [S, V] f32
    state: SamplingState,
    repetition_penalty: jax.Array,  # [S]
    presence_penalty: jax.Array,  # [S]
    frequency_penalty: jax.Array,  # [S]
) -> jax.Array:
    seen = state.all_counts > 0
    rp = repetition_penalty[:, None]
    penalized = jnp.where(logits > 0, logits / rp, logits * rp)
    logits = jnp.where(seen, penalized, logits)
    logits = logits - presence_penalty[:, None] * (state.out_counts > 0)
    logits = logits - frequency_penalty[:, None] * state.out_counts
    return logits


def _mask_top_k(sorted_logits: jax.Array, top_k: jax.Array) -> jax.Array:
    """Mask (on the sorted-desc axis) entries past top_k. top_k==0 → off."""
    S, V = sorted_logits.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (S, V), 1)
    k = jnp.where(top_k <= 0, V, top_k)[:, None]
    return idx < k


def _mask_top_p(sorted_probs: jax.Array, top_p: jax.Array) -> jax.Array:
    """Keep smallest prefix of sorted-desc probs with cumsum >= top_p
    (inclusive of the crossing token)."""
    cum = jnp.cumsum(sorted_probs, axis=-1)
    keep = (cum - sorted_probs) < top_p[:, None]
    return keep


def _mask_min_p(sorted_probs: jax.Array, min_p: jax.Array) -> jax.Array:
    max_p = sorted_probs[:, :1]
    return sorted_probs >= (min_p[:, None] * max_p)


def sample(
    logits: jax.Array,  # [S, V] f32 (already penalized)
    temperature: jax.Array,  # [S]
    top_p: jax.Array,
    top_k: jax.Array,
    min_p: jax.Array,
    seeds: jax.Array,  # [S] uint32
    step_counters: jax.Array,  # [S] int32
) -> jax.Array:
    """Returns sampled token ids [S] int32. temperature==0 → greedy."""
    S, V = logits.shape
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    temp = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = logits / temp
    sorted_logits, sort_idx = jax.lax.sort_key_val(
        -scaled, jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32), (S, V)), dimension=-1
    )
    sorted_logits = -sorted_logits
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    keep = (
        _mask_top_k(sorted_logits, top_k)
        & _mask_top_p(sorted_probs, top_p)
        & _mask_min_p(sorted_probs, min_p)
    )
    # always keep the argmax
    keep = keep.at[:, 0].set(True)
    masked_sorted = jnp.where(keep, sorted_logits, -1e30)

    # Per-row gumbel noise from (seed, step) — batch-composition independent.
    def row_bits(seed, ctr):
        key = jax.random.fold_in(jax.random.key(seed), ctr)
        return jax.random.uniform(key, (V,), jnp.float32, minval=1e-20, maxval=1.0)

    u = jax.vmap(row_bits)(seeds, step_counters)
    gumbel = -jnp.log(-jnp.log(u))
    # sorted_logits are already temperature-scaled
    choice_sorted = jnp.argmax(masked_sorted + gumbel, axis=-1)
    sampled = jnp.take_along_axis(
        sort_idx, choice_sorted[:, None], axis=-1
    )[:, 0].astype(jnp.int32)

    return jnp.where(temperature == 0.0, greedy, sampled)


def compute_logprobs(logits: jax.Array, sampled: jax.Array) -> jax.Array:
    """Log-prob of the sampled token per row, [S] f32."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, sampled[:, None].astype(jnp.int32), axis=-1)[:, 0]
