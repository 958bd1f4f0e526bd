"""On-chip microbench: chunked decode attention kernel vs gather path.

Exact-match check + timing at several context lengths (the round-3
kernel has no context cap; VERDICT.md asked for 4k/8k datapoints).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_tpu.ops.attention.pallas_decode import decode_paged_attention
from vllm_omni_tpu.ops.attention.ragged_paged import (
    ragged_paged_attention_gather,
)

Hq, Hkv, D, B = 16, 8, 128, 16
S = int(__import__("os").environ.get("BENCH_BATCH", "16"))


def build(ctx, seed=0):
    rng = np.random.default_rng(seed)
    MAXB = ctx // B
    N = S * MAXB + 1
    k = jnp.asarray(rng.normal(size=(N, Hkv, B, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(N, Hkv, B, D)), jnp.bfloat16)
    tables = rng.permutation(np.arange(1, N))[: S * MAXB].reshape(S, MAXB)
    q = jnp.asarray(rng.normal(size=(S, Hq, D)), jnp.bfloat16)
    ks = jnp.asarray(rng.normal(size=(S, Hkv, D)), jnp.bfloat16)
    vs = jnp.asarray(rng.normal(size=(S, Hkv, D)), jnp.bfloat16)
    seq_lens = jnp.full((S,), ctx - 3, jnp.int32)
    positions = seq_lens - 1
    token_rows = jnp.arange(S, dtype=jnp.int32)
    return (q, k, v, seq_lens, jnp.asarray(tables, jnp.int32),
            positions, token_rows, ks, vs)


def main():
    print(f"device: {jax.devices()[0]}, batch {S}")
    for ctx in (512, 2048, 8192):
        q, k, v, sl, bt, pos, rows, ks, vs = build(ctx)

        @jax.jit
        def kern(q, k, v, sl, bt, pos, rows, ks, vs, n):
            def body(i, acc):
                # acc feeds q: forces one evaluation per iteration
                qq = (q.astype(jnp.float32) + acc * 1e-30).astype(q.dtype)
                o = decode_paged_attention(
                    qq, k, v, sl, bt, pos, rows, scale=D**-0.5,
                    k_self=ks, v_self=vs, has_self=True)
                return acc + o.astype(jnp.float32)
            return jax.lax.fori_loop(
                0, n, body, jnp.zeros((S, Hq, D), jnp.float32))

        @jax.jit
        def gath(q, k, v, sl, bt, pos, rows, ks, vs, n):
            def body(i, acc):
                qq = (q.astype(jnp.float32) + acc * 1e-30).astype(q.dtype)
                o = ragged_paged_attention_gather(
                    qq, k, v, None, None, sl, bt, pos, rows,
                    scale=D**-0.5, k_self=ks, v_self=vs)
                return acc + o.astype(jnp.float32)
            return jax.lax.fori_loop(
                0, n, body, jnp.zeros((S, Hq, D), jnp.float32))

        # correctness (single eval)

        a = np.asarray(kern(q, k, v, sl, bt, pos, rows, ks, vs, 1))
        b = np.asarray(gath(q, k, v, sl, bt, pos, rows, ks, vs, 1))
        err = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9)
        # timing: difference two iteration counts to cancel dispatch
        n1, n2 = 4, 36
        live_kv = 2 * S * (ctx - 3) * Hkv * D * 2  # bytes

        def timed(fn, n):
            np.asarray(fn(q, k, v, sl, bt, pos, rows, ks, vs, n))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fn(q, k, v, sl, bt, pos, rows, ks, vs, n))
                best = min(best, time.perf_counter() - t0)
            return best

        dt_k = (timed(kern, n2) - timed(kern, n1)) / (n2 - n1)
        dt_g = (timed(gath, n2) - timed(gath, n1)) / (n2 - n1)
        print(f"ctx {ctx:6d}: kernel {dt_k*1e6:8.1f} us "
              f"({live_kv/dt_k/1e9:6.1f} GB/s) | gather {dt_g*1e6:8.1f} us "
              f"({live_kv/dt_g/1e9:6.1f} GB/s) | rel-err {err:.2e}")


if __name__ == "__main__":
    main()
