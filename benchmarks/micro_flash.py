"""Flash-attention block-size sweep at video-scale sequence lengths.

The Wan 720p denoise step measured ~13x off the MXU roofline; the
suspect is per-block overhead in the flash kernel at 21k tokens
(grid (B*H, Lq/BQ, Lk/BK) = ~170k steps with the default 256/512
blocks). This sweep measures wall time per attention call vs block
size to pick defaults for long sequences.

Usage: python benchmarks/micro_flash.py [seq] [heads] [batch]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, ".")
    from vllm_omni_tpu.ops.attention.pallas_flash import flash_attention

    L = int(sys.argv[1]) if len(sys.argv) > 1 else 21120
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    D = 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.bfloat16)

    flops = 4 * B * H * L * L * D  # QK^T + PV, 2 FLOP/MAC

    # tunnel RTT floor for the amortized timing below
    tiny = jax.jit(lambda x: x + 1)
    xs = jnp.ones((8,), jnp.float32)
    np.asarray(tiny(xs))
    rtts = []
    for _ in range(8):
        t0 = time.perf_counter()
        np.asarray(tiny(xs))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]
    print(f"tunnel rtt {rtt*1e3:.1f} ms", flush=True)

    ref = None
    for bq, bk, sd in [(256, 512, "f32"), (512, 1024, "f32"),
                       (512, 2048, "f32"), (1024, 2048, "f32"),
                       (512, 4096, "f32"),
                       (512, 2048, "bf16"), (1024, 2048, "bf16"),
                       (512, 4096, "bf16"), (1024, 4096, "bf16"),
                       (2048, 2048, "bf16"), (1024, 8192, "bf16")]:
        if bq > L or bk > L:
            continue
        f = lambda: flash_attention(q, k, v, block_q=bq, block_k=bk,
                                    softmax_dtype=sd)
        try:
            out = f()
            # sync via a 4-byte scalar fetch: block_until_ready alone has
            # proven unreliable over the dev tunnel, and np.asarray of the
            # full output would drag ~260 MB per rep
            float(jnp.sum(out.astype(jnp.float32)))
        except Exception as e:  # e.g. scoped-vmem OOM at huge tiles
            print(f"bq={bq:5d} bk={bk:5d} softmax={sd:4s}: FAILED "
                  f"{str(e).splitlines()[0][:90]}", flush=True)
            continue
        N = 5
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(N):
                o = f()
            float(jnp.sum(o.astype(jnp.float32)))
            ts.append((time.perf_counter() - t0 - rtt) / N)
        t = min(ts)
        if ref is None:
            ref = out.astype(jnp.float32)  # stays on device
            err = 0.0
        else:
            err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
            assert err < 0.1, (bq, bk, sd, err)
        print(f"bq={bq:5d} bk={bk:5d} softmax={sd:4s}: {t*1000:8.1f} ms  "
              f"{flops/t/1e12:6.1f} TFLOP/s  maxerr={err:.4f}", flush=True)


if __name__ == "__main__":
    main()
