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
    ref = None
    for bq, bk in [(256, 512), (512, 512), (512, 1024), (1024, 1024),
                   (1024, 2048), (2048, 1024), (2048, 2048)]:
        if bq > L or bk > L:
            continue
        f = lambda: flash_attention(q, k, v, block_q=bq, block_k=bk)
        out = f()
        np.asarray(out)  # compile + sync
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f())
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        if ref is None:
            ref = np.asarray(out, np.float32)
        else:
            err = float(np.abs(np.asarray(out, np.float32) - ref).max())
            assert err < 0.1, (bq, bk, err)
        print(f"bq={bq:5d} bk={bk:5d}: {t*1000:8.1f} ms  "
              f"{flops/t/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
