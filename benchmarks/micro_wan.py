"""Component-level timing of the Wan video denoise step (VERDICT r3 #2).

Times each piece of one 30L Wan block scan at the 704x1280x21f shape
([B=2, S=21120, 24h, 128d]) to locate the gap between the measured
27.1 s/step and the ~3.5 s compute bound. Pieces:

  rope       apply_wan_rope (reshape-pair) vs apply_wan_rope_mm (matmul)
  flash      pallas flash attention at video scale
  linears    the block's 10 matmuls alone (scan over 30 layers)
  block      the full block scan (everything the step does between
             patchify and the head)

Usage: python benchmarks/micro_wan.py [piece ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, S, H, D = 2, 21120, 24, 128
DIM = H * D
FFN = 14336
L = 30


def _force(res):
    """Block on completion via a host fetch of a SCALAR reduction (some
    remote platforms resolve block_until_ready before execution
    finishes, and fetching a full video-scale array drags ~260 MB over
    the dev tunnel — 8+ s that used to masquerade as kernel time)."""
    leaf = jax.tree_util.tree_leaves(res)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))


_RTT = None


def _tunnel_rtt() -> float:
    global _RTT
    if _RTT is None:
        tiny = jax.jit(lambda x: x + 1)
        xs = jnp.ones((8,), jnp.float32)
        np.asarray(tiny(xs))
        rtts = []
        for _ in range(8):
            t0 = time.perf_counter()
            np.asarray(tiny(xs))
            rtts.append(time.perf_counter() - t0)
        _RTT = sorted(rtts)[len(rtts) // 2]
    return _RTT


def timeit(fn, *args, reps=3, warmup=1):
    """Per-call device time: each rep pays one tunnel round trip for the
    scalar sync, which is measured once and subtracted (28 ms of RTT
    reads as +35% on an 80 ms kernel otherwise)."""
    for _ in range(warmup):
        _force(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(*args))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - _tunnel_rtt(), 1e-9)


def bench_rope():
    from vllm_omni_tpu.diffusion.models.wan2_2.transformer import (
        WanTransformerConfig, apply_wan_rope, apply_wan_rope_mm,
        wan_rope_angles, wan_rope_tables,
    )

    cfg = WanTransformerConfig(num_attention_heads=H, attention_head_dim=D)
    angles = wan_rope_angles(cfg, 21, 44 // 2 * 2 // 2, 40)  # ~S positions
    # exact S: use f=21, h and w chosen to multiply to S/21
    angles = wan_rope_angles(cfg, 21, 32, S // (21 * 32))
    Sa = angles.shape[0]
    x = jax.random.normal(jax.random.PRNGKey(0), (B, Sa, H, D), jnp.bfloat16)

    f_ref = jax.jit(apply_wan_rope)
    t_ref = timeit(f_ref, x, angles)

    cos, sin, rot = wan_rope_tables(angles)
    f_mm = jax.jit(apply_wan_rope_mm)
    t_mm = timeit(f_mm, x, cos, sin, rot)

    a = np.asarray(f_ref(x, angles), np.float32)
    b = np.asarray(f_mm(x, cos, sin, rot), np.float32)
    err = float(np.abs(a - b).max())
    print(f"rope  S={Sa}: reshape-pair {t_ref*1e3:.1f} ms  "
          f"mm {t_mm*1e3:.1f} ms  ({t_ref/t_mm:.2f}x)  max|diff|={err:.2e}")
    return {"rope_ref_ms": t_ref * 1e3, "rope_mm_ms": t_mm * 1e3}


def bench_flash():
    from vllm_omni_tpu.ops.attention.pallas_flash import flash_attention

    k0 = jax.random.PRNGKey(0)
    q = jax.random.normal(k0, (B, S, H, D), jnp.bfloat16)
    t = timeit(flash_attention, q, q, q)
    fl = 4 * B * H * S * S * D
    print(f"flash [B{B} S{S} H{H} D{D}]: {t*1e3:.1f} ms  "
          f"{fl/t/1e12:.1f} TFLOP/s  (x30 layers = {t*30:.2f} s)")
    return {"flash_ms": t * 1e3, "flash_tflops": fl / t / 1e12}


def _mk_layer_params(key):
    ks = jax.random.split(key, 12)

    def w(k, i, o):
        return jax.random.normal(k, (L, i, o), jnp.bfloat16) * 0.02

    return {
        "q1": w(ks[0], DIM, DIM), "k1": w(ks[1], DIM, DIM),
        "v1": w(ks[2], DIM, DIM), "o1": w(ks[3], DIM, DIM),
        "q2": w(ks[4], DIM, DIM), "o2": w(ks[5], DIM, DIM),
        "fc1": w(ks[6], DIM, FFN), "fc2": w(ks[7], FFN, DIM),
    }


def bench_linears():
    p = _mk_layer_params(jax.random.PRNGKey(1))
    x = jax.random.normal(jax.random.PRNGKey(2), (B, S, DIM), jnp.bfloat16)

    @jax.jit
    def run(p, x):
        def layer(h, lp):
            h = h + jnp.dot(h, lp["q1"]) * 0.0 + jnp.dot(h, lp["k1"]) * 0.0 \
                + jnp.dot(h, lp["v1"]) * 0.0
            h = h + jnp.dot(h, lp["o1"]) * 1e-3
            h = h + jnp.dot(h, lp["q2"]) * 0.0 + jnp.dot(h, lp["o2"]) * 1e-3
            h = h + jnp.dot(jax.nn.gelu(jnp.dot(h, lp["fc1"])),
                            lp["fc2"]) * 1e-3
            return h, None

        h, _ = jax.lax.scan(layer, x, p)
        return h

    t = timeit(run, p, x)
    fl = 2 * B * S * (6 * DIM * DIM + 2 * DIM * FFN) * L
    print(f"linears (8 matmuls x {L}L): {t*1e3:.0f} ms  "
          f"{fl/t/1e12:.1f} TFLOP/s")
    return {"linears_ms": t * 1e3}


def _setup_model():
    from vllm_omni_tpu.diffusion.models.wan2_2.transformer import (
        WanTransformer3DModel, WanTransformerConfig,
    )

    cfg = WanTransformerConfig(
        num_attention_heads=H, attention_head_dim=D, num_layers=L,
        ffn_dim=FFN, text_dim=4096)
    model = WanTransformer3DModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    # 21 video frames -> 6 latent frames (temporal VAE stride 4); with
    # patch (1,2,2): S = 6 * 44 * 80 = 21120, the bench_video shape
    lat = jax.random.normal(
        jax.random.PRNGKey(1), (B, 16, 6, 704 // 8, 1280 // 8),
        jnp.bfloat16)
    tstep = jnp.full((B,), 500.0, jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, 64, 4096),
                            jnp.bfloat16)
    return model, params, lat, tstep, ctx


def bench_block():
    model, params, lat, tstep, ctx = _setup_model()
    fwd = jax.jit(model.forward)
    t = timeit(fwd, params, lat, tstep, ctx, reps=2)
    print(f"full forward (30L, {S} tokens): {t:.2f} s")
    return {"forward_s": t}


def bench_ablate(tag: str = "full"):
    """In-situ ablation of the full forward: stub ONE component and
    time (one process per ablation — the 10 GB params + compiled
    executables of several variants do not coexist in 16 GB HBM).

    tags: full | no_attn | no_rope | no_rms | bf16_ln"""
    import vllm_omni_tpu.diffusion.layers as dlayers
    import vllm_omni_tpu.diffusion.models.wan2_2.transformer as wt

    if tag == "no_attn":
        dlayers.dense_attention = lambda q, k, v, scale=None, mask=None: (
            q * 0.01 + jnp.mean(v, axis=1, keepdims=True))
    elif tag == "no_rope":
        wt.apply_wan_rope = lambda x, angles: x
        wt.apply_wan_rope_mm = lambda x, cos, sin, rot: x
    elif tag == "no_rms":
        wt._rms_full = lambda x, w, eps: x
    elif tag == "bf16_ln":
        def _bf16_ln(x, eps, gamma=None, beta=None):
            o = dlayers.layer_norm(x, eps)
            if gamma is not None:
                o = o * gamma + beta
            return o

        wt._fp32_ln = _bf16_ln

    model, params, lat, tstep, ctx = _setup_model()
    fwd = jax.jit(model.forward)
    t = timeit(fwd, params, lat, tstep, ctx, reps=2)
    print(f"forward [{tag}]: {t:.2f} s")
    return {f"fwd_{tag}_s": t}


if __name__ == "__main__":
    which = sys.argv[1:] or ["rope", "flash", "linears", "block"]
    out = {}
    for name in which:
        if name.startswith("ablate"):
            _, _, tag = name.partition(":")
            out.update(bench_ablate(tag or "full"))
            continue
        out.update({"rope": bench_rope, "flash": bench_flash,
                    "linears": bench_linears, "block": bench_block}[name]())
    import json

    print(json.dumps({k: round(v, 2) for k, v in out.items()}))
