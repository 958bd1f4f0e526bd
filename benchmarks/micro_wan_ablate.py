"""Ablate the Wan2.2-TI2V 720p denoise step on-chip.

The r3 flagship bench measured 27.1 s/step at ~16% MXU utilization
(BASELINE.md). This splits the step into its compute classes to find
where the time goes:

  full        the real transformer forward (flash attention engaged)
  no_attn     self+cross attention replaced by identity (matmuls +
              modulation + rope only)
  flash_self  30x the self-attention kernel alone at [2, S, 24, 128]
  rope        30x apply_wan_rope on q+k

Usage: python benchmarks/micro_wan_ablate.py [S]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _force(x):
    # block_until_ready is not a reliable barrier over the axon tunnel;
    # a device_get of one element is
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(fn, *args, reps=3, warmup=1):
    for _ in range(warmup):
        _force(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from vllm_omni_tpu.diffusion.models.wan2_2.transformer import (
        WanTransformer3DModel,
        WanTransformerConfig,
        apply_wan_rope,
        wan_rope_angles,
    )

    # TI2V-5B shape at 704x1280x21 frames -> latents [1,16,21,88,160],
    # patch (1,2,2) -> S = 21*44*80 = 73920? No: VAE downsamples 8x16 ->
    # flagship used 21120 latent tokens: latent grid F=12? Keep the
    # flagship number: latents [B,16,F,H/8? ...] — drive S directly.
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 21120
    cfg = WanTransformerConfig(
        num_attention_heads=24, attention_head_dim=128, num_layers=30,
        ffn_dim=14336, text_dim=4096)
    model = WanTransformer3DModel(cfg, dtype=jnp.bfloat16)
    params = model.init_params(jax.random.key(0))

    # factor S into a plausible (f, h, w) grid
    f = 12
    hw = L // f
    h = int(np.sqrt(hw / (1280 / 704)))
    h = max(8, h // 2 * 2)
    w = hw // h
    S = f * h * w
    B = 2  # batched CFG
    pt, ph, pw = cfg.patch_size
    lat = jnp.asarray(np.random.default_rng(0).normal(
        size=(B, cfg.in_channels, f * pt, h * ph, w * pw)), jnp.bfloat16)
    tstep = jnp.full((B,), 500.0, jnp.float32)
    ctx = jnp.asarray(np.random.default_rng(1).normal(
        size=(B, 64, cfg.text_dim)), jnp.bfloat16)

    flops_self = 4 * B * cfg.num_attention_heads * S * S * \
        cfg.attention_head_dim * cfg.num_layers
    flops_mm = (2 * B * S * cfg.inner_dim * cfg.inner_dim * (4 + 4)
                + 2 * B * S * cfg.inner_dim * cfg.ffn_dim * 2) * \
        cfg.num_layers
    print(f"S={S} (f={f} h={h} w={w}) B={B}; "
          f"self-attn {flops_self/1e12:.1f} TF, matmuls {flops_mm/1e12:.1f} TF")

    fwd = jax.jit(lambda p, x, t, c: model.forward(p, x, t, c))
    t_full = timeit(fwd, params, lat, tstep, ctx)
    print(f"full step:        {t_full:8.3f} s   "
          f"({(flops_self + flops_mm) / t_full / 1e12:.1f} TFLOP/s)")

    # ---- attention -> identity --------------------------------------
    import vllm_omni_tpu.diffusion.layers as dl

    orig = dl.dense_attention

    def ident(q, k, v, mask=None, **kw):
        # same shape contract: [B, L, H, D] -> [B, L, H, D]
        return q

    dl.dense_attention = ident
    try:
        fwd2 = jax.jit(lambda p, x, t, c: model.forward(p, x, t, c))
        t_noattn = timeit(fwd2, params, lat, tstep, ctx)
    finally:
        dl.dense_attention = orig
    print(f"no-attn step:     {t_noattn:8.3f} s   "
          f"({flops_mm / t_noattn / 1e12:.1f} TFLOP/s on matmuls)")

    # ---- flash self-attention alone ---------------------------------
    from vllm_omni_tpu.ops.attention.pallas_flash import flash_attention

    q = jnp.asarray(np.random.default_rng(2).normal(
        size=(B, S, cfg.num_attention_heads, cfg.attention_head_dim)),
        jnp.bfloat16)

    def flash30(q):
        out = q
        for _ in range(3):
            out = flash_attention(out, q, q)
        return out

    f30 = jax.jit(flash30)
    t_flash = timeit(f30, q) / 3 * cfg.num_layers
    print(f"flash x30:        {t_flash:8.3f} s   "
          f"({flops_self / t_flash / 1e12:.1f} TFLOP/s)")

    # ---- rope alone --------------------------------------------------
    angles = wan_rope_angles(cfg, f, h, w)

    def rope30(q):
        out = q
        for _ in range(3):
            out = apply_wan_rope(out, angles)
        return out

    r30 = jax.jit(rope30)
    t_rope = timeit(r30, q) / 3 * cfg.num_layers * 2  # q and k
    print(f"rope x30x2:       {t_rope:8.3f} s")

    print(f"unexplained:      {t_full - t_noattn - t_flash:8.3f} s "
          f"(full - no_attn - flash; rope counted in no_attn)")


if __name__ == "__main__":
    main()
