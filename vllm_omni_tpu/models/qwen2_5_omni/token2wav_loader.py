"""HF Qwen2_5OmniToken2Wav state dict -> JAX param pytrees."""

from __future__ import annotations

from typing import Any

import numpy as np

import jax.numpy as jnp


def _lin(sd, name, dt):
    p = {"w": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T, dt)}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[f"{name}.bias"]), dt)
    else:
        p["b"] = None
    return p


def _conv(sd, name, dt, bias=True):
    return {
        "w": jnp.asarray(np.asarray(sd[f"{name}.weight"]), dt),
        "b": jnp.asarray(np.asarray(sd[f"{name}.bias"]), dt)
        if bias and f"{name}.bias" in sd else None,
    }


def _ecapa_params(sd, prefix, cfg, dt):
    n_se = len(cfg.enc_channels) - 2
    se_blocks = []
    for i in range(1, 1 + n_se):
        p = f"{prefix}blocks.{i}."
        se_blocks.append({
            "tdnn1": _conv(sd, p + "tdnn1.conv", dt),
            "res2net": [
                _conv(sd, p + f"res2net_block.blocks.{j}.conv", dt)
                for j in range(cfg.enc_res2net_scale - 1)
            ],
            "tdnn2": _conv(sd, p + "tdnn2.conv", dt),
            "se1": _conv(sd, p + "se_block.conv1", dt),
            "se2": _conv(sd, p + "se_block.conv2", dt),
        })
    return {
        "block0": _conv(sd, f"{prefix}blocks.0.conv", dt),
        "se_blocks": se_blocks,
        "mfa": _conv(sd, f"{prefix}mfa.conv", dt),
        "asp_tdnn": _conv(sd, f"{prefix}asp.tdnn.conv", dt),
        "asp_conv": _conv(sd, f"{prefix}asp.conv", dt),
        "fc": _conv(sd, f"{prefix}fc", dt),
    }


def dit_params_from_state_dict(sd, cfg, dt=jnp.float32) -> dict[str, Any]:
    L = cfg.num_hidden_layers

    def stack_lin(fmt):
        ws, bs = [], []
        for i in range(L):
            ws.append(np.asarray(sd[fmt.format(i) + ".weight"]).T)
            bs.append(np.asarray(sd[fmt.format(i) + ".bias"]))
        return {"w": jnp.asarray(np.stack(ws), dt),
                "b": jnp.asarray(np.stack(bs), dt)}

    return {
        "time_mlp1": _lin(sd, "time_embed.time_mlp.0", dt),
        "time_mlp2": _lin(sd, "time_embed.time_mlp.2", dt),
        "codec_embed": jnp.asarray(
            np.asarray(sd["text_embed.codec_embed.weight"]), dt),
        "input_proj": _lin(sd, "input_embed.proj", dt),
        "spk_encoder": _ecapa_params(sd, "input_embed.spk_encoder.", cfg, dt),
        "layers": {
            "attn_norm": stack_lin("transformer_blocks.{}.attn_norm.linear"),
            "to_q": stack_lin("transformer_blocks.{}.attn.to_q"),
            "to_k": stack_lin("transformer_blocks.{}.attn.to_k"),
            "to_v": stack_lin("transformer_blocks.{}.attn.to_v"),
            "to_out": stack_lin("transformer_blocks.{}.attn.to_out.0"),
            "ff1": stack_lin("transformer_blocks.{}.ff.ff.0"),
            "ff2": stack_lin("transformer_blocks.{}.ff.ff.3"),
        },
        "norm_out": _lin(sd, "norm_out.linear", dt),
        "proj_out": _lin(sd, "proj_out", dt),
    }


def bigvgan_params_from_state_dict(sd, cfg, dt=jnp.float32) -> dict[str, Any]:
    n_up = len(cfg.upsample_rates)
    n_res = len(cfg.resblock_kernel_sizes)
    ups = []
    for i in range(n_up):
        ups.append({
            "w": jnp.asarray(np.asarray(sd[f"ups.{i}.0.weight"]), dt),  # [I,O,K]
            "b": jnp.asarray(np.asarray(sd[f"ups.{i}.0.bias"]), dt),
        })
    resblocks = []
    for n in range(n_up * n_res):
        p = f"resblocks.{n}."
        n_c = len(cfg.resblock_dilation_sizes[n % n_res])
        rb = {
            "convs1": [_conv(sd, p + f"convs1.{j}", dt) for j in range(n_c)],
            "convs2": [_conv(sd, p + f"convs2.{j}", dt) for j in range(n_c)],
            "alphas1": [], "betas1": [], "alphas2": [], "betas2": [],
        }
        # activations interleaved: [a1_0, a2_0, a1_1, a2_1, ...] via [::2]
        for j in range(n_c):
            rb["alphas1"].append(jnp.asarray(
                np.asarray(sd[p + f"activations.{2*j}.act.alpha"]), dt))
            rb["betas1"].append(jnp.asarray(
                np.asarray(sd[p + f"activations.{2*j}.act.beta"]), dt))
            rb["alphas2"].append(jnp.asarray(
                np.asarray(sd[p + f"activations.{2*j+1}.act.alpha"]), dt))
            rb["betas2"].append(jnp.asarray(
                np.asarray(sd[p + f"activations.{2*j+1}.act.beta"]), dt))
        resblocks.append(rb)
    return {
        "conv_pre": _conv(sd, "conv_pre", dt),
        "ups": ups,
        "resblocks": resblocks,
        "post_alpha": jnp.asarray(
            np.asarray(sd["activation_post.act.alpha"]), dt),
        "post_beta": jnp.asarray(
            np.asarray(sd["activation_post.act.beta"]), dt),
        "conv_post": _conv(sd, "conv_post", dt, bias=False),
    }


def token2wav_params_from_state_dict(model, sd) -> dict[str, Any]:
    dit_sd = {k[len("code2wav_dit_model."):]: v for k, v in sd.items()
              if k.startswith("code2wav_dit_model.")}
    bv_sd = {k[len("code2wav_bigvgan_model."):]: v for k, v in sd.items()
             if k.startswith("code2wav_bigvgan_model.")}
    if not dit_sd:  # flat layout (standalone sub-models)
        dit_sd = sd
        bv_sd = sd
    dt = model.dit.dtype
    return {
        "dit": dit_params_from_state_dict(dit_sd, model.dit_cfg, dt),
        "bigvgan": bigvgan_params_from_state_dict(bv_sd, model.bigvgan_cfg, dt),
    }
