"""Frozen-checkpoint validation of the diffusers loader path.

No real checkpoint is downloadable in this environment (zero egress) and
diffusers is not installed, so this locks the loader end-to-end the
other way (VERDICT round-1 item 4): a tiny checkpoint in the exact
diffusers DIRECTORY LAYOUT and NAME SCHEME (model_index.json, component
config.json + *.safetensors with diffusers parameter names — reference
model_loader/diffusers_loader.py:36-228) is synthesized from known
params, loaded back through the real loader (name mapping, transposes,
gamma reshapes, flat/nested block indexing), and must (a) reproduce the
source params exactly and (b) generate an image matching the frozen
golden checked into the repo.

Regenerate goldens after an intentional numerics change:
  OMNI_TPU_WRITE_GOLDEN=1 python -m pytest tests/diffusion/test_frozen_checkpoint.py
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_omni_tpu.config.diffusion import OmniDiffusionConfig
from vllm_omni_tpu.diffusion.models.qwen_image import loader as qloader
from vllm_omni_tpu.diffusion.models.qwen_image.pipeline import (
    QwenImagePipeline,
)
from vllm_omni_tpu.diffusion.models.qwen_image.transformer import (
    QwenImageTransformerConfig,
)
from vllm_omni_tpu.diffusion.models.qwen_image.vae import QwenImageVAEConfig
from vllm_omni_tpu.diffusion.request import OmniDiffusionRequest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

TF_CFG = dict(
    num_layers=2, attention_head_dim=32, num_attention_heads=2,
    joint_attention_dim=48, in_channels=16, out_channels=4,
    axes_dims_rope=(8, 12, 12),
)
VAE_CFG = dict(base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
               temperal_downsample=(False,))


def _get(tree, dotted):
    for part in dotted.split("."):
        tree = tree[part]
    return tree


def _export_transformer(params, L):
    sd = {}
    for dname, (key, tr) in qloader._TOP_MAP.items():
        try:
            arr = np.asarray(_get(params, key), np.float32)
        except KeyError:
            continue  # optional (layered-variant) params
        sd[dname] = np.ascontiguousarray(arr.T if tr else arr)
    for dname, (key, tr) in qloader._BLOCK_MAP.items():
        stacked = np.asarray(_get(params["blocks"], key), np.float32)
        for li in range(L):
            a = stacked[li]
            sd[f"transformer_blocks.{li}.{dname}"] = np.ascontiguousarray(
                a.T if tr else a)
    return sd


def _export_vae(p, cfg):
    sd = {}

    def conv(pfx, c):
        sd[pfx + ".weight"] = np.asarray(c["w"], np.float32)
        sd[pfx + ".bias"] = np.asarray(c["b"], np.float32)

    def gam(name, g, extra_dims):
        sd[name] = np.asarray(g, np.float32).reshape(
            (-1,) + (1,) * extra_dims)

    def res(pfx, r):
        gam(pfx + ".norm1.gamma", r["norm1"], 3)  # images=False: (C,1,1,1)
        conv(pfx + ".conv1", r["conv1"])
        gam(pfx + ".norm2.gamma", r["norm2"], 3)
        conv(pfx + ".conv2", r["conv2"])
        if "shortcut" in r:
            conv(pfx + ".conv_shortcut", r["shortcut"])

    def mid(pfx, m):
        res(pfx + ".resnets.0", m["res0"])
        gam(pfx + ".attentions.0.norm.gamma", m["attn"]["norm"], 2)
        conv(pfx + ".attentions.0.to_qkv", m["attn"]["qkv"])
        conv(pfx + ".attentions.0.proj", m["attn"]["proj"])
        res(pfx + ".resnets.1", m["res1"])

    e = p["encoder"]
    conv("encoder.conv_in", e["conv_in"])
    j = 0
    for stage in e["blocks"]:
        for r in stage["res"]:
            res(f"encoder.down_blocks.{j}", r)
            j += 1
        if "down" in stage:
            conv(f"encoder.down_blocks.{j}.resample.1", stage["down"])
            if "time_down" in stage:
                conv(f"encoder.down_blocks.{j}.time_conv",
                     stage["time_down"])
            j += 1
    mid("encoder.mid_block", e["mid"])
    gam("encoder.norm_out.gamma", e["norm_out"], 3)
    conv("encoder.conv_out", e["conv_out"])

    d = p["decoder"]
    conv("decoder.conv_in", d["conv_in"])
    mid("decoder.mid_block", d["mid"])
    for i, stage in enumerate(d["blocks"]):
        for r, rp in enumerate(stage["res"]):
            res(f"decoder.up_blocks.{i}.resnets.{r}", rp)
        if "up" in stage:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.resample.1",
                 stage["up"])
            if "time_up" in stage:
                conv(f"decoder.up_blocks.{i}.upsamplers.0.time_conv",
                     stage["time_up"])
    gam("decoder.norm_out.gamma", d["norm_out"], 3)
    conv("decoder.conv_out", d["conv_out"])
    conv("quant_conv", p["quant_conv"])
    conv("post_quant_conv", p["post_quant_conv"])
    return sd


def _write_checkpoint(tmp_path) -> str:
    """Synthesize the diffusers-layout checkpoint from seeded params."""
    from safetensors.numpy import save_file

    root = str(tmp_path / "tiny-qwen-image")
    os.makedirs(os.path.join(root, "transformer"), exist_ok=True)
    os.makedirs(os.path.join(root, "vae"), exist_ok=True)
    with open(os.path.join(root, "model_index.json"), "w") as f:
        json.dump({"_class_name": "QwenImagePipeline"}, f)
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump({**TF_CFG, "axes_dims_rope": list(TF_CFG["axes_dims_rope"])},
                  f)
    with open(os.path.join(root, "vae", "config.json"), "w") as f:
        json.dump({**VAE_CFG, "dim_mult": list(VAE_CFG["dim_mult"]),
                   "temperal_downsample": list(
                       VAE_CFG["temperal_downsample"])}, f)

    od = OmniDiffusionConfig(model="", dtype="float32")
    src = QwenImagePipeline(
        od, transformer_config=QwenImageTransformerConfig(**TF_CFG),
        vae_config=QwenImageVAEConfig(**VAE_CFG),
        load_weights=False, rng_seed=123)
    save_file(_export_transformer(src.params["transformer"],
                                  TF_CFG["num_layers"]),
              os.path.join(root, "transformer",
                           "diffusion_pytorch_model.safetensors"))
    save_file(_export_vae(src.params["vae"], src.vae.cfg),
              os.path.join(root, "vae",
                           "diffusion_pytorch_model.safetensors"))
    return root, src


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    return _write_checkpoint(tmp_path_factory.mktemp("ckpt"))


def test_loader_roundtrips_params(checkpoint):
    root, src = checkpoint
    od = OmniDiffusionConfig(model=root, dtype="float32")
    loaded = QwenImagePipeline(od, load_weights=True)
    # configs resolved from the checkpoint subfolders
    assert loaded.transformer.cfg.num_layers == TF_CFG["num_layers"]
    assert loaded.vae.cfg.z_dim == VAE_CFG["z_dim"]
    flat_src = jax.tree_util.tree_leaves_with_path(src.params)
    flat_new = {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_leaves_with_path(
                    loaded.params)}
    assert len(flat_src) == len(flat_new)
    for k, v in flat_src:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_array_equal(
            np.asarray(v, np.float32), np.asarray(flat_new[ks], np.float32),
            err_msg=ks)


def test_engine_generates_golden_image(checkpoint):
    root, _ = checkpoint
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    od = OmniDiffusionConfig(model=root, dtype="float32")
    eng = DiffusionEngine(od)  # class resolved via model_index.json
    rng = np.random.default_rng(7)
    req = OmniDiffusionRequest(
        request_id="g", prompt="golden",
        prompt_embeds=rng.normal(size=(1, 6, 48)).astype(np.float32),
        negative_prompt_embeds=rng.normal(size=(1, 6, 48)
                                          ).astype(np.float32),
        height=32, width=32, num_inference_steps=2, seed=11,
        true_cfg_scale=1.8, output_type="np")
    out = eng.step([req])[0]
    assert out.error is None, out.error
    img = np.asarray(out.images[0])
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8

    golden_path = os.path.join(GOLDEN_DIR, "qwen_image_tiny.npy")
    if os.environ.get("OMNI_TPU_WRITE_GOLDEN") == "1":
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(golden_path, img)
        pytest.skip("golden regenerated")
    assert os.path.isfile(golden_path), (
        "golden missing — regenerate with OMNI_TPU_WRITE_GOLDEN=1")
    golden = np.load(golden_path)
    # tolerate off-by-one uint8 rounding across BLAS/XLA versions
    diff = np.abs(img.astype(np.int32) - golden.astype(np.int32))
    assert (diff <= 1).mean() > 0.999 and diff.max() <= 3, (
        diff.max(), (diff > 1).mean())
