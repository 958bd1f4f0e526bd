"""Diffusion LoRA: load-time fusion into base weights."""

import numpy as np
import pytest

from vllm_omni_tpu.diffusion.lora import (
    merge_lora_into,
    merge_lora_for,
    read_lora_tensors,
)


def _pair(rng, out, inn, r):
    A = rng.standard_normal((r, inn)).astype(np.float32)
    B = rng.standard_normal((out, r)).astype(np.float32)
    return A, B


def test_merge_exact_math_and_alpha():
    rng = np.random.default_rng(0)
    W = rng.standard_normal((8, 6)).astype(np.float32)
    A, B = _pair(rng, 8, 6, 2)
    base = {"blocks.0.attn.to_q.weight": W.copy()}
    lora = {
        "transformer.blocks.0.attn.to_q.lora_A.weight": A,
        "transformer.blocks.0.attn.to_q.lora_B.weight": B,
        "transformer.blocks.0.attn.to_q.alpha": np.float32(4.0),
    }
    n = merge_lora_into(base, lora, scale=0.5)
    assert n == 1
    # scale * (alpha / r) = 0.5 * (4 / 2) = 1.0
    np.testing.assert_allclose(
        base["blocks.0.attn.to_q.weight"], W + B @ A, rtol=1e-6)


def test_merge_legacy_up_down_names_and_no_alpha():
    rng = np.random.default_rng(1)
    W = rng.standard_normal((4, 4)).astype(np.float32)
    A, B = _pair(rng, 4, 4, 2)
    base = {"proj.weight": W.copy()}
    lora = {
        "diffusion_model.proj.lora.down.weight": A,
        "diffusion_model.proj.lora.up.weight": B,
    }
    assert merge_lora_into(base, lora, scale=2.0) == 1
    np.testing.assert_allclose(base["proj.weight"], W + 2.0 * (B @ A),
                               rtol=1e-6)


def test_target_module_filter_and_missing_targets():
    rng = np.random.default_rng(2)
    base = {
        "a.to_q.weight": rng.standard_normal((4, 4)).astype(np.float32),
        "a.to_k.weight": rng.standard_normal((4, 4)).astype(np.float32),
    }
    k0 = base["a.to_k.weight"].copy()
    A, B = _pair(rng, 4, 4, 1)
    lora = {}
    for m in ("to_q", "to_k", "ghost"):
        lora[f"a.{m}.lora_A.weight"] = A
        lora[f"a.{m}.lora_B.weight"] = B
    n = merge_lora_into(base, lora, target_modules=["to_q"])
    assert n == 1
    np.testing.assert_array_equal(base["a.to_k.weight"], k0)


def test_read_and_merge_via_config(tmp_path):
    safetensors = pytest.importorskip("safetensors.numpy")
    rng = np.random.default_rng(3)
    W = rng.standard_normal((8, 8)).astype(np.float32)
    A, B = _pair(rng, 8, 8, 4)
    safetensors.save_file(
        {"transformer.x.lora_A.weight": A,
         "transformer.x.lora_B.weight": B},
        str(tmp_path / "pytorch_lora_weights.safetensors"))

    from vllm_omni_tpu.config.diffusion import OmniDiffusionConfig

    od = OmniDiffusionConfig(lora_path=str(tmp_path), lora_scale=0.25)
    sd = {"x.weight": W.copy()}
    merge_lora_for(sd, od)
    np.testing.assert_allclose(sd["x.weight"], W + 0.25 * (B @ A),
                               rtol=1e-6)
    # nothing matching -> hard error (silent no-op LoRA is worse)
    with pytest.raises(ValueError):
        merge_lora_for({"y.weight": W.copy()}, od)
    # no lora configured -> pass-through
    sd2 = {"x.weight": W.copy()}
    merge_lora_for(sd2, OmniDiffusionConfig())
    np.testing.assert_array_equal(sd2["x.weight"], W)


def test_read_lora_tensors_single_file(tmp_path):
    safetensors = pytest.importorskip("safetensors.numpy")
    f = tmp_path / "my_adapter.safetensors"
    safetensors.save_file(
        {"k.lora_A.weight": np.zeros((1, 2), np.float32)}, str(f))
    # by file path and by directory discovery
    assert "k.lora_A.weight" in read_lora_tensors(str(f))
    assert "k.lora_A.weight" in read_lora_tensors(str(tmp_path))
