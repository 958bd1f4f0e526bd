"""Vision encoder numeric parity vs HF Qwen2_5OmniVisionEncoder."""

import numpy as np
import jax.numpy as jnp
import pytest

from vllm_omni_tpu.models.vision_encoder import VisionEncoder, VisionEncoderConfig


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import (
        Qwen2_5OmniVisionEncoderConfig,
    )
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import (
        Qwen2_5OmniVisionEncoder,
    )

    torch.manual_seed(0)
    kwargs = dict(
        depth=4, hidden_size=64, intermediate_size=96, num_heads=4,
        in_channels=3, patch_size=4, temporal_patch_size=2,
        spatial_merge_size=2, window_size=16, fullatt_block_indexes=[2],
        out_hidden_size=48,
    )
    hf_cfg = Qwen2_5OmniVisionEncoderConfig(
        **kwargs, attn_implementation="sdpa")
    hf = Qwen2_5OmniVisionEncoder(hf_cfg).eval()
    ours = VisionEncoder(VisionEncoderConfig(
        **{**kwargs, "fullatt_block_indexes": tuple(kwargs["fullatt_block_indexes"])}))
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = ours.load_from_state_dict(sd)
    return hf, ours, params


@pytest.mark.parametrize("grid", [(1, 8, 8), (1, 12, 8), (2, 8, 12)])
def test_vision_encoder_matches_hf(hf_pair, grid):
    import torch

    hf, ours, params = hf_pair
    t, h, w = grid
    n_patches = t * h * w
    patch_dim = 3 * 2 * 4 * 4
    rng = np.random.default_rng(sum(grid))
    patches = rng.normal(size=(n_patches, patch_dim)).astype(np.float32)
    with torch.no_grad():
        ref = hf(
            torch.from_numpy(patches), torch.tensor([list(grid)])
        ).numpy()
    got = np.asarray(ours.forward(params, jnp.asarray(patches), [grid]))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=5e-4)


def test_vision_encoder_window_vs_full_differs(hf_pair):
    """Sanity: windows actually restrict attention (mask matters) on a
    grid larger than one window."""
    _, ours, params = hf_pair
    grid = (1, 12, 12)
    n_patches = 144
    rng = np.random.default_rng(0)
    patches = rng.normal(size=(n_patches, 96)).astype(np.float32)
    got = ours.forward(params, jnp.asarray(patches), [grid])
    cfg_full = VisionEncoderConfig(
        depth=4, hidden_size=64, intermediate_size=96, num_heads=4,
        in_channels=3, patch_size=4, temporal_patch_size=2,
        spatial_merge_size=2, window_size=16,
        fullatt_block_indexes=(0, 1, 2, 3), out_hidden_size=48,
    )
    ours_full = VisionEncoder(cfg_full)
    got_full = ours_full.forward(params, jnp.asarray(patches), [grid])
    assert not np.allclose(np.asarray(got), np.asarray(got_full), atol=1e-4)
