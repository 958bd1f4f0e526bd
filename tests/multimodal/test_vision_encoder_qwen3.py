"""Qwen3-Omni vision tower parity vs HF (incl. deepstack features)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vllm_omni_tpu.models.vision_encoder_qwen3 import (
    Qwen3VisionEncoder,
    Qwen3VisionEncoderConfig,
)


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import (
        Qwen3OmniMoeVisionEncoderConfig,
    )
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeVisionEncoder,
    )

    torch.manual_seed(0)
    kwargs = dict(
        depth=3, hidden_size=64, intermediate_size=96, num_heads=4,
        in_channels=3, patch_size=4, temporal_patch_size=2,
        spatial_merge_size=2, out_hidden_size=48,
        num_position_embeddings=64, deepstack_visual_indexes=[0, 2],
    )
    hf = Qwen3OmniMoeVisionEncoder(
        Qwen3OmniMoeVisionEncoderConfig(**kwargs, attn_implementation="sdpa")
    ).eval()
    ours = Qwen3VisionEncoder(Qwen3VisionEncoderConfig(
        **{**kwargs, "deepstack_visual_indexes": (0, 2)}))
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = ours.load_from_state_dict(sd)
    return hf, ours, params


@pytest.mark.parametrize("grid", [(1, 8, 8), (2, 8, 12)])
def test_qwen3_vision_matches_hf(hf_pair, grid):
    import torch

    hf, ours, params = hf_pair
    t, h, w = grid
    n_patches = t * h * w
    patch_dim = 3 * 2 * 4 * 4
    rng = np.random.default_rng(sum(grid))
    patches = rng.normal(size=(n_patches, patch_dim)).astype(np.float32)
    with torch.no_grad():
        ref, ref_deep = hf(
            torch.from_numpy(patches), torch.tensor([list(grid)]))
    got, got_deep = ours.forward(params, jnp.asarray(patches), [grid])
    np.testing.assert_allclose(
        np.asarray(got), ref.numpy(), atol=1e-3, rtol=1e-3)
    assert len(got_deep) == len(ref_deep) == 2
    for g, r in zip(got_deep, ref_deep):
        np.testing.assert_allclose(
            np.asarray(g), r.numpy(), atol=1e-3, rtol=1e-3)
