"""Video preprocessing parity vs the HF Qwen2VL image processor (which
handles frame lists with identical patching semantics) + frame sampling
unit checks."""

import numpy as np
import pytest

from vllm_omni_tpu.multimodal.processor import (
    preprocess_video,
    sample_video_frames,
)

CLIP_MEAN = [0.48145466, 0.4578275, 0.40821073]
CLIP_STD = [0.26862954, 0.26130258, 0.27577711]


@pytest.fixture(scope="module")
def hf_proc():
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor,
    )

    return Qwen2VLImageProcessor()  # patch 14, merge 2, temporal 2


def _hf_ref(hf_proc, frames):
    return hf_proc._preprocess(
        list(frames), do_resize=True, size=hf_proc.size, resample=3,
        do_rescale=True, rescale_factor=1 / 255.0, do_normalize=True,
        image_mean=CLIP_MEAN, image_std=CLIP_STD,
        patch_size=14, temporal_patch_size=2, merge_size=2,
        do_convert_rgb=False,
    )


def test_video_patches_match_hf(hf_proc):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (6, 300, 400, 3), dtype=np.uint8)
    ref_patches, ref_grid = _hf_ref(hf_proc, frames)
    got_patches, got_grid = preprocess_video(frames)
    assert got_grid == tuple(ref_grid)
    np.testing.assert_allclose(got_patches, ref_patches, atol=5e-3)


def test_odd_frame_count_pads_with_last(hf_proc):
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (5, 112, 112, 3), dtype=np.uint8)
    ref_patches, ref_grid = _hf_ref(hf_proc, frames)
    got_patches, got_grid = preprocess_video(
        frames, min_pixels=3136, max_pixels=1003520)
    assert got_grid == tuple(ref_grid)
    assert got_grid[0] == 3  # ceil(5 / 2)
    np.testing.assert_allclose(got_patches, ref_patches, atol=5e-3)


def test_sample_video_frames():
    # 10 s clip at 30 fps, target 2 fps -> 20 frames, even count
    idx = sample_video_frames(300, 30.0, fps=2.0)
    assert len(idx) == 20 and idx[0] == 0 and idx[-1] == 299
    # short clip: min_frames floor
    idx = sample_video_frames(9, 30.0, fps=2.0, min_frames=4)
    assert len(idx) == 4
    # cap at total frames (rounded to temporal_patch_size)
    idx = sample_video_frames(3, 1.0, fps=2.0, min_frames=4)
    assert len(idx) == 2 and idx.max() <= 2
    # never exceeds max_frames
    idx = sample_video_frames(100000, 30.0, fps=2.0, max_frames=768)
    assert len(idx) == 768
