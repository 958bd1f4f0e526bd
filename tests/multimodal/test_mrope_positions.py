"""M-RoPE position parity vs HF thinker get_rope_index."""

import numpy as np
import pytest

from vllm_omni_tpu.multimodal.mrope import (
    MRopeParams,
    MRopeTokenIds,
    compute_mrope_positions,
)

IMG, VID, AUD = 151655, 151656, 151646
VSTART, ASTART = 151652, 151647
VEND, AEND = 151653, 151648

PARAMS = MRopeParams(
    tokens=MRopeTokenIds(
        image_token_id=IMG, video_token_id=VID, audio_token_id=AUD,
        vision_start_token_id=VSTART, audio_start_token_id=ASTART,
    )
)


@pytest.fixture(scope="module")
def hf_thinker():
    import torch
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import (
        Qwen2_5OmniThinkerConfig,
    )
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import (
        Qwen2_5OmniThinkerForConditionalGeneration,
    )

    cfg = Qwen2_5OmniThinkerConfig()
    cfg.vision_start_token_id = VSTART
    cfg.vision_end_token_id = VEND
    cfg.image_token_id = IMG
    cfg.video_token_id = VID
    cfg.audio_token_id = AUD
    cfg.text_config.num_hidden_layers = 1
    cfg.text_config.hidden_size = 64
    cfg.text_config.intermediate_size = 64
    cfg.text_config.num_attention_heads = 4
    cfg.text_config.num_key_value_heads = 2
    cfg.audio_config.encoder_layers = 1
    cfg.audio_config.d_model = 64
    cfg.audio_config.encoder_attention_heads = 4
    cfg.audio_config.encoder_ffn_dim = 64
    cfg.audio_config.output_dim = 64
    cfg.vision_config.depth = 1
    cfg.vision_config.hidden_size = 32
    cfg.vision_config.intermediate_size = 32
    cfg.vision_config.num_heads = 2
    cfg.vision_config.out_hidden_size = 64
    with __import__("torch").device("meta"):
        pass
    return Qwen2_5OmniThinkerForConditionalGeneration(cfg)


def hf_positions(hf_thinker, ids, image=None, video=None, audio_lens=None,
                 spg=None, uaiv=False):
    import torch

    pos, delta = hf_thinker.get_rope_index(
        input_ids=torch.tensor([ids]),
        image_grid_thw=torch.tensor(image) if image else None,
        video_grid_thw=torch.tensor(video) if video else None,
        attention_mask=torch.ones(1, len(ids), dtype=torch.long),
        use_audio_in_video=uaiv,
        audio_seqlens=torch.tensor(audio_lens) if audio_lens else None,
        second_per_grids=torch.tensor(spg, dtype=torch.float) if spg else None,
    )
    return pos[:, 0].numpy(), int(delta[0, 0])


def build_image_seq(prefix, grid, suffix):
    n = grid[0] * (grid[1] // 2) * (grid[2] // 2)
    return prefix + [VSTART] + [IMG] * n + [VEND] + suffix


def test_text_with_image(hf_thinker):
    grid = (1, 4, 6)
    ids = build_image_seq([11, 12, 13], grid, [14, 15])
    ref, ref_delta = hf_positions(hf_thinker, ids, image=[grid])
    got, delta = compute_mrope_positions(ids, PARAMS, image_grid_thw=[grid])
    np.testing.assert_array_equal(got, ref)
    assert delta == ref_delta


def test_two_images_and_text(hf_thinker):
    g1, g2 = (1, 4, 4), (1, 2, 6)
    ids = build_image_seq([1, 2], g1, [3])
    ids = build_image_seq(ids, g2, [4, 5, 6])
    ref, ref_delta = hf_positions(hf_thinker, ids, image=[g1, g2])
    got, delta = compute_mrope_positions(ids, PARAMS, image_grid_thw=[g1, g2])
    np.testing.assert_array_equal(got, ref)
    assert delta == ref_delta


def test_video_no_audio(hf_thinker):
    grid = (3, 4, 4)
    n = grid[0] * (grid[1] // 2) * (grid[2] // 2)
    ids = [7, 8] + [VSTART] + [VID] * n + [VEND] + [9]
    ref, ref_delta = hf_positions(
        hf_thinker, ids, video=[grid], spg=[2.0])
    got, delta = compute_mrope_positions(
        ids, PARAMS, video_grid_thw=[grid], second_per_grids=[2.0])
    np.testing.assert_array_equal(got, ref)
    assert delta == ref_delta


def test_audio_plus_image(hf_thinker):
    mel_len = 100
    alen = ((mel_len - 1) // 2 + 1 - 2) // 2 + 1
    grid = (1, 4, 4)
    n = grid[0] * 2 * 2
    ids = ([1] + [ASTART] + [AUD] * alen + [AEND]
           + [VSTART] + [IMG] * n + [VEND] + [2, 3])
    ref, ref_delta = hf_positions(
        hf_thinker, ids, image=[grid], audio_lens=[mel_len])
    got, delta = compute_mrope_positions(
        ids, PARAMS, image_grid_thw=[grid], audio_seqlens=[mel_len])
    np.testing.assert_array_equal(got, ref)
    assert delta == ref_delta


def test_audio_in_video_interleaved(hf_thinker):
    mel_len = 200
    alen = ((mel_len - 1) // 2 + 1 - 2) // 2 + 1  # 50 tokens = 2s
    grid = (4, 4, 4)  # 4 temporal patches
    n = grid[0] * 2 * 2
    spg = [1.0]
    # processor layout for use_audio_in_video: vision bos, audio bos,
    # interleaved chunks (video first), audio eos, vision eos
    per_chunk = 50  # 25 pos/s * 2 s
    import torch

    # build interleaving the same way the HF processor does: chunk by t
    video_t = np.repeat(np.arange(grid[0]) * spg[0] * 25, 4).astype(int)
    audio_t = np.arange(alen)
    v_spans, a_spans = [], []
    from vllm_omni_tpu.multimodal.mrope import _chunk_spans

    v_spans = _chunk_spans(video_t, per_chunk, 0)
    a_spans = _chunk_spans(audio_t, per_chunk, 0)
    body = []
    for j in range(max(len(v_spans), len(a_spans))):
        if j < len(v_spans):
            s, e = v_spans[j]
            body += [VID] * (e - s)
        if j < len(a_spans):
            s, e = a_spans[j]
            body += [AUD] * (e - s)
    ids = [1, 2] + [VSTART, ASTART] + body + [AEND, VEND] + [3]
    ref, ref_delta = hf_positions(
        hf_thinker, ids, video=[grid], audio_lens=[mel_len], spg=spg,
        uaiv=True)
    got, delta = compute_mrope_positions(
        ids, PARAMS, video_grid_thw=[grid], audio_seqlens=[mel_len],
        second_per_grids=spg, use_audio_in_video=True)
    np.testing.assert_array_equal(got, ref)
    assert delta == ref_delta


def test_pure_text():
    got, delta = compute_mrope_positions([5, 6, 7], PARAMS)
    np.testing.assert_array_equal(got, np.broadcast_to(np.arange(3), (3, 3)))
    assert delta == 1 + 2 - 3
