"""End-to-end Qwen2.5-Omni thinker parity: HF generate vs our engine.

Tiny random thinker (audio tower + vision tower + text decoder); same
weights loaded into both stacks; greedy continuations must agree given
audio + image inputs. This exercises: mel parity, both encoders, feature
splicing, M-RoPE positions through the paged-attention engine.
"""

import numpy as np
import pytest

from vllm_omni_tpu.config.engine import EngineArgs
from vllm_omni_tpu.engine.llm import LLM
from vllm_omni_tpu.multimodal.processor import expand_placeholders
from vllm_omni_tpu.sampling_params import SamplingParams

IMG, VID, AUD = 151655, 151656, 151646
VSTART, ASTART = 151652, 151647
VEND, AEND = 151653, 151648


@pytest.fixture(scope="module")
def tiny_pair():
    import torch
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import (
        Qwen2_5OmniThinkerConfig,
    )
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import (
        Qwen2_5OmniThinkerForConditionalGeneration as HFThinker,
    )

    torch.manual_seed(0)
    cfg = Qwen2_5OmniThinkerConfig(
        audio_token_index=AUD, image_token_index=IMG, video_token_index=VID,
    )
    cfg.vision_start_token_id = VSTART
    cfg.vision_end_token_id = VEND
    cfg.image_token_id = IMG
    cfg.video_token_id = VID
    cfg.audio_token_id = AUD
    tc = cfg.text_config
    tc.num_hidden_layers = 2
    tc.hidden_size = 64
    tc.intermediate_size = 128
    tc.num_attention_heads = 4
    tc.num_key_value_heads = 2
    tc.vocab_size = 151_700
    tc.max_position_embeddings = 512
    tc.rope_scaling = {"mrope_section": [2, 3, 3], "rope_type": "default",
                       "type": "default"}
    ac = cfg.audio_config
    ac.num_mel_bins = 128
    ac.d_model = 48
    ac.encoder_layers = 2
    ac.encoder_attention_heads = 4
    ac.encoder_ffn_dim = 96
    ac.n_window = 25
    ac.output_dim = 64
    ac.max_source_positions = 500
    vc = cfg.vision_config
    vc.depth = 2
    vc.hidden_size = 32
    vc.intermediate_size = 64
    vc.num_heads = 2
    vc.patch_size = 4
    vc.temporal_patch_size = 2
    vc.spatial_merge_size = 2
    vc.window_size = 16
    vc.fullatt_block_indexes = [1]
    vc.out_hidden_size = 64
    vc.in_channels = 3

    hf = HFThinker._from_config(cfg, attn_implementation="sdpa").eval()

    from vllm_omni_tpu.models.qwen2_5_omni.thinker import (
        Qwen2_5OmniThinkerForConditionalGeneration,
    )
    from vllm_omni_tpu.models.qwen2_5_omni.loader import (
        thinker_params_from_tensors,
    )
    from vllm_omni_tpu.config.model import ModelConfig

    cfg_dict = cfg.to_dict()
    cfg_dict["architectures"] = ["Qwen2_5OmniThinkerForConditionalGeneration"]
    mc = ModelConfig(model="tiny-thinker", hf_config=cfg_dict, dtype="float32")
    ours = Qwen2_5OmniThinkerForConditionalGeneration(mc)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = thinker_params_from_tensors(ours, iter(sd.items()))

    args = EngineArgs(
        model="tiny-thinker", hf_config=cfg_dict, dtype="float32",
        model_arch="Qwen2_5OmniThinkerForConditionalGeneration",
        max_num_seqs=2, max_num_batched_tokens=256, block_size=8,
        num_kv_cache_blocks=128,
    )
    llm = LLM(engine_args=args, load_weights=False, model_impl=ours)
    llm.core.runner.params = params
    return hf, llm, cfg


def hf_greedy(hf, ids, n_new, mel=None, patches=None, grid=None,
              video_patches=None, video_grid=None, second_per_grid=None,
              use_audio_in_video=False):
    import torch

    kwargs = {}
    if mel is not None:
        kwargs["input_features"] = torch.from_numpy(mel[None])
        kwargs["feature_attention_mask"] = torch.ones(
            1, mel.shape[1], dtype=torch.long)
    if patches is not None:
        kwargs["pixel_values"] = torch.from_numpy(patches)
        kwargs["image_grid_thw"] = torch.tensor([list(grid)])
    if video_patches is not None:
        kwargs["pixel_values_videos"] = torch.from_numpy(video_patches)
        kwargs["video_grid_thw"] = torch.tensor([list(video_grid)])
        if second_per_grid is not None:
            kwargs["video_second_per_grid"] = torch.tensor(
                [second_per_grid])
    if use_audio_in_video:
        kwargs["use_audio_in_video"] = True
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([ids]),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=n_new, do_sample=False, use_cache=True,
            **kwargs,
        )
    return out[0, len(ids):].tolist()


def test_text_only_parity(tiny_pair):
    hf, llm, _ = tiny_pair
    ids = [10, 20, 30, 40, 50]
    ref = hf_greedy(hf, ids, 5)
    got = llm.generate(
        {"prompt_token_ids": ids},
        SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True,
                       detokenize=False),
    )[0].outputs[0].token_ids
    assert got == ref


def test_audio_image_parity(tiny_pair):
    import torch

    hf, llm, cfg = tiny_pair
    rng = np.random.default_rng(0)
    wav = (rng.uniform(-1, 1, 16000) * 0.3).astype(np.float32)  # 1 s

    from vllm_omni_tpu.multimodal.audio import (
        audio_output_lengths,
        log_mel_spectrogram,
    )

    mel = np.asarray(log_mel_spectrogram(wav))
    n_audio = audio_output_lengths(mel.shape[1])

    grid = (1, 8, 8)
    n_img = grid[0] * (grid[1] // 2) * (grid[2] // 2)
    patch_dim = 3 * 2 * 4 * 4
    patches = rng.normal(size=(grid[0] * grid[1] * grid[2], patch_dim)).astype(
        np.float32)

    ids = [100, ASTART] + [AUD] * n_audio + [AEND, 7, VSTART] + \
        [IMG] * n_img + [VEND, 8, 9]

    ref = hf_greedy(hf, ids, 5, mel=mel, patches=patches, grid=grid)
    got = llm.generate(
        {
            "prompt_token_ids": ids,
            "multi_modal_data": {
                "audio": [wav],
                "image": [{"patches": patches, "grid_thw": grid}],
            },
        },
        SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True,
                       detokenize=False),
    )[0].outputs[0].token_ids
    assert got == ref


def test_video_parity(tiny_pair):
    """Video input (pre-patchified) greedy parity incl. second_per_grid
    M-RoPE time scaling (reference mrope.py:415-587 video branch)."""
    hf, llm, cfg = tiny_pair
    rng = np.random.default_rng(7)
    grid = (3, 8, 8)  # 3 temporal patches
    n_vid = grid[0] * (grid[1] // 2) * (grid[2] // 2)
    patch_dim = 3 * 2 * 4 * 4
    patches = rng.normal(
        size=(grid[0] * grid[1] * grid[2], patch_dim)).astype(np.float32)
    spg = 1.0  # temporal_patch_size / fps = 2/2

    ids = [100, 7, VSTART] + [VID] * n_vid + [VEND, 8, 9]
    ref = hf_greedy(hf, ids, 5, video_patches=patches, video_grid=grid,
                    second_per_grid=spg)
    got = llm.generate(
        {
            "prompt_token_ids": ids,
            "multi_modal_data": {
                "video": [{"patches": patches, "grid_thw": grid}],
                "second_per_grids": [spg],
            },
        },
        SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True,
                       detokenize=False),
    )[0].outputs[0].token_ids
    assert got == ref


def test_video_raw_frames_expansion(tiny_pair):
    """Raw frames + a SINGLE <|VIDEO|> placeholder: the engine must
    preprocess frames and expand the placeholder, matching the
    pre-patchified path exactly."""
    hf, llm, cfg = tiny_pair
    rng = np.random.default_rng(8)
    frames = rng.integers(0, 256, (6, 16, 16, 3), dtype=np.uint8)

    from vllm_omni_tpu.multimodal.processor import preprocess_video

    patches, grid = preprocess_video(
        frames, patch_size=4, merge_size=2, temporal_patch_size=2,
        min_pixels=64, max_pixels=4096)
    n_vid = grid[0] * (grid[1] // 2) * (grid[2] // 2)

    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True,
                        detokenize=False)
    pre = llm.generate(
        {
            "prompt_token_ids": [100, VSTART] + [VID] * n_vid + [VEND, 9],
            "multi_modal_data": {
                "video": [{"patches": patches, "grid_thw": grid}]},
        }, sp.clone())[0].outputs[0].token_ids
    raw = llm.generate(
        {
            "prompt_token_ids": [100, VSTART, VID, VEND, 9],
            "multi_modal_data": {"video": [frames]},
            "mm_processor_kwargs": {
                "video": {"min_pixels": 64, "max_pixels": 4096}},
        }, sp.clone())[0].outputs[0].token_ids
    assert raw == pre


def test_use_audio_in_video_parity(tiny_pair):
    """use_audio_in_video: chunk-interleaved video+audio placeholder run,
    greedy parity vs HF generate(use_audio_in_video=True)."""
    import torch

    hf, llm, cfg = tiny_pair
    rng = np.random.default_rng(9)
    wav = (rng.uniform(-1, 1, 32000) * 0.3).astype(np.float32)  # 2 s

    from vllm_omni_tpu.multimodal.audio import (
        audio_output_lengths,
        log_mel_spectrogram,
    )
    from vllm_omni_tpu.multimodal.processor import (
        build_video_audio_interleave,
    )

    mel = np.asarray(log_mel_spectrogram(wav))
    n_audio = audio_output_lengths(mel.shape[1])

    grid = (4, 8, 8)
    patch_dim = 3 * 2 * 4 * 4
    patches = rng.normal(
        size=(grid[0] * grid[1] * grid[2], patch_dim)).astype(np.float32)
    spg = 1.0

    inter = build_video_audio_interleave(
        grid, n_audio, VID, AUD, second_per_grid=spg, merge_size=2,
        position_id_per_seconds=25, seconds_per_chunk=2.0)
    ids = [100, VSTART, ASTART] + inter + [AEND, VEND, 9]

    ref = hf_greedy(hf, ids, 5, mel=mel, video_patches=patches,
                    video_grid=grid, second_per_grid=spg,
                    use_audio_in_video=True)
    got = llm.generate(
        {
            "prompt_token_ids": ids,
            "multi_modal_data": {
                "video": [{"patches": patches, "grid_thw": grid}],
                "audio": [wav],
                "second_per_grids": [spg],
                "use_audio_in_video": True,
            },
        },
        SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True,
                       detokenize=False),
    )[0].outputs[0].token_ids
    assert got == ref
