"""Qwen3-Omni MoE thinker parity: HF generate vs our engine (MoE text +
AuT audio + deepstack vision + interleaved M-RoPE)."""

import numpy as np
import pytest

from vllm_omni_tpu.config.engine import EngineArgs
from vllm_omni_tpu.engine.llm import LLM
from vllm_omni_tpu.sampling_params import SamplingParams

IMG, VID, AUD = 151655, 151656, 151646
VSTART, ASTART = 151652, 151647
VEND, AEND = 151653, 151648


@pytest.fixture(scope="module")
def tiny_pair():
    import torch
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import (
        Qwen3OmniMoeThinkerConfig,
    )
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeThinkerForConditionalGeneration as HFThinker,
    )

    torch.manual_seed(0)
    cfg = Qwen3OmniMoeThinkerConfig(
        audio_token_id=AUD, image_token_id=IMG, video_token_id=VID,
        vision_start_token_id=VSTART, vision_end_token_id=VEND,
        audio_start_token_id=ASTART, audio_end_token_id=AEND,
    )
    tc = cfg.text_config
    tc.num_hidden_layers = 2
    tc.hidden_size = 64
    tc.intermediate_size = 128
    tc.moe_intermediate_size = 32
    tc.num_experts = 8
    tc.num_experts_per_tok = 2
    tc.num_attention_heads = 4
    tc.num_key_value_heads = 2
    tc.head_dim = 16
    tc.vocab_size = 151_700
    tc.max_position_embeddings = 512
    tc.rope_scaling = {"mrope_section": [2, 3, 3],
                       "mrope_interleaved": True,
                       "rope_type": "default", "type": "default"}
    ac = cfg.audio_config
    ac.num_mel_bins = 128
    ac.d_model = 48
    ac.encoder_layers = 2
    ac.encoder_attention_heads = 4
    ac.encoder_ffn_dim = 96
    ac.n_window = 50
    ac.n_window_infer = 200
    ac.downsample_hidden_size = 16
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
    vc.out_hidden_size = 64
    vc.num_position_embeddings = 64
    vc.deepstack_visual_indexes = [0, 1]

    hf = HFThinker._from_config(cfg, attn_implementation="sdpa").eval()

    from vllm_omni_tpu.models.qwen3_omni.thinker import (
        Qwen3OmniMoeThinkerForConditionalGeneration,
    )
    from vllm_omni_tpu.models.qwen3_omni.loader import (
        thinker_params_from_tensors,
    )
    from vllm_omni_tpu.config.model import ModelConfig

    cfg_dict = cfg.to_dict()
    cfg_dict["architectures"] = [
        "Qwen3OmniMoeThinkerForConditionalGeneration"]
    mc = ModelConfig(model="tiny-q3t", hf_config=cfg_dict, dtype="float32")
    ours = Qwen3OmniMoeThinkerForConditionalGeneration(mc)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = thinker_params_from_tensors(ours, iter(sd.items()))

    args = EngineArgs(
        model="tiny-q3t", hf_config=cfg_dict, dtype="float32",
        model_arch="Qwen3OmniMoeThinkerForConditionalGeneration",
        max_num_seqs=2, max_num_batched_tokens=256, block_size=8,
        num_kv_cache_blocks=128,
    )
    llm = LLM(engine_args=args, load_weights=False, model_impl=ours)
    llm.core.runner.params = params
    return hf, llm, cfg


def hf_greedy(hf, ids, n_new, mel=None, patches=None, grid=None):
    import torch

    kwargs = {}
    if mel is not None:
        kwargs["input_features"] = torch.from_numpy(mel[None].copy())
        kwargs["feature_attention_mask"] = torch.ones(
            1, mel.shape[1], dtype=torch.long)
    if patches is not None:
        kwargs["pixel_values"] = torch.from_numpy(patches)
        kwargs["image_grid_thw"] = torch.tensor([list(grid)])
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


def test_audio_image_deepstack_parity(tiny_pair):
    hf, llm, cfg = tiny_pair
    rng = np.random.default_rng(0)
    wav = (rng.uniform(-1, 1, 16000) * 0.3).astype(np.float32)

    from vllm_omni_tpu.multimodal.audio import log_mel_spectrogram
    from vllm_omni_tpu.multimodal.mrope import _audio_len_qwen3

    mel = np.asarray(log_mel_spectrogram(wav))
    n_audio = _audio_len_qwen3(mel.shape[1])

    grid = (1, 8, 8)
    n_img = grid[0] * (grid[1] // 2) * (grid[2] // 2)
    patch_dim = 3 * 2 * 4 * 4
    patches = rng.normal(
        size=(grid[0] * grid[1] * grid[2], patch_dim)).astype(np.float32)

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
