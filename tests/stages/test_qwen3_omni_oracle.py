"""Full Qwen3-Omni orchestration oracle: HF
Qwen3OmniMoeForConditionalGeneration.generate(return_audio=True) vs our
3-stage Omni pipeline (thinker -> thinker2talker -> talker -> code2wav)
with identical random weights, all greedy.

Validates end-to-end: thinker latent emission incl. the
accept_hidden_layer capture, the chatml segmentation + projections in
thinker2talker, the talker MTP decode loop (suppression + repetition
penalty), the frame flattening, and the code2wav vocoder."""

import numpy as np
import pytest

import jax.numpy as jnp

TH = 64   # thinker hidden
H = 64    # talker hidden
NQ = 4
TVOCAB = 256      # thinker vocab
CVOCAB = 1088     # talker codec vocab (>1024 so HF suppression is sane)
EOS_CODEC = 1040  # inside the suppressed tail but explicitly allowed
IM_START, SYSTEM, USER, ASSISTANT = 90, 91, 92, 93
TTS_BOS, TTS_EOS, TTS_PAD = 94, 95, 96
THINKER_EOS = 255

THINKER_CFG = {
    "audio_token_id": 151646, "image_token_id": 151655,
    "video_token_id": 151656, "vision_start_token_id": 151652,
    "vision_end_token_id": 151653, "audio_start_token_id": 151647,
    "audio_end_token_id": 151648,
    "text_config": {
        "hidden_size": TH, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "head_dim": 16, "intermediate_size": 128,
        "moe_intermediate_size": 32, "num_experts": 8,
        "num_experts_per_tok": 2, "vocab_size": TVOCAB,
        "max_position_embeddings": 512, "eos_token_id": THINKER_EOS,
        "rope_theta": 1000000.0,  # the HF Qwen3OmniMoeTextConfig default
        "rope_scaling": {"mrope_section": [2, 3, 3],
                         "mrope_interleaved": True,
                         "rope_type": "default", "type": "default"},
    },
    "audio_config": {
        "num_mel_bins": 128, "d_model": 48, "encoder_layers": 1,
        "encoder_attention_heads": 4, "encoder_ffn_dim": 96,
        "n_window": 50, "n_window_infer": 200,
        "downsample_hidden_size": 16, "output_dim": TH,
        "max_source_positions": 500,
    },
    "vision_config": {
        "depth": 1, "hidden_size": 32, "intermediate_size": 64,
        "num_heads": 2, "patch_size": 4, "temporal_patch_size": 2,
        "spatial_merge_size": 2, "out_hidden_size": TH,
        "num_position_embeddings": 64, "deepstack_visual_indexes": [0],
    },
}

TALKER_CFG = {
    "num_code_groups": NQ,
    "thinker_hidden_size": TH,
    "accept_hidden_layer": 1,
    "codec_eos_token_id": EOS_CODEC,
    "codec_pad_id": 1025, "codec_bos_id": 1026, "codec_nothink_id": 1027,
    "codec_think_bos_id": 1028, "codec_think_eos_id": 1029,
    "speaker_id": {"ethan": 1030},
    "spatial_merge_size": 2,
    "text_config": {
        "hidden_size": H, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "head_dim": 16, "intermediate_size": 96,
        "moe_intermediate_size": 32,
        "shared_expert_intermediate_size": 48,
        "num_experts": 8, "num_experts_per_tok": 2,
        "norm_topk_prob": False, "vocab_size": CVOCAB,
        "max_position_embeddings": 512,
        "rope_scaling": {"rope_type": "default",
                         "mrope_section": [2, 3, 3]},
    },
    "code_predictor_config": {
        "hidden_size": H, "num_hidden_layers": 1,
        "num_attention_heads": 2, "num_key_value_heads": 1,
        "head_dim": 16, "intermediate_size": 64,
        "num_code_groups": NQ, "vocab_size": 32,
        "max_position_embeddings": 64,
    },
}

C2W_CFG = {
    "codebook_size": 64, "num_quantizers": NQ, "hidden_size": 32,
    "num_hidden_layers": 1, "num_attention_heads": 2,
    "num_key_value_heads": 2, "intermediate_size": 64,
    "sliding_window": 8, "max_position_embeddings": 512,
    "decoder_dim": 32, "upsample_rates": [3, 2],
    "upsampling_ratios": [2], "layer_scale_initial_scale": 0.01,
}

TOP = {
    "im_start_token_id": IM_START, "system_token_id": SYSTEM,
    "user_token_id": USER, "assistant_token_id": ASSISTANT,
    "tts_bos_token_id": TTS_BOS, "tts_eos_token_id": TTS_EOS,
    "tts_pad_token_id": TTS_PAD,
}

OMNI_CFG = {
    "thinker_config": THINKER_CFG, "talker_config": TALKER_CFG,
    "code2wav_config": C2W_CFG, **TOP,
}

PROMPT = (
    [IM_START, SYSTEM, 5, 6]
    + [IM_START, USER, 10, 11, 12, 13]
    + [IM_START, ASSISTANT, 20]
)
N_TEXT = 4   # thinker tokens
N_CODE0 = 4  # talker code-0 tokens -> <= 3 frames


@pytest.fixture(scope="module")
def hf_omni():
    import torch
    from transformers import Qwen3OmniMoeConfig
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeForConditionalGeneration as HFOmni,
    )

    torch.manual_seed(7)
    cfg = Qwen3OmniMoeConfig(
        thinker_config=THINKER_CFG, talker_config=TALKER_CFG,
        code2wav_config=C2W_CFG, enable_audio_output=True, **TOP,
    )
    hf = HFOmni._from_config(cfg, attn_implementation="sdpa").eval()
    return hf


def _hf_generate(hf):
    import torch

    orig = hf.talker.code_predictor.generate

    def greedy_gen(**kw):
        kw.update(do_sample=False, top_k=None, top_p=None)
        return orig(**kw)

    hf.talker.code_predictor.generate = greedy_gen
    try:
        with torch.no_grad():
            thinker_result, wav = hf.generate(
                input_ids=torch.tensor([PROMPT]),
                speaker="Ethan",
                return_audio=True,
                thinker_max_new_tokens=N_TEXT,
                thinker_eos_token_id=THINKER_EOS,
                thinker_do_sample=False,
                talker_do_sample=False,
                talker_max_new_tokens=N_CODE0,
                talker_repetition_penalty=1.05,
            )
    finally:
        hf.talker.code_predictor.generate = orig
    text_ids = thinker_result.sequences[0, len(PROMPT):].tolist()
    return text_ids, wav.numpy().reshape(-1)


def _our_pipeline(hf):
    from vllm_omni_tpu.config.engine import EngineArgs
    from vllm_omni_tpu.config.model import ModelConfig
    from vllm_omni_tpu.config.stage import StageConfig
    from vllm_omni_tpu.engine.llm import LLM
    from vllm_omni_tpu.models.qwen3_omni.code2wav import Qwen3OmniMoeCode2Wav
    from vllm_omni_tpu.models.qwen3_omni.code2wav_engine import Code2WavEngine
    from vllm_omni_tpu.models.qwen3_omni.loader import (
        thinker_params_from_tensors,
    )
    from vllm_omni_tpu.models.qwen3_omni.talker_engine import TalkerEngine
    from vllm_omni_tpu.models.qwen3_omni.thinker import (
        Qwen3OmniMoeThinkerForConditionalGeneration,
    )
    from vllm_omni_tpu.sampling_params import SamplingParams
    from vllm_omni_tpu.stages.omni import Omni

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    def sub_sd(prefix):
        return {k[len(prefix):]: v for k, v in sd.items()
                if k.startswith(prefix)}

    thinker_args = EngineArgs(
        model="tiny-thinker", hf_config=OMNI_CFG,
        model_arch="Qwen3OmniMoeThinkerForConditionalGeneration",
        hf_config_name="thinker_config", engine_output_type="latent",
        dtype="float32", max_num_seqs=2, max_num_batched_tokens=128,
        block_size=8, num_kv_cache_blocks=64)

    def factory(cfg):
        if cfg.stage_id == 0:
            mc = ModelConfig(
                model="tiny-thinker", hf_config=OMNI_CFG,
                hf_config_name="thinker_config", dtype="float32",
                engine_output_type="latent",
                model_arch="Qwen3OmniMoeThinkerForConditionalGeneration")
            ours = Qwen3OmniMoeThinkerForConditionalGeneration(mc)
            assert ours.capture_layer == 1
            llm = LLM(engine_args=thinker_args, load_weights=False,
                      model_impl=ours)
            llm.core.runner.params = thinker_params_from_tensors(
                ours, iter(sub_sd("thinker.").items()))
            return llm
        if cfg.stage_id == 1:
            eng = TalkerEngine(
                OMNI_CFG, load_weights=False, dtype=jnp.float32,
                max_len=128, predictor_greedy=True)
            eng.params = eng.model.load_from_state_dict(sub_sd("talker."))
            return eng
        model = Qwen3OmniMoeCode2Wav(C2W_CFG, dtype=jnp.float32)
        return Code2WavEngine(
            hf_config=OMNI_CFG,
            params=model.load_from_state_dict(sub_sd("code2wav.")),
            load_weights=False)

    cfgs = [
        StageConfig(
            stage_id=0, stage_type="llm", engine_args=thinker_args,
            final_output=True, final_output_type="text",
            default_sampling_params={
                "temperature": 0.0, "max_tokens": N_TEXT},
        ),
        StageConfig(
            stage_id=1, stage_type="talker",
            engine_args=EngineArgs(
                model="tiny-talker", hf_config=OMNI_CFG,
                engine_output_type="latent", load_format="random",
                dtype="float32"),
            engine_input_source=[0],
            custom_process_input_func=(
                "vllm_omni_tpu.stages.input_processors."
                "qwen3_omni.thinker2talker"),
            diffusion_args={"speaker": "ethan"},
            default_sampling_params={
                "temperature": 0.0, "max_tokens": N_CODE0 - 1,
                "repetition_penalty": 1.05},
        ),
        StageConfig(
            stage_id=2, stage_type="code2wav",
            engine_args=EngineArgs(
                model="tiny-c2w", hf_config=OMNI_CFG,
                hf_config_name="code2wav_config",
                engine_output_type="audio", load_format="random",
                dtype="float32"),
            engine_input_source=[1],
            custom_process_input_func=(
                "vllm_omni_tpu.stages.input_processors."
                "qwen3_omni.talker2code2wav"),
            final_output=True, final_output_type="audio",
        ),
    ]
    with Omni(stage_configs=cfgs, engine_factory=factory) as omni:
        outs = omni.generate({"prompt_token_ids": list(PROMPT)})
    assert not any(o.error for o in outs), [o.error for o in outs]
    by_stage = {o.stage_id: o for o in outs}
    text_ids = list(by_stage[0].request_output.outputs[0].token_ids)
    wav = np.asarray(by_stage[2].request_output.outputs[0]
                     .multimodal_output["waveform"]).reshape(-1)
    return text_ids, wav


def test_full_omni_oracle(hf_omni):
    hf_text, hf_wav = _hf_generate(hf_omni)
    our_text, our_wav = _our_pipeline(hf_omni)
    assert our_text == hf_text
    assert our_wav.shape == hf_wav.shape
    np.testing.assert_allclose(our_wav, hf_wav, atol=5e-4, rtol=5e-3)
