"""Full Qwen2.5-Omni orchestration oracle: HF
Qwen2_5OmniForConditionalGeneration.generate(return_audio=True) vs our
3-stage Omni pipeline (thinker -> thinker2talker -> talker ->
talker2token2wav -> token2wav) from shared random weights, all greedy.

Complements the per-component parity suites by validating the GLUE:
embeds_to_talker construction, codec bos/pad embedding sums, streamed
reply embeds, suppress_tokens, code stripping, speaker conditioning."""

import numpy as np
import pytest

import jax.numpy as jnp

TH = 64  # thinker hidden == talker hidden/embedding (tiny)
MEL = 16

TTS_TEXT_START, TTS_TEXT_END, TTS_TEXT_PAD = 151860, 151861, 151859
CODEC_PAD, CODEC_START, CODEC_END, CODEC_MASK = 192, 193, 194, 196
PROMPT = [5, 6, 7, 8, 9, 10, 11]
N_TEXT = 4
N_CODES = 10


@pytest.fixture(scope="module")
def hf_omni():
    import torch
    from transformers import (
        Qwen2_5OmniConfig,
        Qwen2_5OmniTalkerConfig,
        Qwen2_5OmniThinkerConfig,
        Qwen2_5OmniToken2WavConfig,
    )
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import (
        Qwen2_5OmniForConditionalGeneration as HFOmni,
    )

    torch.manual_seed(11)
    thinker = Qwen2_5OmniThinkerConfig(
        vision_start_token_id=151652, vision_end_token_id=151653,
        audio_start_token_id=151647, audio_end_token_id=151648,
        seconds_per_chunk=2, position_id_per_seconds=25)
    tc = thinker.text_config
    tc.hidden_size = TH
    tc.num_hidden_layers = 2
    tc.layer_types = ["full_attention"] * 2
    tc.num_attention_heads = 4
    tc.num_key_value_heads = 2
    tc.intermediate_size = 128
    tc.vocab_size = 152000
    tc.max_position_embeddings = 512
    tc.rope_scaling = {"mrope_section": [2, 3, 3], "rope_type": "default",
                       "type": "default"}
    ac = thinker.audio_config
    ac.num_mel_bins = 128
    ac.d_model = 32
    ac.encoder_layers = 1
    ac.encoder_attention_heads = 2
    ac.encoder_ffn_dim = 48
    ac.n_window = 25
    ac.output_dim = TH
    ac.max_source_positions = 400
    vc = thinker.vision_config
    vc.depth = 1
    vc.hidden_size = 32
    vc.intermediate_size = 32
    vc.num_heads = 2
    vc.patch_size = 4
    vc.temporal_patch_size = 2
    vc.spatial_merge_size = 2
    vc.window_size = 16
    vc.fullatt_block_indexes = [0]
    vc.out_hidden_size = TH

    talker = Qwen2_5OmniTalkerConfig(
        vocab_size=256, embedding_size=TH, hidden_size=TH,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, head_dim=16, max_position_embeddings=512,
        rope_scaling={"mrope_section": [2, 3, 3], "rope_type": "default",
                      "type": "default"},
        tts_codec_start_token_id=CODEC_START,
        tts_codec_end_token_id=CODEC_END,
        tts_codec_pad_token_id=CODEC_PAD,
        tts_codec_mask_token_id=CODEC_MASK,
        tts_text_start_token_id=TTS_TEXT_START,
        tts_text_end_token_id=TTS_TEXT_END,
        tts_text_pad_token_id=TTS_TEXT_PAD,
    )
    t2w = Qwen2_5OmniToken2WavConfig()
    d = t2w.dit_config
    d.mel_dim = MEL
    d.num_embeds = 256
    d.emb_dim = 24
    d.hidden_size = 64
    d.num_hidden_layers = 2
    d.num_attention_heads = 2
    d.head_dim = 32
    d.ff_mult = 2
    d.block_size = 4
    d.repeats = 2
    d.look_ahead_layers = [1]
    d.look_backward_layers = [0]
    d.enc_dim = 12
    d.enc_emb_dim = 20
    d.enc_channels = [16, 16, 16, 16, 48]
    d.enc_kernel_sizes = [5, 3, 3, 3, 1]
    d.enc_dilations = [1, 2, 3, 4, 1]
    d.enc_res2net_scale = 2
    d.enc_se_channels = 8
    d.enc_attention_channels = 8
    b = t2w.bigvgan_config
    b.mel_dim = MEL
    b.upsample_initial_channel = 32
    b.upsample_rates = [3, 2]
    b.upsample_kernel_sizes = [7, 4]
    b.resblock_kernel_sizes = [3]
    b.resblock_dilation_sizes = [[1, 3, 5]]

    cfg = Qwen2_5OmniConfig(
        thinker_config=thinker.to_dict(), talker_config=talker.to_dict(),
        token2wav_config=t2w.to_dict(), enable_audio_output=True)
    hf = HFOmni._from_config(cfg, attn_implementation="sdpa").eval().float()
    # inject a synthetic speaker (load_speakers reads a .pt in real ckpts)
    import torch as th

    g = th.Generator().manual_seed(5)
    hf.speaker_map["chelsie"] = {
        "cond": th.randn(1, d.enc_emb_dim, generator=g) * 0.5,
        "ref_mel": th.randn(1, 40, MEL, generator=g) * 0.5,
        # speaker-specific tts bos (real ckpts carry one per voice)
        "bos_token": TTS_TEXT_START,
    }
    return hf, cfg


def _hf_generate(hf):
    import torch

    import jax

    # match the flow-ODE initial noise to our engine's (jax key(0),
    # shape-exact) so waveforms are comparable end to end
    real_randn = torch.randn

    def fake_randn(*shape, **kw):
        if shape and shape[0] == 1 and shape[-1] == MEL:
            arr = np.asarray(jax.random.normal(
                jax.random.key(0), tuple(shape)), np.float32)
            return torch.from_numpy(arr)
        return real_randn(*shape, **kw)

    torch.randn = fake_randn
    try:
        return _hf_generate_inner(hf)
    finally:
        torch.randn = real_randn


def _hf_generate_inner(hf):
    import torch

    with torch.no_grad():
        text_ids, wav = hf.generate(
            input_ids=torch.tensor([PROMPT]),
            speaker="chelsie",
            return_audio=True,
            thinker_max_new_tokens=N_TEXT,
            thinker_do_sample=False,
            thinker_eos_token_id=151999,  # never sampled
            talker_max_new_tokens=N_CODES,
            talker_do_sample=False,
            talker_eos_token_id=[CODEC_END, CODEC_PAD],
            talker_repetition_penalty=1.0,
            token2wav_num_steps=2,
        )
    return text_ids[0, len(PROMPT):].tolist(), wav.numpy().reshape(-1)


def _our_pipeline(hf, cfg):
    from vllm_omni_tpu.config.engine import EngineArgs
    from vllm_omni_tpu.config.model import ModelConfig
    from vllm_omni_tpu.config.stage import StageConfig
    from vllm_omni_tpu.engine.llm import LLM
    from vllm_omni_tpu.models.qwen2_5_omni.loader import (
        talker_params_from_tensors,
        thinker_params_from_tensors,
    )
    from vllm_omni_tpu.models.qwen2_5_omni.talker import (
        Qwen2_5OmniTalkerForConditionalGeneration,
    )
    from vllm_omni_tpu.models.qwen2_5_omni.thinker import (
        Qwen2_5OmniThinkerForConditionalGeneration,
    )
    from vllm_omni_tpu.models.qwen2_5_omni.token2wav import (
        Qwen2_5OmniToken2WavModel,
    )
    from vllm_omni_tpu.models.qwen2_5_omni.token2wav_engine import (
        Token2WavEngine,
    )
    from vllm_omni_tpu.stages.omni import Omni

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    def sub(prefix):
        return iter((k[len(prefix):], v) for k, v in sd.items()
                    if k.startswith(prefix))

    thinker_cfg = cfg.thinker_config.to_dict()
    thinker_cfg["architectures"] = [
        "Qwen2_5OmniThinkerForConditionalGeneration"]
    talker_cfg = cfg.talker_config.to_dict()
    talker_cfg["architectures"] = [
        "Qwen2_5OmniTalkerForConditionalGeneration"]
    t2w_cfg = {
        "dit_config": cfg.token2wav_config.dit_config.to_dict(),
        "bigvgan_config": cfg.token2wav_config.bigvgan_config.to_dict(),
    }

    thinker_args = EngineArgs(
        model="tiny-thinker", hf_config=thinker_cfg,
        engine_output_type="latent", dtype="float32", max_num_seqs=2,
        max_num_batched_tokens=128, block_size=8, num_kv_cache_blocks=64)
    talker_args = EngineArgs(
        model="tiny-talker", hf_config=talker_cfg, dtype="float32",
        max_num_seqs=2, max_num_batched_tokens=128, block_size=8,
        num_kv_cache_blocks=64)

    def factory(scfg):
        if scfg.stage_id == 0:
            ours = Qwen2_5OmniThinkerForConditionalGeneration(ModelConfig(
                model="tiny-thinker", hf_config=dict(thinker_cfg),
                dtype="float32", engine_output_type="latent"))
            llm = LLM(engine_args=thinker_args, load_weights=False,
                      model_impl=ours)
            llm.core.runner.params = thinker_params_from_tensors(
                ours, sub("thinker."))
            return llm
        if scfg.stage_id == 1:
            ours = Qwen2_5OmniTalkerForConditionalGeneration(ModelConfig(
                model="tiny-talker", hf_config=dict(talker_cfg),
                dtype="float32"))
            llm = LLM(engine_args=talker_args, load_weights=False,
                      model_impl=ours)
            llm.core.runner.params = talker_params_from_tensors(
                ours, sub("talker."))
            return llm
        model = Qwen2_5OmniToken2WavModel(t2w_cfg, dtype=jnp.float32)
        params = model.load_from_state_dict(
            {k[len("token2wav."):]: v for k, v in sd.items()
             if k.startswith("token2wav.")})
        spk = hf.speaker_map["chelsie"]
        return Token2WavEngine(
            ModelConfig(model="tiny-t2w", hf_config=t2w_cfg,
                        dtype="float32", engine_output_type="audio"),
            load_weights=False, params=params,
            speaker_map={"chelsie": {
                "cond": np.asarray(spk["cond"]),
                "ref_mel": np.asarray(spk["ref_mel"])}},
            num_steps=2)

    cfgs = [
        StageConfig(
            stage_id=0, stage_type="llm", engine_args=thinker_args,
            final_output=True, final_output_type="text",
            default_sampling_params={
                "temperature": 0.0, "max_tokens": N_TEXT,
                "ignore_eos": True, "detokenize": False},
        ),
        StageConfig(
            stage_id=1, stage_type="llm", engine_args=talker_args,
            engine_input_source=[0],
            custom_process_input_func=(
                "vllm_omni_tpu.stages.input_processors.qwen2_5_omni."
                "thinker2talker"),
            final_output=True, final_output_type="text",
            default_sampling_params={
                "temperature": 0.0, "max_tokens": N_CODES,
                "detokenize": False,
                "stop_token_ids": [CODEC_END, CODEC_PAD],
                "ignore_eos": True,
                "suppress_token_ids": [CODEC_START]},
        ),
        StageConfig(
            stage_id=2, stage_type="token2wav",
            engine_args=EngineArgs(
                model="tiny-t2w", hf_config=t2w_cfg, dtype="float32",
                load_format="random"),
            engine_input_source=[1],
            custom_process_input_func=(
                "vllm_omni_tpu.stages.input_processors.qwen2_5_omni."
                "talker2token2wav"),
            diffusion_args={"codec_stop_ids": [CODEC_END, CODEC_PAD]},
            final_output=True, final_output_type="audio",
        ),
    ]
    with Omni(stage_configs=cfgs, engine_factory=factory) as omni:
        outs = omni.generate({
            "prompt_token_ids": list(PROMPT),
            "additional_information": {
                "tts_bos_id": TTS_TEXT_START, "tts_eos_id": TTS_TEXT_END,
                "tts_pad_id": TTS_TEXT_PAD,
            },
        })
    assert not any(o.error for o in outs), [o.error for o in outs]
    by_stage = {o.stage_id: o for o in outs}
    text = list(by_stage[0].request_output.outputs[0].token_ids)
    codes = list(by_stage[1].request_output.outputs[0].token_ids)
    wav = np.asarray(by_stage[2].request_output.outputs[0]
                     .multimodal_output["waveform"]).reshape(-1)
    return text, codes, wav


def test_full_qwen2_5_omni_oracle(hf_omni):
    import torch

    hf, cfg = hf_omni
    hf_text, hf_wav = _hf_generate(hf)
    # HF talker codes for comparison (it drops the final token)
    our_text, our_codes, our_wav = _our_pipeline(hf, cfg)
    assert our_text == hf_text

    # reconstruct HF codes length from the waveform: mel = 2*codes,
    # wav = mel * 6 (upsample 3*2)
    hf_n_codes = hf_wav.size // (2 * 6)
    assert our_wav.shape == hf_wav.shape, (our_wav.shape, hf_wav.shape,
                                           hf_n_codes, our_codes)
    np.testing.assert_allclose(our_wav, hf_wav, atol=2e-3, rtol=2e-2)
