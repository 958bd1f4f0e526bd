"""Talker parity: HF Qwen2_5OmniTalker generate vs our engine fed by the
thinker2talker construction, from identical synthetic thinker outputs."""

import numpy as np
import pytest

from vllm_omni_tpu.config.engine import EngineArgs
from vllm_omni_tpu.engine.llm import LLM
from vllm_omni_tpu.sampling_params import SamplingParams

H = 64  # thinker embedding size == talker hidden for the tiny config


@pytest.fixture(scope="module")
def hf_talker():
    import torch
    from transformers import Qwen2_5OmniTalkerConfig
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import (
        Qwen2_5OmniTalkerForConditionalGeneration as HFTalker,
    )

    torch.manual_seed(1)
    cfg = Qwen2_5OmniTalkerConfig(
        vocab_size=256, embedding_size=H, hidden_size=H,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, head_dim=16,
        max_position_embeddings=512,
        rope_scaling={"mrope_section": [2, 3, 3], "rope_type": "default",
                      "type": "default"},
        tts_codec_start_token_id=193, tts_codec_end_token_id=194,
        tts_codec_pad_token_id=192, tts_codec_mask_token_id=196,
        tts_text_start_token_id=151860, tts_text_end_token_id=151861,
        tts_text_pad_token_id=151859,
    )
    return HFTalker._from_config(cfg, attn_implementation="sdpa").eval(), cfg


@pytest.fixture(scope="module")
def our_talker(hf_talker):
    hf, cfg = hf_talker
    from vllm_omni_tpu.models.qwen2_5_omni.talker import (
        Qwen2_5OmniTalkerForConditionalGeneration,
    )
    from vllm_omni_tpu.models.qwen2_5_omni.loader import (
        talker_params_from_tensors,
    )

    cfg_dict = cfg.to_dict()
    cfg_dict["architectures"] = ["Qwen2_5OmniTalkerForConditionalGeneration"]
    args = EngineArgs(
        model="tiny-talker", hf_config=cfg_dict, dtype="float32",
        max_num_seqs=2, max_num_batched_tokens=128, block_size=8,
        num_kv_cache_blocks=128,
    )
    from vllm_omni_tpu.config.model import ModelConfig

    model = Qwen2_5OmniTalkerForConditionalGeneration(
        ModelConfig(model="tiny-talker", hf_config=dict(cfg_dict),
                    dtype="float32"))
    llm = LLM(engine_args=args, load_weights=False, model_impl=model)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    llm.core.runner.params = talker_params_from_tensors(model, iter(sd.items()))
    return llm


def test_talker_greedy_parity(hf_talker, our_talker):
    import torch

    hf, cfg = hf_talker
    llm = our_talker
    model = llm.core.runner.model
    params = llm.core.runner.params

    rng = np.random.default_rng(0)
    P = 6          # thinker prompt length
    n_reply = 5    # thinker generated tokens
    prompt_part = rng.normal(size=(1, P, H)).astype(np.float32) * 0.5
    reply = rng.normal(size=(1, n_reply - 1, H)).astype(np.float32) * 0.5
    tts_bos_embed = rng.normal(size=(1, 1, H)).astype(np.float32) * 0.5
    tts_eos_embed = rng.normal(size=(1, 1, H)).astype(np.float32) * 0.5
    tts_pad_embed = rng.normal(size=(1, 1, H)).astype(np.float32) * 0.5
    thinker_prompt_ids = [5, 6, 7, 8, 9, 10]
    first_gen = 11

    # ---- HF side (mirrors Qwen2_5OmniForConditionalGeneration.generate)
    talker_input_text_ids = torch.tensor(
        [thinker_prompt_ids + [cfg.tts_text_start_token_id, first_gen]])
    talker_input_ids = torch.tensor(
        [[cfg.tts_codec_mask_token_id] * P
         + [cfg.tts_codec_pad_token_id, cfg.tts_codec_start_token_id]])
    talker_inputs_embeds = torch.from_numpy(np.concatenate(
        [prompt_part, tts_bos_embed, reply[:, :1]], axis=1))
    thinker_reply_part = torch.from_numpy(np.concatenate(
        [reply[:, 1:], tts_eos_embed, tts_pad_embed], axis=1))
    with torch.no_grad():
        hf_out = hf.generate(
            input_ids=talker_input_ids,
            input_text_ids=talker_input_text_ids,
            thinker_reply_part=thinker_reply_part,
            inputs_embeds=talker_inputs_embeds.clone(),
            attention_mask=torch.ones(1, P + 2, dtype=torch.long),
            max_new_tokens=8, do_sample=False,
            eos_token_id=None, suppress_tokens=None,
        )
    ref = hf_out[0, P + 2:].tolist()

    # ---- our side: same construction as thinker2talker
    import jax.numpy as jnp

    codec_pad_embed = np.asarray(model.codec_embedding(
        params, [cfg.tts_codec_pad_token_id]))[0]
    codec_bos_embed = np.asarray(model.codec_embedding(
        params, [cfg.tts_codec_start_token_id]))[0]
    prefill = np.concatenate([
        prompt_part[0],
        tts_bos_embed[0] + codec_pad_embed[None],
        reply[0, :1] + codec_bos_embed[None],
    ])
    decode_embeds = np.concatenate(
        [reply[0, 1:], tts_eos_embed[0], tts_pad_embed[0]])

    from vllm_omni_tpu.multimodal.mrope import (
        MRopeParams, MRopeTokenIds, compute_mrope_positions,
    )

    positions, delta = compute_mrope_positions(
        thinker_prompt_ids + [cfg.tts_text_start_token_id, first_gen],
        MRopeParams(tokens=MRopeTokenIds(1, 2, 3, 4, 5)),
    )
    got = llm.generate(
        {
            "prompt_token_ids": [cfg.tts_codec_mask_token_id] * P
            + [cfg.tts_codec_pad_token_id, cfg.tts_codec_start_token_id],
            "prompt_embeds": prefill,
            "additional_information": {
                "decode_embeds": decode_embeds,
                "mrope_positions": positions,
                "mrope_delta": delta,
            },
        },
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                       detokenize=False),
    )[0].outputs[0].token_ids
    assert got == ref
