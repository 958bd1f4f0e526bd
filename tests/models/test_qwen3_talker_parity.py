"""Qwen3-Omni talker + MTP code-predictor parity vs HF.

Oracle: transformers Qwen3OmniMoeTalkerForConditionalGeneration
(generate with do_sample=False and the code predictor patched to
greedy), from identical random weights."""

import numpy as np
import pytest

import jax.numpy as jnp

H = 64  # talker hidden == predictor hidden (HF feeds talker states in)
TH = 48  # thinker hidden
NQ = 4  # num_code_groups
V = 64  # codec vocab
EOS = 50


def _talker_cfg_dict():
    return {
        "num_code_groups": NQ,
        "thinker_hidden_size": TH,
        "accept_hidden_layer": 1,
        "codec_eos_token_id": EOS,
        "codec_pad_id": 51, "codec_bos_id": 52, "codec_nothink_id": 53,
        "codec_think_bos_id": 54, "codec_think_eos_id": 55,
        "spatial_merge_size": 2,
        "text_config": {
            "hidden_size": H, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "head_dim": 16, "intermediate_size": 96,
            "moe_intermediate_size": 32,
            "shared_expert_intermediate_size": 48,
            "num_experts": 8, "num_experts_per_tok": 2,
            "norm_topk_prob": False, "vocab_size": V,
            "rope_theta": 10000.0, "max_position_embeddings": 512,
            "rope_scaling": {"rope_type": "default",
                             "mrope_section": [2, 3, 3]},
        },
        "code_predictor_config": {
            "hidden_size": H, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "head_dim": 16, "intermediate_size": 96,
            "num_code_groups": NQ, "vocab_size": 32,
            "rope_theta": 10000.0, "rms_norm_eps": 1e-6,
            "max_position_embeddings": 64,
        },
    }


@pytest.fixture(scope="module")
def hf_talker():
    import torch
    from transformers import Qwen3OmniMoeTalkerConfig
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeTalkerForConditionalGeneration as HFTalker,
    )

    torch.manual_seed(3)
    cfg = Qwen3OmniMoeTalkerConfig(**_talker_cfg_dict())
    hf = HFTalker._from_config(cfg, attn_implementation="sdpa").eval()
    return hf, cfg


@pytest.fixture(scope="module")
def our_engine(hf_talker):
    hf, _ = hf_talker
    from vllm_omni_tpu.models.qwen3_omni.talker_engine import TalkerEngine

    eng = TalkerEngine(
        {"talker_config": _talker_cfg_dict()}, load_weights=False,
        dtype=jnp.float32, max_len=256, predictor_greedy=True,
        suppress_special=False,
    )
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    eng.params = eng.model.load_from_state_dict(sd)
    return eng


def test_predictor_forward_parity(hf_talker, our_engine):
    import torch

    hf, _ = hf_talker
    rng = np.random.default_rng(0)
    embeds = rng.normal(size=(1, 3, H)).astype(np.float32) * 0.3
    with torch.no_grad():
        out = hf.code_predictor(inputs_embeds=torch.tensor(embeds))
    # generation_steps = 3 - 2 = 1 -> lm_head[1]
    model = our_engine.model.predictor
    params = our_engine.params["code_predictor"]
    S = NQ + 1
    buf = np.zeros((S, H), np.float32)
    buf[:3] = embeds[0]
    hid = model.forward(params, jnp.asarray(buf), valid_len=jnp.int32(3))
    logits = np.asarray(jnp.dot(hid[:3], params["heads"][1]))
    np.testing.assert_allclose(
        logits, out.logits[0].numpy(), rtol=2e-4, atol=2e-4)


def test_talker_prefill_parity(hf_talker, our_engine):
    import torch

    hf, _ = hf_talker
    rng = np.random.default_rng(1)
    T = 7
    embeds = rng.normal(size=(1, T, H)).astype(np.float32) * 0.3
    ids = rng.integers(0, 40, size=(1, T))
    with torch.no_grad():
        out = hf(
            inputs_embeds=torch.tensor(embeds),
            attention_mask=torch.ones(1, T, dtype=torch.long),
            talker_input_ids=torch.tensor(ids),
            use_cache=False,
        )
    model = our_engine.model
    kv = model.init_cache(16)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.float32), (3, T))
    hid, _ = model.forward(
        our_engine.params, jnp.asarray(embeds[0]), pos, kv, jnp.int32(0))
    logits = np.asarray(model.logits(our_engine.params, hid))
    np.testing.assert_allclose(
        logits, out.logits[0].numpy(), rtol=2e-4, atol=2e-4)


def test_talker_generate_parity(hf_talker, our_engine):
    import torch

    hf, _ = hf_talker
    # force the MTP predictor greedy so the whole pipeline is deterministic
    orig = hf.code_predictor.generate

    def greedy_gen(**kw):
        kw.update(do_sample=False, top_k=None, top_p=None)
        return orig(**kw)

    hf.code_predictor.generate = greedy_gen
    try:
        rng = np.random.default_rng(2)
        T = 6
        embeds = rng.normal(size=(1, T, H)).astype(np.float32) * 0.3
        trailing = rng.normal(size=(1, 2, H)).astype(np.float32) * 0.3
        tts_pad = rng.normal(size=(1, 1, H)).astype(np.float32) * 0.3
        ids = rng.integers(0, 40, size=(1, T))
        K = 5  # total code-0 tokens -> K-1 frames
        with torch.no_grad():
            res = hf.generate(
                inputs_embeds=torch.tensor(embeds),
                attention_mask=torch.ones(1, T, dtype=torch.long),
                talker_input_ids=torch.tensor(ids),
                trailing_text_hidden=torch.tensor(trailing),
                tts_pad_embed=torch.tensor(tts_pad),
                max_new_tokens=K, do_sample=False,
                eos_token_id=EOS, suppress_tokens=None,
                repetition_penalty=1.05,
                output_hidden_states=True, return_dict_in_generate=True,
            )
        hf_frames = [hid[-1][0].numpy() for hid in res.hidden_states
                     if hid[-1] is not None]
        hf_codes = np.stack(hf_frames, axis=1)  # [NQ, n_frames]
    finally:
        hf.code_predictor.generate = orig

    from vllm_omni_tpu.sampling_params import SamplingParams

    prompt = {
        "inputs_embeds": embeds[0],
        "mrope_positions": np.broadcast_to(
            np.arange(T, dtype=np.float32), (3, T)),
        "mrope_delta": 0,
        "trailing_text_hidden": trailing[0],
        "tts_pad_embed": tts_pad[0, 0],
    }
    sp = SamplingParams(temperature=0.0, repetition_penalty=1.05,
                        max_tokens=K - 1)
    out = our_engine.generate([prompt], [sp])[0]
    ours = out.outputs[0].multimodal_output["codes"]
    np.testing.assert_array_equal(ours, hf_codes)
