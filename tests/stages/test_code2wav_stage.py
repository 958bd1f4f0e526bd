"""Qwen3 code2wav one-shot stage engine through the orchestrator."""

import numpy as np

from vllm_omni_tpu.config.engine import EngineArgs
from vllm_omni_tpu.config.stage import StageConfig
from vllm_omni_tpu.stages.omni import Omni

C2W_CFG = {
    "code2wav_config": {
        "codebook_size": 32, "num_quantizers": 4, "hidden_size": 32,
        "num_hidden_layers": 1, "num_attention_heads": 2,
        "num_key_value_heads": 2, "intermediate_size": 64,
        "sliding_window": 8, "max_position_embeddings": 512,
        "decoder_dim": 32, "upsample_rates": [3, 2],
        "upsampling_ratios": [2], "layer_scale_initial_scale": 0.01,
    },
}


def test_code2wav_stage():
    cfgs = [StageConfig(
        stage_id=0, stage_type="code2wav",
        engine_args=EngineArgs(model="tiny-c2w", hf_config=C2W_CFG,
                               load_format="random"),
        final_output=True, final_output_type="audio",
    )]
    rng = np.random.default_rng(0)
    codes = [int(x) for x in rng.integers(0, 32, size=4 * 10)]
    with Omni(stage_configs=cfgs) as omni:
        outs = omni.generate({"prompt_token_ids": codes})
        assert len(outs) == 1, [o.error for o in outs]
        wav = np.asarray(
            outs[0].request_output.outputs[0].multimodal_output["waveform"])
        # causal trans-conv cropping gives (T+1)*s - K per decoder block
        # (HF semantics): 10 codes -> 20 -> 57 -> 112 samples
        assert wav.size == 112
        assert np.isfinite(wav).all()
