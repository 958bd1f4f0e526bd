"""On-chip parity check: chunked pallas ragged prefill kernel vs the
XLA reference at realistic shapes (the interpret-mode unit tests cover
tiny shapes; this validates the compiled kernel on real hardware).

Usage: python benchmarks/check_ragged_onchip.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax.numpy as jnp

    from vllm_omni_tpu.ops.attention.pallas_ragged import (
        ragged_paged_attention_pallas,
    )
    from vllm_omni_tpu.ops.attention.ragged_paged import (
        ragged_paged_attention_ref,
    )
    from tests.ops.test_ragged_paged_attention import build_case

    rng = np.random.default_rng(0)
    results = {}
    cases = {
        # (ctx_len, q_len) per sequence; mixed prefill+decode rows
        "prefill_2048": ([(0, 2048)], 2048),
        "chunked_mid": ([(1024, 512), (0, 512)], 1024),
        "mixed": ([(0, 384), (700, 1), (256, 127)], 512),
    }
    for name, (seqs, T_pad) in cases.items():
        inputs, _, T = build_case(
            rng, seqs, Hq=16, Hkv=8, D=128, block_size=16,
            max_blocks=192, T_pad=T_pad,
        )
        args = {k: jnp.asarray(v) for k, v in inputs.items()}
        # bf16 like production; reference in f32 on the same bf16 inputs
        args_bf16 = dict(args)
        for k in ("q", "k_cache", "v_cache"):
            args_bf16[k] = args[k].astype(jnp.bfloat16)
        scale = 1.0 / np.sqrt(128)
        ref = ragged_paged_attention_ref(**args_bf16, scale=scale)
        out = ragged_paged_attention_pallas(**args_bf16, scale=scale)
        g = np.asarray(out[:T], np.float32)
        r = np.asarray(ref[:T], np.float32)
        err = float(np.abs(g - r).max() / (np.abs(r).max() + 1e-9))
        results[name] = round(err, 6)
        assert err < 2e-2, (name, err)
    print(json.dumps({"metric": "ragged_kernel_onchip_parity",
                      "rel_max_err": results, "ok": True}))


if __name__ == "__main__":
    main()
