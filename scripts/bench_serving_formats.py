"""Serving-regime decode throughput per quant format at 1.5B (gpt2-xl).

In-model methodology (see BASELINE.md): batch-8 greedy KV-cache decode after
a 128-token prompt, measured per format against the same-session bf16
baseline. Usage:

    python scripts/bench_serving_formats.py [fmt ...]

where each fmt is a QuantConfig spec like ``w:lns8;pallas`` (default: the
full serving table). Prints one JSON line per format.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import _decode_fn, _decode_throughput  # noqa: E402


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from llm_lns_quantization_tpu.models import build_model
    from llm_lns_quantization_tpu.quant import ActQuantizer, QuantConfig

    specs = sys.argv[1:] or [
        "w:w8a8;pallas", "w:fp8;pallas", "w:lns8;pallas",
        "w:lns4;pallas", "w:fp4;pallas",
    ]
    DB, DP, DS = 8, 128, 32
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, 50000, (DB, DP)).astype(np.int32))

    t0 = time.time()
    base = build_model(family="gpt2", preset="xl", dtype=jnp.bfloat16)
    base_dec = _decode_throughput(
        _decode_fn(base, ActQuantizer(QuantConfig()), DB, DP, DS),
        base.params, prompt, DS, iters=4,
    )
    print(json.dumps({"format": "bf16", "decode_tokens_per_s": round(base_dec, 1),
                      "t_wall_s": round(time.time() - t0, 1)}), flush=True)

    for spec in specs:
        t0 = time.time()
        quant = QuantConfig.parse(spec)
        q = build_model(family="gpt2", preset="xl", dtype=jnp.bfloat16,
                        quant=quant)
        q_dec = _decode_throughput(
            _decode_fn(q, ActQuantizer(quant), DB, DP, DS),
            q.params, prompt, DS, iters=4,
        )
        del q
        print(json.dumps({
            "format": spec,
            "decode_tokens_per_s": round(q_dec, 1),
            "vs_bf16": round(q_dec / base_dec, 4),
            "t_wall_s": round(time.time() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
