"""Continuous-batching engine throughput vs dispatch granularity (one chip).

Measures lm/serve.py ContinuousBatcher end-to-end (prefill + decode + host
bookkeeping) at the 1.5B serving preset for steps_per_dispatch in {1, 8, 16},
per weight format. The chunked dispatch amortizes the tunnel's ~1 ms
dispatch+sync cost over K tokens; outputs are bit-identical by construction
(tests/test_serve.py::test_chunked_dispatch_invariance).

    python scripts/bench_continuous_batching.py [--preset xl] [--formats ...]
"""

import argparse
import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from llm_lns_quantization_tpu.lm.serve import ContinuousBatcher
    from llm_lns_quantization_tpu.models import build_model
    from llm_lns_quantization_tpu.quant import QuantConfig

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="xl")
    ap.add_argument("--family", default="gpt2")
    ap.add_argument("--formats", nargs="*", default=[None, "w:w8a8;pallas"])
    ap.add_argument("--steps", nargs="*", type=int, default=[1, 8, 16])
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--new_tokens", type=int, default=64)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    # 2x more requests than slots, staggered lengths -> mid-flight admission
    prompts = [
        list(rng.integers(1, 50000, int(n)))
        for n in rng.integers(64, 128, args.slots * 2)
    ]

    for spec in args.formats:
        quant = QuantConfig.parse(spec) if spec else None
        bundle = build_model(
            family=args.family, preset=args.preset, quant=quant, seed=0
        )
        for k in args.steps:
            cb = ContinuousBatcher(
                bundle, quant=quant, slots=args.slots, max_len=256,
                steps_per_dispatch=k,
            )
            # warm ALL compiles in the timed path: same admission pattern
            # (same prefill group sizes + buckets) and the chunk program
            cb.generate(prompts, max_new_tokens=2)
            t0 = time.time()
            outs = cb.generate(prompts, max_new_tokens=args.new_tokens)
            dt = time.time() - t0
            toks = sum(len(o) for o in outs)
            print(json.dumps({
                "format": spec or "bf16",
                "steps_per_dispatch": k,
                "tokens_per_s": round(toks / dt, 1),
                "tokens": toks,
                "t_wall_s": round(dt, 1),
            }), flush=True)
        del bundle


if __name__ == "__main__":
    main()
