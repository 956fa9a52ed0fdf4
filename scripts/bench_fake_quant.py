"""Fake-quant emulation tax attribution (VERDICT round-1 item #8).

The LNS8 w+a fake-quant scoring path (the reference's own operating mode —
huggingface.py's in-model STEFunction sites) measured 0.61x bf16 at GPT-2
124M after the transcendental-free rewrite. This script attributes the
remaining tax with the repo's differential in-model methodology (BASELINE.md
"in-model differential attribution is the trustworthy methodology"):

1. bf16 baseline vs full w+a lns8 fake-quant (the 0.61x number);
2. weight-only (runtime-free: weights are fake-quantized once at load) and
   act-only variants;
3. act-only with each QUANT_SITE suppressed one at a time — the per-site
   delta is that site's runtime cost.

Usage: python scripts/bench_fake_quant.py  (runs on the TPU; prints one
JSON line per variant).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import _score_fn, _throughput  # noqa: E402


class _SiteFilter:
    """ActQuantizer wrapper that suppresses quantization at named sites."""

    def __init__(self, inner, skip):
        self.inner = inner
        self.config = inner.config
        self.skip = frozenset(skip)

    def __call__(self, site, x):
        if site in self.skip:
            return x
        return self.inner(site, x)


def main():
    import argparse

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from llm_lns_quantization_tpu.models import build_model
    from llm_lns_quantization_tpu.models import gpt2
    from llm_lns_quantization_tpu.quant import ActQuantizer, QuantConfig

    ap = argparse.ArgumentParser()
    ap.add_argument("--sites", default=None,
                    help="comma-separated site subset for the per-site pass "
                         "(default: all QUANT_SITES); 'none' skips it")
    args = ap.parse_args()
    sites = (gpt2.QUANT_SITES if args.sites is None
             else [] if args.sites == "none" else args.sites.split(","))

    B, T = 8, 1024
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 50000, (B, T)).astype(np.int32))
    targets = jnp.asarray(rng.integers(0, 50000, (B, T)).astype(np.int32))
    mask = jnp.ones((B, T), bool)

    base = build_model(family="gpt2", preset="small", dtype=jnp.bfloat16)

    def run(tag, bundle, actq, base_tps=[None]):
        t0 = time.time()
        tps = _throughput(_score_fn(bundle, actq), bundle.params,
                          tokens, targets, mask)
        rec = {"variant": tag, "tokens_per_s": round(tps, 1),
               "t_wall_s": round(time.time() - t0, 1)}
        if base_tps[0] is None:
            base_tps[0] = tps
        else:
            rec["vs_bf16"] = round(tps / base_tps[0], 4)
        print(json.dumps(rec), flush=True)
        return tps

    run("bf16", base, ActQuantizer(QuantConfig()))

    wa = QuantConfig(weights="lns8", acts="lns8")
    qb = build_model(family="gpt2", preset="small", dtype=jnp.bfloat16,
                     quant=wa)
    aq = ActQuantizer(wa)
    run("lns8 w+a", qb, aq)

    # weight-only: quantized params, identity act sites
    run("lns8 w only", qb, ActQuantizer(QuantConfig()))
    # act-only: bf16 params, quant sites live
    run("lns8 a only", base, aq)

    # per-site attribution on the act-only path (bf16 params isolate the
    # runtime cost; weight fake-quant has no per-step cost)
    for site in sites:
        run(f"a only, -{site}", base, _SiteFilter(aq, [site]))


if __name__ == "__main__":
    main()
