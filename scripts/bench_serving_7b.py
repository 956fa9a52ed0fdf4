"""Llama-2-7B serving-regime decode on one chip (BASELINE.json config #3 shape).

Random 7B weights are materialized ONCE on the host with numpy into the
pytree structure given by ``jax.eval_shape`` (a jax.random init of 7B params
on 2 vCPUs takes tens of minutes; numpy fills take ~2), then each format's
packing runs leaf-by-leaf on the TPU (per-leaf transfer keeps peak HBM at
packed-size + one bf16 leaf). Batch-8 greedy KV-cache decode after a
128-token prompt, per format vs the same-session bf16 baseline.

    python scripts/bench_serving_7b.py [fmt ...]   # default: w8a8, fp8, lns8
"""

import gc
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import _decode_fn, _decode_throughput  # noqa: E402


def _host_params(cfg, llama):
    import ml_dtypes

    shapes = jax.eval_shape(
        lambda k: llama.init_params(k, cfg), jax.random.PRNGKey(0)
    )
    rng = np.random.default_rng(0)

    def fill(s):
        a = rng.standard_normal(s.shape, dtype=np.float32) * 0.02
        return a.astype(ml_dtypes.bfloat16)

    return jax.tree_util.tree_map(fill, shapes)


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from llm_lns_quantization_tpu.models import ModelBundle, llama
    from llm_lns_quantization_tpu.quant import ActQuantizer, QuantConfig
    from llm_lns_quantization_tpu.quant.apply import quantize_weights

    tpu = jax.devices()[0]
    specs = sys.argv[1:] or ["w:w8a8;pallas", "w:fp8;pallas", "w:lns8;pallas"]

    cfg = llama.LlamaConfig.llama2_7b(dtype=jnp.bfloat16)
    t0 = time.time()
    host = _host_params(cfg, llama)
    print(f"# host params in {time.time()-t0:.0f}s", flush=True)

    def bundle_with(params):
        return ModelBundle(
            family="llama", cfg=cfg, params=params, forward=llama.forward,
            init_cache=llama.init_cache,
            max_length=cfg.max_position_embeddings,
            quant_sites=llama.QUANT_SITES,
        )

    DB, DP, DS = 8, 128, 32
    rng = np.random.default_rng(1)
    prompt = jnp.asarray(rng.integers(0, 32000, (DB, DP)).astype(np.int32))

    t0 = time.time()
    dev_params = jax.tree_util.tree_map(lambda a: jax.device_put(a, tpu), host)
    jax.block_until_ready(dev_params)
    b = bundle_with(dev_params)
    base_dec = _decode_throughput(
        _decode_fn(b, ActQuantizer(QuantConfig()), DB, DP, DS),
        b.params, prompt, DS, iters=4,
    )
    print(json.dumps({"format": "bf16", "decode_tokens_per_s": round(base_dec, 1),
                      "t_wall_s": round(time.time() - t0, 1)}), flush=True)
    del dev_params, b
    gc.collect()

    for spec in specs:
        t0 = time.time()
        quant = QuantConfig.parse(spec)
        # packing runs on the TPU, one host leaf at a time
        qparams = quantize_weights(host, quant)
        qparams = jax.device_put(qparams, tpu)  # move remaining host leaves
        jax.block_until_ready(qparams)
        qb = bundle_with(qparams)
        q_dec = _decode_throughput(
            _decode_fn(qb, ActQuantizer(quant), DB, DP, DS),
            qb.params, prompt, DS, iters=4,
        )
        del qparams, qb
        gc.collect()
        print(json.dumps({
            "format": spec,
            "decode_tokens_per_s": round(q_dec, 1),
            "vs_bf16": round(q_dec / base_dec, 4),
            "t_wall_s": round(time.time() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
