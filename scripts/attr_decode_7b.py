"""Decode-step floor attribution at 7B (VERDICT r4 item 6).

The int4gk whole-pool decode step measures ~18.4 ms against a ~4.8 ms packed
weight read + ~6.8 ms decode-cost estimate; this script measures where the
rest goes, by timing each section of the step as its own chained on-TPU
loop (dependency-carried `lax.fori_loop`, one device_get sync per section —
the axon tunnel makes per-dispatch host timing meaningless):

  matmuls  — the 7 packed per-layer projections x 32 layers (q/k/v/o +
             gate/up/down), chained through their outputs: the weight-read
             floor plus per-matmul decode cost
  attn     — KV-cache update + masked decode attention_core x 32 layers
             against the standard 160-slot cache
  eltwise  — 2 rms_norms + rope apply + silu*up per layer + final norm
  head     — token-embedding gather + lm_head [8,4096]@[4096,32000] (NOT
             packed in the serving tier: leaves named embed/lm_head stay
             bf16, 256 MB/step of the floor)

The full-step reference comes from the same session by differencing two
lengths of the standard decode loop (steps=96 vs steps=32 on the same
128-token prompt), which cancels the prefill and dispatch constants.

Usage: python scripts/attr_decode_7b.py [--format "w:int4g;pallas"]
Writes ATTR_DECODE7B.json and prints one line per section.
"""

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import _decode_fn, _decode_throughput  # noqa: E402
from scripts.bench_serving_7b import _device_param_shapes  # noqa: E402

from llm_lns_quantization_tpu.models import ModelBundle, llama  # noqa: E402
from llm_lns_quantization_tpu.models.layers import (  # noqa: E402
    attention_core,
    decode_mask_bias,
    dense,
    update_kv_cache,
)
from llm_lns_quantization_tpu.quant import ActQuantizer, QuantConfig  # noqa: E402
from llm_lns_quantization_tpu.quant.apply import (  # noqa: E402
    NULL_ACT_QUANT,
    quantize_weights,
)

B, PROMPT, STEPS = 8, 128, 32
ITERS = 32  # chained iterations per section loop


def _norm(x):
    # keep the chained carries finite without a meaningful cost
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x.astype(jnp.float32))) + 1.0
                             ).astype(x.dtype)


def _timed(fn, *args, reps=3):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--format", default="w:int4g;pallas")
    ap.add_argument("--out", default="ATTR_DECODE7B.json")
    ap.add_argument("--preset", default="llama2_7b",
                    help="LlamaConfig preset (tiny for a CPU smoke run)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = getattr(llama.LlamaConfig, args.preset)(dtype=jnp.bfloat16)
    quant = QuantConfig.parse(args.format)
    shapes, materialize = _device_param_shapes(cfg, llama)
    params = quantize_weights(shapes, quant, materialize=materialize)
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    actq = ActQuantizer(quant)
    H, F = cfg.hidden_size, cfg.intermediate_size
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    L = cfg.num_hidden_layers
    CACHE = PROMPT + STEPS

    rec = {"format": args.format, "batch": B, "prompt": PROMPT,
           "steps": STEPS, "iters": ITERS}

    # ---- full step by differencing two decode-loop lengths --------------
    bundle = ModelBundle(
        family="llama", cfg=cfg, params=params, forward=llama.forward,
        init_cache=llama.init_cache, max_length=cfg.max_position_embeddings,
        quant_sites=llama.QUANT_SITES,
    )
    rng = np.random.default_rng(1)
    prompt = jnp.asarray(rng.integers(0, 32000, (B, PROMPT)).astype(np.int32))
    tps32 = _decode_throughput(_decode_fn(bundle, actq, B, PROMPT, 32),
                               params, prompt, 32, iters=2)
    tps96 = _decode_throughput(_decode_fn(bundle, actq, B, PROMPT, 96),
                               params, prompt, 96, iters=2)
    t32, t96 = B * 32 / tps32, B * 96 / tps96  # wall per call
    step_ms = (t96 - t32) / 64 * 1000
    rec["decode_tokens_per_s_steps32"] = round(tps32, 1)
    rec["step_ms_prefill_free"] = round(step_ms, 3)

    # ---- matmuls --------------------------------------------------------
    @jax.jit
    def matmuls(params, x0):
        def body(i, x):
            x = _norm(x + i * jnp.asarray(1e-6, x.dtype))
            for lp in params["layers"]:
                q = dense(x, lp["q_proj"], None, NULL_ACT_QUANT, "attn_q")
                k = dense(x, lp["k_proj"], None, NULL_ACT_QUANT, "attn_k")
                v = dense(x, lp["v_proj"], None, NULL_ACT_QUANT, "attn_v")
                a = dense(q, lp["o_proj"], None, NULL_ACT_QUANT, "attn_out")
                # keep k/v live without shape coupling (GQA narrows them)
                a = a + (jnp.sum(k) + jnp.sum(v)).astype(a.dtype) * 1e-9
                g = dense(a, lp["gate_proj"], None, NULL_ACT_QUANT, "mlp_gate")
                u = dense(a, lp["up_proj"], None, NULL_ACT_QUANT, "mlp_up")
                x = _norm(dense(g * u, lp["down_proj"], None, NULL_ACT_QUANT,
                                "mlp_down"))
            return x
        return jax.lax.fori_loop(0, ITERS, body, x0)

    x0 = jnp.asarray(rng.standard_normal((B, 1, H)), jnp.bfloat16)
    rec["matmuls_ms"] = round(_timed(matmuls, params, x0) / ITERS * 1000, 3)

    # ---- attention + cache update --------------------------------------
    cache = [
        (jnp.zeros((B, nh, CACHE, hd), jnp.bfloat16),
         jnp.zeros((B, nh, CACHE, hd), jnp.bfloat16))
        for _ in range(L)
    ]
    idx = jnp.int32(PROMPT + 4)
    scale = 1.0 / float(hd) ** 0.5

    @jax.jit
    def attn(cache, q0):
        bias = decode_mask_bias(1, CACHE, idx, None)

        def body(i, carry):
            q, cache = carry
            q = _norm(q + i * jnp.asarray(1e-6, q.dtype))
            new = []
            for cp in cache:
                k, v, cp2 = update_kv_cache(cp, q, q, idx, q.dtype)
                out = attention_core(q, k, v, scale=scale, mask_bias=bias)
                q = _norm(out.astype(q.dtype))
                new.append(cp2)
            return q, new
        return jax.lax.fori_loop(0, ITERS, body, (q0, cache))

    q0 = jnp.asarray(rng.standard_normal((B, nh, 1, hd)), jnp.bfloat16)
    rec["attn_ms"] = round(_timed(attn, cache, q0) / ITERS * 1000, 3)

    # ---- norms / rope / eltwise ----------------------------------------
    from llm_lns_quantization_tpu.models.layers import rms_norm
    from llm_lns_quantization_tpu.models.llama import (
        _apply_rope,
        _rope_tables,
    )

    g1 = params["layers"][0]["input_norm"]
    positions = jnp.full((B, 1), PROMPT + 4, jnp.int32)

    @jax.jit
    def eltwise(x0, gu0):
        cos, sin = _rope_tables(cfg, positions, NULL_ACT_QUANT)

        def body(i, carry):
            x, gu = carry
            x = x + i * jnp.asarray(1e-6, x.dtype)
            for _ in range(L):
                h = rms_norm(x, g1, cfg.rms_norm_eps)
                h = rms_norm(x + h, g1, cfg.rms_norm_eps)
                q = jnp.broadcast_to(h[:, :, None, :hd], (B, 1, nh, hd))
                q = _apply_rope(q, cos, sin)  # [B, T, heads, D] layout
                act = jax.nn.silu(gu.astype(jnp.float32)).astype(x.dtype)
                gu = _norm(act * gu)
                x = _norm(h + jnp.sum(q).astype(h.dtype) * 1e-9)
            return x, gu
        return jax.lax.fori_loop(0, ITERS, body, (x0, gu0))

    gu0 = jnp.asarray(rng.standard_normal((B, 1, F)), jnp.bfloat16)
    rec["eltwise_ms"] = round(_timed(eltwise, x0, gu0) / ITERS * 1000, 3)

    # ---- embed gather + lm_head ----------------------------------------
    toks = jnp.asarray(rng.integers(0, 32000, (B, 1)).astype(np.int32))

    @jax.jit
    def head(params, toks):
        def body(i, carry):
            t, acc = carry
            x = params["embed"][t].astype(cfg.dtype)
            logits = jnp.dot(x, params["lm_head"],
                             preferred_element_type=jnp.float32)
            t = jnp.argmax(logits[:, 0, :], axis=-1).astype(jnp.int32)[:, None]
            return t, acc + logits[0, 0, 0]
        return jax.lax.fori_loop(0, ITERS, body,
                                 (toks, jnp.float32(0)))

    rec["head_ms"] = round(_timed(head, params, toks) / ITERS * 1000, 3)

    rec["sections_sum_ms"] = round(
        rec["matmuls_ms"] + rec["attn_ms"] + rec["eltwise_ms"]
        + rec["head_ms"], 3)
    rec["residual_ms"] = round(rec["step_ms_prefill_free"]
                               - rec["sections_sum_ms"], 3)
    rec["ts"] = int(time.time())
    print(json.dumps(rec), flush=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
