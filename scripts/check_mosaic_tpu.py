"""Compiled-Mosaic validation on the real TPU chip (VERDICT round-1 item #9).

The CPU test suite runs every Pallas kernel in interpret mode
(ops/matmul.py _interpret), so two things are never exercised there:
(a) actual Mosaic compilation of the fused kernels, and (b) the cross
product compiled-Mosaic x custom_partitioning (sharded). This script runs
both on the real chip:

1. every fused kernel (lns8/int8/w8a8/mx/fp8 + the kpair tier
   lns4k/fp4k/int4gk/nf4k) compiled by Mosaic at a serving-decode shape,
   checked against the XLA dequant-dot path;
2. one custom_partitioning packed matmul (lns8 + kpair lns4) under a
   1-device jax.sharding.Mesh with the fused kernel forced — the partition
   wrapper's opaque sub-computation must compile and agree with the
   unsharded result.

Prints one JSON line per check; exits non-zero on any mismatch.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from llm_lns_quantization_tpu.ops import matmul as qmm
    from llm_lns_quantization_tpu.ops import packing, tp

    assert jax.devices()[0].platform == "tpu", jax.devices()
    M, K, N = 16, 2048, 2048
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)
    w = jnp.asarray((rng.standard_normal((K, N)) * 0.05).astype(np.float32))
    ok = True

    def check(name, fused_fn, xla_fn, rtol=3e-2, atol=3e-2):
        nonlocal ok
        got = np.asarray(jax.device_get(fused_fn()))
        want = np.asarray(jax.device_get(xla_fn()))
        err = float(np.max(np.abs(got - want)))
        good = np.allclose(got, want, rtol=rtol, atol=atol)
        ok = ok and good
        print(json.dumps({"check": name, "max_abs_err": round(err, 5),
                          "pass": bool(good)}), flush=True)

    # -- fused Mosaic kernels vs XLA path ---------------------------------
    qmm._FUSED_MIN_WEIGHT = 0        # force fused for the byte formats
    qmm._KPAIR_FUSED_MIN_WEIGHT = 0  # and the kpair tier
    ql8 = packing.pack_lns(w)
    q8 = packing.pack_int8(w)
    qmx = packing.pack_mx(w)
    qf8 = packing.pack_fp8(w)
    q4k = packing.pack_lns4k(w)
    qf4k = packing.pack_fp4k(w)
    qgk = packing.pack_int4gk(w)
    qnk = packing.pack_nf4k(w)

    def xla_only():
        qmm._FUSED_MIN_WEIGHT = 1 << 62
        qmm._KPAIR_FUSED_MIN_WEIGHT = 1 << 62

    def fused_only():
        qmm._FUSED_MIN_WEIGHT = 0
        qmm._KPAIR_FUSED_MIN_WEIGHT = 0

    cases = [
        ("lns8", lambda: qmm.lns_matmul(x, ql8.codes, frac_bits=3)),
        ("int8", lambda: qmm.int8_matmul(x, q8.codes, q8.scale)),
        ("w8a8", lambda: qmm.w8a8_matmul(x, q8.codes, q8.scale)),
        ("mx", lambda: qmm.mx_matmul(x, qmx.codes, qmx.bscale)),
        ("fp8", lambda: qmm.fp8_matmul(x, qf8.codes)),
        ("lns4_kpair", lambda: qmm.lns4k_matmul(x, q4k.packed)),
        ("fp4_kpair", lambda: qmm.fp4k_matmul(x, qf4k.packed)),
        ("int4g_kpair",
         lambda: qmm.int4gk_matmul(x, qgk.packed, qgk.scale, qgk.zero)),
        ("nf4_kpair", lambda: qmm.nf4k_matmul(x, qnk.packed, qnk.bscale)),
    ]
    for name, fn in cases:
        def fused(fn=fn):
            fused_only()
            return fn()

        def xla(fn=fn):
            xla_only()
            return fn()

        check(f"mosaic_compiled_{name}", fused, xla)

    # -- compiled Mosaic x custom_partitioning (1-device mesh) ------------
    fused_only()
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    tp_single = tp._single_device
    tp._single_device = lambda: False  # force the partition wrapper
    try:
        with mesh:
            xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))
            ps = jax.device_put(ql8.codes, NamedSharding(mesh, P(None, "model")))
            check(
                "mosaic_sharded_lns8",
                lambda: jax.jit(
                    lambda a, p: tp.lns_matmul(a, p, frac_bits=3)
                )(xs, ps),
                lambda: qmm.lns_matmul(x, ql8.codes, frac_bits=3),
            )
            p4 = jax.device_put(q4k.packed, NamedSharding(mesh, P(None, "model")))
            check(
                "mosaic_sharded_lns4_kpair",
                lambda: jax.jit(lambda a, p: tp.lns4k_matmul(a, p))(xs, p4),
                lambda: qmm.lns4k_matmul(x, q4k.packed),
            )
    finally:
        tp._single_device = tp_single

    print(json.dumps({"all_pass": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
