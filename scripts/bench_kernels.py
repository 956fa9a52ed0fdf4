"""Kernel-level roofline microbenchmark: Pallas quantized matmuls vs XLA bf16.

Measures the BASELINE.json kernel target directly (">=85% of BF16 matmul
roofline per chip"): for each (M, K, N) in Llama-7B serving shapes, time
XLA's bf16 matmul, the Pallas LNS8 dequant-fused matmul, and the Pallas INT8
matmul on the attached TPU.

Usage: python scripts/bench_kernels.py [--m 4096]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0][0])


def timeit(fn, x, *wargs, iters=32):
    """Time the kernel itself: loop inside one jit with a data dependency
    between iterations (per-dispatch tunnel latency would otherwise dominate
    and hide the kernel time)."""

    def looped(x, *wargs):
        def body(_, carry):
            out = fn(carry, *wargs)
            # fold a negligible slice of the output back into x to chain the
            # iterations (prevents loop-invariant hoisting / DCE)
            return carry + out[:, :1].astype(carry.dtype) * 1e-30

        return jax.lax.fori_loop(0, iters, body, x)

    jitted = jax.jit(looped)
    out = jitted(x, *wargs)
    sync(out)
    t0 = time.perf_counter()
    out = jitted(x, *wargs)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from llm_lns_quantization_tpu.ops import matmul as qmm
    from llm_lns_quantization_tpu.ops import pack_int8, pack_lns, pack_lns4

    parser = argparse.ArgumentParser()
    parser.add_argument("--m", type=int, default=4096)
    parser.add_argument("--decode_m", type=int, default=16)
    parser.add_argument("--sections", default="big,decode")
    args = parser.parse_args()

    # llama-2-7B projection shapes (K, N)
    shapes = [
        (4096, 4096),    # q/o proj
        (4096, 11008),   # gate/up
        (11008, 4096),   # down
    ]
    M = args.m
    rng = np.random.default_rng(0)

    sections = args.sections.split(",")
    print(f"M={M}  (times in ms, TFLOP/s; device {jax.devices()[0]})")
    for K, N in (shapes if "big" in sections else []):
        x = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)
        w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
        wq = pack_lns(jnp.asarray(w))
        w8 = pack_int8(jnp.asarray(w))
        wb = jnp.asarray(w, jnp.bfloat16)

        flops = 2 * M * K * N

        bf16_fn = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
        t_bf16 = timeit(bf16_fn, x, wb)
        t_lns = timeit(lambda a, c: qmm.lns_matmul(a, c), x, wq.codes)
        t_int8 = timeit(lambda a, c, s: qmm.int8_matmul(a, c, s), x, w8.codes, w8.scale)
        t_w8a8 = timeit(lambda a, c, s: qmm.w8a8_matmul(a, c, s), x, w8.codes, w8.scale)

        def row(name, t):
            print(
                f"  K={K:5d} N={N:5d}  {name:6s} {t*1e3:7.3f} ms  "
                f"{flops/t/1e12:6.1f} TF/s  ({t_bf16/t:.2f}x bf16)"
            )

        row("bf16", t_bf16)
        row("lns8", t_lns)
        row("int8", t_int8)
        row("w8a8", t_w8a8)

    # ------------------------------------------------------------------
    # decode regime: tiny M, weight-HBM-bound. Here the packed formats'
    # smaller weight footprint (1 B lns8/int8, 0.5 B lns4 vs 2 B bf16)
    # should translate directly into lower kernel time — this is the
    # serving win for 7B+ models (BASELINE.md configs 3-5).
    # ------------------------------------------------------------------
    Md = args.decode_m
    print(f"\nDecode regime M={Md}  (weight-HBM-bound; ideal lns8/int8 = 2.0x, lns4 = 4.0x)")
    for K, N in (shapes if "decode" in sections else []):
        x = jnp.asarray(rng.standard_normal((Md, K)) * 0.1, jnp.bfloat16)
        w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
        wq = pack_lns(jnp.asarray(w))
        w8 = pack_int8(jnp.asarray(w))
        w4 = pack_lns4(jnp.asarray(w))
        wb = jnp.asarray(w, jnp.bfloat16)

        wbytes = K * N * 2  # bf16 weight traffic per matmul

        bf16_fn = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
        t_bf16 = timeit(bf16_fn, x, wb, iters=64)
        t_lns = timeit(lambda a, c: qmm.lns_matmul(a, c), x, wq.codes, iters=64)
        t_int8 = timeit(lambda a, c, s: qmm.int8_matmul(a, c, s), x, w8.codes, w8.scale, iters=64)
        t_ln4 = timeit(lambda a, c: qmm.lns4_matmul(a, c), x, w4.packed, iters=64)
        t_w8a8 = timeit(lambda a, c, s: qmm.w8a8_matmul(a, c, s), x, w8.codes, w8.scale, iters=64)

        def drow(name, t, nbytes):
            print(
                f"  K={K:5d} N={N:5d}  {name:6s} {t*1e3:7.3f} ms  "
                f"{nbytes/t/1e9:6.1f} GB/s weight-read  ({t_bf16/t:.2f}x bf16)"
            )

        drow("bf16", t_bf16, wbytes)
        drow("lns8", t_lns, wbytes // 2)
        drow("int8", t_int8, wbytes // 2)
        drow("lns4", t_ln4, wbytes // 4)
        drow("w8a8", t_w8a8, wbytes // 2)


if __name__ == "__main__":
    main()
