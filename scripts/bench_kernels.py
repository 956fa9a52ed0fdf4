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
    from llm_lns_quantization_tpu.ops import pack_int8, pack_lns

    parser = argparse.ArgumentParser()
    parser.add_argument("--m", type=int, default=4096)
    args = parser.parse_args()

    # llama-2-7B projection shapes (K, N)
    shapes = [
        (4096, 4096),    # q/o proj
        (4096, 11008),   # gate/up
        (11008, 4096),   # down
    ]
    M = args.m
    rng = np.random.default_rng(0)

    print(f"M={M}  (times in ms, TFLOP/s; device {jax.devices()[0]})")
    for K, N in shapes:
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

        def row(name, t):
            print(
                f"  K={K:5d} N={N:5d}  {name:6s} {t*1e3:7.3f} ms  "
                f"{flops/t/1e12:6.1f} TF/s  ({t_bf16/t:.2f}x bf16)"
            )

        row("bf16", t_bf16)
        row("lns8", t_lns)
        row("int8", t_int8)


if __name__ == "__main__":
    main()
