"""kpair nibble-tier kernel microbenchmark at 7B decode shapes.

Round-2 threshold measurement for ops/matmul.py's kpair dispatch
(`_KPAIR_FUSED_MIN_WEIGHT` — "pending on-chip measurement"): at the
weight-HBM-bound decode regime (small M, Llama-2-7B projection shapes),
time per matmul for

  bf16      XLA dense bf16 dot (the baseline)
  xla2dot   XLA kpair fallback: two dots, nibble decode fused into each
            operand read (1 B/elem effective traffic)
  fused     the shipped kpair Mosaic kernel: packed tile read once, both
            planes decoded to VMEM scratch, two partial dots (0.5 B/elem)
  stacked   experimental: decode both planes into ONE [K, bn] scratch
            (lo rows stacked above hi rows) and do ONE dot against
            column-permuted activations — half the dot issues of `fused`

Usage: python scripts/bench_kpair.py [--m 8] [--iters 64]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0][0])


def timeit(fn, x, *wargs, iters=64):
    def looped(x, *wargs):
        def body(_, carry):
            out = fn(carry, *wargs)
            return carry + out[:, :1].astype(carry.dtype) * 1e-30

        return jax.lax.fori_loop(0, iters, body, x)

    jitted = jax.jit(looped)
    sync(jitted(x, *wargs))
    t0 = time.perf_counter()
    sync(jitted(x, *wargs))
    return (time.perf_counter() - t0) / iters


def _stacked_kernel(xs_ref, w_ref, o_ref, wdec_ref, *, nib_decode, k2):
    u = w_ref[...].astype(jnp.int32)
    wdec_ref[0:k2, :] = nib_decode(u & 0xF)
    wdec_ref[k2:, :] = nib_decode((u >> 4) & 0xF)
    o_ref[...] = jnp.dot(
        xs_ref[...], wdec_ref[...], preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)


def _lns4_nib_decode_opt(nib):
    """Round-4 experiment: minimal-op int32 bit assembly (10 vector ops vs
    the shipped 13) — same grid, bit-exact. (nib&6)<<22 lands the exponent
    lsbs at bit 23 with the -4 bias folded into the 125<<23 constant."""
    bits = (((nib & 8) << 28) + ((nib & 6) << 22)
            + (nib & 1) * 0x350000 + (125 << 23))
    return jax.lax.bitcast_convert_type(
        bits.astype(jnp.int32), jnp.float32
    ).astype(jnp.bfloat16)


def _lns4_nib_decode_i16(nib):
    """Round-4 experiment: assemble bf16 BITS directly in int16 (9 narrow
    ops, no f32 round-trip) — if Mosaic runs int16 lanes at 2x int32 rate
    and supports the i16->bf16 bitcast, decode cost roughly halves. bf16
    fields: sign bit 15, exponent bits 14-7, mantissa bits 6-0 (sqrt2's
    7-bit mantissa is 0x35)."""
    n = nib.astype(jnp.int16)
    bits = (((n & 8) << 12) + ((n & 6) << 6)
            + (n & 1) * jnp.int16(0x35) + jnp.int16(125 << 7))
    return jax.lax.bitcast_convert_type(bits.astype(jnp.int16), jnp.bfloat16)


def stacked_matmul(xs, packed, nib_decode, block_n=256):
    """[M, K] (kpair-permuted cols: evens then odds) @ packed [K/2, N]."""
    M, K = xs.shape
    K2, N = packed.shape
    kernel = functools.partial(_stacked_kernel, nib_decode=nib_decode, k2=K2)
    return pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        grid=(N // block_n,),
        in_specs=[
            pl.BlockSpec((M, K), lambda j: (0, 0)),
            pl.BlockSpec((K2, block_n), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((M, block_n), lambda j: (0, j)),
        scratch_shapes=[pltpu.VMEM((K, block_n), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K2 * N + M * N * 2,
            transcendentals=0,
        ),
    )(xs, packed)


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from llm_lns_quantization_tpu.ops import matmul as qmm
    from llm_lns_quantization_tpu.ops.packing import pack_lns4k

    # the `fused` variant must reach the Mosaic kernel regardless of the
    # shipped dispatch default (XLA-everywhere since the round-2 in-model
    # measurement); `xla2dot` calls _xla_kpair_dot directly
    qmm._KPAIR_FUSED_MIN_WEIGHT = 0

    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--shapes", default="4096x4096,4096x11008,11008x4096")
    ap.add_argument("--variants", default="bf16,xla2dot,fused,stacked")
    args = ap.parse_args()

    M = args.m
    rng = np.random.default_rng(0)
    variants = args.variants.split(",")

    for sh in args.shapes.split(","):
        K, N = map(int, sh.split("x"))
        x = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32) * 0.05)
        wb = w.astype(jnp.bfloat16)
        packed = pack_lns4k(w).packed
        xe, xo = qmm._kpair_split(x)
        xs = jnp.concatenate([xe, xo], axis=1)
        b2d = qmm._bias2d(None, N)

        def bf16_dot(x, wb):
            return jnp.dot(x, wb, preferred_element_type=jnp.float32).astype(
                jnp.bfloat16)

        runs = {
            "bf16": (bf16_dot, x, wb),
            "xla2dot": (lambda x, p: qmm._xla_kpair_dot(
                x, p, lambda u, s: qmm._lns4_nib_decode(u), b2d,
                jnp.bfloat16), x, packed),
            "fused": (lambda x, p: qmm._kpair_matmul(
                x, p, qmm._lns4_nib_decode, None, None, jnp.bfloat16, None),
                x, packed),
            "stacked": (lambda xs, p: stacked_matmul(
                xs, p, qmm._lns4_nib_decode), xs, packed),
            # decode-cost experiments (VERDICT r3 item #5: lns4k fused loses
            # to int4gk by the in-kernel decode serialization)
            "fused_opt": (lambda x, p: qmm._kpair_matmul(
                x, p, _lns4_nib_decode_opt, None, None, jnp.bfloat16, None),
                x, packed),
            "fused_i16": (lambda x, p: qmm._kpair_matmul(
                x, p, _lns4_nib_decode_i16, None, None, jnp.bfloat16, None),
                x, packed),
        }
        # correctness gate: every variant must agree with the XLA kpair dot
        ref = np.asarray(jax.device_get(runs["xla2dot"][0](x, packed)),
                         np.float32)
        for name in variants:
            if name in ("bf16", "xla2dot"):
                continue
            fn, *a = runs[name]
            got = np.asarray(jax.device_get(fn(*a)), np.float32)
            err = float(np.max(np.abs(got - ref)))
            assert np.allclose(got, ref, rtol=3e-2, atol=3e-2), (name, err)

        base = None
        for name in variants:
            fn, *a = runs[name]
            t = timeit(fn, *a, iters=args.iters)
            note = ""
            if name == "bf16":
                base = t
            elif base:
                note = f"  ({base / t:.3f}x bf16)"
            # effective weight bytes per element: bf16 reads 2, the fused/
            # stacked kernels read the packed array once (0.5), but xla2dot
            # reads it once per nibble plane — 1.0 effective (see docstring)
            bpe = {"bf16": 2.0, "xla2dot": 1.0}.get(name, 0.5)
            gbs = K * N * bpe / t / 1e9
            print(f"{K}x{N} {name:8s} {t * 1e3:7.3f} ms  {gbs:6.1f} GB/s"
                  f"{note}", flush=True)


if __name__ == "__main__":
    main()
