"""W4A8 concept microbench: segmented s8xs8 MXU dequant-matmul vs int4gk.

Question (round 5, exploratory): the int4gk fused kernel's decode is
upcast-to-f32 + mul + add + cast-bf16 per weight element (~5 VPU ops) and
the decode-step attribution shows the matmul chain is 85% of the 7B step.
A W4A8 path quantizes activations per row to s8 ONCE and keeps the nibble
decode purely integer (and/shift -> s8), running the contraction on the
s8xs8 MXU (2x bf16 rate) SEGMENTED by scale group:

    x @ (s*q + z) = row_scale * sum_g [ s_g x (xq_g @ q_g)
                                        + z_g x rowsum_g(xq) ]

Two granularities are measured at 7B decode shapes (M=8):
  * G = K/128 segments (the int4gk grid's group_size): 2 small s8 dots per
    group per tile — tests whether many tiny MXU invocations sink it;
  * G = 1 (per-column scales only): one s8 dot pair per tile — the
    upper bound of the approach (coarser format).

Numerics differ from int4gk by the activation quantization (standard
W4A8); correctness is asserted against an f32 emulation of the same
math. This is a MICROBENCH, not a product format: the outcome (win or
negative) is recorded in BASELINE.md, and wiring a serving tier only
happens if the concept wins in-model.

Usage: python scripts/bench_w4a8.py [--platform cpu]  (interpret on CPU)
"""

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from llm_lns_quantization_tpu.ops import matmul as qmm  # noqa: E402
from llm_lns_quantization_tpu.ops.packing import pack_int4gk  # noqa: E402


def _w4a8_kernel(xe_ref, xo_ref, rs_ref, rsum_ref, w_ref, s_ref, z_ref,
                 o_ref, *, groups, rpg, out_dtype):
    """One N-tile: segmented s8 dots with per-group scale/zero epilogue.

    xe/xo: [M, K2] s8 (even/odd k rows); rs: [M, 1] f32 row scales;
    rsum: [M, G] f32 (sum of xq over each group's k rows, prescaled);
    w: [K2, bn] packed bytes; s/z: [G, bn] f32.
    """
    # Mosaic cannot legalize i8 shifts (arith.shrui on vector<i8>) — same
    # lowering limitation as the round-4 int16 finding — so extract in i32
    u = w_ref[...].astype(jnp.int32)
    lo = (u & 0xF).astype(jnp.int8)
    hi = ((u >> 4) & 0xF).astype(jnp.int8)
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for g in range(groups):
        sl = slice(g * rpg, (g + 1) * rpg)
        part = (
            jax.lax.dot(xe_ref[:, sl], lo[sl],
                        preferred_element_type=jnp.int32)
            + jax.lax.dot(xo_ref[:, sl], hi[sl],
                          preferred_element_type=jnp.int32)
        )
        acc = acc + part.astype(jnp.float32) * s_ref[g][None, :]
        acc = acc + rsum_ref[:, g][:, None] * z_ref[g][None, :]
    o_ref[...] = (acc * rs_ref[...]).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "block_n",
                                             "out_dtype", "interpret"))
def w4a8_matmul(x, packed, scale, zero, group_size=128, block_n=512,
                out_dtype=jnp.bfloat16, interpret=False):
    """[M, K] bf16 @ int4gk-packed [K, N] via per-row-s8 activations."""
    M, K = x.shape
    K2, N = packed.shape
    G = K // group_size
    rpg = group_size // 2

    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    rs = absmax / 127.0
    xq = jnp.clip(jnp.round(xf / jnp.where(rs == 0, 1.0, rs)),
                  -127, 127).astype(jnp.int8)
    # per-group row sums of xq (f32: rowsum*z term is applied pre-rowscale)
    rsum = jnp.sum(
        xq.astype(jnp.float32).reshape(M, G, group_size), axis=2)
    xr = xq.reshape(M, K2, 2)
    xe, xo = xr[:, :, 0], xr[:, :, 1]

    grid = (qmm._cdiv(N, block_n),)
    kernel = functools.partial(_w4a8_kernel, groups=G, rpg=rpg,
                               out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, K2), lambda j: (0, 0)),
            pl.BlockSpec((M, K2), lambda j: (0, 0)),
            pl.BlockSpec((M, 1), lambda j: (0, 0)),
            pl.BlockSpec((M, G), lambda j: (0, 0)),
            pl.BlockSpec((K2, block_n), lambda j: (0, j)),
            pl.BlockSpec((G, block_n), lambda j: (0, j)),
            pl.BlockSpec((G, block_n), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((M, block_n), lambda j: (0, j)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(xe, xo, rs, rsum, packed, scale, zero)


def _emulate(x, q):
    """f32 emulation of the same W4A8 math (correctness oracle)."""
    from llm_lns_quantization_tpu.ops.packing import unpack_int4gk

    xf = np.asarray(x, np.float32)
    absmax = np.abs(xf).max(axis=1, keepdims=True)
    rs = absmax / 127.0
    xq = np.clip(np.round(xf / np.where(rs == 0, 1.0, rs)), -127, 127)
    w = np.asarray(unpack_int4gk(q, jnp.float32))
    return (xq @ w) * rs  # (s*qv+z summed) == xq@w exactly in f32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    interp = jax.default_backend() == "cpu"

    rng = np.random.default_rng(0)
    rows = {}
    for K, N in ((4096, 4096), (4096, 11008), (11008, 4096)):
        M = 8
        x = jnp.asarray(rng.standard_normal((M, K)) * 0.5, jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.float32)
        q = pack_int4gk(w)
        # correctness first (small tolerance: bf16 x + s8 act quant)
        got = np.asarray(w4a8_matmul(x, q.packed, q.scale, q.zero,
                                     interpret=interp), np.float32)
        want = _emulate(x, q)
        err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert err < 5e-2, (K, N, err)
        if interp:
            rows[f"{K}x{N}"] = {"relerr": float(err), "interpret": True}
            continue

        def timed(fn, *a):
            o = fn(*a); jax.device_get(o)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                o = fn(*a)
            jax.device_get(o)
            return (time.perf_counter() - t0) / args.iters * 1e3

        t_w4a8 = timed(lambda: w4a8_matmul(x, q.packed, q.scale, q.zero))
        # G=1 upper bound (per-column scales, ONE s8 dot pair per tile):
        # synthetic [1, N] bands — timing-valid, numerics are the coarser
        # format's, not int4gk's
        s1, z1 = q.scale[:1], q.zero[:1]
        t_g1 = timed(lambda: w4a8_matmul(x, q.packed, s1, z1, group_size=K,
                                         block_n=256))  # VMEM: i32 nib tile
        t_int4gk = timed(lambda: qmm.int4gk_matmul(x, q.packed, q.scale,
                                                   q.zero))
        t_bf16 = timed(lambda: jnp.dot(
            x, jnp.asarray(w, jnp.bfloat16),
            preferred_element_type=jnp.float32))
        rows[f"{K}x{N}"] = {
            "w4a8_ms": round(t_w4a8, 4),
            "w4a8_g1_ms": round(t_g1, 4),
            "int4gk_ms": round(t_int4gk, 4),
            "bf16_ms": round(t_bf16, 4),
            "w4a8_vs_int4gk": round(t_int4gk / t_w4a8, 3),
            "relerr": float(err),
        }
        print(f"{K}x{N}: {json.dumps(rows[f'{K}x{N}'])}", flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
