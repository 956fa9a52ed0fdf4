"""Pallas TPU kernels: dequant-fused quantized matmuls.

The north-star kernels from BASELINE.json: instead of the reference's
fake-quant (dequantized weights live in HBM at full width), weights stay in
HBM as packed integer codes and are dequantized in VMEM inside the matmul —
the dequant rides the MXU pipeline (epilogue/prologue fusion), HBM reads
shrink 2x (LNS8/INT8), and XLA's bf16 matmul remains the roofline reference.

Kernels:
  lns_matmul   — x:bf16 [M,K] @ lns-coded w [K,N]: codes are decoded to
                 bf16 in VMEM per (K,N) tile (bit unpack + exp2 on the VPU),
                 then fed to the MXU. Log-domain "add-as-multiply" shows up
                 as the decode being a pure exponent manipulation.
  int8_matmul  — x:bf16 [M,K] @ int8 w [K,N] with per-column scales:
                 int8 codes are upcast in VMEM, MXU accumulates in f32,
                 per-column scale applied in the epilogue (W8A8 weight path).

Both use a (i, j, k) grid with K-tiling and an f32 VMEM accumulator
(flushed to the output tile on the last k step).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# LNS dequant-fused matmul
# ---------------------------------------------------------------------------


def _lns_matmul_kernel(x_ref, w_ref, o_ref, wdec_ref, *, inv_scale, out_dtype):
    # grid is (j, i) with i (the M tiles) innermost: the weight tile for a
    # given j stays resident in VMEM across all i steps, and its decode runs
    # once (at i == 0) into the persistent scratch — dequant cost is
    # amortized over the whole M dimension instead of per tile.
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        u = w_ref[...].astype(jnp.int32)
        k = (u & 0x7F) - 64
        mag = jnp.exp2(k.astype(jnp.float32) * inv_scale)
        wdec_ref[...] = jnp.where((u & 0x80) != 0, -mag, mag).astype(jnp.bfloat16)

    o_ref[...] = jnp.dot(
        x_ref[...], wdec_ref[...], preferred_element_type=jnp.float32
    ).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("frac_bits", "block_m", "block_n", "out_dtype")
)
def lns_matmul(
    x: jax.Array,
    codes: jax.Array,
    frac_bits: int = 3,
    block_m: int = 512,
    block_n: int = 512,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """[M, K] @ lns-coded [K, N] -> [M, N].

    K stays fully VMEM-resident (codes tile [K, block_n] is 1 byte/elem);
    ``block_n`` is shrunk automatically for large K so codes + decoded bf16 +
    x tile fit comfortably in VMEM.
    """
    M, K = x.shape
    K2, N = codes.shape
    assert K == K2, (x.shape, codes.shape)
    block_m = min(block_m, M)
    block_n = min(block_n, N)

    def _vmem(bm, bn):
        # pallas double-buffers inputs and outputs; scratch is single
        return 2 * (bm * K * 2) + 2 * (K * bn) + K * bn * 2 + 2 * (bm * bn * 2)

    while block_n > 128 and _vmem(block_m, block_n) > 6 * 2**20:
        block_n //= 2
    while block_m > 128 and _vmem(block_m, block_n) > 6 * 2**20:
        block_m //= 2

    grid = (_cdiv(N, block_n), _cdiv(M, block_m))
    kernel = functools.partial(
        _lns_matmul_kernel,
        inv_scale=1.0 / float(2**frac_bits),
        out_dtype=out_dtype,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, K), lambda j, i: (i, 0)),
            pl.BlockSpec((K, block_n), lambda j, i: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda j, i: (i, j)),
        scratch_shapes=[pltpu.VMEM((K, block_n), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K * N + M * N * 2,
            transcendentals=K * N,  # exp2 per weight element (once)
        ),
    )(x, codes)


# ---------------------------------------------------------------------------
# INT8 weight matmul (per-column scales)
# ---------------------------------------------------------------------------


def _int8_matmul_kernel(x_ref, w_ref, s_ref, o_ref, wdec_ref, *, out_dtype):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        wdec_ref[...] = w_ref[...].astype(jnp.bfloat16)

    acc = jnp.dot(x_ref[...], wdec_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = (acc * s_ref[...]).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "out_dtype"))
def int8_matmul(
    x: jax.Array,
    codes: jax.Array,
    scale: jax.Array,
    block_m: int = 512,
    block_n: int = 512,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """[M, K] @ int8 [K, N] (per-column scale [N]) -> [M, N].

    Same decode-once layout as lns_matmul (grid (j, i), weight tile resident
    across M steps, per-column scale applied in the epilogue).
    """
    M, K = x.shape
    K2, N = codes.shape
    assert K == K2
    block_m = min(block_m, M)
    block_n = min(block_n, N)

    def _vmem(bm, bn):
        return 2 * (bm * K * 2) + 2 * (K * bn) + K * bn * 2 + 2 * (bm * bn * 2)

    while block_n > 128 and _vmem(block_m, block_n) > 6 * 2**20:
        block_n //= 2
    while block_m > 128 and _vmem(block_m, block_n) > 6 * 2**20:
        block_m //= 2

    grid = (_cdiv(N, block_n), _cdiv(M, block_m))
    scale2d = scale.reshape(1, N).astype(jnp.float32)
    kernel = functools.partial(_int8_matmul_kernel, out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, K), lambda j, i: (i, 0)),
            pl.BlockSpec((K, block_n), lambda j, i: (0, j)),
            pl.BlockSpec((1, block_n), lambda j, i: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda j, i: (i, j)),
        scratch_shapes=[pltpu.VMEM((K, block_n), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K * N + M * N * 2,
            transcendentals=0,
        ),
    )(x, codes, scale2d)
