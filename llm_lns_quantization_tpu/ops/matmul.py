"""Pallas TPU kernels: dequant-fused quantized matmuls.

The north-star kernels from BASELINE.json: instead of the reference's
fake-quant (dequantized weights live in HBM at full width), weights stay in
HBM as packed integer codes and are dequantized in VMEM inside the matmul —
the dequant rides the MXU pipeline (epilogue/prologue fusion), HBM reads
shrink 2x (LNS8/INT8), and XLA's bf16 matmul remains the roofline reference.

Kernels:
  lns_matmul   — x:bf16 [M,K] @ lns-coded w [K,N]: codes are decoded to
                 bf16 in VMEM per (K,N) tile (pure integer bit-assembly on
                 the VPU — see _lns_decode; no transcendentals), then fed to
                 the MXU. Log-domain "add-as-multiply" shows up as the decode
                 being a pure exponent manipulation.
  int8_matmul  — x:bf16 [M,K] @ int8 w [K,N] with per-column scales:
                 int8 codes are upcast in VMEM, MXU accumulates in f32,
                 per-column scale applied in the epilogue (W8A8 weight path).

Both use a (i, j, k) grid with K-tiling and an f32 VMEM accumulator
(flushed to the output tile on the last k step).

Dispatch policy: the fused kernels exist for the weight-HBM-bound regime
(few activation rows — KV-cache decode, small serving batches) where reading
1-byte codes instead of 2-byte bf16 is the whole game. In the compute-bound
regime (M >= _XLA_DOT_MIN_M: scoring, prefill) every public entry point
instead dequantizes the packed weight once with the same bit-assembly decode
and calls XLA's matmul — its emitter beats a hand-tiled Mosaic matmul at
those shapes, and the [K, N] dequant round-trip is negligible next to the
activation traffic. Weights stay packed in HBM either way.
"""

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    """Pallas TPU kernels only run compiled on TPU; on the CPU backend (unit
    tests, virtual-device meshes) fall back to interpreter mode."""
    return jax.default_backend() == "cpu"


def _cdiv(a, b):
    return -(-a // b)




_K_RESIDENT_MAX = 6144  # beyond this, fall back to k-tiled kernels

# VMEM bytes the auto-tiler may plan for (double-buffered operands + scratch).
# v5e/v5p have 128 MB; keep headroom for Mosaic's own allocations.
_VMEM_BUDGET = 8 * 2**20

# default (block_m, block_n) when the caller passes None — module-level so
# in-model tuning sweeps can override without threading args everywhere
# (jit reads them at trace time; jax.clear_caches() forces a re-read)
_DEFAULT_BLOCK_M = 512
try:  # env-tunable for on-chip block sweeps (scripts/bench_serving_7b.py)
    _DEFAULT_BLOCK_N = int(__import__("os").environ.get("LLMQ_BLOCK_N", 512))
except ValueError:
    _DEFAULT_BLOCK_N = 512
_FORCE_KTILED = False


def _blocks(block_m, block_n):
    return (_DEFAULT_BLOCK_M if block_m is None else block_m,
            _DEFAULT_BLOCK_N if block_n is None else block_n)


def _bias2d(bias, N):
    """Fused bias epilogue operand: [1, N] float32 (zeros when absent).

    Folding the bias into the kernel matters because XLA fuses ``dot + b``
    into the matmul's output loop, but cannot fuse into an opaque
    pallas_call — an unfused bias add costs an extra read+write of the whole
    [M, N] output (measured ~15% of end-to-end GPT-2 scoring throughput).
    """
    if bias is None:
        return jnp.zeros((1, N), jnp.float32)
    return bias.reshape(1, N).astype(jnp.float32)


@functools.lru_cache(maxsize=None)
def _lns_mant_words(frac_bits):
    """bf16 mantissas of 2^(r / 2^frac_bits), r in [0, 2^f), packed 4-per-u32.

    Each entry is the 7-bit mantissa field of the bf16 rounding of the f32
    value (matching the old f32-compute-then-cast semantics bit for bit,
    verified over the full code grid in tests).
    """
    import ml_dtypes
    import numpy as np

    n = 1 << frac_bits
    mants = [
        int(
            np.asarray(np.float32(2.0 ** (r / n)), ml_dtypes.bfloat16)
            .view(np.uint16)
        )
        & 0x7F
        for r in range(n)
    ]
    mants += [0] * (-len(mants) % 4)
    return tuple(
        mants[i] | (mants[i + 1] << 8) | (mants[i + 2] << 16)
        | (mants[i + 3] << 24)
        for i in range(0, len(mants), 4)
    )


def _lns_decode(u, frac_bits):
    """uint8 LNS code -> bf16 value: pure integer bit-assembly, no floats.

    value = sign * 2^(k / 2^f) with k = (u & 0x7F) - 64. Split k = 2^f*e + r:
    sign and integer exponent go straight into the float32 sign/exponent
    fields; the fractional part contributes a 7-bit bf16 mantissa looked up
    from packed u32 constant words by a variable shift (r's bits are u's low
    bits, untouched by the -64). The assembled f32 is exactly the bf16 value
    (bf16 = f32 with a 7-bit mantissa), so the final cast is exact — and the
    whole decode is shifts/ands/ors, as cheap as the FP8 decode. This is the
    non-MXU cost of every LNS matmul, so op count here is throughput.
    """
    f = frac_bits
    words = _lns_mant_words(f)
    if len(words) > 4:  # f > 4: fall back to a per-bit multiplier chain
        k = (u & 0x7F) - 64
        base = jax.lax.bitcast_convert_type(
            (((u & 0x80) << 24) | (((k >> f) + 127) << 23)).astype(jnp.int32),
            jnp.float32,
        )
        m = base
        for i in range(f):
            m = m * jnp.where(
                (u & (1 << i)) != 0, jnp.float32(2.0 ** (2**i / (1 << f))),
                jnp.float32(1.0),
            )
        return m.astype(jnp.bfloat16)
    # exponent field folded: ((k >> f) + 127) << 23 with k = (u & 0x7F) - 64
    # equals the masked high code bits shifted into place plus a constant
    # (64 is a multiple of 2^f, so the bias never borrows from the r bits)
    sbits = (u & 0x80) << 24  # sign -> float32 bit 31
    ef = (u & (0x7F & ~((1 << f) - 1))) << (23 - f)
    e_const = (127 - (64 >> f)) << 23
    r = u & ((1 << f) - 1)
    # select the u32 word holding mant[r]: word = words[r >> 2]. The chain
    # must apply the SMALLEST-index condition last (descending i) so an
    # earlier threshold overrides later ones — ascending order picks the
    # wrong word whenever there are >2 words (f = 4).
    word = jnp.int32(words[-1])
    for i in reversed(range(len(words) - 1)):
        word = jnp.where(r < 4 * (i + 1), jnp.int32(words[i]), word)
    mant = (word >> ((r & 3) * 8)) & 0x7F
    bits = sbits + (ef + e_const) + (mant << 16)  # disjoint fields: no carries
    return jax.lax.bitcast_convert_type(
        bits.astype(jnp.int32), jnp.float32
    ).astype(jnp.bfloat16)


# Above this many activation rows the matmul is compute-bound and XLA's
# hand-tuned matmul emitter beats the fused Pallas kernel (measured 0.87x vs
# 0.70x of bf16 on GPT-2 scoring); the dequant materializes only the [K, N]
# bf16 weight (negligible next to M*K + M*N activation traffic). Below it —
# the decode/serving regime — weight HBM traffic dominates and the fused
# kernel's packed reads win. Env-overridable (LLMQ_XLA_DOT_MIN_M) so the
# mid-M band (batched admission prefill, M~1024) can be probed with the
# fused kernels without a code edit; the default is the measured boundary.
_XLA_DOT_MIN_M = int(__import__("os").environ.get("LLMQ_XLA_DOT_MIN_M",
                                                  1024))

# Minimum weight elements for the fused Pallas kernels. Default: never —
# every measured regime on v5e favors the XLA path, because XLA fuses the
# elementwise bit-assembly decode into its matmul operand read (the weight is
# only ever read packed) AND schedules the matmul better than a hand-tiled
# Mosaic kernel (in-model, same session: gpt2-124M scoring 0.87x-vs-bf16 XLA
# vs 0.70x fused; gpt2-xl 1.5B decode 0.83x XLA vs 0.63x fused for LNS8, and
# 1.30x for int8 where the decode is a free upcast). The fused kernels stay
# selectable (lower this knob) for research and non-XLA-quality backends.
_FUSED_MIN_WEIGHT = 1 << 62


def _dispatch_xla(M, K, N):
    return M >= _XLA_DOT_MIN_M or K * N < _FUSED_MIN_WEIGHT


def _lns4_nib_decode(nib):
    """4-bit LNS nibble [.., 4 bits] -> bf16 (pure bit assembly).

    2^(k/2) = 2^(k>>1) * (1 or sqrt2); sqrt2's bf16 mantissa (0x35) is
    multiplied in from the nibble's low bit — no float ops, exact in bf16.
    Minimal-op form (round 4): sign = (nib&8)<<28; exponent lsbs land at
    bit 23 via (nib&6)<<22 with the k-4 bias folded into the 125<<23
    constant — 3 fewer vector ops than the k=(nib&7)-4 formulation, and on
    the 4-bit decode the VPU op count is the measured cost driver of the
    kpair tier at 7B decode (BASELINE.md round 4). Bit-exact vs the
    original (tests/test_ops.py grid goldens)."""
    bits = (((nib & 8) << 28) + ((nib & 6) << 22)
            + (nib & 1) * 0x350000 + (125 << 23))
    return jax.lax.bitcast_convert_type(
        bits.astype(jnp.int32), jnp.float32
    ).astype(jnp.bfloat16)


def _fp4_nib_decode(nib):
    """E2M1 nibble -> bf16 (pure bit assembly, XLA-fusable)."""
    sbits = (nib & 0x8) << 28
    e = ((nib >> 1) & 0x3) + 125
    mant = (nib & 1) << 22
    return jax.lax.bitcast_convert_type(
        (sbits | (e << 23) | mant).astype(jnp.int32), jnp.float32
    ).astype(jnp.bfloat16)


def _xla_halves_dot(x, packed, nib_decode, b2d, out_dtype):
    """XLA path for halves-layout nibble weights, as TWO dots.

    A single unpack would concatenate the low/high nibble halves along N —
    the concat blocks XLA from fusing the decode into the dot's operand read
    and materializes the full [K, N] bf16 weight in HBM (measured 0.51x bf16
    on gpt2-xl decode). Decoding each half separately keeps both decodes
    elementwise producers of their own dot, so the weight is only ever read
    packed (0.5 bytes/element).
    """
    u = packed.astype(jnp.int32)
    y_lo = jnp.dot(x, nib_decode(u & 0xF), preferred_element_type=jnp.float32)
    y_hi = jnp.dot(x, nib_decode((u >> 4) & 0xF),
                   preferred_element_type=jnp.float32)
    return (jnp.concatenate([y_lo, y_hi], axis=1) + b2d).astype(out_dtype)


def _xla_dot(x, w, b2d, out_dtype):
    y = jnp.dot(x, w, preferred_element_type=jnp.float32) + b2d
    return y.astype(out_dtype)


def _fit_block_k(K: int, want: int = 2048):
    """Largest multiple of 128 <= ``want`` that divides K, or None.

    The k-tiled kernels accumulate over every k step with no remainder mask,
    and Pallas TPU boundary-block padding is undefined — a K % block_k
    remainder would sum garbage into the accumulator. Callers fall back to
    the XLA dequant-dot path when no remainder-free tile exists.
    """
    top = min(want, K) // 128 * 128
    for c in range(top, 0, -128):
        if K % c == 0:
            return c
    return None


def _shrink_blocks(block_m: int, block_n: int, vmem_bytes):
    """Shrink (block_m, block_n) until the tile fits the VMEM budget.

    ``vmem_bytes(bm, bn)`` is each caller's format-specific buffer-byte
    model (weight/activation widths differ per format); the shrink POLICY —
    N first down to 128-multiples, then M by halving — lives only here.
    """
    while block_n > 128 and vmem_bytes(block_m, block_n) > _VMEM_BUDGET:
        block_n = _shrink_n(block_n)
    while block_m > 128 and vmem_bytes(block_m, block_n) > _VMEM_BUDGET:
        block_m //= 2
    return block_m, block_n


def _shrink_n(bn: int) -> int:
    """Halve a block_n while keeping it Mosaic-legal: lane-dim blocks must be
    multiples of 128 (or the full array dim). Plain halving of e.g. 384
    yields 192/96, which Mosaic rejects."""
    bn //= 2
    if bn > 128:
        bn -= bn % 128
    return max(bn, 128)


def _lns_matmul_ktiled_kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *,
                              frac_bits, out_dtype):
    k_step = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_step == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = _lns_decode(w_ref[...].astype(jnp.int32), frac_bits)
    acc_ref[...] += jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)

    @pl.when(k_step == nk - 1)
    def _():
        o_ref[...] = (acc_ref[...] + b_ref[...]).astype(out_dtype)


def _lns_matmul_ktiled(x, codes, bias2d, frac_bits, out_dtype,
                       block_m=512, block_n=512, block_k=2048):
    """Classic (i, j, k) tiling for K too large to keep VMEM-resident.

    The weight tile is decoded per (i, k) step — an extra nm decodes of the
    full weight vs the resident kernel, ~0.2% of the tile FLOPs each.
    """
    M, K = x.shape
    _, N = codes.shape
    block_m = min(block_m, M)
    block_n = min(block_n, N)
    block_k = min(block_k, K)

    grid = (_cdiv(M, block_m), _cdiv(N, block_n), _cdiv(K, block_k))
    kernel = functools.partial(
        _lns_matmul_ktiled_kernel, frac_bits=frac_bits, out_dtype=out_dtype
    )
    return pl.pallas_call(
        kernel,
        interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K * N + M * N * 2,
            transcendentals=0,  # decode is integer bit-assembly
        ),
    )(x, codes, bias2d)


# ---------------------------------------------------------------------------
# LNS dequant-fused matmul
# ---------------------------------------------------------------------------


def _lns_matmul_kernel(x_ref, w_ref, b_ref, o_ref, wdec_ref, *, frac_bits,
                       out_dtype):
    # grid is (j, i) with i (the M tiles) innermost: the weight tile for a
    # given j stays resident in VMEM across all i steps, and its decode runs
    # once (at i == 0) into the persistent scratch — dequant cost is
    # amortized over the whole M dimension instead of per tile.
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        wdec_ref[...] = _lns_decode(w_ref[...].astype(jnp.int32), frac_bits)

    o_ref[...] = (
        jnp.dot(x_ref[...], wdec_ref[...], preferred_element_type=jnp.float32)
        + b_ref[...]
    ).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("frac_bits", "block_m", "block_n", "out_dtype")
)
def lns_matmul(
    x: jax.Array,
    codes: jax.Array,
    frac_bits: int = 3,
    block_m=None,
    block_n=None,
    out_dtype=jnp.bfloat16,
    bias=None,
) -> jax.Array:
    """[M, K] @ lns-coded [K, N] -> [M, N].

    K stays fully VMEM-resident (codes tile [K, block_n] is 1 byte/elem);
    ``block_n`` is shrunk automatically for large K so codes + decoded bf16 +
    x tile fit comfortably in VMEM.
    """
    M, K = x.shape
    K2, N = codes.shape
    assert K == K2, (x.shape, codes.shape)
    block_m, block_n = _blocks(block_m, block_n)
    b2d = _bias2d(bias, N)
    if _dispatch_xla(M, K, N):
        # same transcendental-free bit-assembly decode, run by XLA
        return _xla_dot(x, _lns_decode(codes.astype(jnp.int32), frac_bits),
                        b2d, out_dtype)
    if _FORCE_KTILED or K > _K_RESIDENT_MAX:
        bk = _fit_block_k(K)
        if bk is None:  # no remainder-free k tile: XLA dequant dot instead
            return _xla_dot(x, _lns_decode(codes.astype(jnp.int32), frac_bits),
                            b2d, out_dtype)
        return _lns_matmul_ktiled(
            x, codes, b2d, frac_bits, out_dtype,
            block_m=block_m, block_n=block_n, block_k=bk,
        )
    block_m = min(block_m, M)
    block_n = min(block_n, N)

    def _vmem(bm, bn):
        # pallas double-buffers inputs and outputs; scratch is single
        return 2 * (bm * K * 2) + 2 * (K * bn) + K * bn * 2 + 2 * (bm * bn * 2)

    block_m, block_n = _shrink_blocks(block_m, block_n, _vmem)

    grid = (_cdiv(N, block_n), _cdiv(M, block_m))
    kernel = functools.partial(
        _lns_matmul_kernel,
        frac_bits=frac_bits,
        out_dtype=out_dtype,
    )
    return pl.pallas_call(
        kernel,
        interpret=_interpret(),
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
            transcendentals=0,  # decode is integer bit-assembly
        ),
    )(x, codes, b2d)


# ---------------------------------------------------------------------------
# INT8 weight matmul (per-column scales)
# ---------------------------------------------------------------------------


def _int8_matmul_kernel(x_ref, w_ref, s_ref, b_ref, o_ref, wdec_ref, *,
                        out_dtype):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        wdec_ref[...] = w_ref[...].astype(jnp.bfloat16)

    acc = jnp.dot(x_ref[...], wdec_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = (acc * s_ref[...] + b_ref[...]).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "out_dtype"))
def int8_matmul(
    x: jax.Array,
    codes: jax.Array,
    scale: jax.Array,
    block_m=None,
    block_n=None,
    out_dtype=jnp.bfloat16,
    bias=None,
) -> jax.Array:
    """[M, K] @ int8 [K, N] (per-column scale [N]) -> [M, N].

    Same decode-once layout as lns_matmul (grid (j, i), weight tile resident
    across M steps, per-column scale applied in the epilogue).
    """
    M, K = x.shape
    K2, N = codes.shape
    assert K == K2
    block_m, block_n = _blocks(block_m, block_n)
    b2d = _bias2d(bias, N)
    def _xla():
        y = jnp.dot(x, codes.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        return (y * scale.reshape(1, N).astype(jnp.float32) + b2d).astype(out_dtype)

    if _dispatch_xla(M, K, N):
        return _xla()
    if _FORCE_KTILED or K > _K_RESIDENT_MAX:
        bk = _fit_block_k(K)
        if bk is None:  # no remainder-free k tile
            return _xla()
        return _int8_matmul_ktiled(
            x, codes, scale, b2d, out_dtype,
            block_m=block_m, block_n=block_n, block_k=bk,
        )
    block_m = min(block_m, M)
    block_n = min(block_n, N)

    def _vmem(bm, bn):
        return 2 * (bm * K * 2) + 2 * (K * bn) + K * bn * 2 + 2 * (bm * bn * 2)

    block_m, block_n = _shrink_blocks(block_m, block_n, _vmem)

    grid = (_cdiv(N, block_n), _cdiv(M, block_m))
    scale2d = scale.reshape(1, N).astype(jnp.float32)
    kernel = functools.partial(_int8_matmul_kernel, out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, K), lambda j, i: (i, 0)),
            pl.BlockSpec((K, block_n), lambda j, i: (0, j)),
            pl.BlockSpec((1, block_n), lambda j, i: (0, j)),
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
    )(x, codes, scale2d, b2d)


# ---------------------------------------------------------------------------
# 4-bit LNS matmul (nibble-packed weights: 4x less HBM than bf16)
# ---------------------------------------------------------------------------


def _lns4_matmul_kernel(x_ref, w_ref, b_ref, o_ref, wdec_ref, *,
                        n_half_tiles, out_dtype):
    j = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        u = w_ref[...].astype(jnp.int32)  # [K, bn] packed bytes (halves layout)
        # output tile j < n_half_tiles reads the low nibbles (columns [0, N/2));
        # j >= n_half_tiles reads the high nibbles (columns [N/2, N)). One
        # vector select — no lane interleave (Mosaic can't shape-cast one).
        nib = jnp.where(j < n_half_tiles, u & 0xF, (u >> 4) & 0xF)
        # pure bit-assembled 2^(k/2): sign + integer exponent + sqrt2's bf16
        # mantissa OR-ed in from the half-step bit (see _lns4_nib_decode)
        wdec_ref[...] = _lns4_nib_decode(nib)

    o_ref[...] = (
        jnp.dot(x_ref[...], wdec_ref[...], preferred_element_type=jnp.float32)
        + b_ref[...]
    ).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "out_dtype"))
def lns4_matmul(
    x: jax.Array,
    packed: jax.Array,
    block_m=None,
    block_n=None,
    out_dtype=jnp.bfloat16,
    bias=None,
) -> jax.Array:
    """[M, K] @ nibble-packed 4-bit LNS [K, N] -> [M, N].

    ``packed`` uses the halves layout (ops.packing.LNS4Weight): the same
    [K, block_n] byte tile feeds output tiles j and j + N/(2*block_n).
    """
    M, K = x.shape
    K2, N_half = packed.shape
    N = N_half * 2
    assert K == K2
    block_m, block_n = _blocks(block_m, block_n)
    if _dispatch_xla(M, K, N) or N_half % 128 != 0 or K % 8 != 0:
        # compute-bound regime, small weights, or layers below Mosaic's
        # (8, 128) tile minimum once the N axis is halved — XLA instead
        return _xla_halves_dot(x, packed, _lns4_nib_decode,
                               _bias2d(bias, N), out_dtype)
    block_m = min(block_m, M)
    block_n = min(block_n, N_half)

    def _vmem(bm, bn):
        return 2 * (bm * K * 2) + 2 * (K * bn) + K * bn * 2 + 2 * (bm * bn * 2)

    block_m, block_n = _shrink_blocks(block_m, block_n, _vmem)
    # each packed tile must sit entirely in one half
    while N_half % block_n:
        block_n = _shrink_n(block_n)

    b2d = _bias2d(bias, N)
    n_half_tiles = N_half // block_n
    grid = (2 * n_half_tiles, _cdiv(M, block_m))
    kernel = functools.partial(
        _lns4_matmul_kernel, n_half_tiles=n_half_tiles, out_dtype=out_dtype
    )
    return pl.pallas_call(
        kernel,
        interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, K), lambda j, i: (i, 0)),
            pl.BlockSpec((K, block_n), lambda j, i: (0, j % n_half_tiles)),
            pl.BlockSpec((1, block_n), lambda j, i: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda j, i: (i, j)),
        scratch_shapes=[pltpu.VMEM((K, block_n), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K * N // 2 + M * N * 2,
            transcendentals=0,
        ),
    )(x, packed, b2d)


# ---------------------------------------------------------------------------
# kpair nibble kernels: the true 0.5 byte/element tier
# ---------------------------------------------------------------------------
#
# The halves-N layout above reads the packed array once per nibble plane
# (two dots or two grid passes -> effective 1 byte/element, BASELINE.md
# round-1 "halves-layout ceiling"). The kpair layout (ops.packing.LNS4KWeight
# / FP4KWeight) pairs adjacent CONTRACTION rows in one byte, so
#
#     y = x[:, 0::2] @ decode(lo) + x[:, 1::2] @ decode(hi)
#
# and the fused kernel loads each packed tile into VMEM once, decodes both
# planes, and accumulates both partial dots — each weight byte crosses HBM
# exactly once. The even/odd activation split happens here, outside the
# kernel, on the [M, K] activations (tiny in the decode regime).

# Fused-kernel threshold for the kpair tier (weight elements). XLA cannot
# express the shared packed read across the two plane dots, so the fused
# kernel is the only true 0.5 B/elem path — but measured IN-MODEL at 7B
# decode (round 2, scripts/bench_serving_7b.py) the kernel's opaque
# pallas_call loses more to XLA's inter-op scheduling than the halved read
# saves: lns4 fused 0.80x bf16 vs ~1.0x for the XLA kpair two-dot, even
# though the same kernel wins 1.2-1.3x in the isolated chained-kernel
# microbench (scripts/bench_kpair.py). Default is therefore XLA-everywhere,
# consistent with _FUSED_MIN_WEIGHT; the env override below exists for
# benchmarking and for hardware where the trade flips (untunneled chips).
import os as _os


def _env_int(name: str, default: int) -> int:
    # a malformed value must not break every import of the package
    raw = _os.environ.get(name)
    if raw is None:
        return default
    try:
        return int(raw)
    except ValueError:
        import warnings

        warnings.warn(f"{name}={raw!r} is not an int; using {default}")
        return default


_KPAIR_FUSED_MIN_WEIGHT = _env_int("LLMQ_KPAIR_FUSED_MIN_WEIGHT", 1 << 62)
# Above this M the kpair XLA fallback decodes the plane ONCE (materialized
# single-dot, _xla_kpair_once_dot) instead of chunking: the once-dot's cost
# is a constant ~2 plane round-trips per forward, the chunked path's is an
# [M, N] f32 partial-sum round-trip per chunk that scales with M. Measured
# at 7B (BASELINE.md round 5): M=8192 once-dot 0.820-0.853x bf16 vs chunked
# 0.542-0.597x; M=1024 (the 128-token prefill inside the decode loop) the
# ordering flips (decode row 433 -> 379 tok/s when once-dot is applied
# there). Crossover from the two cost models is ~M=2000.
_KPAIR_ONCE_DOT_MIN_M = _env_int("LLMQ_KPAIR_ONCE_DOT_MIN_M", 2048)
# int4gk gets its own production threshold: its affine band broadcast is the
# one kpair decode XLA refuses to fuse at 7B plane sizes (0.33x bf16
# in-model), while its in-kernel decode (upcast-mul-add) is the cheapest of
# the nibble formats — the fused Mosaic kernel measures 1.20x bf16 at 7B
# decode (433 tok/s, round 3), the best 4-bit decode in the repo. 12M elems
# sits between GPT-2 XL's largest matmul (10.2M, where XLA-everywhere
# measures 1.088x) and Llama-7B's smallest (16.8M), so 1.5B-class models
# keep the measured XLA dispatch and 7B-class get the kernel. lns4k/fp4k/
# nf4k keep XLA (lns4k fused 0.805x < XLA 0.864x at 7B: their bit-assembly/
# LUT decodes are too expensive inside the kernel's serialized tile loop).
_INT4GK_FUSED_MIN_WEIGHT = _env_int("LLMQ_INT4GK_FUSED_MIN_WEIGHT",
                                    12_000_000)
# int4gk mid-M (M in [_XLA_DOT_MIN_M, _KPAIR_ONCE_DOT_MIN_M)) is
# DISPATCH-CONTEXT dependent (round 5, both directions measured at 7B,
# M=1024): as a STANDALONE dispatch — the batcher's batched admission
# prefill — the fused kernel beats the mid-M chunked-XLA path by ~19%
# (prefill phase 466/451 -> 379/374 ms on same-session pairs, end-to-end
# 292.5 -> 307.8 gen-tok/s, chunk phase unchanged at 1.26 s); but traced
# INSIDE a larger program — the lock-step prefill+scan decode bench — the
# same kernel at the same shape LOSES ~8% end-to-end (430.4 -> 396.0/396.4
# tok/s, replicated): an opaque pallas_call at the head of a fused program
# blocks the overlap XLA schedules around its own chunked dots. So the
# module default keeps chunked-XLA at mid-M, and `int4gk_prefill_kernel()`
# scopes the kernel to standalone-prefill traces (lm/serve.py). The env
# knob forces a global max-M for probing.
_INT4GK_KERNEL_MAX_M = _env_int("LLMQ_INT4GK_KERNEL_MAX_M", 0)
_INT4GK_KERNEL_MAX_M_CTX = 0


@contextlib.contextmanager
def int4gk_prefill_kernel(max_m=2048):
    """Trace-time scope: route int4gk mid-M matmuls (M < ``max_m``) to the
    fused Mosaic kernel. Wrap the CALL of a jitted standalone-prefill
    program (decision is baked at first trace; re-traces of new shape
    buckets must also happen inside the scope — lm/serve.py wraps every
    prefill invocation)."""
    global _INT4GK_KERNEL_MAX_M_CTX
    prev = _INT4GK_KERNEL_MAX_M_CTX
    _INT4GK_KERNEL_MAX_M_CTX = max_m
    try:
        yield
    finally:
        _INT4GK_KERNEL_MAX_M_CTX = prev


def _int4gk_xla_min_m():
    return max(_INT4GK_KERNEL_MAX_M, _INT4GK_KERNEL_MAX_M_CTX,
               _XLA_DOT_MIN_M)
# nf4k: measured round 4 at 7B decode — fused kernel 0.565x bf16 vs
# chunked-XLA 0.504x (the packed-word LUT decode dominates either way, but
# the kernel's single packed read wins) — so 7B-class decode shapes take
# the kernel, same 12M threshold rationale as int4gk. lns4k stays
# XLA-everywhere: its chunked-XLA 1.027x beats its fused kernel's 0.84x
# (round-4 minimal-op decode numbers, BASELINE.md kpair table).
_NF4K_FUSED_MIN_WEIGHT = _env_int("LLMQ_NF4K_FUSED_MIN_WEIGHT",
                                  12_000_000)


def _kpair_split(x):
    M, K = x.shape
    xr = x.reshape(M, K // 2, 2)
    return xr[:, :, 0], xr[:, :, 1]


# Above ~this many decoded elements per nibble plane, XLA stops fusing the
# decode into the dot operand read and materializes the full bf16 plane to
# HBM — measured in-model at 7B decode: int4gk 0.33x bf16 (vs 1.09x at
# 1.5B, whose largest plane is 5.1M elems and fuses fine). Chunking the
# contraction keeps each decode below the threshold so it stays fused; the
# extra dots are negligible at decode M. 6M elems = 12 MB bf16.
_KPAIR_XLA_CHUNK_ELEMS = _env_int("LLMQ_KPAIR_XLA_CHUNK_ELEMS", 6 << 20)
# Mid-M band (the 128-token prefill: _XLA_DOT_MIN_M <= M <
# _KPAIR_ONCE_DOT_MIN_M): materialization is no longer catastrophic there
# (once-dot measures within ~15% of chunked), so the budget relaxes to 24M
# elements — large enough that every 7B plane decodes in ONE chunk, halving
# the [M, N] f32 partial-sum passes. Measured: int4gk batcher prefill
# 559 -> 405 ms, end-to-end 278 -> 301 gen-tok/s (BASELINE.md round 5).
_KPAIR_XLA_CHUNK_ELEMS_MIDM = _env_int(
    "LLMQ_KPAIR_XLA_CHUNK_ELEMS_MIDM", 24 << 20)


def _kpair_chunk_rows(K2: int, N: int, align: int,
                      budget: int = None) -> int:
    """Packed rows per chunk: full K2 when the plane is already small,
    otherwise the largest multiple of ``align`` under the fusion budget.

    Bound (ADVICE.md r3): when ``align * N`` itself exceeds the budget the
    chunk floor is one band group, so each chunk's decoded plane is
    ``align * N`` elements and the anti-materialization guarantee weakens to
    that size. With the production band granularities (align <= 64 packed
    rows) that needs N > ~98k — an order of magnitude beyond any _PACKABLE
    weight (widest today: 70B gateup 57344) — so warn rather than fail."""
    if budget is None:
        budget = _KPAIR_XLA_CHUNK_ELEMS
    if K2 * N <= budget:
        return K2
    if align * N > budget:
        import warnings

        warnings.warn(
            f"kpair chunk floor align={align} x N={N} exceeds the "
            f"{budget}-element fusion budget; decode "
            "materialization may recur on this layer")
    return min(K2, max(align, budget // N // align * align))


def _xla_kpair_once_dot(x, packed, plane, b2d, out_dtype):
    """Score/prefill-regime kpair path: decode the packed plane ONCE to a
    bf16 [K, N] scratch and run a single XLA dot.

    In the compute-bound regime (M >= _XLA_DOT_MIN_M) the matmul itself
    dominates, and what made the chunked fallback ~0.5x bf16 there (7B score
    rows, BASELINE.md round 4: int4gk 0.542x, lns4k 0.597x) was not the
    decode but the partial-sum traffic — every per-chunk ``y = y + dot(...)``
    round-trips the [M, N] f32 accumulator through HBM, and at score-M that
    accumulator is 10-100x the weight plane (M=8192, N=11008: 344 MB vs a
    44 MB bf16 plane). Deliberately materializing the decoded plane costs
    ~2 plane-sized HBM touches once, then a single dot with zero
    accumulator round-trips.

    The `stack([lo, hi], 1).reshape` row interleave (kpair row i holds
    k=2i in the low nibble, k=2i+1 in the high) measured BEST of every
    layout tried at 7B score (BASELINE.md round-5 layout table, int4gk):
    stack-interleave 0.820x bf16; register-interleave via broadcast +
    iota-parity shift 0.576x (variable per-element shifts devectorize);
    contiguous concat with permuted activations 0.702x; two dots without
    relayout 0.688x; the fused Mosaic kernel at score-M 0.620x; and an
    invalid-numerics contiguous-write probe bounds the layout headroom at
    0.854x — the residual vs bf16 is the decode + plane round-trip itself,
    constant per forward (so it amortizes with M), not the interleave.
    ``plane(nib [K2, N], s) -> [K2, N]`` applies the format's value decode
    to one nibble half-plane (``s``: first packed row, for band slicing —
    always 0 here since the full plane decodes at once).

    The scratch plane is bf16 DELIBERATELY: it halves the materialize
    round-trip and matches what the fused Mosaic kernels feed the MXU
    (their VMEM planes are bf16 too); the chunked fallback dots against
    f32 planes, so loglikelihoods differ across the M threshold by normal
    bf16 rounding — within quantization-error tolerance, and paired
    accuracy sweeps always score all formats at the same geometry.

    The anti-materialization chunking (_xla_kpair_dot) remains the
    decode-M fallback, where the [M, N] accumulator is tiny and the packed
    read is the whole game. This is the harness's hottest path —
    loglikelihood scoring, reference lm_eval/base.py:271-409 — so the
    dispatch is regression-tested
    (tests/test_ops.py::test_kpair_score_regime_dispatch)."""
    K2, N = packed.shape
    u = packed.astype(jnp.int32)
    lo = plane(u & 0xF, 0)
    hi = plane((u >> 4) & 0xF, 0)
    w = jnp.stack([lo, hi], axis=1).reshape(2 * K2, N).astype(jnp.bfloat16)
    y = jnp.dot(x.astype(jnp.bfloat16), w,
                preferred_element_type=jnp.float32) + b2d
    return y.astype(out_dtype)


def _xla_kpair_dot(x, packed, plane, b2d, out_dtype, align=8):
    """XLA fallback for kpair weights: per-K-chunk dot pairs, each with the
    nibble decode fused into its operand read (same 1 B/elem ceiling as the
    halves layout, but summing partials instead of concatenating output
    halves). ``plane(nib, s)`` decodes a nibble chunk whose first packed row
    is ``s`` (formats with per-K-group side bands slice them by ``s``)."""
    xe, xo = _kpair_split(x)
    K2, N = packed.shape
    budget = (_KPAIR_XLA_CHUNK_ELEMS_MIDM
              if x.shape[0] >= _XLA_DOT_MIN_M else None)
    rows = _kpair_chunk_rows(K2, N, align, budget)
    y = jnp.broadcast_to(b2d, (x.shape[0], N)).astype(jnp.float32)
    for s in range(0, K2, rows):
        u = packed[s:s + rows].astype(jnp.int32)
        y = y + jnp.dot(xe[:, s:s + rows], plane(u & 0xF, s),
                        preferred_element_type=jnp.float32)
        y = y + jnp.dot(xo[:, s:s + rows], plane((u >> 4) & 0xF, s),
                        preferred_element_type=jnp.float32)
    return y.astype(out_dtype)


def _kpair_matmul_kernel(xe_ref, xo_ref, w_ref, b_ref, o_ref, lo_ref, hi_ref,
                         *, nib_decode, out_dtype):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        u = w_ref[...].astype(jnp.int32)  # [K/2, bn] packed bytes, read ONCE
        lo_ref[...] = nib_decode(u & 0xF)         # rows 0, 2, 4, ...
        hi_ref[...] = nib_decode((u >> 4) & 0xF)  # rows 1, 3, 5, ...

    o_ref[...] = (
        jnp.dot(xe_ref[...], lo_ref[...], preferred_element_type=jnp.float32)
        + jnp.dot(xo_ref[...], hi_ref[...], preferred_element_type=jnp.float32)
        + b_ref[...]
    ).astype(out_dtype)


def _kpair_matmul(x, packed, nib_decode, block_m, block_n, out_dtype, bias):
    """[M, K] @ kpair-packed 4-bit [K, N] -> [M, N] (shared lns4k/fp4k body)."""
    M, K = x.shape
    K2, N = packed.shape
    assert K == K2 * 2
    block_m, block_n = _blocks(block_m, block_n)
    b2d = _bias2d(bias, N)
    if (M >= _XLA_DOT_MIN_M or K * N < _KPAIR_FUSED_MIN_WEIGHT
            or K2 % 128 != 0 or N % 128 != 0 or K2 > _K_RESIDENT_MAX):
        if M >= _KPAIR_ONCE_DOT_MIN_M:
            return _xla_kpair_once_dot(x, packed,
                                       lambda u, s: nib_decode(u),
                                       b2d, out_dtype)
        return _xla_kpair_dot(x, packed, lambda u, s: nib_decode(u),
                              b2d, out_dtype)
    block_m = min(block_m, M)
    block_n = min(block_n, N)

    def _vmem(bm, bn):
        # xe+xo double-buffered bf16, packed tile double-buffered, two
        # decoded planes (scratch), out tile
        return (2 * (2 * bm * K2 * 2) + 2 * (K2 * bn)
                + 2 * K2 * bn * 2 + 2 * (bm * bn * 2))

    block_m, block_n = _shrink_blocks(block_m, block_n, _vmem)
    xe, xo = _kpair_split(x.astype(jnp.bfloat16))

    grid = (_cdiv(N, block_n), _cdiv(M, block_m))
    kernel = functools.partial(
        _kpair_matmul_kernel, nib_decode=nib_decode, out_dtype=out_dtype
    )
    return pl.pallas_call(
        kernel,
        interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, K2), lambda j, i: (i, 0)),
            pl.BlockSpec((block_m, K2), lambda j, i: (i, 0)),
            pl.BlockSpec((K2, block_n), lambda j, i: (0, j)),
            pl.BlockSpec((1, block_n), lambda j, i: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda j, i: (i, j)),
        scratch_shapes=[pltpu.VMEM((K2, block_n), jnp.bfloat16),
                        pltpu.VMEM((K2, block_n), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K2 * N + M * N * 2,
            transcendentals=0,
        ),
    )(xe, xo, packed, b2d)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "out_dtype"))
def lns4k_matmul(x, packed, block_m=None, block_n=None,
                 out_dtype=jnp.bfloat16, bias=None):
    """[M, K] @ kpair-packed 4-bit LNS [K, N] -> [M, N] (0.5 B/elem reads)."""
    return _kpair_matmul(x, packed, _lns4_nib_decode, block_m, block_n,
                         out_dtype, bias)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "out_dtype"))
def fp4k_matmul(x, packed, block_m=None, block_n=None,
                out_dtype=jnp.bfloat16, bias=None):
    """[M, K] @ kpair-packed E2M1 fp4 [K, N] -> [M, N] (0.5 B/elem reads)."""
    return _kpair_matmul(x, packed, _fp4_nib_decode, block_m, block_n,
                         out_dtype, bias)


def _int4gk_plane(nib, s_tile, z_tile, rows_per_group):
    """Affine decode of one kpair nibble plane [K/2, bn]: both rows of a
    packed byte share a group, so one band row covers group_size/2 packed
    rows (same sublane-split reshape as _mx_decode — lane dim untouched).
    The decode is the cheapest of the nibble formats: upcast, mul, add."""
    v = nib.astype(jnp.float32)
    K2, bn = v.shape
    v = v.reshape(K2 // rows_per_group, rows_per_group, bn)
    v = v * s_tile[:, None, :] + z_tile[:, None, :]
    return v.reshape(K2, bn).astype(jnp.bfloat16)


def _int4gk_matmul_kernel(xe_ref, xo_ref, w_ref, s_ref, z_ref, b_ref, o_ref,
                          lo_ref, hi_ref, *, rows_per_group, out_dtype):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        u = w_ref[...].astype(jnp.int32)  # packed bytes, read ONCE
        s, z = s_ref[...], z_ref[...]
        lo_ref[...] = _int4gk_plane(u & 0xF, s, z, rows_per_group)
        hi_ref[...] = _int4gk_plane((u >> 4) & 0xF, s, z, rows_per_group)

    o_ref[...] = (
        jnp.dot(xe_ref[...], lo_ref[...], preferred_element_type=jnp.float32)
        + jnp.dot(xo_ref[...], hi_ref[...], preferred_element_type=jnp.float32)
        + b_ref[...]
    ).astype(out_dtype)


def int4gk_matmul(x, packed, scale, zero, group_size=128, block_m=None,
                  block_n=None, out_dtype=jnp.bfloat16, bias=None):
    """[M, K] @ kpair-packed group-affine INT4 [K, N] -> [M, N].

    ``packed`` [K/2, N] pairs adjacent K rows; ``scale``/``zero`` [K/group, N]
    (ops.packing.Int4GroupKWeight — the GPTQ grid at true 0.5625 B/elem).

    Thin wrapper resolving the context-dependent mid-M dispatch threshold
    (`int4gk_prefill_kernel` scope) into a STATIC arg of the jitted body:
    the decision must ride the jit cache key, or the first trace of a shape
    outside the scope would be silently reused inside it."""
    return _int4gk_matmul_jit(
        x, packed, scale, zero, group_size=group_size, block_m=block_m,
        block_n=block_n, out_dtype=out_dtype, bias=bias,
        xla_min_m=_int4gk_xla_min_m())


def _int4gk_matmul_nojit(x, packed, scale, zero, group_size=128, block_m=None,
                         block_n=None, out_dtype=jnp.bfloat16, bias=None):
    """Un-jitted body with the context threshold resolved — keeps the
    ``fn.__wrapped__`` contract the pallas interpret-mode tests rely on."""
    return _int4gk_matmul_jit.__wrapped__(
        x, packed, scale, zero, group_size=group_size, block_m=block_m,
        block_n=block_n, out_dtype=out_dtype, bias=bias,
        xla_min_m=_int4gk_xla_min_m())


int4gk_matmul.__wrapped__ = _int4gk_matmul_nojit


@functools.partial(jax.jit, static_argnames=(
    "group_size", "block_m", "block_n", "out_dtype", "xla_min_m"))
def _int4gk_matmul_jit(x, packed, scale, zero, group_size=128, block_m=None,
                       block_n=None, out_dtype=jnp.bfloat16, bias=None,
                       xla_min_m=1024):
    M, K = x.shape
    K2, N = packed.shape
    assert K == K2 * 2
    rpg = group_size // 2
    block_m, block_n = _blocks(block_m, block_n)
    b2d = _bias2d(bias, N)
    if (M >= xla_min_m or K * N < _INT4GK_FUSED_MIN_WEIGHT
            or K2 % 128 != 0 or N % 128 != 0 or K2 > _K_RESIDENT_MAX):
        def plane(nib, s):
            g0, g1 = s // rpg, s // rpg + nib.shape[0] // rpg
            return _int4gk_plane(nib, scale[g0:g1], zero[g0:g1], rpg)

        if M >= _KPAIR_ONCE_DOT_MIN_M:
            return _xla_kpair_once_dot(x, packed, plane, b2d, out_dtype)
        return _xla_kpair_dot(x, packed, plane, b2d, out_dtype, align=rpg)
    block_m = min(block_m, M)
    block_n = min(block_n, N)
    G = K // group_size

    def _vmem(bm, bn):
        return (2 * (2 * bm * K2 * 2) + 2 * (K2 * bn) + 2 * (2 * G * bn * 4)
                + 2 * K2 * bn * 2 + 2 * (bm * bn * 2))

    block_m, block_n = _shrink_blocks(block_m, block_n, _vmem)
    xe, xo = _kpair_split(x.astype(jnp.bfloat16))

    grid = (_cdiv(N, block_n), _cdiv(M, block_m))
    kernel = functools.partial(
        _int4gk_matmul_kernel, rows_per_group=rpg, out_dtype=out_dtype
    )
    return pl.pallas_call(
        kernel,
        interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, K2), lambda j, i: (i, 0)),
            pl.BlockSpec((block_m, K2), lambda j, i: (i, 0)),
            pl.BlockSpec((K2, block_n), lambda j, i: (0, j)),
            pl.BlockSpec((G, block_n), lambda j, i: (0, j)),
            pl.BlockSpec((G, block_n), lambda j, i: (0, j)),
            pl.BlockSpec((1, block_n), lambda j, i: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda j, i: (i, j)),
        scratch_shapes=[pltpu.VMEM((K2, block_n), jnp.bfloat16),
                        pltpu.VMEM((K2, block_n), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K2 * N + 2 * G * N * 4 + M * N * 2,
            transcendentals=0,
        ),
    )(xe, xo, packed, scale, zero, b2d)


def _nf4k_plane(nib, s_tile, rows_per_block):
    """NF4 decode of one kpair nibble plane [K/2, bn]: packed-word LUT value
    (_nf4_nib_decode) times the block absmax broadcast over block_size/2
    packed rows."""
    v = _nf4_nib_decode(nib)
    K2, bn = v.shape
    v = v.reshape(K2 // rows_per_block, rows_per_block, bn) * s_tile[:, None, :]
    return v.reshape(K2, bn).astype(jnp.bfloat16)


def _nf4k_matmul_kernel(xe_ref, xo_ref, w_ref, s_ref, b_ref, o_ref,
                        lo_ref, hi_ref, *, rows_per_block, out_dtype):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        u = w_ref[...].astype(jnp.int32)
        s = s_ref[...]
        lo_ref[...] = _nf4k_plane(u & 0xF, s, rows_per_block)
        hi_ref[...] = _nf4k_plane((u >> 4) & 0xF, s, rows_per_block)

    o_ref[...] = (
        jnp.dot(xe_ref[...], lo_ref[...], preferred_element_type=jnp.float32)
        + jnp.dot(xo_ref[...], hi_ref[...], preferred_element_type=jnp.float32)
        + b_ref[...]
    ).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=(
    "block_size", "block_m", "block_n", "out_dtype"))
def nf4k_matmul(x, packed, bscale, block_size=64, block_m=None,
                block_n=None, out_dtype=jnp.bfloat16, bias=None):
    """[M, K] @ kpair-packed NF4 [K, N] -> [M, N].

    ``packed`` [K/2, N] pairs adjacent K rows; ``bscale`` [K/block, N]
    (ops.packing.NF4KWeight — QLoRA storage at true 0.5625 B/elem)."""
    M, K = x.shape
    K2, N = packed.shape
    assert K == K2 * 2
    rpb = block_size // 2
    block_m, block_n = _blocks(block_m, block_n)
    b2d = _bias2d(bias, N)
    if (M >= _XLA_DOT_MIN_M
            or K * N < min(_NF4K_FUSED_MIN_WEIGHT, _KPAIR_FUSED_MIN_WEIGHT)
            or K2 % 128 != 0 or N % 128 != 0 or K2 > _K_RESIDENT_MAX):
        def plane(nib, s):
            b0, b1 = s // rpb, s // rpb + nib.shape[0] // rpb
            return _nf4k_plane(nib, bscale[b0:b1], rpb)

        if M >= _KPAIR_ONCE_DOT_MIN_M:
            return _xla_kpair_once_dot(x, packed, plane, b2d, out_dtype)
        return _xla_kpair_dot(x, packed, plane, b2d, out_dtype, align=rpb)
    block_m = min(block_m, M)
    block_n = min(block_n, N)
    B = K // block_size

    def _vmem(bm, bn):
        return (2 * (2 * bm * K2 * 2) + 2 * (K2 * bn) + 2 * (B * bn * 4)
                + 2 * K2 * bn * 2 + 2 * (bm * bn * 2))

    block_m, block_n = _shrink_blocks(block_m, block_n, _vmem)
    xe, xo = _kpair_split(x.astype(jnp.bfloat16))

    grid = (_cdiv(N, block_n), _cdiv(M, block_m))
    kernel = functools.partial(
        _nf4k_matmul_kernel, rows_per_block=rpb, out_dtype=out_dtype
    )
    return pl.pallas_call(
        kernel,
        interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, K2), lambda j, i: (i, 0)),
            pl.BlockSpec((block_m, K2), lambda j, i: (i, 0)),
            pl.BlockSpec((K2, block_n), lambda j, i: (0, j)),
            pl.BlockSpec((B, block_n), lambda j, i: (0, j)),
            pl.BlockSpec((1, block_n), lambda j, i: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda j, i: (i, j)),
        scratch_shapes=[pltpu.VMEM((K2, block_n), jnp.bfloat16),
                        pltpu.VMEM((K2, block_n), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K2 * N + B * N * 4 + M * N * 2,
            transcendentals=0,
        ),
    )(xe, xo, packed, bscale, b2d)


# ---------------------------------------------------------------------------
# True W8A8: int8 activations x int8 weights on the MXU
# ---------------------------------------------------------------------------
#
# int8_matmul above is a *weight-compression* kernel (s8 codes upcast to bf16,
# bf16 MXU). This one is the serving W8A8 path: activations are quantized to
# int8 per row (dynamic symmetric absmax — the ZeroQuant/SmoothQuant recipe,
# reference huggingface.py:976-989 modulo power-of-2 scales) *inside the
# kernel* while the x tile is VMEM-resident, and the MXU runs a native
# s8 x s8 -> s32 dot, which has 2x the bf16 throughput on v5e+. The epilogue
# rescales by (row_scale x column_scale).


def _w8a8_quant_rows(x):
    """bf16/f32 [bm, K] -> (int8 codes, f32 per-row scale [bm, 1])."""
    x = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    rscale = jnp.maximum(absmax, 1e-30) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(x / rscale), -127.0, 127.0).astype(jnp.int8)
    return xq, rscale


def _w8a8_matmul_kernel(x_ref, w_ref, s_ref, b_ref, o_ref, *, out_dtype):
    xq, rscale = _w8a8_quant_rows(x_ref[...])
    acc = jnp.dot(xq, w_ref[...], preferred_element_type=jnp.int32)
    o_ref[...] = (
        acc.astype(jnp.float32) * rscale * s_ref[...] + b_ref[...]
    ).astype(out_dtype)


def _w8a8_matmul_ktiled_kernel(x_ref, w_ref, s_ref, b_ref, o_ref, acc_ref, *,
                               out_dtype):
    k_step = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_step == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # per-(row, k-tile) scales: group quantization along K — finer-grained
    # than one scale per row, so accumulate in f32 after rescaling each tile
    xq, rscale = _w8a8_quant_rows(x_ref[...])
    part = jnp.dot(xq, w_ref[...], preferred_element_type=jnp.int32)
    acc_ref[...] += part.astype(jnp.float32) * rscale

    @pl.when(k_step == nk - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s_ref[...] + b_ref[...]).astype(out_dtype)


def _w8a8_matmul_ktiled(x, codes, scale, b2d, out_dtype,
                        block_m=512, block_n=512, block_k=2048):
    M, K = x.shape
    _, N = codes.shape
    block_m = min(block_m, M)
    block_n = min(block_n, N)
    scale2d = scale.reshape(1, N).astype(jnp.float32)
    grid = (_cdiv(M, block_m), _cdiv(N, block_n), _cdiv(K, block_k))
    kernel = functools.partial(_w8a8_matmul_ktiled_kernel, out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K * N + M * N * 2,
            transcendentals=0,
        ),
    )(x, codes, scale2d, b2d)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "out_dtype"))
def w8a8_matmul(
    x: jax.Array,
    codes: jax.Array,
    scale: jax.Array,
    block_m=None,
    block_n=None,
    out_dtype=jnp.bfloat16,
    bias=None,
) -> jax.Array:
    """[M, K] bf16 @ int8 [K, N] (per-column scale [N]) -> [M, N], with the
    activations dynamically quantized to int8 per row in-kernel and the
    contraction running as a native s8 x s8 -> s32 MXU dot."""
    M, K = x.shape
    K2, N = codes.shape
    assert K == K2, (x.shape, codes.shape)
    block_m, block_n = _blocks(block_m, block_n)
    b2d = _bias2d(bias, N)

    def _xla():
        # XLA also runs the native s8 x s8 MXU dot; per-row dynamic act quant
        # vectorizes fine outside the kernel
        xq, rscale = _w8a8_quant_rows(x)
        acc = jax.lax.dot_general(
            xq, codes, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (acc.astype(jnp.float32) * rscale
             * scale.reshape(1, N).astype(jnp.float32))
        return (y + b2d).astype(out_dtype)

    if _dispatch_xla(M, K, N):
        return _xla()
    if _FORCE_KTILED or K > _K_RESIDENT_MAX:
        bk = _fit_block_k(K)
        if bk is None:  # no remainder-free k tile
            return _xla()
        return _w8a8_matmul_ktiled(
            x, codes, scale, b2d, out_dtype,
            block_m=block_m, block_n=block_n, block_k=bk,
        )
    block_m = min(block_m, M)
    block_n = min(block_n, N)

    def _vmem(bm, bn):
        return 2 * (bm * K * 2 + bm * K) + 2 * (K * bn) + 2 * (bm * bn * 4)

    block_m, block_n = _shrink_blocks(block_m, block_n, _vmem)

    grid = (_cdiv(N, block_n), _cdiv(M, block_m))
    scale2d = scale.reshape(1, N).astype(jnp.float32)
    kernel = functools.partial(_w8a8_matmul_kernel, out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, K), lambda j, i: (i, 0)),
            pl.BlockSpec((K, block_n), lambda j, i: (0, j)),
            pl.BlockSpec((1, block_n), lambda j, i: (0, j)),
            pl.BlockSpec((1, block_n), lambda j, i: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda j, i: (i, j)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K * N + M * N * 2,
            transcendentals=0,
        ),
    )(x, codes, scale2d, b2d)


def _int8_matmul_ktiled_kernel(x_ref, w_ref, s_ref, b_ref, o_ref, acc_ref, *,
                               out_dtype):
    k_step = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_step == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(
        x_ref[...], w_ref[...].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k_step == nk - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s_ref[...] + b_ref[...]).astype(out_dtype)


def _int8_matmul_ktiled(x, codes, scale, b2d, out_dtype,
                        block_m=512, block_n=512, block_k=2048):
    M, K = x.shape
    _, N = codes.shape
    block_m = min(block_m, M)
    block_n = min(block_n, N)
    block_k = min(block_k, K)
    grid = (_cdiv(M, block_m), _cdiv(N, block_n), _cdiv(K, block_k))
    scale2d = scale.reshape(1, N).astype(jnp.float32)
    kernel = functools.partial(_int8_matmul_ktiled_kernel, out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K * N + M * N * 2,
            transcendentals=0,
        ),
    )(x, codes, scale2d, b2d)


# ---------------------------------------------------------------------------
# MX block floating-point matmul (fp8-style codes + per-(K-block, col) scale)
# ---------------------------------------------------------------------------


def _mx_decode(u, s_tile, exp_bits, man_bits, block_size):
    """uint8 MX element codes [K, bn] + block scales [K/bs, bn] -> bf16.

    Pure integer bit-assembly (like _lns_decode): sign/exponent/mantissa are
    placed directly into float32 bit positions, then the per-block scale is
    applied through a sublane-split reshape (lane dim untouched).
    """
    mm = (1 << man_bits) - 1
    em = (1 << exp_bits) - 1
    bias = 2 ** (exp_bits - 1) - 1
    sb = (u & 0x80) << 24
    e = ((u >> man_bits) & em) - bias + 127
    mant = (u & mm) << (23 - man_bits)
    val = jax.lax.bitcast_convert_type(
        (sb | (e << 23) | mant).astype(jnp.int32), jnp.float32
    )
    K, bn = val.shape
    val = val.reshape(K // block_size, block_size, bn) * s_tile[:, None, :]
    return val.reshape(K, bn).astype(jnp.bfloat16)


def _mx_matmul_kernel(x_ref, w_ref, s_ref, b_ref, o_ref, wdec_ref, *,
                      exp_bits, man_bits, block_size, out_dtype):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        wdec_ref[...] = _mx_decode(
            w_ref[...].astype(jnp.int32), s_ref[...],
            exp_bits, man_bits, block_size,
        )

    o_ref[...] = (
        jnp.dot(x_ref[...], wdec_ref[...], preferred_element_type=jnp.float32)
        + b_ref[...]
    ).astype(out_dtype)


def _mx_matmul_ktiled_kernel(x_ref, w_ref, s_ref, b_ref, o_ref, acc_ref, *,
                             exp_bits, man_bits, block_size, out_dtype):
    k_step = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_step == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = _mx_decode(
        w_ref[...].astype(jnp.int32), s_ref[...], exp_bits, man_bits, block_size
    )
    acc_ref[...] += jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)

    @pl.when(k_step == nk - 1)
    def _():
        o_ref[...] = (acc_ref[...] + b_ref[...]).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=(
    "exp_bits", "man_bits", "block_size", "block_m", "block_n", "out_dtype"))
def mx_matmul(
    x: jax.Array,
    codes: jax.Array,
    bscale: jax.Array,
    exp_bits: int = 5,
    man_bits: int = 2,
    block_size: int = 16,
    block_m=None,
    block_n=None,
    out_dtype=jnp.bfloat16,
    bias=None,
) -> jax.Array:
    """[M, K] bf16 @ MX-packed [K, N] -> [M, N] with dequant fused in VMEM.

    Weight HBM traffic: 1 byte of code + 4/block_size bytes of scale per
    element (1.25 B at block 16, 1.125 B at block 32) vs 2 B bf16.
    """
    M, K = x.shape
    K2, N = codes.shape
    assert K == K2 and K % block_size == 0, (x.shape, codes.shape, block_size)
    block_m, block_n = _blocks(block_m, block_n)
    b2d = _bias2d(bias, N)
    if _dispatch_xla(M, K, N):
        w = _mx_decode(codes.astype(jnp.int32), bscale, exp_bits, man_bits,
                       block_size)
        return _xla_dot(x, w, b2d, out_dtype)
    kernel_args = dict(
        exp_bits=exp_bits, man_bits=man_bits, block_size=block_size,
        out_dtype=out_dtype,
    )
    if _FORCE_KTILED or K > _K_RESIDENT_MAX:
        block_k = _fit_block_k(K)
        if block_k is None:  # no remainder-free k tile: XLA dequant dot
            w = _mx_decode(codes.astype(jnp.int32), bscale, exp_bits,
                           man_bits, block_size)
            return _xla_dot(x, w, b2d, out_dtype)
        block_m = min(block_m, M)
        block_n = min(block_n, N)
        grid = (_cdiv(M, block_m), _cdiv(N, block_n), _cdiv(K, block_k))
        return pl.pallas_call(
            functools.partial(_mx_matmul_ktiled_kernel, **kernel_args),
            interpret=_interpret(),
            out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
                pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
                pl.BlockSpec(
                    (block_k // block_size, block_n), lambda i, j, k: (k, j)
                ),
                pl.BlockSpec((1, block_n), lambda i, j, k: (0, j)),
            ],
            out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * M * N * K,
                bytes_accessed=M * K * 2 + K * N + M * N * 2,
                transcendentals=0,
            ),
        )(x, codes, bscale, b2d)

    block_m = min(block_m, M)
    block_n = min(block_n, N)

    def _vmem(bm, bn):
        return 2 * (bm * K * 2) + 2 * (K * bn) + K * bn * 2 + 2 * (bm * bn * 2)

    block_m, block_n = _shrink_blocks(block_m, block_n, _vmem)

    grid = (_cdiv(N, block_n), _cdiv(M, block_m))
    return pl.pallas_call(
        functools.partial(_mx_matmul_kernel, **kernel_args),
        interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, K), lambda j, i: (i, 0)),
            pl.BlockSpec((K, block_n), lambda j, i: (0, j)),
            pl.BlockSpec((K // block_size, block_n), lambda j, i: (0, j)),
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
    )(x, codes, bscale, b2d)


# ---------------------------------------------------------------------------
# FP8 (custom-float, scale-free) dequant-fused matmul
# ---------------------------------------------------------------------------


def _fp8_decode(u, exp_bits, man_bits, e_bias):
    """uint8 fp_quant element codes [K, bn] -> bf16 (ops.packing.FP8Weight).

    Same integer bit-assembly as _mx_decode minus the block-scale multiply:
    sign/exponent/mantissa are placed directly into float32 bit positions.
    """
    mm = (1 << man_bits) - 1
    em = (1 << exp_bits) - 1
    sb = (u & 0x80) << 24
    e = ((u >> man_bits) & em) - e_bias + 127
    mant = (u & mm) << (23 - man_bits)
    return jax.lax.bitcast_convert_type(
        (sb | (e << 23) | mant).astype(jnp.int32), jnp.float32
    ).astype(jnp.bfloat16)


def _fp8_matmul_kernel(x_ref, w_ref, b_ref, o_ref, wdec_ref, *,
                       exp_bits, man_bits, e_bias, out_dtype):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        wdec_ref[...] = _fp8_decode(
            w_ref[...].astype(jnp.int32), exp_bits, man_bits, e_bias
        )

    o_ref[...] = (
        jnp.dot(x_ref[...], wdec_ref[...], preferred_element_type=jnp.float32)
        + b_ref[...]
    ).astype(out_dtype)


def _fp8_matmul_ktiled_kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *,
                              exp_bits, man_bits, e_bias, out_dtype):
    k_step = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_step == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = _fp8_decode(w_ref[...].astype(jnp.int32), exp_bits, man_bits, e_bias)
    acc_ref[...] += jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)

    @pl.when(k_step == nk - 1)
    def _():
        o_ref[...] = (acc_ref[...] + b_ref[...]).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=(
    "exp_bits", "man_bits", "e_bias", "block_m", "block_n", "out_dtype"))
def fp8_matmul(
    x: jax.Array,
    codes: jax.Array,
    exp_bits: int = 4,
    man_bits: int = 3,
    # 7 = pack_fp8's bias for its own defaults (exp_bits=4: e_min = -7);
    # always pass FP8Weight.e_bias — 8 for the reference's clamp-tweaked
    # E4M3 variant, 15 for E5M2
    e_bias: int = 7,
    block_m=None,
    block_n=None,
    out_dtype=jnp.bfloat16,
    bias=None,
) -> jax.Array:
    """[M, K] bf16 @ fp8-packed [K, N] -> [M, N] with dequant fused in VMEM.

    Weight HBM traffic: exactly 1 byte per element (no scale side-band) —
    the cheapest decode of the kernel zoo: two shifts, two masks, one add.
    """
    M, K = x.shape
    K2, N = codes.shape
    assert K == K2, (x.shape, codes.shape)
    block_m, block_n = _blocks(block_m, block_n)
    b2d = _bias2d(bias, N)
    if _dispatch_xla(M, K, N):
        w = _fp8_decode(codes.astype(jnp.int32), exp_bits, man_bits, e_bias)
        return _xla_dot(x, w, b2d, out_dtype)
    kernel_args = dict(
        exp_bits=exp_bits, man_bits=man_bits, e_bias=e_bias, out_dtype=out_dtype
    )
    if _FORCE_KTILED or K > _K_RESIDENT_MAX:
        block_k = _fit_block_k(K)
        if block_k is None:  # no remainder-free k tile: XLA dequant dot
            w = _fp8_decode(codes.astype(jnp.int32), exp_bits, man_bits,
                            e_bias)
            return _xla_dot(x, w, b2d, out_dtype)
        block_m = min(block_m, M)
        block_n = min(block_n, N)
        grid = (_cdiv(M, block_m), _cdiv(N, block_n), _cdiv(K, block_k))
        return pl.pallas_call(
            functools.partial(_fp8_matmul_ktiled_kernel, **kernel_args),
            interpret=_interpret(),
            out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
                pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
                pl.BlockSpec((1, block_n), lambda i, j, k: (0, j)),
            ],
            out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * M * N * K,
                bytes_accessed=M * K * 2 + K * N + M * N * 2,
                transcendentals=0,
            ),
        )(x, codes, b2d)

    block_m = min(block_m, M)
    block_n = min(block_n, N)

    def _vmem(bm, bn):
        return 2 * (bm * K * 2) + 2 * (K * bn) + K * bn * 2 + 2 * (bm * bn * 2)

    block_m, block_n = _shrink_blocks(block_m, block_n, _vmem)

    grid = (_cdiv(N, block_n), _cdiv(M, block_m))
    return pl.pallas_call(
        functools.partial(_fp8_matmul_kernel, **kernel_args),
        interpret=_interpret(),
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
    )(x, codes, b2d)


# ---------------------------------------------------------------------------
# 4-bit FP4 (E2M1) matmul: nibble-packed custom-float weights
# ---------------------------------------------------------------------------


def _fp4_matmul_kernel(x_ref, w_ref, b_ref, o_ref, wdec_ref, *,
                       n_half_tiles, out_dtype):
    j = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        u = w_ref[...].astype(jnp.int32)  # [K, bn] packed bytes (halves layout)
        nib = jnp.where(j < n_half_tiles, u & 0xF, (u >> 4) & 0xF)
        wdec_ref[...] = _fp4_nib_decode(nib)

    o_ref[...] = (
        jnp.dot(x_ref[...], wdec_ref[...], preferred_element_type=jnp.float32)
        + b_ref[...]
    ).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "out_dtype"))
def fp4_matmul(
    x: jax.Array,
    packed: jax.Array,
    block_m=None,
    block_n=None,
    out_dtype=jnp.bfloat16,
    bias=None,
) -> jax.Array:
    """[M, K] bf16 @ nibble-packed E2M1 [K, N] -> [M, N].

    ``packed`` uses the halves layout (ops.packing.FP4Weight); tiling and
    fallback rules are identical to lns4_matmul.
    """
    M, K = x.shape
    K2, N_half = packed.shape
    N = N_half * 2
    assert K == K2
    block_m, block_n = _blocks(block_m, block_n)
    if _dispatch_xla(M, K, N) or N_half % 128 != 0 or K % 8 != 0:
        return _xla_halves_dot(x, packed, _fp4_nib_decode,
                               _bias2d(bias, N), out_dtype)
    block_m = min(block_m, M)
    block_n = min(block_n, N_half)

    def _vmem(bm, bn):
        return 2 * (bm * K * 2) + 2 * (K * bn) + K * bn * 2 + 2 * (bm * bn * 2)

    block_m, block_n = _shrink_blocks(block_m, block_n, _vmem)
    while N_half % block_n:
        block_n = _shrink_n(block_n)

    b2d = _bias2d(bias, N)
    n_half_tiles = N_half // block_n
    grid = (2 * n_half_tiles, _cdiv(M, block_m))
    kernel = functools.partial(
        _fp4_matmul_kernel, n_half_tiles=n_half_tiles, out_dtype=out_dtype
    )
    return pl.pallas_call(
        kernel,
        interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, K), lambda j, i: (i, 0)),
            pl.BlockSpec((K, block_n), lambda j, i: (0, j % n_half_tiles)),
            pl.BlockSpec((1, block_n), lambda j, i: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda j, i: (i, j)),
        scratch_shapes=[pltpu.VMEM((K, block_n), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K * N // 2 + M * N * 2,
            transcendentals=0,
        ),
    )(x, packed, b2d)


# ---------------------------------------------------------------------------
# NF4 (QLoRA NormalFloat-4) matmul: nibble codebook + per-K-block absmax
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _nf4_value_words():
    """The 16 NF4 code values as bf16 bit patterns, packed 2-per-u32."""
    import ml_dtypes
    import numpy as np

    from ..quant.formats import NF4_CODE

    bits = [
        int(np.asarray(np.float32(v), ml_dtypes.bfloat16).view(np.uint16))
        for v in NF4_CODE
    ]
    words = [bits[2 * i] | (bits[2 * i + 1] << 16) for i in range(8)]
    # as signed int32 two's complement (the high half may carry a sign bit)
    return tuple(w - (1 << 32) if w >= (1 << 31) else w for w in words)


def _nf4_nib_decode(nib):
    """NF4 nibble [.., 4 bits] -> bf16 code value (as f32) via a packed LUT.

    Unlike the LNS/FP nibbles, NF4 code values are arbitrary quantile
    constants, so there is no pure bit-assembly shortcut. A naive 15-deep
    ``where(nib == i, ...)`` chain costs ~30 VPU ops/element and measured
    0.58x of bf16 decode throughput at 1.5B — the decode sat on the critical
    path (BASELINE.md). Instead the 16 bf16 code values live packed 2-per-u32
    in 8 constant words (the _lns_mant_words trick): 7 compare-selects pick
    the word, one variable shift picks the half, and the bf16 pattern is
    shifted into float32 position — everything stays elementwise, so XLA
    still fuses the decode into the dot's operand read."""
    words = _nf4_value_words()
    r = nib >> 1
    w = jnp.int32(words[7])
    for i in reversed(range(7)):
        w = jnp.where(r == i, jnp.int32(words[i]), w)
    bits = ((w >> ((nib & 1) << 4)) & 0xFFFF) << 16
    return jax.lax.bitcast_convert_type(bits.astype(jnp.int32), jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_size", "out_dtype"))
def nf4_matmul(
    x: jax.Array,
    packed: jax.Array,
    bscale: jax.Array,
    block_size: int = 64,
    out_dtype=jnp.bfloat16,
    bias=None,
) -> jax.Array:
    """[M, K] bf16 @ nibble-packed NF4 [K, N] -> [M, N].

    ``packed`` uses the halves layout and ``bscale`` is halves-aligned
    [K/block, 2, N/2] (ops.packing.NF4Weight). Runs as two XLA dots with the
    decode + block-scale multiply as elementwise producers of each dot's
    weight operand (see _xla_halves_dot for why two dots, not a concat).

    The decode reads bf16-rounded code values from the packed LUT (the
    same target-is-bf16 convention as the LNS decodes), so the effective
    weight differs from unpack_nf4's round-after-scale by <= 2^-8 relative —
    noise against the 4-bit format's ~6% quantization step.

    Deliberately no fused Mosaic variant: the halves-layout kernel study
    (BASELINE.md — lns4's fused kernel measured 0.66x of this XLA dispatch
    at 7B decode shapes) showed the packed tile being read once per output
    half plus in-tile decode->dot serialization loses more than the packed
    read saves, and NF4 adds a scale multiply on top. XLA fuses the decode
    into its own matmul's operand read, so the weight is only ever read
    packed either way.
    """
    M, K = x.shape
    K2, N_half = packed.shape
    N = N_half * 2
    assert K == K2 and K % block_size == 0, (x.shape, packed.shape, block_size)
    b2d = _bias2d(bias, N)
    u = packed.astype(jnp.int32)

    def _half(h):
        val = _nf4_nib_decode((u >> (4 * h)) & 0xF)
        s = bscale[:, h, :]
        w = (
            val.reshape(K // block_size, block_size, N_half) * s[:, None, :]
        ).reshape(K, N_half).astype(jnp.bfloat16)
        return jnp.dot(x, w, preferred_element_type=jnp.float32)

    y = jnp.concatenate([_half(0), _half(1)], axis=1) + b2d
    return y.astype(out_dtype)


# ---------------------------------------------------------------------------
# INT4 group-affine matmul (the GPTQ/AWQ grid): nibbles + (scale, zero)/group
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("group_size", "out_dtype"))
def int4g_matmul(
    x: jax.Array,
    packed: jax.Array,
    scale: jax.Array,
    zero: jax.Array,
    group_size: int = 128,
    out_dtype=jnp.bfloat16,
    bias=None,
) -> jax.Array:
    """[M, K] bf16 @ nibble-packed group-affine INT4 [K, N] -> [M, N].

    ``packed`` uses the halves layout; ``scale``/``zero`` are halves-aligned
    [K/group, 2, N/2] (ops.packing.Int4GroupWeight). Two XLA dots with the
    nibble upcast and the per-group affine (mul-add) fused as elementwise
    producers of each dot's weight operand — the same dispatch rationale as
    nf4_matmul (no fused Mosaic variant: see that docstring).
    """
    M, K = x.shape
    K2, N_half = packed.shape
    N = N_half * 2
    assert K == K2 and K % group_size == 0, (x.shape, packed.shape, group_size)
    b2d = _bias2d(bias, N)
    u = packed.astype(jnp.int32)

    def _half(h):
        nib = ((u >> (4 * h)) & 0xF).astype(jnp.float32)
        g = K // group_size
        w = (
            nib.reshape(g, group_size, N_half) * scale[:, h, None, :]
            + zero[:, h, None, :]
        ).reshape(K, N_half).astype(jnp.bfloat16)
        return jnp.dot(x, w, preferred_element_type=jnp.float32)

    y = jnp.concatenate([_half(0), _half(1)], axis=1) + b2d
    return y.astype(out_dtype)
