"""Quantized weight storage formats (host-side packing, pure JAX).

The reference only ever emulates quantization (quantize->dequantize in fp32,
SURVEY.md §0); the real-quant tier here stores weights in packed integer
codes that the Pallas kernels (ops/matmul.py) dequantize on the fly inside
the matmul — halving (LNS8/INT8) or quartering (LNS4) HBM traffic, which is
the win that matters on TPU where matmuls at serving batch sizes are
bandwidth-bound.

LNS code layout (1 byte per weight, matching quant.formats.lns_quant's grid):
  bit 7      sign
  bits 0-6   k + 64  where  value = sign * 2^(k / 2^frac_bits)
k is clamped to the format's exponent range (lns8: f=3, k in [-64, 63] i.e.
2^±8; lns4: f=1, k in [-4, 3] — stored in the same byte for now, bit-packing
two-per-byte lands with the serving path).

INT8 layout: plain int8 codes + one float32 scale per output column
(symmetric absmax, the standard W8A8 weight recipe).
"""

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_with_keys_class
class LNSWeight:
    """Packed LNS weight: uint8 codes [K, N] + static frac_bits."""

    def __init__(self, codes, frac_bits: int):
        self.codes = codes
        self.frac_bits = frac_bits

    @property
    def shape(self):
        return self.codes.shape

    @property
    def ndim(self):
        return self.codes.ndim

    def tree_flatten_with_keys(self):
        return ((jax.tree_util.GetAttrKey("codes"), self.codes),), self.frac_bits

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)


@jax.tree_util.register_pytree_with_keys_class
class Int8Weight:
    """Packed int8 weight: codes [K, N] + per-column float32 scale [N]."""

    def __init__(self, codes, scale):
        self.codes = codes
        self.scale = scale

    @property
    def shape(self):
        return self.codes.shape

    @property
    def ndim(self):
        return self.codes.ndim

    def tree_flatten_with_keys(self):
        return (
            (jax.tree_util.GetAttrKey("codes"), self.codes),
            (jax.tree_util.GetAttrKey("scale"), self.scale),
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1])


def pack_lns(w: jax.Array, frac_bits: int = 3, man_bits: int = 4) -> LNSWeight:
    """Quantize weights onto the LNS grid and pack codes into uint8.

    The represented value set equals quant.formats.lns_quant(w, man_bits,
    frac_bits) for every non-zero w (zeros clamp to +threshold_down there;
    here too, preserving the emulation's semantics), EXCEPT the grid's top
    point: the 7-bit code field holds k in [-64, 63], so the fake grid's
    k = 64 (|w| rounding to 2^8 for lns8) saturates down to k = 63 —
    same top-merge convention as LNS4Weight.
    """
    from ..quant.formats import _lns_grid_tables

    threshold_clamp = 2 ** (man_bits - 1)
    up = float(2**threshold_clamp)
    down = float(2.0**-threshold_clamp)

    w = w.astype(jnp.float32)
    mag = jnp.clip(jnp.abs(w), down, up)
    # exact boundary-count rounding (same mechanism as formats.lns_quant):
    # libm round(log2(x)*2^f) can land one code off for inputs within ~1 ulp
    # of a half-step boundary, making the packed and fake tiers of the same
    # spec disagree element-wise
    bounds, _ = _lns_grid_tables(frac_bits)
    bits = jax.lax.bitcast_convert_type(mag, jnp.int32)
    m23 = bits & 0x7FFFFF
    j = (m23 >= bounds[0]).astype(jnp.int32)
    for b in bounds[1:]:
        j += (m23 >= b).astype(jnp.int32)
    e = (bits >> 23) - 127
    k = e * (1 << frac_bits) + j
    k = jnp.clip(k, -64, 63)
    sign = (w < 0).astype(jnp.uint8)
    codes = ((k + 64).astype(jnp.uint8) & 0x7F) | (sign << 7)
    return LNSWeight(codes, frac_bits)


def _lns_exact_mag(k, frac_bits):
    """Exact 2^(k/2^f) by float32 bit assembly: exponent field from the
    integer part, mantissa from the correctly-rounded grid table (libm exp2
    is ~1 ulp off, which would put the dequant off the fake tier's grid)."""
    from ..quant.formats import _lns_grid_tables

    _, mants = _lns_grid_tables(frac_bits)
    e = k >> frac_bits  # floor division (k may be negative)
    j = k - (e << frac_bits)
    mant = jnp.asarray(mants, jnp.int32)[j]
    return jax.lax.bitcast_convert_type(((e + 127) << 23) | mant, jnp.float32)


def unpack_lns(q: LNSWeight, dtype=jnp.bfloat16) -> jax.Array:
    """Reference (XLA) dequant — the Pallas kernels fuse this into the matmul."""
    u = q.codes.astype(jnp.int32)
    k = (u & 0x7F) - 64
    mag = _lns_exact_mag(k, q.frac_bits)
    val = jnp.where((u & 0x80) != 0, -mag, mag)
    return val.astype(dtype)


def pack_int8(w: jax.Array) -> Int8Weight:
    """Symmetric per-column absmax int8 quantization."""
    w = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    codes = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return Int8Weight(codes, scale)


def unpack_int8(q: Int8Weight, dtype=jnp.bfloat16) -> jax.Array:
    return (q.codes.astype(jnp.float32) * q.scale).astype(dtype)


@jax.tree_util.register_pytree_with_keys_class
class LNS4Weight:
    """True 4-bit LNS weights: two codes per byte, packed along N in halves.

    Code nibble: bit 3 = sign, bits 0-2 = k + 4 where value = sign * 2^(k/2),
    k in [-4, 3] — the genuine 4-bit LNS grid (1 sign + 2 int + 1 frac bit).
    Note: the fake-quant emulation (quant.formats.lns4) admits k = +4 because
    its clamp bound 2^2 is inclusive; the packed grid tops out at 2^1.5.

    Byte layout: packed[k, j] holds column j in the LOW nibble and column
    j + N/2 in the HIGH nibble. The halves layout (vs interleaved pairs) is
    deliberate: the Pallas kernel decodes a whole [K, bn] tile by selecting
    one nibble per grid column — Mosaic cannot lower the lane-interleaving
    shape cast an even/odd pairing would need.
    """

    def __init__(self, packed):
        self.packed = packed  # uint8 [K, N//2]

    @property
    def shape(self):
        return (self.packed.shape[0], self.packed.shape[1] * 2)

    @property
    def ndim(self):
        return 2

    def tree_flatten_with_keys(self):
        return ((jax.tree_util.GetAttrKey("packed"), self.packed),), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


def _lns4_nibbles(w: jax.Array) -> jax.Array:
    """[K, N] float -> [K, N] uint8 nibbles on the 4-bit LNS grid (shared by
    the halves-N and kpair-K packers — one grid, two byte layouts)."""
    from ..quant.formats import _lns_grid_tables

    w = w.astype(jnp.float32)
    mag = jnp.clip(jnp.abs(w), 2.0**-2, 2.0**2)
    # exact boundary-count rounding — see pack_lns
    bounds, _ = _lns_grid_tables(1)
    bits = jax.lax.bitcast_convert_type(mag, jnp.int32)
    m23 = bits & 0x7FFFFF
    j = (m23 >= bounds[0]).astype(jnp.int32)
    for b in bounds[1:]:
        j += (m23 >= b).astype(jnp.int32)
    k = jnp.clip(((bits >> 23) - 127) * 2 + j, -4, 3)
    sign = (w < 0).astype(jnp.int32)
    return ((k + 4) | (sign << 3)).astype(jnp.uint8)  # [K, N] in [0, 15]


def pack_lns4(w: jax.Array) -> LNS4Weight:
    """Quantize to the 4-bit LNS grid and pack two codes per byte (halves
    layout along N: low nibble = column j, high nibble = column j + N/2)."""
    K, N = w.shape
    assert N % 2 == 0, "N must be even for nibble packing"
    nib = _lns4_nibbles(w)
    lo = nib[:, : N // 2]
    hi = nib[:, N // 2 :]
    return LNS4Weight((lo | (hi << 4)).astype(jnp.uint8))


def unpack_lns4(q: LNS4Weight, dtype=jnp.bfloat16) -> jax.Array:
    u = q.packed.astype(jnp.int32)
    nib = jnp.concatenate([u & 0xF, (u >> 4) & 0xF], axis=1)
    k = (nib & 0x7) - 4
    mag = _lns_exact_mag(k, 1)
    val = jnp.where((nib & 0x8) != 0, -mag, mag)
    return val.astype(dtype)


@jax.tree_util.register_pytree_with_keys_class
class MXWeight:
    """MX block floating-point weights: fp8-style element codes + one f32
    scale per (K-block, column).

    Element byte: sign(1) | biased exponent (exp_bits) | mantissa (man_bits).
    The represented value is ``(1 + m/2^man) * 2^(e - bias) * bscale`` with
    ``bscale = round(max|block|) / 2^threshold`` — exactly the grid of
    quant.formats.mx_block_quant (reference huggingface.py:472-619), except
    that the single lowest binade of the scaled range (values down-clamped
    to ``2^-threshold``, i.e. ~2^(2*threshold) below the block max) is
    merged one binade up so the exponent fits ``exp_bits`` bits. Blocks run
    along K (the contraction dim), matching the reference's row-axis
    blocking of activations.
    """

    def __init__(self, codes, bscale, exp_bits: int, man_bits: int,
                 block_size: int):
        self.codes = codes      # uint8 [K, N]
        self.bscale = bscale    # f32 [K/block, N]
        self.exp_bits = exp_bits
        self.man_bits = man_bits
        self.block_size = block_size

    @property
    def shape(self):
        return self.codes.shape

    @property
    def ndim(self):
        return 2

    def tree_flatten_with_keys(self):
        return (
            (jax.tree_util.GetAttrKey("codes"), self.codes),
            (jax.tree_util.GetAttrKey("bscale"), self.bscale),
        ), (self.exp_bits, self.man_bits, self.block_size)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)


def pack_mx(w: jax.Array, block_size: int = 16, exp_bits: int = 5,
            man_bits: int = 2) -> MXWeight:
    """Quantize [K, N] onto the reference MX grid and pack element codes.

    K must be a multiple of ``block_size`` (true for every transformer
    projection at the sizes the kernels target).
    """
    K, N = w.shape
    assert K % block_size == 0, (K, block_size)
    threshold = 2 ** (exp_bits - 1)
    up = float(2**threshold)
    down = float(2.0**-threshold)
    bias = threshold - 1  # exponent stored in [0, 2^exp_bits - 1], e >= -bias

    w = w.astype(jnp.float32)
    xb = w.reshape(K // block_size, block_size, N)
    max_vals = jnp.round(jnp.max(jnp.abs(xb), axis=1, keepdims=True))
    max_vals = jnp.where(max_vals == 0, 1.0, max_vals)

    scaled = jnp.clip(jnp.abs(xb) * (up / max_vals), down, up)
    e = jnp.floor(jnp.log2(scaled)).astype(jnp.int32)
    # ldexp, not exp2: libm exp2 is inexact for |e| >= 13 and shifts exact
    # round-half-even mantissa ties off the mx_block_quant grid (pack_fp8
    # uses ldexp for the same reason)
    m = jnp.round((scaled / jnp.ldexp(jnp.float32(1.0), e) - 1.0)
                  * float(2**man_bits)).astype(jnp.int32)
    # m may round up to 2^man (next binade); renormalize
    roll = m >= 2**man_bits
    e = jnp.where(roll, e + 1, e)
    m = jnp.where(roll, 0, m)
    # merge the lowest binade up so e fits exp_bits (see class docstring)
    m = jnp.where(e < -bias, 0, m)
    e = jnp.clip(e, -bias, threshold)

    sign = (xb < 0).astype(jnp.uint8)
    code = (
        (sign << 7)
        | (((e + bias).astype(jnp.uint8) & ((1 << exp_bits) - 1)) << man_bits)
        | (m.astype(jnp.uint8) & ((1 << man_bits) - 1))
    )
    return MXWeight(
        codes=code.reshape(K, N).astype(jnp.uint8),
        bscale=(max_vals[:, 0, :] / up).astype(jnp.float32),
        exp_bits=exp_bits,
        man_bits=man_bits,
        block_size=block_size,
    )


def unpack_mx(q: MXWeight, dtype=jnp.bfloat16) -> jax.Array:
    """Reference (XLA) dequant — the Pallas kernel fuses this into the matmul."""
    bias = 2 ** (q.exp_bits - 1) - 1
    u = q.codes.astype(jnp.int32)
    m = u & ((1 << q.man_bits) - 1)
    e = ((u >> q.man_bits) & ((1 << q.exp_bits) - 1)) - bias
    # ldexp keeps the decode bit-exact (exp2 drifts ~5e-7 at |e| >= 13,
    # off the grid the Pallas/XLA kernels decode exactly)
    mag = jnp.ldexp(
        1.0 + m.astype(jnp.float32) / float(2**q.man_bits), e
    )
    val = jnp.where((u & 0x80) != 0, -mag, mag)
    K, N = q.codes.shape
    scale = jnp.repeat(q.bscale, q.block_size, axis=0)
    return (val * scale).astype(dtype)


@jax.tree_util.register_pytree_with_keys_class
class FP8Weight:
    """Packed custom-float weight: one uint8 code per element, no scales.

    Element byte: sign(1) | stored exponent (exp_bits) | mantissa (man_bits);
    the represented value is ``(1 + m/2^man_bits) * 2^(e_stored - e_bias)`` —
    exactly the grid of quant.formats.fp_quant (reference float8 block,
    huggingface.py:343-470). The reference's active E4M3 variant narrows the
    clamp range to [10*2^-8, 0.5*2^8], which spans 13 binades — it fits 4
    exponent bits outright, so packing is bit-faithful. The wide variants
    (plain E4M3 / E5M2) span 2^exp_bits + 1 binades; as in MXWeight, the
    single lowest binade merges one binade up to fit.
    """

    def __init__(self, codes, exp_bits: int, man_bits: int, e_bias: int):
        self.codes = codes  # uint8 [K, N]
        self.exp_bits = exp_bits
        self.man_bits = man_bits
        self.e_bias = e_bias  # real exponent = stored - e_bias

    @property
    def shape(self):
        return self.codes.shape

    @property
    def ndim(self):
        return 2

    def tree_flatten_with_keys(self):
        return (
            (jax.tree_util.GetAttrKey("codes"), self.codes),
        ), (self.exp_bits, self.man_bits, self.e_bias)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


def pack_fp8(w: jax.Array, exp_bits: int = 4, man_bits: int = 3,
             clamp_up_mul: float = 1.0, clamp_down_mul: float = 1.0) -> FP8Weight:
    """Quantize [K, N] onto the fp_quant grid and pack one byte per element."""
    import math

    K, N = w.shape
    threshold = 2 ** (exp_bits - 1)
    up = float(2**threshold) * clamp_up_mul
    down = float(2.0**-threshold) * clamp_down_mul

    w = w.astype(jnp.float32)
    # fp_quant maps zeros to +down (formats._signed_clamp)
    c = jnp.clip(jnp.abs(w), down, up)
    e = jnp.floor(jnp.log2(c)).astype(jnp.int32)
    # ldexp, not exp2 (exp2 lowers to exp(x*ln2), ~1 ULP off) — fp_quant
    # divides by ldexp(1, e) and bit-exactness requires the same divisor
    m = jnp.round((c / jnp.ldexp(jnp.float32(1.0), e) - 1.0)
                  * float(2**man_bits)).astype(jnp.int32)
    # mantissa rounding up to 2^man rolls into the next binade
    roll = m >= 2**man_bits
    e = jnp.where(roll, e + 1, e)
    m = jnp.where(roll, 0, m)

    e_max = math.floor(math.log2(up))
    if float(2.0**e_max) < up:  # non-power-of-2 cap: rolls may land one up
        e_max += 1
    e_min = e_max - (2**exp_bits - 1)
    # merge any binade below the storable floor up to it (wide variants only)
    m = jnp.where(e < e_min, 0, m)
    e = jnp.clip(e, e_min, e_max)

    sign = (w < 0).astype(jnp.uint8)
    code = (
        (sign << 7)
        | (((e - e_min).astype(jnp.uint8) & ((1 << exp_bits) - 1)) << man_bits)
        | (m.astype(jnp.uint8) & ((1 << man_bits) - 1))
    )
    return FP8Weight(
        codes=code.astype(jnp.uint8), exp_bits=exp_bits, man_bits=man_bits,
        e_bias=-e_min,
    )


def unpack_fp8(q: FP8Weight, dtype=jnp.bfloat16) -> jax.Array:
    """Reference (XLA) dequant — the Pallas kernel fuses this into the matmul."""
    u = q.codes.astype(jnp.int32)
    m = u & ((1 << q.man_bits) - 1)
    e = ((u >> q.man_bits) & ((1 << q.exp_bits) - 1)) - q.e_bias
    # ldexp, not exp2: exp2 lowers to exp(x*ln2) and is ~1 ULP off, which
    # breaks the bit-exactness contract vs formats.fp_quant
    mag = jnp.ldexp(
        1.0 + m.astype(jnp.float32) / float(2**q.man_bits), e
    )
    return jnp.where((u & 0x80) != 0, -mag, mag).astype(dtype)


@jax.tree_util.register_pytree_with_keys_class
class FP4Weight:
    """True 4-bit custom-float (E2M1) weights: two codes per byte, halves
    layout along N (same byte layout rationale as LNS4Weight).

    Code nibble: bit 3 = sign, bits 1-2 = stored exponent (e + 2), bit 0 =
    mantissa; value = sign * (1 + m/2) * 2^(e_stored - 2). The fp_quant E2M1
    grid (quant.formats.fp4_e2m1, reference float4 block huggingface.py:
    1338-1428) spans binades -2..2 — one more than 2 exponent bits hold —
    so the packed grid merges the TOP grid point down (4.0 -> 3.0): weights
    overwhelmingly populate the bottom of the grid (|w| << 0.25 clamps up to
    the 0.25 floor), so bottom-binade fidelity is what matters; only values
    in [3.5, 4] are affected.
    """

    def __init__(self, packed):
        self.packed = packed  # uint8 [K, N//2]

    @property
    def shape(self):
        return (self.packed.shape[0], self.packed.shape[1] * 2)

    @property
    def ndim(self):
        return 2

    def tree_flatten_with_keys(self):
        return ((jax.tree_util.GetAttrKey("packed"), self.packed),), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


def _fp4_nibbles(w: jax.Array) -> jax.Array:
    """[K, N] float -> [K, N] uint8 nibbles on the E2M1 fp_quant grid
    (shared by the halves-N and kpair-K packers)."""
    w = w.astype(jnp.float32)
    c = jnp.clip(jnp.abs(w), 0.25, 4.0)  # fp_quant maps zeros to +down
    e = jnp.floor(jnp.log2(c)).astype(jnp.int32)
    m = jnp.round((c / jnp.ldexp(jnp.float32(1.0), e) - 1.0) * 2.0).astype(jnp.int32)
    roll = m >= 2
    e = jnp.where(roll, e + 1, e)
    m = jnp.where(roll, 0, m)
    # top merge: 4.0 (e=2, m=0) -> 3.0 (e=1, m=1); see FP4Weight docstring
    m = jnp.where(e > 1, 1, m)
    e = jnp.clip(e, -2, 1)
    sign = (w < 0).astype(jnp.int32)
    return ((sign << 3) | ((e + 2) << 1) | m).astype(jnp.uint8)


def pack_fp4(w: jax.Array) -> FP4Weight:
    """Quantize [K, N] onto the E2M1 fp_quant grid and pack two nibbles per
    byte (halves layout: low nibble = column j, high = column j + N/2)."""
    K, N = w.shape
    assert N % 2 == 0, "N must be even for nibble packing"
    nib = _fp4_nibbles(w)
    lo = nib[:, : N // 2]
    hi = nib[:, N // 2 :]
    return FP4Weight((lo | (hi << 4)).astype(jnp.uint8))


def unpack_fp4(q: FP4Weight, dtype=jnp.bfloat16) -> jax.Array:
    u = q.packed.astype(jnp.int32)
    nib = jnp.concatenate([u & 0xF, (u >> 4) & 0xF], axis=1)
    e = ((nib >> 1) & 0x3) - 2
    mag = jnp.ldexp(1.0 + (nib & 1).astype(jnp.float32) * 0.5, e)
    return jnp.where((nib & 0x8) != 0, -mag, mag).astype(dtype)


@jax.tree_util.register_pytree_with_keys_class
class NF4Weight:
    """True 4-bit NF4 (QLoRA NormalFloat) weights: codebook nibbles packed
    two per byte (halves layout along N, like LNS4Weight) + per-(K-block,
    column) float32 absmax scales.

    Nibble = index into quant.formats.NF4_CODE; value = NF4_CODE[nib] *
    absmax[block, col] — exactly the grid of quant.formats.nf4_quant with
    blocks along K. This is the storage format of the reference's
    bitsandbytes ``load_in_4bit`` path (huggingface.py:1799-1822), here
    first-class instead of behind a CUDA-only loader. ``bscale`` is stored
    halves-aligned [K/block, 2, N/2] (axis 2 tracks the packed byte columns)
    so tensor-parallel shards of packed bytes and scales stay contiguous
    together (ops/tp.py).

    HBM traffic: 0.5 B/elem of codes + 4/block B/elem of scales
    (0.5625 B at block 64) vs 2 B bf16.
    """

    def __init__(self, packed, bscale, block_size: int):
        self.packed = packed    # uint8 [K, N//2]
        self.bscale = bscale    # f32 [K/block, 2, N//2]
        self.block_size = block_size

    @property
    def shape(self):
        return (self.packed.shape[0], self.packed.shape[1] * 2)

    @property
    def ndim(self):
        return 2

    def tree_flatten_with_keys(self):
        return (
            (jax.tree_util.GetAttrKey("packed"), self.packed),
            (jax.tree_util.GetAttrKey("bscale"), self.bscale),
        ), self.block_size

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)


def pack_nf4(w: jax.Array, block_size: int = 64,
             double_quant: bool = False) -> NF4Weight:
    """Quantize [K, N] onto the nf4_quant grid (K-axis blocks) and pack
    codebook nibbles two per byte (halves layout along N).

    ``double_quant`` stores the double-quantized absmax reconstruction in
    ``bscale`` (value-identical to quant.formats.nf4_dq; storage stays f32 —
    the scales are 1/128 of the codes' bytes, so re-compressing them buys
    nothing on this tier)."""
    from ..quant.formats import _int8_block_quant_flat, _nf4_snap_codes

    K, N = w.shape
    assert K % block_size == 0 and N % 2 == 0, (w.shape, block_size)
    w = w.astype(jnp.float32)
    xb = w.reshape(K // block_size, block_size, N)
    absmax = jnp.max(jnp.abs(xb), axis=1, keepdims=True)
    absmax = jnp.where(absmax == 0, 1.0, absmax)
    nib = _nf4_snap_codes(xb / absmax).reshape(K, N).astype(jnp.uint8)
    if double_quant:  # codes use the true absmax; only the stored scale moves
        flat = absmax.reshape(-1)
        offset = jnp.mean(flat)
        flat = _int8_block_quant_flat(flat - offset, 256) + offset
        absmax = flat.reshape(absmax.shape)
    lo = nib[:, : N // 2]
    hi = nib[:, N // 2 :]
    bscale = absmax[:, 0, :].reshape(K // block_size, 2, N // 2)
    return NF4Weight(
        (lo | (hi << 4)).astype(jnp.uint8), bscale.astype(jnp.float32),
        block_size,
    )


def unpack_nf4(q: NF4Weight, dtype=jnp.bfloat16) -> jax.Array:
    """Reference (XLA) dequant — matches quant.formats.nf4_quant elementwise."""
    from ..quant.formats import NF4_CODE

    u = q.packed.astype(jnp.int32)
    nib = jnp.concatenate([u & 0xF, (u >> 4) & 0xF], axis=1)
    val = jnp.asarray(NF4_CODE, jnp.float32)[nib]
    K, N = val.shape
    scale = q.bscale.reshape(q.bscale.shape[0], N)
    val = val.reshape(K // q.block_size, q.block_size, N) * scale[:, None, :]
    return val.reshape(K, N).astype(dtype)


@jax.tree_util.register_pytree_with_keys_class
class Int4GroupWeight:
    """True 4-bit group-affine weights (the GPTQ/AWQ storage grid):
    codes packed two per byte (halves layout along N) + per-(K-group, column)
    float32 (scale, zero) pairs.

    value = nib * scale[g, col] + zero[g, col], nib in [0, 15] — exactly the
    grid of quant.formats.int4_group with groups along K, which is also the
    dequant form of AutoGPTQ checkpoints (models/hf_loader.py:
    _dequantize_gptq, reference huggingface.py:1859-1874). ``scale`` and
    ``zero`` are halves-aligned [K/group, 2, N/2] like NF4Weight.bscale.

    HBM traffic: 0.5 B/elem of codes + 8/group B/elem of scales+zeros
    (0.5625 B at group 128) vs 2 B bf16.
    """

    def __init__(self, packed, scale, zero, group_size: int):
        self.packed = packed    # uint8 [K, N//2]
        self.scale = scale      # f32 [K/group, 2, N//2]
        self.zero = zero        # f32 [K/group, 2, N//2]
        self.group_size = group_size

    @property
    def shape(self):
        return (self.packed.shape[0], self.packed.shape[1] * 2)

    @property
    def ndim(self):
        return 2

    def tree_flatten_with_keys(self):
        return (
            (jax.tree_util.GetAttrKey("packed"), self.packed),
            (jax.tree_util.GetAttrKey("scale"), self.scale),
            (jax.tree_util.GetAttrKey("zero"), self.zero),
        ), self.group_size

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux)


def _int4g_nibscale(w: jax.Array, group_size: int):
    """Shared int4_group quantization: [K, N] float -> (nibbles [K, N] u8,
    scale [K/group, N] f32, lo [K/group, N] f32). One grid, two byte layouts
    (halves-N below, kpair further down)."""
    K, N = w.shape
    w = w.astype(jnp.float32)
    xg = w.reshape(K // group_size, group_size, N)
    lo = jnp.min(xg, axis=1, keepdims=True)
    hi = jnp.max(xg, axis=1, keepdims=True)
    scale = (hi - lo) / 15.0
    scale = jnp.where(scale == 0, 1.0, scale)
    nib = jnp.clip(jnp.round((xg - lo) / scale), 0.0, 15.0)
    return (nib.reshape(K, N).astype(jnp.uint8),
            scale[:, 0, :].astype(jnp.float32),
            lo[:, 0, :].astype(jnp.float32))


def pack_int4g(w: jax.Array, group_size: int = 128) -> Int4GroupWeight:
    """Quantize [K, N] onto the int4_group grid (K-axis groups, min/max
    affine) and pack codes two per byte (halves layout along N)."""
    K, N = w.shape
    assert K % group_size == 0 and N % 2 == 0, (w.shape, group_size)
    nib, scale, lo = _int4g_nibscale(w, group_size)
    halves = lambda a: a.reshape(  # noqa: E731
        K // group_size, 2, N // 2
    )
    return Int4GroupWeight(
        (nib[:, : N // 2] | (nib[:, N // 2 :] << 4)).astype(jnp.uint8),
        halves(scale), halves(lo), group_size,
    )


def unpack_int4g(q: Int4GroupWeight, dtype=jnp.bfloat16) -> jax.Array:
    """Reference (XLA) dequant — matches quant.formats.int4_group elementwise."""
    u = q.packed.astype(jnp.int32)
    nib = jnp.concatenate([u & 0xF, (u >> 4) & 0xF], axis=1).astype(jnp.float32)
    K, N = nib.shape
    g = q.scale.shape[0]
    s = q.scale.reshape(g, N)
    z = q.zero.reshape(g, N)
    val = nib.reshape(g, q.group_size, N) * s[:, None, :] + z[:, None, :]
    return val.reshape(K, N).astype(dtype)


# ---------------------------------------------------------------------------
# kpair layout: the true 0.5 byte/element nibble tier
# ---------------------------------------------------------------------------
#
# The halves-N layout above pairs output COLUMNS (j, j + N/2) in one byte, so
# any consumer — the two-dot XLA dispatch or the halves Pallas kernel — must
# read the full packed array once per nibble plane: effective HBM traffic is
# 1 byte/element, the same as the 8-bit formats (measured: lns4 7B decode
# 0.995x bf16, BASELINE.md round-1 "halves-layout ceiling"). The kpair layout
# pairs adjacent CONTRACTION rows (2k, 2k+1) instead:
#
#     packed[k2, n] = nibble(w[2*k2, n]) | nibble(w[2*k2 + 1, n]) << 4
#
# so y = x[:, 0::2] @ lo(packed) + x[:, 1::2] @ hi(packed). A fused kernel
# loads each packed tile into VMEM ONCE, decodes both nibble planes from
# registers, and accumulates both partial dots — each weight byte crosses HBM
# exactly once: 0.5 bytes/element. The even/odd activation split happens
# outside the kernel on the [M, K] activations (tiny in the decode regime
# this tier targets); pairing adjacent rows (vs K-halves) keeps any even
# K-shard's pairs shard-local, so row-parallel TP shards stay congruent.


@jax.tree_util.register_pytree_with_keys_class
class LNS4KWeight:
    """4-bit LNS weights, kpair layout: packed uint8 [K/2, N]; the byte at
    [k2, n] holds rows 2*k2 (low nibble) and 2*k2+1 (high). Same code grid
    as LNS4Weight."""

    def __init__(self, packed):
        self.packed = packed  # uint8 [K//2, N]

    @property
    def shape(self):
        return (self.packed.shape[0] * 2, self.packed.shape[1])

    @property
    def ndim(self):
        return 2

    def tree_flatten_with_keys(self):
        return ((jax.tree_util.GetAttrKey("packed"), self.packed),), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


@jax.tree_util.register_pytree_with_keys_class
class FP4KWeight:
    """E2M1 fp4 weights, kpair layout (see LNS4KWeight); same code grid as
    FP4Weight."""

    def __init__(self, packed):
        self.packed = packed  # uint8 [K//2, N]

    @property
    def shape(self):
        return (self.packed.shape[0] * 2, self.packed.shape[1])

    @property
    def ndim(self):
        return 2

    def tree_flatten_with_keys(self):
        return ((jax.tree_util.GetAttrKey("packed"), self.packed),), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


def _kpair_pack(nib: jax.Array) -> jax.Array:
    K, N = nib.shape
    pairs = nib.reshape(K // 2, 2, N)
    return (pairs[:, 0, :] | (pairs[:, 1, :] << 4)).astype(jnp.uint8)


def _kpair_unpack_nibbles(packed: jax.Array) -> jax.Array:
    u = packed.astype(jnp.int32)
    K2, N = u.shape
    return jnp.stack([u & 0xF, (u >> 4) & 0xF], axis=1).reshape(K2 * 2, N)


def pack_lns4k(w: jax.Array) -> LNS4KWeight:
    """Quantize to the 4-bit LNS grid (identical to pack_lns4's) and pack
    adjacent K rows two per byte."""
    K, N = w.shape
    assert K % 2 == 0, "K must be even for kpair packing"
    return LNS4KWeight(_kpair_pack(_lns4_nibbles(w)))


def unpack_lns4k(q: LNS4KWeight, dtype=jnp.bfloat16) -> jax.Array:
    nib = _kpair_unpack_nibbles(q.packed)
    k = (nib & 0x7) - 4
    mag = _lns_exact_mag(k, 1)
    return jnp.where((nib & 0x8) != 0, -mag, mag).astype(dtype)


def pack_fp4k(w: jax.Array) -> FP4KWeight:
    """Quantize onto the E2M1 grid (identical to pack_fp4's) and pack
    adjacent K rows two per byte."""
    K, N = w.shape
    assert K % 2 == 0, "K must be even for kpair packing"
    return FP4KWeight(_kpair_pack(_fp4_nibbles(w)))


def unpack_fp4k(q: FP4KWeight, dtype=jnp.bfloat16) -> jax.Array:
    nib = _kpair_unpack_nibbles(q.packed)
    e = ((nib >> 1) & 0x3) - 2
    mag = jnp.ldexp(1.0 + (nib & 1).astype(jnp.float32) * 0.5, e)
    return jnp.where((nib & 0x8) != 0, -mag, mag).astype(dtype)


@jax.tree_util.register_pytree_with_keys_class
class Int4GroupKWeight:
    """Group-affine INT4 (GPTQ grid), kpair layout: packed uint8 [K/2, N]
    (adjacent K rows per byte) + per-(K-group, column) affine bands stored
    UN-halved: ``scale``/``zero`` [K/group, N]. Same grid as Int4GroupWeight;
    both rows of a packed byte share a group (group_size is even), so the
    affine decode of either nibble plane broadcasts one band row over
    group_size/2 packed rows. HBM traffic: 0.5 B/elem codes + 8/group B/elem
    bands (0.5625 B at group 128)."""

    def __init__(self, packed, scale, zero, group_size: int):
        self.packed = packed    # uint8 [K//2, N]
        self.scale = scale      # f32 [K/group, N]
        self.zero = zero        # f32 [K/group, N]
        self.group_size = group_size

    @property
    def shape(self):
        return (self.packed.shape[0] * 2, self.packed.shape[1])

    @property
    def ndim(self):
        return 2

    def tree_flatten_with_keys(self):
        return (
            (jax.tree_util.GetAttrKey("packed"), self.packed),
            (jax.tree_util.GetAttrKey("scale"), self.scale),
            (jax.tree_util.GetAttrKey("zero"), self.zero),
        ), self.group_size

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux)


def pack_int4gk(w: jax.Array, group_size: int = 128) -> Int4GroupKWeight:
    """Quantize onto the int4_group grid (identical to pack_int4g's) and pack
    adjacent K rows two per byte."""
    K, N = w.shape
    assert K % group_size == 0, (w.shape, group_size)
    nib, scale, lo = _int4g_nibscale(w, group_size)
    return Int4GroupKWeight(_kpair_pack(nib), scale, lo, group_size)


def unpack_int4gk(q: Int4GroupKWeight, dtype=jnp.bfloat16) -> jax.Array:
    nib = _kpair_unpack_nibbles(q.packed).astype(jnp.float32)
    K, N = nib.shape
    g = q.scale.shape[0]
    val = (nib.reshape(g, q.group_size, N) * q.scale[:, None, :]
           + q.zero[:, None, :])
    return val.reshape(K, N).astype(dtype)


@jax.tree_util.register_pytree_with_keys_class
class NF4KWeight:
    """NF4 (QLoRA NormalFloat-4) weights, kpair layout: packed uint8 [K/2, N]
    (adjacent K rows per byte) + per-(K-block, column) absmax stored
    UN-halved: ``bscale`` [K/block, N]. Same codebook grid as NF4Weight; both
    rows of a packed byte share a block (block_size is even). 0.5625 B/elem
    at block 64."""

    def __init__(self, packed, bscale, block_size: int):
        self.packed = packed    # uint8 [K//2, N]
        self.bscale = bscale    # f32 [K/block, N]
        self.block_size = block_size

    @property
    def shape(self):
        return (self.packed.shape[0] * 2, self.packed.shape[1])

    @property
    def ndim(self):
        return 2

    def tree_flatten_with_keys(self):
        return (
            (jax.tree_util.GetAttrKey("packed"), self.packed),
            (jax.tree_util.GetAttrKey("bscale"), self.bscale),
        ), self.block_size

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)


def pack_nf4k(w: jax.Array, block_size: int = 64,
              double_quant: bool = False) -> NF4KWeight:
    """Quantize onto the nf4_quant grid (identical to pack_nf4's, incl. the
    double-quant scale path) and pack adjacent K rows two per byte."""
    from ..quant.formats import _int8_block_quant_flat, _nf4_snap_codes

    K, N = w.shape
    assert K % block_size == 0, (w.shape, block_size)
    w = w.astype(jnp.float32)
    xb = w.reshape(K // block_size, block_size, N)
    absmax = jnp.max(jnp.abs(xb), axis=1, keepdims=True)
    absmax = jnp.where(absmax == 0, 1.0, absmax)
    nib = _nf4_snap_codes(xb / absmax).reshape(K, N).astype(jnp.uint8)
    if double_quant:  # codes use the true absmax; only the stored scale moves
        flat = absmax.reshape(-1)
        offset = jnp.mean(flat)
        flat = _int8_block_quant_flat(flat - offset, 256) + offset
        absmax = flat.reshape(absmax.shape)
    return NF4KWeight(
        _kpair_pack(nib), absmax[:, 0, :].astype(jnp.float32), block_size
    )


def unpack_nf4k(q: NF4KWeight, dtype=jnp.bfloat16) -> jax.Array:
    from ..quant.formats import NF4_CODE

    nib = _kpair_unpack_nibbles(q.packed)
    val = jnp.asarray(NF4_CODE, jnp.float32)[nib]
    K, N = val.shape
    val = (val.reshape(K // q.block_size, q.block_size, N)
           * q.bscale[:, None, :])
    return val.reshape(K, N).astype(dtype)


# every packed-weight wrapper type: used by quant.apply.packed_leaf_report
# (and tests) to tell real-quant leaves from fake-quant fallback arrays in a
# quantized param pytree without enumerating classes at each call site.
PACKED_WEIGHT_TYPES = (
    LNSWeight, Int8Weight, LNS4Weight, MXWeight, FP8Weight, FP4Weight,
    NF4Weight, Int4GroupWeight, LNS4KWeight, FP4KWeight, Int4GroupKWeight,
    NF4KWeight,
)
