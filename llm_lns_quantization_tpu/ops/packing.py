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
    here too, preserving the emulation's semantics).
    """
    scale = float(2**frac_bits)
    threshold_clamp = 2 ** (man_bits - 1)
    up = float(2**threshold_clamp)
    down = float(2.0**-threshold_clamp)

    w = w.astype(jnp.float32)
    mag = jnp.clip(jnp.abs(w), down, up)
    k = jnp.round(jnp.log2(mag) * scale).astype(jnp.int32)
    k = jnp.clip(k, -64, 63)
    sign = (w < 0).astype(jnp.uint8)
    codes = ((k + 64).astype(jnp.uint8) & 0x7F) | (sign << 7)
    return LNSWeight(codes, frac_bits)


def unpack_lns(q: LNSWeight, dtype=jnp.bfloat16) -> jax.Array:
    """Reference (XLA) dequant — the Pallas kernels fuse this into the matmul."""
    u = q.codes.astype(jnp.int32)
    k = (u & 0x7F) - 64
    mag = jnp.exp2(k.astype(jnp.float32) / float(2**q.frac_bits))
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


def pack_lns4(w: jax.Array) -> LNS4Weight:
    """Quantize to the 4-bit LNS grid and pack two codes per byte (halves
    layout along N: low nibble = column j, high nibble = column j + N/2)."""
    K, N = w.shape
    assert N % 2 == 0, "N must be even for nibble packing"
    w = w.astype(jnp.float32)
    mag = jnp.clip(jnp.abs(w), 2.0**-2, 2.0**2)
    k = jnp.clip(jnp.round(jnp.log2(mag) * 2.0), -4, 3).astype(jnp.int32)
    sign = (w < 0).astype(jnp.int32)
    nib = ((k + 4) | (sign << 3)).astype(jnp.uint8)  # [K, N] in [0, 15]
    lo = nib[:, : N // 2]
    hi = nib[:, N // 2 :]
    return LNS4Weight((lo | (hi << 4)).astype(jnp.uint8))


def unpack_lns4(q: LNS4Weight, dtype=jnp.bfloat16) -> jax.Array:
    u = q.packed.astype(jnp.int32)
    nib = jnp.concatenate([u & 0xF, (u >> 4) & 0xF], axis=1)
    k = (nib & 0x7) - 4
    mag = jnp.exp2(k.astype(jnp.float32) * 0.5)
    val = jnp.where((nib & 0x8) != 0, -mag, mag)
    return val.astype(dtype)
