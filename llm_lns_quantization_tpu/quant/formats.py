"""Pure-JAX fake-quantization library: the reference's full format zoo.

Each function here re-implements, bit-faithfully, one of the quantization
emulation blocks the reference keeps as comment-toggled PyTorch forward hooks
inside ``HuggingFaceAutoLM.__init__`` (reference lm_eval/models/huggingface.py,
``# PH: start``/``# PH: end`` blocks, lines 273-1763). They are pure,
shape-polymorphic, ``jit``/``vmap``-able functions of a float32 array — the
idiomatic JAX replacement for the reference's module-walk + forward-hook + STE
``autograd.Function`` machinery.

Reference block → function map (line numbers into the reference file):

=====================================  ==========================================
reference block (lines)                function here
=====================================  ==========================================
float8 E4M3/E5M2         (343-470)     ``fp_quant`` (with the block's up/2,
                                       down*10 clamp tweak exposed as args)
MX block floating point  (472-619)     ``mx_block_quant``
LNS8                     (621-677)     ``lns_quant`` (man_bits=4, frac_bits=3)
modified LNS8 (tiered)   (679-780)     ``dynamic_lns_quant`` (per-tensor max)
modified LNS8 per-vector (862-946)     ``dynamic_lns_quant`` (axis=-2 max)
ZeroQuant                (948-1006)    ``zeroquant``
VSQuant                  (1008-1066)   ``vsquant``
W8A8                     (1068-1123)   ``w8a8``
SmoothQuant              (1125-1266)   ``smoothquant``
LLM.int8() emulated      (1268-1336)   ``llm_int8``
float4 E2M1              (1338-1428)   ``fp_quant`` (exp_bits=2, man_bits=1)
LNS4                     (1430-1486)   ``lns_quant`` (man_bits=2, frac_bits=1)
modified LNS4 base-4     (1488-1604)   ``dynamic_lns_quant`` (base=4, tensor max)
modified LNS4 b4 per-vec (1606-1724)   ``dynamic_lns_quant`` (base=4, axis=-2)
dynamic LNS4 weight path (1726-1763)   ``dynamic_lns_quant`` via quant.apply
=====================================  ==========================================

Faithfulness notes (validated against the reference formulas by
tests/test_quant_parity.py, which re-executes the torch expressions):

* All blocks clamp ``|x|`` into ``[threshold_down, threshold_up]`` *before*
  quantizing and re-apply the sign with ``where(x < 0, -c, c)``; exact zeros
  therefore become ``+threshold_down`` (and then quantize like it). We preserve
  this — it is part of the reference's numerics.
* ``round`` is round-half-to-even in both torch and jnp.
* ``w8a8`` and ``smoothquant`` produce **NaN for an all-zero row/tensor**:
  the reference's unclamped ``num_frac = floor(log2((2^7-1)/max))`` gives an
  infinite scale and ``round(0*inf)/inf = nan`` (huggingface.py:1095-1106,
  1195-1244 guard column maxes with zero→1 but not these row/tensor maxes).
  Preserved verbatim — it is part of the reference's numerics; real model
  activations are never exactly all-zero along these axes.
* The reference branches on 2-D vs 3-D tensors; the axis conventions below are
  the rank-generic generalization that reproduces both cases (documented per
  function).

Everything computes in float32 regardless of input dtype (the reference
hooks ran in the model's fp32/fp16 compute dtype; fp32 is what its published
experiments used) and casts back to the input dtype at the end.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp

Array = jax.Array


def _as_f32(x):
    return x.astype(jnp.float32)


def _signed_clamp(x: Array, down, up) -> Array:
    """clamp(|x|, down, up) with sign restored; zeros map to +down."""
    c = jnp.clip(jnp.abs(x), down, up)
    return jnp.where(x < 0, -c, c)


def _exp2(q: Array) -> Array:
    """Accurate float32 ``2**q``.

    ``jnp.exp2`` lowers to ``exp(q*ln2)`` whose f32 argument rounding costs
    ~|q| ULP of relative error; splitting off the integer part and applying it
    exactly via ``ldexp`` keeps us within ~1 ULP of torch's correctly-rounded
    ``pow(2, q)``, which the parity tests require.
    """
    k = jnp.round(q)
    return jnp.ldexp(jnp.exp2(q - k), k.astype(jnp.int32))


def _restore_dtype(fn):
    """Compute in float32, return in the caller's dtype."""

    def wrapped(x, *args, **kwargs):
        out = fn(_as_f32(x), *args, **kwargs)
        return out.astype(x.dtype)

    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = fn.__doc__
    wrapped.__wrapped__ = fn
    return wrapped


# ---------------------------------------------------------------------------
# Custom floating point (FP8 / FP4)
# ---------------------------------------------------------------------------


def _fp_round(out, man_bits: int):
    """Exact FP-grid rounding of clamped values, as integer bit arithmetic.

    ``round((|v|/2^floor(log2|v|) - 1) * 2^man_bits)`` reconstructed — every
    step is exact in float32, so it reduces to round-half-even on the top
    ``man_bits`` float32 mantissa bits ((half-1+lsb) add, then truncate),
    with the overflow carry propagating into the exponent field. The formula
    is sign-symmetric (the ±1 offsets shift the rounded quantity by the
    integer 2^man_bits, which RNE ignores), so computing on |v| and restoring
    the sign is bit-identical to the reference's signed recipe.
    """
    bits = jax.lax.bitcast_convert_type(jnp.abs(out), jnp.int32)
    m23 = bits & 0x7FFFFF
    sh = 23 - man_bits
    mq = (m23 + (1 << (sh - 1)) - 1 + ((m23 >> sh) & 1)) >> sh
    q = jax.lax.bitcast_convert_type((bits - m23) + (mq << sh), jnp.float32)
    return jnp.where(out > 0, q, jnp.where(out < 0, -q, out))


@_restore_dtype
def fp_quant(
    x: Array,
    exp_bits: int = 4,
    man_bits: int = 3,
    clamp_up_mul: float = 1.0,
    clamp_down_mul: float = 1.0,
) -> Array:
    """Fake-quantize to a custom float format (sign / exp_bits / man_bits).

    Reference: float8 block (huggingface.py:343-470; E4M3 active, E5M2 alt)
    and float4 block (huggingface.py:1338-1428; E2M1). The float8 block
    narrows its clamp range with ``threshold_up/2`` and ``threshold_down*10``
    (huggingface.py:361-362) — pass ``clamp_up_mul=0.5, clamp_down_mul=10.0``
    to reproduce that exact variant; the float4 block uses the plain range.

    Recipe: clamp, ``e = floor(log2|x|)``, ``m = round((x/2^e - 1)*2^man_bits)``,
    reconstruct ``(m/2^man_bits + 1) * 2^e``.

    Implementation: every step of that recipe is exact in float32
    (``floor(log2)`` is the biased exponent field, the division is a power of
    two, the reconstruction writes mantissa bits back), so it runs as pure
    integer bit arithmetic on the float32 representation — round-half-even on
    the top ``man_bits`` mantissa bits, with the overflow carry incrementing
    the exponent field. Bit-identical to the formula, with no
    transcendentals: this is the throughput-critical op of the FP8/FP4
    activation-emulation path (it runs on every quant site's [B, T, C]).
    """
    threshold_clamp = 2 ** (exp_bits - 1)
    up = float(2**threshold_clamp) * clamp_up_mul
    down = float(2.0**-threshold_clamp) * clamp_down_mul

    out = _signed_clamp(x, down, up)
    return _fp_round(out, man_bits)


fp8_e4m3 = partial(fp_quant, exp_bits=4, man_bits=3, clamp_up_mul=0.5, clamp_down_mul=10.0)
fp8_e5m2 = partial(fp_quant, exp_bits=5, man_bits=2)
fp4_e2m1 = partial(fp_quant, exp_bits=2, man_bits=1)


# ---------------------------------------------------------------------------
# Logarithmic number system (LNS)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _lns_grid_tables(frac_bits):
    """Rounding boundaries and grid mantissas for the 2^f-per-binade LNS grid.

    Boundary i (1-based) separates codes i-1 and i within a binade:
    mantissa m = 1 + m23/2^23 rounds to code i iff m >= 2^((i-0.5)/2^f) —
    irrational, so the mathematically exact rounding has no ties. Grid
    mantissas are the correctly-rounded float32 mantissa fields of 2^(r/2^f).
    """
    import numpy as np

    n = 1 << frac_bits
    bounds = [
        int(np.ceil((2.0 ** ((i - 0.5) / n) - 1.0) * (1 << 23)))
        for i in range(1, n + 1)
    ]
    mants = [
        int(np.asarray(2.0 ** (r / n), np.float32).view(np.uint32)) & 0x7FFFFF
        for r in range(n)
    ]
    return bounds, mants


@_restore_dtype
def lns_quant(x: Array, man_bits: int = 4, frac_bits: int = 3) -> Array:
    """Plain LNS fake-quant: ``sign(x) * 2^(round(log2|x| * 2^f) / 2^f)``.

    Reference: LNS8 block (huggingface.py:621-677; man_bits=4, frac_bits=3)
    and LNS4 block (huggingface.py:1430-1486; man_bits=2, frac_bits=1).
    ``man_bits`` bounds the exponent's integer range via the pre-clamp to
    ``[2^-2^(m-1), 2^2^(m-1)]``.

    Implementation: mathematically exact rounding onto the LNS grid with no
    transcendentals. The binade (integer part of log2) is the float32
    exponent field; the fractional code is the count of per-binade mantissa
    boundaries crossed (2^f compares — the boundaries 2^((i-0.5)/2^f) are
    irrational so exact rounding has no ties); the result's mantissa bits
    come from a correctly-rounded constant table. This is the throughput-
    critical op of the LNS activation-emulation path; the libm-log2 recipe
    it replaces could differ only for inputs within ~1 ulp of a rounding
    boundary (covered by the parity suite's tie tolerance).
    """
    threshold_clamp = 2 ** (man_bits - 1)
    up = float(2**threshold_clamp)
    down = float(2.0**-threshold_clamp)
    bounds, mants = _lns_grid_tables(frac_bits)

    out = _signed_clamp(x, down, up)
    bits = jax.lax.bitcast_convert_type(jnp.abs(out), jnp.int32)
    m23 = bits & 0x7FFFFF
    j = (m23 >= bounds[0]).astype(jnp.int32)
    for b in bounds[1:]:
        j += (m23 >= b).astype(jnp.int32)
    e_out = (bits >> 23) + (j >> frac_bits)
    r = j & ((1 << frac_bits) - 1)
    mant = jnp.int32(mants[-1])
    for i in range(len(mants) - 1):
        mant = jnp.where(r == i, jnp.int32(mants[i]), mant)
    q = jax.lax.bitcast_convert_type((e_out << 23) | mant, jnp.float32)
    return jnp.where(out > 0, q, jnp.where(out < 0, -q, out))


lns8 = partial(lns_quant, man_bits=4, frac_bits=3)
lns4 = partial(lns_quant, man_bits=2, frac_bits=1)


@_restore_dtype
def dynamic_lns_quant(
    x: Array,
    base: int = 2,
    man_bits: int = 5,
    frac_low: int = 2,
    frac_high: int = 4,
    frac_highest: int = 6,
    cut_high: float = 3.0,
    cut_low: float = 5.0,
    axis=None,
) -> Array:
    """Outlier-tiered dynamic LNS: 3 precision tiers keyed off max(log|x|).

    Log-magnitudes within ``cut_high`` of the max get ``frac_highest``
    fractional bits, within ``cut_low`` get ``frac_high``, the rest
    ``frac_low``. ``axis=None`` reproduces the per-tensor variants
    (huggingface.py:679-780 LNS8, :1488-1604 base-4 LNS4); ``axis=-2``
    reproduces the per-vector variants, whose per-column max is taken over
    dim=1 for 3-D / dim=0 for 2-D tensors (huggingface.py:862-946 LNS8,
    :1606-1724 base-4 LNS4, and the weight path :1726-1763).

    Defaults are the reference's LNS8 constants (man_bits=5, f=2/4/6, base 2);
    the base-4 LNS4 constants are man_bits=3, f=0/1/5, base 4 (where
    ``log4 x = log2(x)/2`` and thresholds are ``4^±2^(m-1)``).

    Zeros are clamped to ``+threshold_down`` before the log, so the
    reference's ``-64000.0`` zero sentinel (e.g. huggingface.py:828) can never
    fire post-clamp; we keep the same behavior.
    """
    log_base = jnp.log2(float(base))
    threshold_mantissa = 2 ** (man_bits - 1)
    up = float(base) ** threshold_mantissa
    down = float(base) ** (-threshold_mantissa)
    s_lo = float(base) ** frac_low
    s_hi = float(base) ** frac_high
    s_hst = float(base) ** frac_highest

    out = _signed_clamp(x, down, up)
    log_x = jnp.log2(jnp.abs(out)) / log_base
    if axis is None:
        max_val = jnp.max(log_x)
    else:
        max_val = jnp.max(log_x, axis=axis, keepdims=True)
    q_lo = jnp.round(log_x * s_lo) / s_lo
    q_hi = jnp.round(log_x * s_hi) / s_hi
    q_hst = jnp.round(log_x * s_hst) / s_hst
    q = jnp.where(
        log_x > max_val - cut_low,
        jnp.where(log_x > max_val - cut_high, q_hst, q_hi),
        q_lo,
    )
    mag = _exp2(q * log_base)
    return jnp.where(out < 0, -mag, jnp.where(out > 0, mag, out))


lns8_dynamic = partial(dynamic_lns_quant, base=2, man_bits=5, frac_low=2, frac_high=4, frac_highest=6)
lns8_dynamic_pervec = partial(
    dynamic_lns_quant, base=2, man_bits=5, frac_low=2, frac_high=4, frac_highest=6, axis=-2
)
lns4_dynamic = partial(dynamic_lns_quant, base=4, man_bits=3, frac_low=0, frac_high=1, frac_highest=5)
lns4_dynamic_pervec = partial(
    dynamic_lns_quant, base=4, man_bits=3, frac_low=0, frac_high=1, frac_highest=5, axis=-2
)


# ---------------------------------------------------------------------------
# Integer formats with power-of-two scales (ZeroQuant / VSQuant / W8A8 family)
# ---------------------------------------------------------------------------


def _pow2_int_quant(x: Array, max_values: Array, bits: int, clamp_frac: bool) -> Array:
    """Shared core: power-of-2 scale from a max statistic, clamp, round.

    ``num_frac = floor(log2((2^(bits-1)-1) / max))`` (optionally clamped to
    ``[0, bits]``), ``scale = 2^num_frac``; the effective integer range also
    bounds magnitudes via ``2^±2^(bits-num_frac-1)`` before rounding.
    ``max_values`` must broadcast against ``x``.
    """
    int_max = float(2 ** (bits - 1) - 1)
    num_frac = jnp.floor(jnp.log2(int_max / max_values))
    if clamp_frac:
        num_frac = jnp.clip(num_frac, 0.0, float(bits))
    num_bit_mantissa = bits - num_frac
    scale = _exp2(num_frac)
    threshold_clamp = _exp2(num_bit_mantissa - 1.0)
    up = _exp2(threshold_clamp)
    down = _exp2(-threshold_clamp)
    out = _signed_clamp(x, down, up)
    return jnp.round(out * scale) / scale


@_restore_dtype
def zeroquant(x: Array, bits: int = 8, axis: int = 1) -> Array:
    """ZeroQuant-style dynamic int8 with power-of-2 scale per slice.

    Reference: huggingface.py:948-1006. The reference's scalar path always
    reduces over ``dim=1`` — per-token rows for the 2-D ``[tokens, features]``
    case (the ZeroQuant paper's granularity), and per-``[batch, feature]``
    for 3-D inputs; we reproduce that literal axis. ``num_frac`` is clamped to
    ``[0, bits]`` (huggingface.py:982, the ``#!!#`` revision).
    """
    max_values = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    return _pow2_int_quant(x, max_values, bits, clamp_frac=True)


@_restore_dtype
def vsquant(x: Array, bits: int = 8) -> Array:
    """VSQuant-style per-column quant with an *integer* scale statistic.

    Reference: huggingface.py:1008-1066. Per-column max over dim=1 (3-D) /
    dim=0 (2-D) — i.e. axis=-2 — is itself rounded to an integer (zero maxes
    replaced by 1 to avoid NaN), then the ZeroQuant power-of-2-scale recipe is
    applied per column. The reference approximates the paper's block size with
    the whole vector; ``quant.config`` exposes a true block size on top.
    """
    max_val_c = jnp.round(jnp.max(jnp.abs(x), axis=-2, keepdims=True))
    max_val_c = jnp.where(max_val_c == 0, 1.0, max_val_c)
    return _pow2_int_quant(x, max_val_c, bits, clamp_frac=True)


@_restore_dtype
def w8a8(x: Array, bits: int = 8) -> Array:
    """Per-tensor dynamic int8 with power-of-2 scale.

    Reference: huggingface.py:1068-1123 (scalar max; ``num_frac`` unclamped in
    the reference's active path).
    """
    max_values = jnp.max(jnp.abs(x))
    return _pow2_int_quant(x, max_values, bits, clamp_frac=False)


@_restore_dtype
def smoothquant(x: Array, bits: int = 8) -> Array:
    """SmoothQuant-style: per-column smoothing, per-row ZeroQuant, rescale.

    Reference: huggingface.py:1125-1266. Columns are normalized by their max
    over dim=1 (3-D) / dim=0 (2-D) (zero maxes → 1), the result is
    ZeroQuant-ed per row (max over the last axis, ``num_frac`` unclamped),
    then the column scales are multiplied back.
    """
    max_val_c = jnp.max(jnp.abs(x), axis=-2, keepdims=True)
    max_val_c = jnp.where(max_val_c == 0, 1.0, max_val_c)
    out = x / max_val_c
    max_values = jnp.max(jnp.abs(out), axis=-1, keepdims=True)
    out = _pow2_int_quant(out, max_values, bits, clamp_frac=False)
    return out * max_val_c


@_restore_dtype
def llm_int8(x: Array, bits: int = 8, threshold: float = 0.01) -> Array:
    """LLM.int8()-style mixed precision: outlier columns stay full precision.

    Reference: huggingface.py:1268-1336. Columns containing any ``|x| >
    threshold`` (the block ships 0.01; the paper value is 6.0) are passed
    through unquantized; the rest get per-row (dim=1 max, zero maxes →
    0.0001, ``num_frac`` clamped) power-of-2-scale int quantization. Exact
    zeros are restored to 0 (huggingface.py:1313 — unlike the other blocks,
    the original tensor is still on hand here).
    """
    max_values = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    max_values = jnp.where(max_values == 0, 0.0001, max_values)
    mask_high_precision = jnp.any(jnp.abs(x) > threshold, axis=0, keepdims=True)
    q = _pow2_int_quant(x, max_values, bits, clamp_frac=True)
    q = jnp.where(x == 0, 0.0, q)
    return jnp.where(mask_high_precision, x, q)


# ---------------------------------------------------------------------------
# MX block floating point
# ---------------------------------------------------------------------------


@_restore_dtype
def mx_block_quant(
    x: Array, block_size: int = 16, exp_bits: int = 5, man_bits: int = 2
) -> Array:
    """MX-style shared-scale block floating point along the row axis.

    Reference: huggingface.py:472-619. Rows (dim=1 for 3-D, dim=0 for 2-D —
    i.e. axis=-2) are zero-padded to a multiple of ``block_size`` and grouped
    into blocks; each block is scaled by ``threshold_up / round(max|block|)``
    (zero maxes → 1), FP-quantized with (exp_bits, man_bits), and rescaled.
    Active reference config: block 16, E5M2 ("microexponent"); the legacy
    alternative is block 32, E4M3 (huggingface.py:474-480).
    """
    if x.ndim < 2:
        raise ValueError("mx_block_quant expects rank >= 2")
    threshold_clamp = 2 ** (exp_bits - 1)
    up = float(2**threshold_clamp)
    down = float(2.0**-threshold_clamp)

    *lead, rows, cols = x.shape
    num_blocks = -(-rows // block_size)
    pad = num_blocks * block_size - rows
    xp = jnp.pad(x, [(0, 0)] * len(lead) + [(0, pad), (0, 0)])
    xb = xp.reshape(*lead, num_blocks, block_size, cols)

    max_vals = jnp.round(jnp.max(jnp.abs(xb), axis=-2, keepdims=True))
    max_vals = jnp.where(max_vals == 0, 1.0, max_vals)
    coeff = up / max_vals

    scaled = xb * coeff
    out = _signed_clamp(scaled, down, up)
    out = _fp_round(out, man_bits)  # exact integer-bit FP rounding, no logs
    out = out / coeff

    out = out.reshape(*lead, num_blocks * block_size, cols)
    return out[..., :rows, :]


mx16_e5m2 = partial(mx_block_quant, block_size=16, exp_bits=5, man_bits=2)
mx32_e4m3 = partial(mx_block_quant, block_size=32, exp_bits=4, man_bits=3)


# ---------------------------------------------------------------------------
# NF4 (4-bit NormalFloat, QLoRA) — blockwise absmax + 16-entry codebook
# ---------------------------------------------------------------------------

# The 16 NF4 code values: quantiles of N(0, 1) normalized to [-1, 1]
# (QLoRA, Dettmers et al. 2023). These are the exact constants hard-coded in
# bitsandbytes' dDequantizeNF4 kernel, which the reference loads real 4-bit
# models through (bnb_4bit_quant_type="nf4", reference huggingface.py:
# 1799-1822) — the capability this format reproduces without bitsandbytes.
NF4_CODE = (
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
)


def _nf4_snap_codes(v: Array) -> Array:
    """Nearest-NF4-code index for values in [-1, 1].

    bitsandbytes' dQuantizeNF4 is a binary decision tree of strict ``>``
    comparisons against the code midpoints — a value exactly on a midpoint
    takes the LOWER code. ``searchsorted(..., side="left")`` reproduces that
    tie rule exactly (first midpoint >= v counts as not-crossed).
    """
    mids = jnp.asarray(
        [(NF4_CODE[i] + NF4_CODE[i + 1]) / 2.0 for i in range(15)],
        jnp.float32,
    )
    return jnp.searchsorted(mids, v, side="left").astype(jnp.int32)


def _int8_block_quant_flat(a: Array, block: int):
    """Symmetric per-block int8 quant of a flat f32 array (pads with zeros).

    Returns the dequantized array — the second-level ("double") quantization
    of NF4 absmax values. Zero-max blocks pass through unscaled.
    """
    n = a.shape[0]
    nb = -(-n // block)
    ap = jnp.pad(a, (0, nb * block - n)).reshape(nb, block)
    absmax = jnp.max(jnp.abs(ap), axis=1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(ap / scale), -127, 127) * scale
    return q.reshape(nb * block)[:n]


@_restore_dtype
def nf4_quant(
    x: Array, block_size: int = 64, double_quant: bool = False
) -> Array:
    """Fake-quantize to blockwise-absmax NF4 (the QLoRA 4-bit format).

    Semantics follow bitsandbytes ``quantize_4bit(quant_type="nf4")``, the
    loader behind the reference's ``bnb_4bit_quant_type``/``load_in_4bit``
    plumb-through (huggingface.py:107-109, 1799-1822): values are grouped
    into blocks, scaled by the block's absmax into [-1, 1], snapped to the
    nearest of the 16 NF4 code values (midpoint ties to the lower code, as
    bnb's comparison tree), and rescaled.

    Two deliberate deviations from bnb (offline — no CUDA bitsandbytes to
    defer to), both documented here as the contract:

    * blocks run along ``axis=-2`` (rows within a column — K for weights),
      the same convention as :func:`mx_block_quant`, instead of bnb's
      flattened-storage order; granularity (``block_size`` elements per
      absmax) is identical.
    * an all-zero block keeps scale 1 instead of bnb's 0-division NaN.

    ``double_quant=True`` reproduces ``bnb_4bit_use_double_quant``: the
    per-block absmax values are themselves 8-bit-quantized (mean offset +
    symmetric per-256-block int8; bnb uses its dynamic-tree 8-bit map there,
    the linear map here changes scale precision by <1%).
    """
    if x.ndim < 2:
        raise ValueError("nf4_quant expects rank >= 2")
    *lead, rows, cols = x.shape
    num_blocks = -(-rows // block_size)
    pad = num_blocks * block_size - rows
    xp = jnp.pad(x, [(0, 0)] * len(lead) + [(0, pad), (0, 0)])
    xb = xp.reshape(*lead, num_blocks, block_size, cols)

    absmax = jnp.max(jnp.abs(xb), axis=-2, keepdims=True)
    absmax = jnp.where(absmax == 0, 1.0, absmax)
    idx = _nf4_snap_codes(xb / absmax)  # codes use the TRUE absmax (as bnb)
    if double_quant:
        # only the STORED scale is re-quantized; dequant multiplies by the
        # reconstructed absmax
        flat = absmax.reshape(-1)
        offset = jnp.mean(flat)
        flat = _int8_block_quant_flat(flat - offset, 256) + offset
        absmax = flat.reshape(absmax.shape)
    out = jnp.asarray(NF4_CODE, jnp.float32)[idx] * absmax
    out = out.reshape(*lead, num_blocks * block_size, cols)
    return out[..., :rows, :]


nf4 = partial(nf4_quant, block_size=64)
nf4_dq = partial(nf4_quant, block_size=64, double_quant=True)


# ---------------------------------------------------------------------------
# INT4 group-affine (the GPTQ/AWQ storage grid, data-free calibration)
# ---------------------------------------------------------------------------


@_restore_dtype
def int4_group(x: Array, group_size: int = 128) -> Array:
    """Fake-quantize to per-group asymmetric (min/max affine) INT4.

    The grid is the one GPTQ/AWQ checkpoints store — ``w = s[g]*(c - z[g])``
    with 4-bit codes ``c`` and one (scale, zero) pair per ``group_size``
    contraction rows per column (reference: AutoGPTQ loading,
    huggingface.py:1859-1874; models/hf_loader.py dequantizes that exact
    form) — but calibrated data-free from the tensor itself: per group,
    ``scale = (max - min)/15``, ``zero = min``, round-half-even codes.

    For a weight ALREADY on a group-affine INT4 grid with the same group
    structure (i.e. a dequantized GPTQ checkpoint without act-order), min/max
    recover the original (scale, zero) whenever the group exercises its full
    code range, so re-quantization is lossless up to float32 rounding
    (<= 1 ULP) — this is how GPTQ checkpoints
    ride the packed 4-bit serving tier (``w:int4g;pallas``) without a
    bitsandbytes/AutoGPTQ dependency.

    Groups run along ``axis=-2`` (K for weights), like :func:`mx_block_quant`
    and :func:`nf4_quant`; a partial tail group is edge-padded (duplicates of
    the last real row never move a min or max). Constant groups (max == min)
    pass through exactly (scale-1 guard, codes all zero).
    """
    if x.ndim < 2:
        raise ValueError("int4_group expects rank >= 2")
    *lead, rows, cols = x.shape
    num_groups = -(-rows // group_size)
    pad = num_groups * group_size - rows
    xp = jnp.pad(x, [(0, 0)] * len(lead) + [(0, pad), (0, 0)], mode="edge")
    xg = xp.reshape(*lead, num_groups, group_size, cols)

    lo = jnp.min(xg, axis=-2, keepdims=True)
    hi = jnp.max(xg, axis=-2, keepdims=True)
    scale = (hi - lo) / 15.0
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round((xg - lo) / scale), 0.0, 15.0)
    out = (q * scale + lo).reshape(*lead, num_groups * group_size, cols)
    return out[..., :rows, :]


int4g = partial(int4_group, group_size=128)
