"""Bit-parity tests: JAX quantizers vs torch oracles of the reference formulas.

Each oracle below re-executes, in PyTorch, the exact arithmetic of one
``# PH:`` block from the reference's lm_eval/models/huggingface.py (line
numbers cited per oracle). The JAX implementations in
llm_lns_quantization_tpu.quant.formats must match to float32 round-off
(<= a few ULP on the quantized grid; torch.pow vs jnp.exp2 may differ in the
last ULP). This is the parity criterion from SURVEY.md §7.

The reference itself has no unit tests for its quantizers (SURVEY.md §4) —
these tests are the new framework's replacement for "uncomment and eyeball".
"""

import zlib

import numpy as np
import pytest
import torch

from llm_lns_quantization_tpu.quant import formats


def rand(shape, seed=0, scale=4.0, with_zeros=True):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(shape) * scale).astype(np.float32)
    if with_zeros:
        mask = rng.random(shape) < 0.05
        x = np.where(mask, 0.0, x)
    return x


def assert_close(jax_out, torch_out, rtol=4e-6, atol=1e-8, tie_frac=0.05, step=7e-3):
    """Two-tier parity criterion.

    Tier 1 (almost all elements): match to 4e-6 relative — the only residual
    divergence is transcendental-library noise (XLA-CPU's float32 exp2 is a
    ~2.5e-6-relative-accuracy polynomial while torch uses glibc's
    correctly-rounded powf).

    Tier 2 (<= ``tie_frac`` of elements): where ``round(log2|x| * scale)``
    lands near a .5 boundary (XLA-CPU log2's few-ULP error, amplified by the
    fractional-bit scale, flips such ties), torch and XLA legitimately round
    to adjacent grid points; those elements must agree to within one grid
    step of the format's coarsest tier (``step``). The reference's own
    CUDA-vs-CPU runs flip the same ties. A genuine formula bug mismatches
    ~50-100% of elements and trips tier 1.
    """
    got = np.asarray(jax_out)
    want = torch_out.numpy()
    err = np.abs(got - want)
    bound = atol + rtol * np.abs(want)
    exact = err <= bound
    frac_loose = 1.0 - exact.mean()
    assert frac_loose <= tie_frac, (
        f"{frac_loose:.2%} of elements beyond tight tolerance "
        f"(max rel {np.max(err / np.maximum(np.abs(want), 1e-30)):.3g})"
    )
    np.testing.assert_allclose(got, want, rtol=step, atol=atol)


_JITTED = {}


def run_fmt(fn, x):
    """Call a format fn under jit (one XLA compile per (fn, shape) instead of
    per primitive — keeps this suite fast on the 2-vCPU test machine)."""
    import jax

    key = str(fn)
    if key not in _JITTED:
        _JITTED[key] = jax.jit(fn)
    return _JITTED[key](x)


# ---------------------------------------------------------------------------
# torch oracles (re-derived from the reference formulas)
# ---------------------------------------------------------------------------


def torch_fp_quant(x, e, m, up_mul=1.0, down_mul=1.0):
    # reference float8 block, huggingface.py:349-470 (scalar path :430-437)
    offset = torch.tensor(2 ** (e - 1))
    scale = torch.tensor(2.0**m)
    up = float(2.0 ** (2 ** (e - 1))) * up_mul
    down = float(2.0 ** -(2 ** (e - 1))) * down_mul
    out = x.clone()
    c = torch.clamp(torch.abs(out), min=down, max=up)
    out = torch.where(out < 0, -c, c)
    exponent_bits = torch.floor(torch.log2(torch.abs(out))) + offset
    exponent = torch.pow(2, (exponent_bits - offset))
    mantissa_bits = torch.round(((out / exponent) - 1) * scale)
    return ((mantissa_bits / scale) + 1) * exponent


def torch_lns(x, m, f):
    # reference LNS8 block, huggingface.py:621-677
    scale = float(2**f)
    up = float(2.0 ** (2 ** (m - 1)))
    down = float(2.0 ** -(2 ** (m - 1)))
    out = x.clone()
    c = torch.clamp(torch.abs(out), min=down, max=up)
    out = torch.where(out < 0, -c, c)
    return torch.where(
        out > 0,
        torch.pow(2, (torch.round(torch.log2(out) * scale)) / scale),
        torch.where(
            out < 0, -torch.pow(2, (torch.round(torch.log2(-out) * scale) / scale)), out
        ),
    )


def torch_dynamic_lns(x, base, m, f_lo, f_hi, f_hst, per_vec):
    # reference modified-LNS blocks: per-tensor huggingface.py:679-780 /
    # :1488-1604, per-vector :862-946 / :1606-1724, weight path :1726-1763
    up = float(base) ** (2 ** (m - 1))
    down = float(base) ** -(2 ** (m - 1))
    s_lo, s_hi, s_hst = (float(base) ** f for f in (f_lo, f_hi, f_hst))
    div = 2.0 if base == 4 else 1.0
    out = x.clone()
    c = torch.clamp(torch.abs(out), min=down, max=up)
    out = torch.where(out < 0, -c, c)
    log_x = torch.where(
        out < 0,
        torch.log2(-out) / div,
        torch.where(out > 0, torch.log2(out) / div, torch.tensor(-64000.0)),
    )
    q_lo = torch.round(log_x * s_lo) / s_lo
    q_hi = torch.round(log_x * s_hi) / s_hi
    q_hst = torch.round(log_x * s_hst) / s_hst
    if per_vec:
        dim = 1 if out.dim() == 3 else 0
        max_val = torch.max(log_x, dim=dim, keepdim=True).values.expand_as(log_x)
    else:
        max_val = torch.max(log_x)
    q = torch.where(
        log_x > max_val - 5, torch.where(log_x > max_val - 3, q_hst, q_hi), q_lo
    )
    mag = torch.pow(torch.tensor(float(base)), q)
    return torch.where(out < 0, -mag, torch.where(out > 0, mag, out))


def _torch_pow2_int(out, max_values, bits, clamp_frac, unsq_dim):
    int_max = 2 ** (bits - 1) - 1
    num_frac = torch.floor(torch.log2(int_max / max_values))
    if clamp_frac:
        num_frac = torch.clamp(num_frac, min=0, max=bits)
    nbm = bits - num_frac
    scale = torch.pow(2, num_frac)
    tc = torch.pow(2, nbm - 1)
    up = torch.pow(2, tc)
    down = torch.pow(2, -tc)
    if unsq_dim is not None:
        up, down, scale = (t.unsqueeze(unsq_dim) for t in (up, down, scale))
    c = torch.clamp(torch.abs(out), min=down, max=up)
    outq = torch.where(out < 0, -c, c)
    return torch.round(outq * scale) / scale


def torch_zeroquant(x, bits=8):
    # reference huggingface.py:948-1006 (scalar path :976-989, dim=1 max)
    out = x.clone()
    max_values = torch.max(torch.abs(out), dim=1).values
    return _torch_pow2_int(out, max_values, bits, clamp_frac=True, unsq_dim=1)


def torch_vsquant(x, bits=8):
    # reference huggingface.py:1008-1066
    out = x.clone()
    dim = 1 if out.dim() == 3 else 0
    max_val_c = torch.round(torch.max(torch.abs(out), dim=dim).values)
    max_val_c = torch.where(max_val_c == 0, torch.tensor(1.0), max_val_c)
    return _torch_pow2_int(out, max_val_c, bits, clamp_frac=True, unsq_dim=dim)


def torch_w8a8(x, bits=8):
    # reference huggingface.py:1068-1123 (scalar max, unclamped num_frac)
    out = x.clone()
    max_values = torch.max(torch.abs(out))
    return _torch_pow2_int(out, max_values, bits, clamp_frac=False, unsq_dim=None)


def torch_smoothquant(x, bits=8):
    # reference huggingface.py:1125-1266 (active scalar path)
    out = x.clone()
    cdim = 1 if out.dim() == 3 else 0
    max_val_c = torch.max(torch.abs(out), dim=cdim).values
    max_val_c = torch.where(max_val_c == 0, torch.tensor(1.0), max_val_c)
    out = out / max_val_c.unsqueeze(cdim)
    rdim = out.dim() - 1
    max_values = torch.max(torch.abs(out), dim=rdim).values
    out = _torch_pow2_int(out, max_values, bits, clamp_frac=False, unsq_dim=rdim)
    return out * max_val_c.unsqueeze(cdim)


def torch_llm_int8(x, bits=8, threshold=0.01):
    # reference huggingface.py:1268-1336
    out = x.clone()
    max_values = torch.max(torch.abs(out), dim=1).values
    max_values = torch.where(max_values == 0, torch.tensor(0.0001), max_values)
    mask = torch.any(torch.abs(out) > threshold, dim=0, keepdim=True)
    q = _torch_pow2_int(out, max_values, bits, clamp_frac=True, unsq_dim=1)
    q = torch.where(out == 0, torch.tensor(0.0), q)
    return torch.where(mask, out, q)


def torch_mx(x, block_size, e, m):
    # reference huggingface.py:472-619 (scalar path steps 1-5, :505-585)
    scale = torch.tensor(2.0**m)
    offset = torch.tensor(2 ** (e - 1))
    up = float(2.0 ** (2 ** (e - 1)))
    down = float(2.0 ** -(2 ** (e - 1)))
    out = x.clone()
    three_d = out.dim() == 3
    if not three_d:
        out = out.unsqueeze(0)
    bsz, rows, cols = out.shape
    nb = (rows + block_size - 1) // block_size
    pad = nb * block_size - rows
    outp = torch.cat([out, torch.zeros((bsz, pad, cols))], dim=1)
    outr = outp.view(bsz, nb, block_size, cols)
    mv = torch.round(torch.max(torch.abs(outr), dim=2).values)
    mv = torch.where(mv == 0, torch.tensor(1.0), mv)
    coeff = up / mv
    outr = outr * coeff.unsqueeze(2)
    c = torch.clamp(torch.abs(outr), min=down, max=up)
    outr = torch.where(outr < 0, -c, c)
    exponent_bits = torch.floor(torch.log2(torch.abs(outr))) + offset
    exponent = torch.pow(2, (exponent_bits - offset))
    mantissa_bits = torch.round(((outr / exponent) - 1) * scale)
    outr = ((mantissa_bits / scale) + 1) * exponent
    outr = outr / coeff.unsqueeze(2)
    res = outr.view(bsz, -1, cols)[:, :rows, :]
    return res if three_d else res.squeeze(0)


# ---------------------------------------------------------------------------
# parity cases
# ---------------------------------------------------------------------------

SHAPES = [(16, 24), (2, 16, 24)]


# (name, jax_fn, oracle, one-grid-step-of-coarsest-tier)
PARITY_CASES = [
    ("fp8_e4m3", formats.fp8_e4m3, lambda t: torch_fp_quant(t, 4, 3, 0.5, 10.0), 2**-3),
    ("fp8_e5m2", formats.fp8_e5m2, lambda t: torch_fp_quant(t, 5, 2), 2**-2),
    ("fp4_e2m1", formats.fp4_e2m1, lambda t: torch_fp_quant(t, 2, 1), 2**-1),
    ("lns8", formats.lns8, lambda t: torch_lns(t, 4, 3), 2 ** (1 / 8) - 1),
    ("lns4", formats.lns4, lambda t: torch_lns(t, 2, 1), 2 ** (1 / 2) - 1),
    ("lns8_dynamic", formats.lns8_dynamic,
     lambda t: torch_dynamic_lns(t, 2, 5, 2, 4, 6, False), 2 ** (1 / 4) - 1),
    ("lns8_dynamic_pervec", formats.lns8_dynamic_pervec,
     lambda t: torch_dynamic_lns(t, 2, 5, 2, 4, 6, True), 2 ** (1 / 4) - 1),
    ("lns4_dynamic", formats.lns4_dynamic,
     lambda t: torch_dynamic_lns(t, 4, 3, 0, 1, 5, False), 3.0),
    ("lns4_dynamic_pervec", formats.lns4_dynamic_pervec,
     lambda t: torch_dynamic_lns(t, 4, 3, 0, 1, 5, True), 3.0),
    ("zeroquant", formats.zeroquant, torch_zeroquant, 2**-2),
    ("vsquant", formats.vsquant, torch_vsquant, 2**-2),
    ("w8a8", formats.w8a8, torch_w8a8, 2**-2),
    ("smoothquant", formats.smoothquant, torch_smoothquant, 2**-2),
    ("llm_int8", formats.llm_int8, torch_llm_int8, 2**-2),
    ("mx16_e5m2", formats.mx16_e5m2, lambda t: torch_mx(t, 16, 5, 2), 2**-2),
    ("mx32_e4m3", formats.mx32_e4m3, lambda t: torch_mx(t, 32, 4, 3), 2**-3),
]


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize(
    "name,jax_fn,oracle,step", PARITY_CASES, ids=[c[0] for c in PARITY_CASES]
)
def test_parity(shape, name, jax_fn, oracle, step):
    # stable seed (python hash() is salted per process; crc32 is not)
    x = rand(shape, seed=zlib.crc32(f"{name}-{shape}".encode()))
    got = run_fmt(jax_fn, x)
    want = oracle(torch.from_numpy(x.copy()))
    assert_close(got, want, step=step)


@pytest.mark.parametrize("shape", SHAPES)
def test_parity_extreme_values(shape):
    """Huge/tiny magnitudes exercise the clamp and tier boundaries."""
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(shape) * 10.0 ** rng.uniform(-8, 8, shape)).astype(
        np.float32
    )
    for jax_fn, oracle, step in [
        (formats.lns8, lambda t: torch_lns(t, 4, 3), 2 ** (1 / 8) - 1),
        (formats.lns4_dynamic_pervec,
         lambda t: torch_dynamic_lns(t, 4, 3, 0, 1, 5, True), 3.0),
        (formats.w8a8, torch_w8a8, 2**-2),
        (formats.mx16_e5m2, lambda t: torch_mx(t, 16, 5, 2), 2**-2),
    ]:
        assert_close(
            run_fmt(jax_fn, x), oracle(torch.from_numpy(x.copy())),
            rtol=1e-5, atol=1e-6, step=step,
        )


def test_zeros_behavior():
    """Zeros follow each block's documented behavior (clamp-to-down vs 0)."""
    x = np.zeros((8, 8), np.float32)
    # clamp-first blocks map 0 -> +threshold_down then quantize it
    out = np.asarray(run_fmt(formats.lns8, x))
    assert np.all(out > 0)
    # llm_int8 restores exact zeros
    out = np.asarray(run_fmt(formats.llm_int8, x))
    assert np.all(out == 0)


def test_idempotent_on_grid():
    """Quantizing an already-quantized tensor is a fixed point (LNS/FP)."""
    x = rand((32, 32), seed=3)
    for fn in [formats.lns8, formats.lns4, formats.fp4_e2m1, formats.fp8_e5m2]:
        once = np.asarray(run_fmt(fn, x))
        twice = np.asarray(run_fmt(fn, once))
        np.testing.assert_allclose(once, twice, rtol=1e-6, atol=1e-7)


def test_ste_gradient_identity():
    import jax
    import jax.numpy as jnp

    from llm_lns_quantization_tpu.quant import ste

    f = ste(formats.lns8)
    g = jax.grad(lambda x: jnp.sum(f(x)))(jnp.ones((4, 4)) * 1.3)
    np.testing.assert_allclose(np.asarray(g), np.ones((4, 4)))


def test_weight_tree_quantization():
    import jax.numpy as jnp

    from llm_lns_quantization_tpu.quant import QuantConfig, quantize_weights

    params = {
        "block0": {"attn_w": jnp.ones((4, 4)) * 1.3, "bias": jnp.ones((4,)) * 1.3},
        "ln_f": {"scale_norm": jnp.ones((4, 4)) * 1.3},
    }
    cfg = QuantConfig(weights="lns4")
    out = quantize_weights(params, cfg)
    # 2-D non-norm weight is quantized
    assert not np.allclose(np.asarray(out["block0"]["attn_w"]), 1.3)
    # bias (rank 1) untouched, norm-named path untouched
    np.testing.assert_allclose(np.asarray(out["block0"]["bias"]), 1.3)
    np.testing.assert_allclose(np.asarray(out["ln_f"]["scale_norm"]), 1.3)


def test_config_parse_roundtrip():
    from llm_lns_quantization_tpu.quant import QuantConfig

    cfg = QuantConfig.parse("w:lns4_dynamic_pervec;a:fp8;kv:int8")
    assert cfg.weights == "lns4_dynamic_pervec"
    assert cfg.acts == "fp8"
    assert cfg.kv_cache == "int8"
    assert QuantConfig.parse("lns8").acts == "lns8"
    assert QuantConfig.parse(None).describe() == "none"
    with pytest.raises(ValueError):
        QuantConfig.parse("w:nope")
