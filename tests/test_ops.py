"""Pallas kernel tests (interpret mode on CPU) + packing round-trips.

Validates the real-quant tier against the fake-quant reference functions —
the dequant-fused kernels must reproduce exactly what the emulation computes
(SURVEY.md §7 step 7: "validate each kernel against the step-2 reference
functions, then swap in under a config flag").
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llm_lns_quantization_tpu.ops import (
    init_quant_cache,
    kv_dequantize,
    kv_update,
    pack_int8,
    pack_lns,
    unpack_int8,
    unpack_lns,
)
from llm_lns_quantization_tpu.ops import matmul as qmm
from llm_lns_quantization_tpu.quant import formats


def rand(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) * scale).astype(np.float32)


def test_lns_pack_matches_fake_quant():
    """pack->unpack lands on exactly the fake-quant grid (lns8)."""
    w = rand((64, 48), seed=1, scale=2.0)
    q = pack_lns(w, frac_bits=3, man_bits=4)
    deq = np.asarray(unpack_lns(q, dtype=jnp.float32))
    ref = np.asarray(formats.lns8(w))
    np.testing.assert_allclose(deq, ref, rtol=4e-6, atol=0)


def test_lns4_pack_roundtrip():
    w = rand((32, 32), seed=2)
    q = pack_lns(w, frac_bits=1, man_bits=2)
    deq = np.asarray(unpack_lns(q, dtype=jnp.float32))
    # every decoded value is on the lns4 grid: log2|v| * 2 is an integer
    logs = np.log2(np.abs(deq)) * 2
    np.testing.assert_allclose(logs, np.round(logs), atol=1e-5)


def test_int8_pack_roundtrip():
    w = rand((64, 32), seed=3, scale=3.0)
    q = pack_int8(w)
    deq = np.asarray(unpack_int8(q, dtype=jnp.float32))
    err = np.abs(deq - w)
    # max error is half a quantization step per column
    step = np.asarray(q.scale)
    assert np.all(err <= step * 0.5 + 1e-6)


def _interpret(fn, *args, **kw):
    """Run a pallas kernel in interpreter mode (CPU test machine)."""
    import functools
    from unittest import mock

    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", patched):
        # bypass the jit wrapper so the patch is seen
        return fn.__wrapped__(*args, **kw)


@pytest.mark.parametrize("shape", [(128, 256, 128), (64, 384, 256)])
def test_lns_matmul_interpret(shape):
    M, K, N = shape
    x = jnp.asarray(rand((M, K), seed=4, scale=0.5), jnp.bfloat16)
    w = rand((K, N), seed=5, scale=0.1)
    q = pack_lns(w)
    got = _interpret(
        qmm.lns_matmul, x, q.codes, frac_bits=3,
        block_m=64, block_n=128, out_dtype=jnp.float32,
    )
    want = jnp.dot(
        x.astype(jnp.float32),
        unpack_lns(q, dtype=jnp.float32),
        preferred_element_type=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_int8_matmul_interpret():
    M, K, N = 64, 256, 128
    x = jnp.asarray(rand((M, K), seed=6, scale=0.5), jnp.bfloat16)
    w = rand((K, N), seed=7, scale=0.3)
    q = pack_int8(w)
    got = _interpret(
        qmm.int8_matmul, x, q.codes, q.scale,
        block_m=64, block_n=128, out_dtype=jnp.float32,
    )
    want = jnp.dot(
        x.astype(jnp.float32),
        unpack_int8(q, dtype=jnp.float32),
        preferred_element_type=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_kv_cache_quantized_roundtrip():
    cache = init_quant_cache(batch=2, heads=4, max_len=16, head_dim=8)
    new = jnp.asarray(rand((2, 4, 3, 8), seed=8, scale=2.0))
    cache = kv_update(cache, new, index=5)
    deq = np.asarray(kv_dequantize(cache, dtype=jnp.float32))
    got = deq[:, :, 5:8]
    err = np.abs(got - np.asarray(new))
    scale = np.asarray(cache.scale[:, :, 5:8])
    assert np.all(err <= scale * 0.51 + 1e-6)
    # untouched positions remain zero
    assert np.all(deq[:, :, :5] == 0)


def test_pallas_weight_path_in_model_interpret():
    """End-to-end: GPT-2 forward with packed LNS weights through the Pallas
    kernels (interpret mode) matches the fake-quant forward closely."""
    from unittest import mock

    from jax.experimental import pallas as pl

    from llm_lns_quantization_tpu.models import build_model
    from llm_lns_quantization_tpu.quant import QuantConfig

    tokens = jnp.asarray(np.arange(8, dtype=np.int32).reshape(1, 8) + 1)

    fake = build_model(
        family="gpt2", preset="tiny", quant=QuantConfig(weights="lns8"),
        dtype=jnp.float32,
    )
    ref_logits = fake.forward(fake.params, fake.cfg, tokens)

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", patched):
        real = build_model(
            family="gpt2", preset="tiny",
            quant=QuantConfig(weights="lns8", use_pallas=True), dtype=jnp.float32,
        )
        # packed-weight leaves exist
        from llm_lns_quantization_tpu.ops.packing import LNSWeight

        leaves = jax.tree_util.tree_leaves(
            real.params, is_leaf=lambda x: isinstance(x, LNSWeight)
        )
        assert any(isinstance(l, LNSWeight) for l in leaves)
        got = real.forward(real.params, real.cfg, tokens)

    # same quantized weights, kernels accumulate in f32; bf16 x-cast inside
    # the kernel is the only deviation
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref_logits), rtol=5e-2, atol=5e-2
    )


def test_quant_config_parse_pallas():
    from llm_lns_quantization_tpu.quant import QuantConfig

    cfg = QuantConfig.parse("w:lns8;pallas")
    assert cfg.weights == "lns8" and cfg.use_pallas


def test_int8_kv_cache_decode_close_to_fp():
    """Model decode with quantized KV cache tracks the fp cache closely."""
    from llm_lns_quantization_tpu.models import build_model

    b = build_model(family="llama", preset="tiny", seed=0)
    tokens = jnp.asarray(np.arange(10, dtype=np.int32).reshape(1, 10) % 250)

    fp_cache = b.init_cache(b.cfg, 1, 12)
    fp_logits, fp_cache = b.forward(
        b.params, b.cfg, tokens, cache=fp_cache, cache_index=0
    )

    q_cache = b.init_cache(b.cfg, 1, 12, kv_quant=True)
    q_logits, q_cache = b.forward(
        b.params, b.cfg, tokens, cache=q_cache, cache_index=0
    )
    # quantization noise is small relative to logit scale
    diff = np.abs(np.asarray(fp_logits) - np.asarray(q_logits))
    assert diff.max() < 0.1, diff.max()

    # decode one more token through the quantized cache
    nxt = jnp.asarray([[7]], jnp.int32)
    step_logits, _ = b.forward(
        b.params, b.cfg, nxt, cache=q_cache, cache_index=10
    )
    assert np.all(np.isfinite(np.asarray(step_logits)))


def test_fp8_kv_cache_decode_close_to_fp():
    from llm_lns_quantization_tpu.models import build_model

    b = build_model(family="gpt2", preset="tiny", seed=0)
    tokens = jnp.asarray(np.arange(10, dtype=np.int32).reshape(1, 10) % 250)
    fp_cache = b.init_cache(b.cfg, 1, 12)
    fp_logits, _ = b.forward(b.params, b.cfg, tokens, cache=fp_cache, cache_index=0)
    q_cache = b.init_cache(b.cfg, 1, 12, kv_quant="fp8")
    q_logits, q_cache = b.forward(b.params, b.cfg, tokens, cache=q_cache, cache_index=0)
    diff = np.abs(np.asarray(fp_logits) - np.asarray(q_logits))
    assert diff.max() < 0.2, diff.max()
    step, _ = b.forward(b.params, b.cfg, jnp.asarray([[3]], jnp.int32),
                        cache=q_cache, cache_index=10)
    assert np.all(np.isfinite(np.asarray(step)))


def test_lns4_nibble_pack_roundtrip():
    from llm_lns_quantization_tpu.ops import pack_lns4, unpack_lns4

    w = rand((32, 64), seed=9, scale=1.5)
    q = pack_lns4(jnp.asarray(w))
    assert q.packed.shape == (32, 32)  # two codes per byte
    deq = np.asarray(unpack_lns4(q, dtype=jnp.float32))
    # every decoded magnitude is on the 4-bit grid 2^(k/2), k in [-4, 3]
    logs = np.log2(np.abs(deq)) * 2
    np.testing.assert_allclose(logs, np.round(logs), atol=1e-5)
    assert logs.min() >= -4 - 1e-5 and logs.max() <= 3 + 1e-5


def test_lns4_matmul_interpret():
    from llm_lns_quantization_tpu.ops import pack_lns4, unpack_lns4

    M, K, N = 64, 256, 128
    x = jnp.asarray(rand((M, K), seed=10, scale=0.5), jnp.bfloat16)
    w = rand((K, N), seed=11, scale=0.4)
    q = pack_lns4(jnp.asarray(w))
    got = _interpret(
        qmm.lns4_matmul, x, q.packed, block_m=64, block_n=128,
        out_dtype=jnp.float32,
    )
    want = jnp.dot(
        x.astype(jnp.float32), unpack_lns4(q, dtype=jnp.float32),
        preferred_element_type=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


def test_lns4_pallas_model_path():
    """w:lns4;pallas packs eligible weights as nibbles end-to-end (kpair
    layout by default since round 2; see test_kpair_model_path)."""
    from unittest import mock

    from jax.experimental import pallas as pl

    from llm_lns_quantization_tpu.models import build_model
    from llm_lns_quantization_tpu.ops.packing import LNS4KWeight
    from llm_lns_quantization_tpu.quant import QuantConfig

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", patched):
        b = build_model(
            family="llama", preset="tiny", dtype=jnp.float32,
            quant=QuantConfig(weights="lns4", use_pallas=True),
        )
        leaves = jax.tree_util.tree_leaves(
            b.params, is_leaf=lambda x: isinstance(x, LNS4KWeight)
        )
        assert any(isinstance(l, LNS4KWeight) for l in leaves)
        tokens = jnp.asarray(np.arange(8, dtype=np.int32).reshape(1, 8))
        out = b.forward(b.params, b.cfg, tokens)
        assert np.all(np.isfinite(np.asarray(out)))


def test_lns_matmul_large_k_ktiled_interpret():
    """K beyond the residency threshold routes through the k-tiled kernel."""
    M, K, N = 32, 8192, 128
    x = jnp.asarray(rand((M, K), seed=12, scale=0.2), jnp.bfloat16)
    w = rand((K, N), seed=13, scale=0.05)
    q = pack_lns(w)
    got = _interpret(
        qmm.lns_matmul, x, q.codes, frac_bits=3, block_m=32, block_n=128,
        out_dtype=jnp.float32,
    )
    want = jnp.dot(
        x.astype(jnp.float32), unpack_lns(q, dtype=jnp.float32),
        preferred_element_type=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("shape", [(16, 64, 256), (8, 8192, 128)])
def test_w8a8_matmul_interpret(shape):
    """True s8 x s8 kernel == exact integer oracle (per-row dynamic
    activation quant, per-column weight scale). Second shape takes the
    k-tiled path (per-(row, k-tile) group scales)."""
    M, K, N = shape
    x = jnp.asarray(rand((M, K), seed=7, scale=0.5))
    w = rand((K, N), seed=8, scale=0.05)
    q = pack_int8(w)

    out = np.asarray(
        qmm.w8a8_matmul(x, q.codes, q.scale, out_dtype=jnp.float32)
    )

    xq_all, parts = [], []
    codes = np.asarray(q.codes, np.int32)
    if K > qmm._K_RESIDENT_MAX:
        ref = np.zeros((M, N), np.float32)
        for k0 in range(0, K, 2048):
            xt = np.asarray(x[:, k0:k0 + 2048], np.float32)
            absmax = np.abs(xt).max(axis=1, keepdims=True)
            rscale = np.maximum(absmax, 1e-30) / 127.0
            xq = np.clip(np.round(xt / rscale), -127, 127).astype(np.int32)
            ref += (xq @ codes[k0:k0 + 2048]).astype(np.float32) * rscale
        ref *= np.asarray(q.scale, np.float32)[None, :]
    else:
        xt = np.asarray(x, np.float32)
        absmax = np.abs(xt).max(axis=1, keepdims=True)
        rscale = np.maximum(absmax, 1e-30) / 127.0
        xq = np.clip(np.round(xt / rscale), -127, 127).astype(np.int32)
        ref = (xq @ codes).astype(np.float32) * rscale \
            * np.asarray(q.scale, np.float32)[None, :]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_w8a8_model_path_dispatch(monkeypatch):
    """a:w8a8 + packed int8 weights routes dense() through the true-int8
    kernel (spy), and one dense layer through it stays close to the
    upcast-to-bf16 weight-compression kernel — the only difference is the
    in-kernel per-row int8 quantization of the input."""
    from llm_lns_quantization_tpu.models import layers
    from llm_lns_quantization_tpu.ops import tp
    from llm_lns_quantization_tpu.quant import ActQuantizer, QuantConfig

    calls = []
    real = tp.w8a8_matmul

    def spy(*args, **kw):
        calls.append(1)
        return real(*args, **kw)

    monkeypatch.setattr(tp, "w8a8_matmul", spy)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 12, 64)).astype(np.float32))
    w = pack_int8(jnp.asarray(
        rng.standard_normal((64, 192)).astype(np.float32) * 0.05))
    b = jnp.asarray(rng.standard_normal(192).astype(np.float32) * 0.01)

    actq = ActQuantizer(QuantConfig.parse("w:w8a8;a:w8a8;pallas"))
    out_true = layers.dense(x, w, b, actq, site="fc")
    assert calls, "dense() did not dispatch to the true-int8 kernel"

    monkeypatch.setattr(layers, "_INT8_ACT_FORMATS", ())
    out_compress = layers.dense(x, w, b, actq, site="fc")
    # the output site-quant snaps to a coarse grid, so values near a grid
    # boundary may land one step apart; require near-universal agreement
    close = np.isclose(np.asarray(out_true), np.asarray(out_compress),
                       rtol=0.05, atol=0.02)
    assert close.mean() > 0.995, close.mean()


def test_mx_pack_matches_fake_quant():
    """pack_mx -> unpack_mx reproduces formats.mx_block_quant exactly (both
    reference configs: block 16 E5M2 and block 32 E4M3)."""
    from llm_lns_quantization_tpu.ops.packing import pack_mx, unpack_mx

    for bs, e, m in [(16, 5, 2), (32, 4, 3)]:
        w = rand((64, 48), seed=21, scale=3.0)
        q = pack_mx(jnp.asarray(w), bs, e, m)
        deq = np.asarray(unpack_mx(q, dtype=jnp.float32))
        ref = np.asarray(formats.mx_block_quant(
            jnp.asarray(w), block_size=bs, exp_bits=e, man_bits=m))
        np.testing.assert_allclose(deq, ref, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("K", [256, 8192])
def test_mx_matmul_interpret(K):
    """Dequant-fused MX kernel == XLA dequant matmul (resident + k-tiled)."""
    from llm_lns_quantization_tpu.ops.packing import pack_mx, unpack_mx

    w = rand((K, 128), seed=22, scale=0.05)
    q = pack_mx(jnp.asarray(w))
    x = jnp.asarray(rand((32, K), seed=23, scale=0.5), jnp.bfloat16)
    got = np.asarray(qmm.mx_matmul(x, q.codes, q.bscale, out_dtype=jnp.float32))
    want = np.asarray(jnp.dot(
        x.astype(jnp.float32), unpack_mx(q, jnp.float32),
        preferred_element_type=jnp.float32,
    ))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_mx_pallas_model_path():
    """w:mx;pallas packs matmul weights as MXWeight and the model forward
    tracks the fake-quant tier closely."""
    from llm_lns_quantization_tpu.models import build_model
    from llm_lns_quantization_tpu.ops.packing import MXWeight
    from llm_lns_quantization_tpu.quant import QuantConfig

    tokens = jnp.asarray(np.arange(8, dtype=np.int32).reshape(1, 8) + 1)
    fake = build_model(family="llama", preset="tiny", seed=0,
                       quant=QuantConfig(weights="mx"), dtype=jnp.float32)
    real = build_model(family="llama", preset="tiny", seed=0,
                       quant=QuantConfig.parse("w:mx;pallas"),
                       dtype=jnp.float32)
    leaves = jax.tree_util.tree_leaves(
        real.params, is_leaf=lambda x: isinstance(x, MXWeight))
    assert any(isinstance(l, MXWeight) for l in leaves)
    a = real.forward(real.params, real.cfg, tokens)
    b = fake.forward(fake.params, fake.cfg, tokens)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=5e-2, atol=5e-2)


def test_fp8_pack_matches_fake_quant():
    """pack_fp8 -> unpack_fp8 reproduces formats.fp_quant bit-exactly for the
    reference's active (narrow-clamp) E4M3 variant; the wide E5M2 variant
    matches everywhere except the merged lowest binade."""
    from llm_lns_quantization_tpu.ops.packing import pack_fp8, unpack_fp8

    w = rand((64, 48), seed=31, scale=3.0)
    w[0, 0] = 0.0
    w[1, 1] = 1e4   # clamps at the top
    w[2, 2] = -1e-9  # clamps at the bottom
    q = pack_fp8(jnp.asarray(w), 4, 3, clamp_up_mul=0.5, clamp_down_mul=10.0)
    deq = np.asarray(unpack_fp8(q, dtype=jnp.float32))
    ref = np.asarray(formats.fp8_e4m3(jnp.asarray(w)))
    np.testing.assert_array_equal(deq, ref)

    q = pack_fp8(jnp.asarray(w), 5, 2)
    deq = np.asarray(unpack_fp8(q, dtype=jnp.float32))
    ref = np.asarray(formats.fp8_e5m2(jnp.asarray(w)))
    floor = 2.0 ** -16
    mism = deq != ref
    assert np.all(np.abs(ref[mism]) <= 4 * floor)


@pytest.mark.parametrize("K", [256, 8192])
def test_fp8_matmul_interpret(K):
    """Dequant-fused FP8 kernel == XLA dequant matmul (resident + k-tiled)."""
    from llm_lns_quantization_tpu.ops.packing import pack_fp8, unpack_fp8

    w = rand((K, 128), seed=32, scale=0.5)
    q = pack_fp8(jnp.asarray(w), 4, 3, clamp_up_mul=0.5, clamp_down_mul=10.0)
    x = jnp.asarray(rand((32, K), seed=33, scale=0.5), jnp.bfloat16)
    got = np.asarray(qmm.fp8_matmul(
        x, q.codes, exp_bits=q.exp_bits, man_bits=q.man_bits,
        e_bias=q.e_bias, out_dtype=jnp.float32,
    ))
    want = np.asarray(jnp.dot(
        x.astype(jnp.float32), unpack_fp8(q, jnp.float32),
        preferred_element_type=jnp.float32,
    ))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_fp8_pallas_model_path():
    """w:fp8;pallas packs matmul weights as FP8Weight and the model forward
    tracks the fake-quant tier closely."""
    from llm_lns_quantization_tpu.models import build_model
    from llm_lns_quantization_tpu.ops.packing import FP8Weight
    from llm_lns_quantization_tpu.quant import QuantConfig

    tokens = jnp.asarray(np.arange(8, dtype=np.int32).reshape(1, 8) + 1)
    fake = build_model(family="llama", preset="tiny", seed=0,
                       quant=QuantConfig(weights="fp8"), dtype=jnp.float32)
    real = build_model(family="llama", preset="tiny", seed=0,
                       quant=QuantConfig.parse("w:fp8;pallas"),
                       dtype=jnp.float32)
    leaves = jax.tree_util.tree_leaves(
        real.params, is_leaf=lambda x: isinstance(x, FP8Weight))
    assert any(isinstance(l, FP8Weight) for l in leaves)
    a = real.forward(real.params, real.cfg, tokens)
    b = fake.forward(fake.params, fake.cfg, tokens)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("K", [256, 8192])
@pytest.mark.parametrize("M", [16, 1024])
def test_fused_bias_epilogue_all_kernels(K, M):
    """Every quantized matmul's bias add == bias-free matmul + b, on both
    dispatch arms: M=16 exercises the fused Pallas kernels (resident and
    k-tiled), M=1024 the compute-bound XLA dequant-dot path."""
    from llm_lns_quantization_tpu.ops.packing import (
        pack_fp4, pack_fp8, pack_int8, pack_lns, pack_lns4, pack_mx,
    )

    N = 256
    w = rand((K, N), seed=41, scale=0.1)
    x = jnp.asarray(rand((M, K), seed=42, scale=0.5), jnp.bfloat16)
    b = jnp.asarray(rand((N,), seed=43, scale=2.0))

    ql = pack_lns(jnp.asarray(w))
    qi = pack_int8(jnp.asarray(w))
    q4 = pack_lns4(jnp.asarray(w))
    qm = pack_mx(jnp.asarray(w))
    qf = pack_fp8(jnp.asarray(w), 4, 3, clamp_up_mul=0.5, clamp_down_mul=10.0)
    qn = pack_fp4(jnp.asarray(w))
    cases = [
        (lambda bias: qmm.lns_matmul(x, ql.codes, frac_bits=3,
                                     out_dtype=jnp.float32, bias=bias)),
        (lambda bias: qmm.int8_matmul(x, qi.codes, qi.scale,
                                      out_dtype=jnp.float32, bias=bias)),
        (lambda bias: qmm.lns4_matmul(x, q4.packed,
                                      out_dtype=jnp.float32, bias=bias)),
        (lambda bias: qmm.fp4_matmul(x, qn.packed,
                                     out_dtype=jnp.float32, bias=bias)),
        (lambda bias: qmm.mx_matmul(x, qm.codes, qm.bscale,
                                    out_dtype=jnp.float32, bias=bias)),
        (lambda bias: qmm.fp8_matmul(x, qf.codes, exp_bits=qf.exp_bits,
                                     man_bits=qf.man_bits, e_bias=qf.e_bias,
                                     out_dtype=jnp.float32, bias=bias)),
        (lambda bias: qmm.w8a8_matmul(x, qi.codes, qi.scale,
                                      out_dtype=jnp.float32, bias=bias)),
    ]
    for fn in cases:
        base = np.asarray(fn(None))
        fused = np.asarray(fn(b))
        np.testing.assert_allclose(
            fused, base + np.asarray(b)[None, :], rtol=1e-5, atol=1e-5
        )


def test_lns_decode_bitexact_all_codes():
    """The kernel's bit-test product decode == exp2 dequant after the bf16
    cast, for every one of the 256 LNS8 codes (and all 16 LNS4 nibbles via
    the f=1 path)."""
    from llm_lns_quantization_tpu.ops.matmul import _lns_decode
    from llm_lns_quantization_tpu.ops.packing import LNSWeight, unpack_lns

    # f=4 exercises the 4-word mantissa LUT select chain (f=3/1 use <= 2)
    for f in (4, 3, 2, 1):
        codes = jnp.arange(256, dtype=jnp.int32).reshape(16, 16)
        got = np.asarray(_lns_decode(codes, f))
        want = np.asarray(unpack_lns(LNSWeight(codes.astype(jnp.uint8), f)))
        np.testing.assert_array_equal(got, want, err_msg=f"frac_bits={f}")


def test_fp4_pack_matches_fake_quant():
    """pack_fp4 -> unpack_fp4 reproduces formats.fp4_e2m1 exactly except the
    top grid point (4.0 merges down to 3.0 — FP4Weight docstring)."""
    from llm_lns_quantization_tpu.ops.packing import pack_fp4, unpack_fp4

    w = rand((64, 48), seed=51, scale=1.5)
    w[0, 0] = 0.0
    w[1, 1] = 5.0    # clamps to 4.0 in the fake grid
    w[2, 2] = -3.8   # rolls up to -4.0
    deq = np.asarray(unpack_fp4(pack_fp4(jnp.asarray(w)), jnp.float32))
    ref = np.asarray(formats.fp4_e2m1(jnp.asarray(w)))
    mism = deq != ref
    assert np.all(np.abs(ref[mism]) == 4.0) and np.all(np.abs(deq[mism]) == 3.0)
    assert deq[0, 0] == 0.25  # zeros follow the fake grid's bottom clamp


def test_fp4_matmul_interpret():
    """Dequant-fused FP4 nibble kernel == XLA dequant matmul, plus the XLA
    fallback for shapes below Mosaic's tile minimum."""
    from llm_lns_quantization_tpu.ops.packing import pack_fp4, unpack_fp4

    for K, N in [(256, 512), (64, 48)]:  # kernel path / fallback path
        w = rand((K, N), seed=52, scale=1.0)
        q = pack_fp4(jnp.asarray(w))
        x = jnp.asarray(rand((16, K), seed=53, scale=0.5), jnp.bfloat16)
        got = np.asarray(qmm.fp4_matmul(x, q.packed, out_dtype=jnp.float32))
        want = np.asarray(jnp.dot(
            x.astype(jnp.float32), unpack_fp4(q, jnp.float32),
            preferred_element_type=jnp.float32,
        ))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_fp4_pallas_model_path():
    """w:fp4;pallas packs matmul weights as FP4KWeight (kpair layout since
    round 2) and the model forward tracks the fake-quant tier (up to the
    merged top grid point)."""
    from llm_lns_quantization_tpu.models import build_model
    from llm_lns_quantization_tpu.ops.packing import FP4KWeight
    from llm_lns_quantization_tpu.quant import QuantConfig

    tokens = jnp.asarray(np.arange(8, dtype=np.int32).reshape(1, 8) + 1)
    real = build_model(family="llama", preset="tiny", seed=0,
                       quant=QuantConfig.parse("w:fp4;pallas"),
                       dtype=jnp.float32)
    leaves = jax.tree_util.tree_leaves(
        real.params, is_leaf=lambda x: isinstance(x, FP4KWeight))
    assert any(isinstance(l, FP4KWeight) for l in leaves)
    out = real.forward(real.params, real.cfg, tokens)
    assert np.all(np.isfinite(np.asarray(out)))


def test_dispatch_policy():
    """Production dispatch: compute-bound (large M) and small-weight matmuls
    take the XLA dequant-dot path (no pallas_call in the jaxpr); small-M,
    large-weight matmuls take the fused kernel."""
    from llm_lns_quantization_tpu.ops import matmul as qmm
    from llm_lns_quantization_tpu.ops.packing import pack_lns

    qmm._FUSED_MIN_WEIGHT = 1 << 62  # restore the production default
    w_small = pack_lns(jnp.asarray(rand((256, 256), seed=61)))
    w_big = pack_lns(jnp.asarray(rand((4096, 4096), seed=62, scale=0.02)))

    def has_pallas(fn, *args):
        return "pallas_call" in str(jax.make_jaxpr(fn)(*args))

    x_small = jnp.zeros((16, 256), jnp.bfloat16)
    x_big_m = jnp.zeros((2048, 256), jnp.bfloat16)
    x_decode = jnp.zeros((16, 4096), jnp.bfloat16)
    f = lambda x, c: qmm.lns_matmul(x, c, frac_bits=3)
    # production default: XLA everywhere (decode fuses into the dot there)
    assert not has_pallas(f, x_small, w_small.codes)
    assert not has_pallas(f, x_big_m, w_small.codes)
    assert not has_pallas(f, x_decode, w_big.codes)
    # fused kernels remain selectable for the weight-bound regime
    qmm._FUSED_MIN_WEIGHT = 8 * 2**20
    jax.clear_caches()  # the knob is read at trace time
    assert has_pallas(f, x_decode, w_big.codes)
    x_score = jnp.zeros((2048, 4096), jnp.bfloat16)
    assert not has_pallas(f, x_score, w_big.codes)  # still compute-bound


def test_fp8_kv_update_saturates_instead_of_nan():
    """Out-of-range K/V activations must saturate to the e4m3fn max, not cast
    to NaN (a NaN code would poison the cache row for the whole sequence)."""
    from llm_lns_quantization_tpu.ops.kv_cache import fp8_update, init_fp8_cache

    cache = init_fp8_cache(1, 1, 4, 8)
    new = jnp.full((1, 1, 1, 8), 500.0, jnp.bfloat16)
    out = fp8_update(cache, new, 0)
    vals = np.asarray(out.codes.astype(jnp.float32))[0, 0, 0]
    assert np.all(np.isfinite(vals))
    assert np.all(vals == float(jnp.finfo(jnp.float8_e4m3fn).max))


def test_ktiled_k_remainder_handling():
    """K values without a 2048-divisor k-tile must still be exact: the
    dispatch either shrinks block_k to a 128-multiple divisor (K=2176 ->
    128) or falls back to the XLA dequant dot (K=200, not a multiple of
    128) — the k-tiled kernels have no remainder masking."""
    from llm_lns_quantization_tpu.ops import matmul as qmm
    from llm_lns_quantization_tpu.ops.packing import LNSWeight, pack_lns, unpack_lns

    assert qmm._fit_block_k(2176) == 128
    assert qmm._fit_block_k(6400) == 1280
    assert qmm._fit_block_k(200) is None

    old = qmm._FORCE_KTILED
    qmm._FORCE_KTILED = True
    try:
        for K in (2176, 200):
            x = jnp.asarray(rand((8, K), seed=61, scale=0.1), jnp.bfloat16)
            q = pack_lns(jnp.asarray(rand((K, 256), seed=62)))
            got = np.asarray(
                qmm.lns_matmul(x, q.codes, frac_bits=3, out_dtype=jnp.float32)
            )
            want = np.asarray(
                jnp.dot(x, unpack_lns(q), preferred_element_type=jnp.float32)
            )
            np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    finally:
        qmm._FORCE_KTILED = old


def test_pack_mx_exact_mantissa_ties():
    """Regression: pack_mx must divide by ldexp(1, e), not libm exp2 — at
    |e| >= 13 exp2 is inexact and shifts exact round-half-even mantissa ties
    off the mx_block_quant grid (e.g. block max 8 -> bscale 2^-13, and
    w = -1.375 scales to an exact tie 1.375 * 2^13)."""
    from llm_lns_quantization_tpu.ops.packing import pack_mx, unpack_mx
    from llm_lns_quantization_tpu.quant.formats import mx_block_quant

    rng = np.random.default_rng(7)
    K, N, BS = 32, 8, 16
    w = rng.standard_normal((K, N)).astype(np.float32)
    # plant a block whose max rounds to 8 and exact-tie values inside it
    w[:BS, 0] = 0.01
    w[0, 0] = 8.0
    w[1, 0] = -1.375
    w[2, 0] = 1.375
    w[3, 0] = 5.5  # 1.375 * 4: tie in another binade
    q = pack_mx(jnp.asarray(w), block_size=BS, exp_bits=5, man_bits=2)
    fake = np.asarray(mx_block_quant(jnp.asarray(w), block_size=BS,
                                     exp_bits=5, man_bits=2))
    np.testing.assert_array_equal(np.asarray(unpack_mx(q, jnp.float32)), fake)


def test_pack_lns_element_exact_vs_fake_tier():
    """Regression: pack_lns/pack_lns4 use the same exact boundary-count
    rounding as formats.lns_quant, so (away from the documented k=top merge)
    the packed and fake tiers agree ELEMENT-wise — including inputs within
    1 ulp of a half-step rounding boundary, where libm round(log2(x)*2^f)
    can land one code off."""
    from llm_lns_quantization_tpu.ops.packing import (
        pack_lns, pack_lns4, unpack_lns, unpack_lns4,
    )
    from llm_lns_quantization_tpu.quant.formats import lns_quant

    rng = np.random.default_rng(8)
    w = (rng.standard_normal((64, 64)) * 2).astype(np.float32)
    # sprinkle values AT float32 rounding boundaries: nextafter around
    # 2^((i-0.5)/2^f) for a few codes
    for i, target in enumerate((0.5, 1.0, 1.5, 2.5)):
        b = np.float32(2.0 ** ((target * 8 - 0.5) / 8.0))
        w[0, i] = b
        w[1, i] = np.nextafter(b, np.float32(0))
        w[2, i] = np.nextafter(b, np.float32(4))
    # keep away from the top grid point (documented k=64 -> 63 merge)
    w = np.clip(w, -12.0, 12.0)

    fake8 = np.asarray(lns_quant(jnp.asarray(w), man_bits=4, frac_bits=3))
    got8 = np.asarray(unpack_lns(pack_lns(jnp.asarray(w)), jnp.float32))
    np.testing.assert_array_equal(got8, fake8)

    # stay below the k=3->4 rounding boundary 2^(3.5/2) ~ 3.364: above it
    # the fake grid admits k=4 (value 4.0) that the packed nibble merges down
    w4 = np.clip(w, -3.2, 3.2)
    fake4 = np.asarray(lns_quant(jnp.asarray(w4), man_bits=2, frac_bits=1))
    got4 = np.asarray(unpack_lns4(pack_lns4(jnp.asarray(w4)), jnp.float32))
    np.testing.assert_array_equal(got4, fake4)


# ---------------------------------------------------------------------------
# NF4 (QLoRA NormalFloat-4): the reference's bitsandbytes load_in_4bit path
# (huggingface.py:1799-1822), here as a first-class format + packed tier
# ---------------------------------------------------------------------------


def test_nf4_fake_quant_semantics():
    """Blockwise-absmax NF4: on-grid, idempotent, block max preserved, zero
    blocks untouched, ties on code midpoints go to the LOWER code (the bnb
    decision-tree rule)."""
    from llm_lns_quantization_tpu.quant.formats import NF4_CODE

    w = rand((128, 48), seed=70, scale=0.7)
    q = np.asarray(formats.nf4(jnp.asarray(w)))
    # idempotent
    np.testing.assert_array_equal(np.asarray(formats.nf4(jnp.asarray(q))), q)
    # every value = code * block absmax (blocks of 64 along axis 0)
    xb = w.reshape(2, 64, 48)
    am = np.abs(xb).max(axis=1, keepdims=True)
    ratio = q.reshape(2, 64, 48) / am
    codes = np.asarray(NF4_CODE, np.float32)
    assert np.isclose(ratio[..., None], codes, atol=1e-6).any(-1).all()
    # the block absmax element maps to +-1 * absmax (quantizes exactly)
    flat_idx = np.abs(xb).reshape(2, -1).argmax(axis=1)
    for b in range(2):
        r, c = divmod(flat_idx[b], 48)
        assert abs(q.reshape(2, 64, 48)[b, r, c]) == pytest.approx(am[b, 0, c])
    # zero block passes through
    z = jnp.zeros((64, 4))
    np.testing.assert_array_equal(np.asarray(formats.nf4(z)), 0.0)
    # midpoint tie -> lower code: scale so one element IS the midpoint
    mid = (NF4_CODE[8] + NF4_CODE[9]) / 2.0
    x = jnp.asarray(np.array([[mid], [1.0]], np.float32).repeat(32, 1)
                    .reshape(2, 32))
    x = jnp.concatenate([x, jnp.zeros((62, 32))], axis=0)
    out = np.asarray(formats.nf4(x))
    assert out[0, 0] == pytest.approx(NF4_CODE[8])


def test_nf4_double_quant():
    """nf4_dq: codes are chosen with the true absmax; the stored scale is
    8-bit re-quantized with a mean offset, so dequant values shift by <1%
    of the block scale but stay proportional to the same code indices."""
    w = rand((256, 32), seed=71)
    q = np.asarray(formats.nf4(jnp.asarray(w)))
    qd = np.asarray(formats.nf4_dq(jnp.asarray(w)))
    am = np.abs(w.reshape(4, 64, 32)).max(axis=1)
    # same code index per element: ratios to the respective absmax agree
    assert np.abs(qd - q).max() <= 0.01 * am.max()
    assert not np.array_equal(qd, q)  # the re-quantization is not a no-op


def test_nf4_pack_matches_fake_quant():
    """pack_nf4 -> unpack_nf4 reproduces formats.nf4 bit-exactly (same grid,
    same tie rule), including under double quant."""
    from llm_lns_quantization_tpu.ops.packing import pack_nf4, unpack_nf4

    w = rand((128, 64), seed=72)
    w[0, 0] = 0.0
    deq = np.asarray(unpack_nf4(pack_nf4(jnp.asarray(w)), jnp.float32))
    ref = np.asarray(formats.nf4(jnp.asarray(w)))
    np.testing.assert_array_equal(deq, ref)
    dq = np.asarray(
        unpack_nf4(pack_nf4(jnp.asarray(w), double_quant=True), jnp.float32))
    np.testing.assert_array_equal(dq, np.asarray(formats.nf4_dq(jnp.asarray(w))))


def test_nf4_matmul_matches_dequant_dot():
    """nf4_matmul (two halves-dots with fused decode+scale) == dequant dot."""
    from llm_lns_quantization_tpu.ops.packing import pack_nf4, unpack_nf4

    for K, N in [(256, 512), (128, 30)]:
        w = rand((K, N), seed=73)
        q = pack_nf4(jnp.asarray(w))
        x = jnp.asarray(rand((16, K), seed=74, scale=0.5), jnp.bfloat16)
        b = jnp.asarray(rand((N,), seed=75))
        got = np.asarray(qmm.nf4_matmul(
            x, q.packed, q.bscale, block_size=64, out_dtype=jnp.float32,
            bias=b))
        # the kernel decodes bf16-rounded CODE values then scales (LUT
        # decode, see _nf4_nib_decode); unpack_nf4 rounds after the scale —
        # both land within bf16 rounding of each other, so tolerance covers
        # one extra 2^-8-relative rounding accumulated over K
        want = np.asarray(jnp.dot(
            x.astype(jnp.float32),
            unpack_nf4(q, jnp.bfloat16).astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) + b[None, :])
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=1e-1)


def test_nf4_pallas_model_path():
    """w:nf4;pallas packs matmul weights as NF4KWeight (kpair since round 2);
    layers whose K does not divide the 64-block fall back to fake-quant;
    forward is finite."""
    from llm_lns_quantization_tpu.models import build_model
    from llm_lns_quantization_tpu.ops.packing import NF4KWeight
    from llm_lns_quantization_tpu.quant import QuantConfig

    tokens = jnp.asarray(np.arange(8, dtype=np.int32).reshape(1, 8) + 1)
    real = build_model(family="llama", preset="tiny", seed=0,
                       quant=QuantConfig.parse("w:nf4;pallas"),
                       dtype=jnp.float32)
    leaves = jax.tree_util.tree_leaves(
        real.params, is_leaf=lambda x: isinstance(x, NF4KWeight))
    assert any(isinstance(l, NF4KWeight) for l in leaves)
    out = real.forward(real.params, real.cfg, tokens)
    assert np.all(np.isfinite(np.asarray(out)))


# ---------------------------------------------------------------------------
# INT4 group-affine (the GPTQ/AWQ storage grid as a data-free format)
# ---------------------------------------------------------------------------


def test_int4g_fake_quant_semantics():
    """Per-group min/max affine INT4: idempotent, 16-level grid per group,
    group min/max preserved exactly, constant groups untouched, edge-padded
    tail groups keep their true min/max."""
    w = rand((256, 24), seed=80)
    q = np.asarray(formats.int4g(jnp.asarray(w)))
    np.testing.assert_array_equal(np.asarray(formats.int4g(jnp.asarray(q))), q)
    xg = w.reshape(2, 128, 24)
    qg = q.reshape(2, 128, 24)
    for g in range(2):
        for c in range(24):
            vals = np.unique(qg[g, :, c])
            assert len(vals) <= 16
            np.testing.assert_allclose(  # lo / hi are grid points (f32 rounding)
                [vals.min(), vals.max()],
                [xg[g, :, c].min(), xg[g, :, c].max()], rtol=1e-6)
    # constant group passes through
    const = jnp.full((128, 4), 0.7)
    np.testing.assert_array_equal(
        np.asarray(formats.int4g(const)), np.float32(0.7))
    # tail group: 130 rows = one full group + 2-row edge-padded tail
    w2 = rand((130, 8), seed=81)
    q2 = np.asarray(formats.int4g(jnp.asarray(w2)))
    tail = w2[128:]
    assert np.asarray(q2[128:]).min() >= tail.min() - 1e-6
    assert np.asarray(q2[128:]).max() <= tail.max() + 1e-6


def test_int4g_pack_matches_fake_quant():
    from llm_lns_quantization_tpu.ops.packing import pack_int4g, unpack_int4g

    w = rand((256, 64), seed=82)
    deq = np.asarray(unpack_int4g(pack_int4g(jnp.asarray(w)), jnp.float32))
    ref = np.asarray(formats.int4g(jnp.asarray(w)))
    np.testing.assert_allclose(deq, ref, rtol=0, atol=2e-7)


def test_int4g_reconstructs_gptq_grid_exactly():
    """A weight already on a group-affine INT4 grid (i.e. a dequantized GPTQ
    checkpoint, models/hf_loader.py) re-quantizes EXACTLY when each group
    exercises its full code range — the property that lets GPTQ checkpoints
    ride the packed 4-bit tier losslessly."""
    from llm_lns_quantization_tpu.ops.packing import pack_int4g, unpack_int4g

    rng = np.random.default_rng(83)
    K, N, g = 256, 32, 128
    codes = rng.integers(0, 16, (K, N))
    # force full range per (group, column) so min/max recover (scale, zero)
    codes[0, :] = 0
    codes[1, :] = 15
    codes[g, :] = 0
    codes[g + 1, :] = 15
    zeros = rng.integers(1, 15, (K // g, N))
    scales = (rng.random((K // g, N)).astype(np.float32) + 0.5) * 0.02
    gidx = np.arange(K) // g
    w = (scales[gidx] * (codes - zeros[gidx])).astype(np.float32)

    q = np.asarray(formats.int4_group(jnp.asarray(w), group_size=g))
    # lossless up to float32 rounding of q*scale + lo (<= 1 ULP; exact
    # zeros where code == zero-point reconstruct to ~1e-8 * scale)
    np.testing.assert_allclose(q, w, rtol=3e-6, atol=1e-7)
    deq = np.asarray(unpack_int4g(pack_int4g(jnp.asarray(w), group_size=g),
                                  jnp.float32))
    np.testing.assert_allclose(deq, w, rtol=3e-6, atol=1e-7)


def test_int4g_matmul_matches_dequant_dot():
    from llm_lns_quantization_tpu.ops.packing import pack_int4g, unpack_int4g

    for K, N in [(256, 512), (128, 30)]:
        w = rand((K, N), seed=84)
        q = pack_int4g(jnp.asarray(w))
        x = jnp.asarray(rand((16, K), seed=85, scale=0.5), jnp.bfloat16)
        b = jnp.asarray(rand((N,), seed=86))
        got = np.asarray(qmm.int4g_matmul(
            x, q.packed, q.scale, q.zero, group_size=128,
            out_dtype=jnp.float32, bias=b))
        # affine values are not bf16-representable: compare vs the same
        # bf16-rounded decode (as the nf4 test)
        want = np.asarray(jnp.dot(
            x.astype(jnp.float32),
            unpack_int4g(q, jnp.bfloat16).astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) + b[None, :])
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_int4g_pallas_model_path():
    """w:int4g;pallas packs matmul weights as Int4GroupKWeight (kpair since
    round 2; hidden sizes that don't divide the 128-group fall back to
    fake-quant); finite fwd."""
    from llm_lns_quantization_tpu.models import build_model
    from llm_lns_quantization_tpu.ops.packing import Int4GroupKWeight
    from llm_lns_quantization_tpu.quant import QuantConfig

    tokens = jnp.asarray(np.arange(8, dtype=np.int32).reshape(1, 8) + 1)
    real = build_model(family="llama", preset="tiny", seed=0,
                       quant=QuantConfig.parse("w:int4g;pallas"),
                       dtype=jnp.float32,
                       config_overrides=dict(hidden_size=128,
                                             intermediate_size=256))
    leaves = jax.tree_util.tree_leaves(
        real.params, is_leaf=lambda x: isinstance(x, Int4GroupKWeight))
    assert any(isinstance(l, Int4GroupKWeight) for l in leaves)
    out = real.forward(real.params, real.cfg, tokens)
    assert np.all(np.isfinite(np.asarray(out)))


# ---------------------------------------------------------------------------
# kpair layout (true 0.5 B/elem nibble tier)
# ---------------------------------------------------------------------------


def test_kpair_pack_same_grid_as_halves():
    """pack_lns4k/pack_fp4k quantize onto the IDENTICAL grids as the halves
    packers — only the byte layout differs — so unpacks must agree
    element-wise."""
    from llm_lns_quantization_tpu.ops import (
        pack_fp4, pack_fp4k, pack_lns4, pack_lns4k,
        unpack_fp4, unpack_fp4k, unpack_lns4, unpack_lns4k,
    )

    w = jnp.asarray(rand((64, 96), seed=21, scale=1.2))
    np.testing.assert_array_equal(
        np.asarray(unpack_lns4k(pack_lns4k(w), jnp.float32)),
        np.asarray(unpack_lns4(pack_lns4(w), jnp.float32)),
    )
    np.testing.assert_array_equal(
        np.asarray(unpack_fp4k(pack_fp4k(w), jnp.float32)),
        np.asarray(unpack_fp4(pack_fp4(w), jnp.float32)),
    )
    # byte volume is the same 0.5 B/elem; shapes differ by layout
    assert pack_lns4k(w).packed.shape == (32, 96)
    assert pack_lns4k(w).shape == (64, 96)


@pytest.mark.parametrize("fmt", ["lns4k", "fp4k"])
def test_kpair_matmul_xla_path(fmt):
    """The XLA two-dot fallback (even/odd row split) matches the dense dot on
    unpacked weights."""
    from llm_lns_quantization_tpu.ops import (
        pack_fp4k, pack_lns4k, unpack_fp4k, unpack_lns4k,
    )

    pack, unpack, mm = {
        "lns4k": (pack_lns4k, unpack_lns4k, qmm.lns4k_matmul),
        "fp4k": (pack_fp4k, unpack_fp4k, qmm.fp4k_matmul),
    }[fmt]
    M, K, N = 16, 256, 192
    x = jnp.asarray(rand((M, K), seed=22, scale=0.5), jnp.bfloat16)
    w = jnp.asarray(rand((K, N), seed=23, scale=0.4))
    bias = jnp.asarray(rand((N,), seed=24))
    q = pack(w)
    got = mm(x, q.packed, out_dtype=jnp.float32, bias=bias)  # small: XLA path
    want = jnp.dot(
        x.astype(jnp.float32), unpack(q, dtype=jnp.float32),
        preferred_element_type=jnp.float32,
    ) + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("fmt", ["lns4k", "fp4k"])
def test_kpair_matmul_fused_kernel_interpret(fmt):
    """The fused kernel (single packed read, dual-plane accumulate) matches
    the XLA path."""
    from unittest import mock

    from llm_lns_quantization_tpu.ops import pack_fp4k, pack_lns4k

    pack, mm = {
        "lns4k": (pack_lns4k, qmm.lns4k_matmul),
        "fp4k": (pack_fp4k, qmm.fp4k_matmul),
    }[fmt]
    M, K, N = 16, 512, 256
    x = jnp.asarray(rand((M, K), seed=25, scale=0.5), jnp.bfloat16)
    w = jnp.asarray(rand((K, N), seed=26, scale=0.4))
    bias = jnp.asarray(rand((N,), seed=27))
    q = pack(w)
    xla = mm(x, q.packed, out_dtype=jnp.float32, bias=bias)
    with mock.patch.object(qmm, "_KPAIR_FUSED_MIN_WEIGHT", 0):
        fused = _interpret(mm, x, q.packed, block_m=16, block_n=128,
                           out_dtype=jnp.float32, bias=bias)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(xla),
                               rtol=2e-3, atol=2e-3)


def test_kpair_model_path():
    """w:lns4;pallas now routes even-K matmul weights to the kpair layout."""
    from llm_lns_quantization_tpu.models import build_model
    from llm_lns_quantization_tpu.ops.packing import LNS4KWeight
    from llm_lns_quantization_tpu.quant import QuantConfig

    b = build_model(
        family="llama", preset="tiny", dtype=jnp.float32,
        quant=QuantConfig(weights="lns4", use_pallas=True),
    )
    leaves = jax.tree_util.tree_leaves(
        b.params, is_leaf=lambda x: isinstance(x, LNS4KWeight)
    )
    assert any(isinstance(l, LNS4KWeight) for l in leaves)
    tokens = jnp.asarray(np.arange(8, dtype=np.int32).reshape(1, 8))
    out = b.forward(b.params, b.cfg, tokens)
    assert np.all(np.isfinite(np.asarray(out)))


def test_kpair_dispatch_policy():
    """kpair production dispatch: XLA-everywhere by default — the round-2
    in-model 7B measurement showed the fused kernel's opaque pallas_call
    loses more to XLA's inter-op scheduling than its halved packed read
    saves (lns4 fused 0.80x bf16 vs ~1.0x XLA two-dot; BASELINE.md). The
    fused tier stays selectable via the LLMQ_KPAIR_FUSED_MIN_WEIGHT env
    override (read at import) or by patching the module constant."""
    from unittest import mock

    from llm_lns_quantization_tpu.ops import matmul as qmm
    from llm_lns_quantization_tpu.ops.packing import pack_lns4k

    w_small = pack_lns4k(jnp.asarray(rand((256, 256), seed=63)))
    w_big = pack_lns4k(jnp.asarray(rand((4096, 4096), seed=64, scale=0.02)))

    def has_pallas(fn, *args):
        return "pallas_call" in str(jax.make_jaxpr(fn)(*args))

    x_small = jnp.zeros((16, 256), jnp.bfloat16)
    x_big = jnp.zeros((16, 4096), jnp.bfloat16)
    x_score = jnp.zeros((2048, 4096), jnp.bfloat16)
    mm = lambda x, p: qmm.lns4k_matmul(x, p)  # noqa: E731
    assert not has_pallas(mm, x_small, w_small.packed)   # tiny weight: XLA
    assert not has_pallas(mm, x_big, w_big.packed)       # serving decode: XLA
    assert not has_pallas(mm, x_score, w_big.packed)     # compute-bound: XLA
    # distinct M inside the mock block: lns4k_matmul is jitted, so reusing
    # x_big's shape would replay the pre-mock (XLA) trace from the jit cache
    x_big8 = jnp.zeros((8, 4096), jnp.bfloat16)
    x_score8 = jnp.zeros((1024, 4096), jnp.bfloat16)
    try:
        with mock.patch.object(qmm, "_KPAIR_FUSED_MIN_WEIGHT", 8 * 2**20):
            assert has_pallas(mm, x_big8, w_big.packed)        # override: fused
            assert not has_pallas(mm, x_score8, w_big.packed)  # still M-gated
    finally:
        # drop the fused-path traces cached under the mocked constant, or a
        # later test hitting these shapes silently replays the fused kernel
        jax.clear_caches()


def test_int4gk_pack_same_grid_as_halves():
    """pack_int4gk quantizes onto the identical GPTQ-style grid as
    pack_int4g — unpacks must agree element-wise; only the layout differs."""
    from llm_lns_quantization_tpu.ops import (
        pack_int4g, pack_int4gk, unpack_int4g, unpack_int4gk,
    )

    w = jnp.asarray(rand((256, 96), seed=31, scale=0.7))
    np.testing.assert_array_equal(
        np.asarray(unpack_int4gk(pack_int4gk(w), jnp.float32)),
        np.asarray(unpack_int4g(pack_int4g(w), jnp.float32)),
    )
    q = pack_int4gk(w)
    assert q.packed.shape == (128, 96)
    assert q.scale.shape == (2, 96) and q.zero.shape == (2, 96)


def test_int4gk_matmul_xla_and_fused():
    """XLA fallback and fused kernel both match the dense dot on unpacked
    weights (fused: single packed read + band-broadcast affine decode)."""
    from unittest import mock

    from llm_lns_quantization_tpu.ops import pack_int4gk, unpack_int4gk

    M, K, N = 16, 512, 256
    x = jnp.asarray(rand((M, K), seed=32, scale=0.5), jnp.bfloat16)
    w = jnp.asarray(rand((K, N), seed=33, scale=0.4))
    bias = jnp.asarray(rand((N,), seed=34))
    q = pack_int4gk(w)
    want = jnp.dot(
        x.astype(jnp.float32), unpack_int4gk(q, dtype=jnp.float32),
        preferred_element_type=jnp.float32,
    ) + bias
    xla = qmm.int4gk_matmul(x, q.packed, q.scale, q.zero,
                            out_dtype=jnp.float32, bias=bias)
    np.testing.assert_allclose(np.asarray(xla), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    with mock.patch.object(qmm, "_KPAIR_FUSED_MIN_WEIGHT", 0):
        fused = _interpret(qmm.int4gk_matmul, x, q.packed, q.scale, q.zero,
                           block_m=16, block_n=128, out_dtype=jnp.float32,
                           bias=bias)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(xla),
                               rtol=2e-3, atol=2e-3)


def test_int4gk_model_path():
    """w:int4g;pallas routes group-divisible weights to the kpair layout."""
    from llm_lns_quantization_tpu.models import build_model
    from llm_lns_quantization_tpu.ops.packing import Int4GroupKWeight
    from llm_lns_quantization_tpu.quant import QuantConfig

    b = build_model(
        family="llama", preset="tiny", dtype=jnp.float32,
        config_overrides=dict(hidden_size=128, intermediate_size=256),
        quant=QuantConfig(weights="int4g", use_pallas=True),
    )
    leaves = jax.tree_util.tree_leaves(
        b.params, is_leaf=lambda x: isinstance(x, Int4GroupKWeight)
    )
    assert any(isinstance(l, Int4GroupKWeight) for l in leaves)
    tokens = jnp.asarray(np.arange(8, dtype=np.int32).reshape(1, 8))
    out = b.forward(b.params, b.cfg, tokens)
    assert np.all(np.isfinite(np.asarray(out)))


def test_nf4k_pack_same_grid_as_halves():
    """pack_nf4k (incl. double-quant scales) lands on the identical grid as
    pack_nf4 — unpacks must agree element-wise."""
    from llm_lns_quantization_tpu.ops import (
        pack_nf4, pack_nf4k, unpack_nf4, unpack_nf4k,
    )

    w = jnp.asarray(rand((128, 96), seed=41, scale=0.6))
    for dq in (False, True):
        np.testing.assert_array_equal(
            np.asarray(unpack_nf4k(pack_nf4k(w, double_quant=dq), jnp.float32)),
            np.asarray(unpack_nf4(pack_nf4(w, double_quant=dq), jnp.float32)),
        )
    q = pack_nf4k(w)
    assert q.packed.shape == (64, 96) and q.bscale.shape == (2, 96)


def test_nf4k_matmul_xla_and_fused():
    from unittest import mock

    from llm_lns_quantization_tpu.ops import pack_nf4k, unpack_nf4k

    M, K, N = 16, 512, 256
    x = jnp.asarray(rand((M, K), seed=42, scale=0.5), jnp.bfloat16)
    w = jnp.asarray(rand((K, N), seed=43, scale=0.4))
    bias = jnp.asarray(rand((N,), seed=44))
    q = pack_nf4k(w)
    want = jnp.dot(
        x.astype(jnp.float32), unpack_nf4k(q, dtype=jnp.float32),
        preferred_element_type=jnp.float32,
    ) + bias
    xla = qmm.nf4k_matmul(x, q.packed, q.bscale, out_dtype=jnp.float32,
                          bias=bias)
    # oracle decodes in f32; the matmul path decodes to bf16 (code x absmax
    # rounded) — a ~1%/element model difference, not a layout error
    np.testing.assert_allclose(np.asarray(xla), np.asarray(want),
                               rtol=4e-2, atol=5e-2)
    with mock.patch.object(qmm, "_KPAIR_FUSED_MIN_WEIGHT", 0):
        fused = _interpret(qmm.nf4k_matmul, x, q.packed, q.bscale,
                           block_m=16, block_n=128, out_dtype=jnp.float32,
                           bias=bias)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(xla),
                               rtol=2e-3, atol=2e-3)


def test_nf4k_model_path():
    """w:nf4;pallas routes block-divisible weights to the kpair layout."""
    from llm_lns_quantization_tpu.models import build_model
    from llm_lns_quantization_tpu.ops.packing import NF4KWeight
    from llm_lns_quantization_tpu.quant import QuantConfig

    b = build_model(
        family="llama", preset="tiny", dtype=jnp.float32,
        quant=QuantConfig(weights="nf4", use_pallas=True),
    )
    leaves = jax.tree_util.tree_leaves(
        b.params, is_leaf=lambda x: isinstance(x, NF4KWeight)
    )
    assert any(isinstance(l, NF4KWeight) for l in leaves)
    tokens = jnp.asarray(np.arange(8, dtype=np.int32).reshape(1, 8))
    out = b.forward(b.params, b.cfg, tokens)
    assert np.all(np.isfinite(np.asarray(out)))


def test_fuse_proj_serving_layout():
    """``;fuse`` (QuantConfig.fuse_proj): q/k/v and gate/up concatenate into
    one packed matmul each (llama.fuse_projections) and the fused forward is
    BITWISE equal to the unfused packed tier — concatenation runs along N,
    so no format's quantization grid crosses the boundary. Prefill + decode
    + GQA; activation-quant specs are rejected at parse time."""
    import pytest

    from llm_lns_quantization_tpu.models import build_model
    from llm_lns_quantization_tpu.quant import QuantConfig

    tokens = jnp.asarray(
        np.random.default_rng(7).integers(0, 250, (2, 12)).astype(np.int32)
    )
    overrides = dict(hidden_size=128, intermediate_size=256,
                     num_attention_heads=4, num_key_value_heads=2)  # GQA
    for spec in ("w:int4g;pallas", "w:lns4;pallas", "w:w8a8;pallas"):
        a = build_model(family="llama", preset="tiny",
                        config_overrides=overrides,
                        quant=QuantConfig.parse(spec))
        f = build_model(family="llama", preset="tiny",
                        config_overrides=overrides,
                        quant=QuantConfig.parse(spec + ";fuse"))
        assert "qkv_proj" in f.params["layers"][0]
        assert "gateup_proj" in f.params["layers"][0]
        np.testing.assert_array_equal(
            np.asarray(a.forward(a.params, a.cfg, tokens)),
            np.asarray(f.forward(f.params, f.cfg, tokens)),
        )
        cache = f.init_cache(f.cfg, 2, 24)
        ca = a.init_cache(a.cfg, 2, 24)
        lg_f, _ = f.forward(f.params, f.cfg, tokens, cache=cache, cache_index=0)
        lg_a, _ = a.forward(a.params, a.cfg, tokens, cache=ca, cache_index=0)
        np.testing.assert_array_equal(np.asarray(lg_a), np.asarray(lg_f))

    with pytest.raises(ValueError, match="fuse"):
        QuantConfig.parse("w:int4g;a:lns8;pallas;fuse")
    with pytest.raises(ValueError, match="fuse"):
        build_model(family="opt", preset="tiny",
                    quant=QuantConfig.parse("w:int4g;pallas;fuse"))


def test_int4gk_dispatch_policy():
    """int4gk production dispatch (round 3): XLA's fusion of the affine band
    broadcast breaks at 7B plane sizes (0.33x bf16 in-model) while the fused
    Mosaic kernel measures 1.20x — so decode-M calls at 7B-class K*N take
    the kernel, while 1.5B-class shapes and the score regime keep the
    measured XLA dispatch. The 12M-element default threshold sits between
    GPT-2 XL's largest matmul (10.2M) and Llama-7B's smallest (16.8M)."""
    from llm_lns_quantization_tpu.ops import matmul as qmm
    from llm_lns_quantization_tpu.ops.packing import pack_int4gk

    w7b = pack_int4gk(jnp.asarray(rand((4096, 4096), seed=65, scale=0.02)))
    wxl = pack_int4gk(jnp.asarray(rand((3200, 1600), seed=66, scale=0.02)))

    def has_pallas(x, q):
        jaxpr = jax.make_jaxpr(
            lambda a, p, s, z: qmm.int4gk_matmul(a, p, s, z)
        )(x, q.packed, q.scale, q.zero)
        return "pallas_call" in str(jaxpr)

    x7 = jnp.zeros((8, 4096), jnp.bfloat16)
    assert has_pallas(x7, w7b)                      # 7B decode: fused kernel
    # mid-M (M=1024) is dispatch-context dependent (round 5, both measured
    # at 7B): default — inside fused prefill+decode programs — keeps
    # chunked XLA (kernel there lost 430 -> 396 tok/s end-to-end), while
    # the standalone-prefill scope takes the kernel (batcher prefill phase
    # 466 -> 379 ms, end-to-end 292.5 -> 307.8 gen-tok/s)
    xmid = jnp.zeros((1024, 4096), jnp.bfloat16)
    assert not has_pallas(xmid, w7b)
    with qmm.int4gk_prefill_kernel():
        assert has_pallas(xmid, w7b)
        assert has_pallas(x7, w7b)                  # decode-M: kernel either way
        assert not has_pallas(jnp.zeros((2048, 4096), jnp.bfloat16), w7b)
    assert not has_pallas(xmid, w7b)                # scope restores
    assert not has_pallas(jnp.zeros((2048, 4096), jnp.bfloat16), w7b)  # score
    assert not has_pallas(jnp.zeros((8, 3200), jnp.bfloat16), wxl)  # 1.5B: XLA
    jax.clear_caches()


def test_nf4k_and_lns4k_dispatch_policy():
    """Round-4 measured dispatch: nf4k takes its fused kernel at 7B-class
    decode shapes (0.565x vs chunked-XLA's 0.504x — the single packed read
    wins even under the LUT decode), while lns4k stays XLA-everywhere (its
    chunked-XLA 1.027x beats its fused kernel's 0.84x). BASELINE.md round-4
    kpair table."""
    from llm_lns_quantization_tpu.ops import matmul as qmm
    from llm_lns_quantization_tpu.ops.packing import pack_lns4k, pack_nf4k

    w = jnp.asarray(rand((4096, 4096), seed=67, scale=0.02))
    nf = pack_nf4k(w)
    l4 = pack_lns4k(w)
    x = jnp.zeros((8, 4096), jnp.bfloat16)

    j_nf = str(jax.make_jaxpr(
        lambda a, p, s: qmm.nf4k_matmul(a, p, s))(x, nf.packed, nf.bscale))
    assert "pallas_call" in j_nf            # nf4k 7B decode: fused kernel
    j_nf_score = str(jax.make_jaxpr(
        lambda a, p, s: qmm.nf4k_matmul(a, p, s))(
            jnp.zeros((2048, 4096), jnp.bfloat16), nf.packed, nf.bscale))
    assert "pallas_call" not in j_nf_score  # score regime: XLA
    j_l4 = str(jax.make_jaxpr(
        lambda a, p: qmm.lns4k_matmul(a, p))(x, l4.packed))
    assert "pallas_call" not in j_l4        # lns4k: chunked XLA everywhere
    jax.clear_caches()


def test_kpair_score_regime_dispatch():
    """Score-regime (M >= _XLA_DOT_MIN_M) kpair dispatch decodes the packed
    plane ONCE and runs a single dot (round 5, VERDICT r4 item 1): the
    chunked fallback's per-chunk ``y = y + dot`` round-trips the [M, N] f32
    accumulator through HBM, which at 7B score shapes is 10-100x the weight
    plane — measured 0.542x (int4gk) / 0.597x (lns4k) of bf16. The once-dot
    path deliberately materializes the decoded plane instead. Invariant:
    exactly one dot_general in the lowered program at score-M for every
    kpair format, and the result matches the dense dot on unpacked weights.
    Decode-M and mid-M (the 128-token prefill's M=1024, where the chunked
    path's M-proportional partial sums undercut the once-dot's constant
    plane round-trip — measured 433 vs 379 tok/s on the 7B decode row)
    keep the anti-materialization chunked path (>= 2 dots)."""
    from llm_lns_quantization_tpu.ops import matmul as qmm
    from llm_lns_quantization_tpu.ops.packing import (
        pack_fp4k, pack_int4gk, pack_lns4k, pack_nf4k,
        unpack_fp4k, unpack_int4gk, unpack_lns4k, unpack_nf4k,
    )

    M, K, N = 2048, 4096, 256
    x = jnp.asarray(rand((M, K), seed=71, scale=0.1), jnp.bfloat16)
    w = jnp.asarray(rand((K, N), seed=72, scale=0.05))

    cases = {
        "lns4k": (pack_lns4k(w), unpack_lns4k,
                  lambda a, q: qmm.lns4k_matmul(a, q.packed)),
        "fp4k": (pack_fp4k(w), unpack_fp4k,
                 lambda a, q: qmm.fp4k_matmul(a, q.packed)),
        "int4gk": (pack_int4gk(w), unpack_int4gk,
                   lambda a, q: qmm.int4gk_matmul(a, q.packed, q.scale,
                                                  q.zero)),
        "nf4k": (pack_nf4k(w), unpack_nf4k,
                 lambda a, q: qmm.nf4k_matmul(a, q.packed, q.bscale)),
    }
    for name, (q, unpack, mm) in cases.items():
        jaxpr = str(jax.make_jaxpr(lambda a: mm(a, q))(x))
        n_dots = jaxpr.count("dot_general")
        assert n_dots == 1, f"{name}: score-M lowered {n_dots} dots, want 1"
        want = np.asarray(jnp.dot(
            x.astype(jnp.float32), unpack(q, jnp.float32),
            preferred_element_type=jnp.float32))
        got = np.asarray(mm(x, q)).astype(np.float32)
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    # decode-M and prefill-M (1024 < _KPAIR_ONCE_DOT_MIN_M) keep the
    # two-dot chunked form
    q = cases["lns4k"][0]
    for m in (8, 1024):
        j_dec = str(jax.make_jaxpr(
            lambda a: qmm.lns4k_matmul(a, q.packed))(
                jnp.zeros((m, K), jnp.bfloat16)))
        assert j_dec.count("dot_general") >= 2, m
    jax.clear_caches()


def test_askip_site_opt_out():
    """``askip:site1|site2`` leaves named activation sites unquantized
    (round-3 knob: the lm_head site alone is 22 points of emulation
    throughput, BASELINE.md fake-quant attribution). Round-trips through
    describe()."""
    from llm_lns_quantization_tpu.quant import ActQuantizer, QuantConfig

    cfg = QuantConfig.parse("a:lns8;askip:lm_head|attn_qkv")
    assert cfg.skip_act_sites == ("lm_head", "attn_qkv")
    assert QuantConfig.parse(cfg.describe()) == cfg
    actq = ActQuantizer(cfg)
    x = jnp.asarray(rand((4, 8), seed=70))
    np.testing.assert_array_equal(np.asarray(actq("lm_head", x)),
                                  np.asarray(x))
    assert not np.array_equal(np.asarray(actq("mlp_fc", x)), np.asarray(x))


def test_quantize_weights_lazy_materialize():
    """quantize_weights(materialize=...) packs a ShapeDtypeStruct tree
    leaf-by-leaf, bitwise identical to packing the materialized tree — the
    mechanism that lets the 7B/13B benches generate weights on-TPU without
    ever holding the full bf16 tree (scripts/bench_serving_7b.py)."""
    from llm_lns_quantization_tpu.models import build_model
    from llm_lns_quantization_tpu.quant import QuantConfig
    from llm_lns_quantization_tpu.quant.apply import quantize_weights

    base = build_model(family="llama", preset="tiny")
    quant = QuantConfig.parse("w:int4g;pallas")
    eager = quantize_weights(base.params, quant)

    flat, treedef = jax.tree_util.tree_flatten(base.params)
    shapes = jax.tree_util.tree_unflatten(
        treedef, [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in flat]
    )
    sds_to_leaf = {}
    for sds, leaf in zip(jax.tree_util.tree_leaves(shapes), flat):
        sds_to_leaf[id(sds)] = leaf
    calls = []

    def materialize(name, l):
        calls.append(name)
        return sds_to_leaf[id(l)] if isinstance(l, jax.ShapeDtypeStruct) else l

    lazy = quantize_weights(shapes, quant, materialize=materialize)
    assert len(calls) == len(flat)  # every leaf went through the hook
    for a, b in zip(jax.tree_util.tree_leaves(eager),
                    jax.tree_util.tree_leaves(lazy)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
