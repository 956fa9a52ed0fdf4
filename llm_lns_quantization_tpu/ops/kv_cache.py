"""INT8 / FP8 KV-cache quantization ops.

BASELINE.json configs #3/#5 call for an INT8 KV cache: keys/values are
stored in the decode cache as int8 codes with per-(batch, head, position)
scales, halving cache HBM footprint and bandwidth — the decode-time
bottleneck at long contexts. Quantize on write, dequantize on read; both are
cheap VPU element-wise ops that XLA fuses around the attention matmuls.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantKV(NamedTuple):
    codes: jax.Array   # int8  [B, H, S, D]
    scale: jax.Array   # f32   [B, H, S, 1]

    @property
    def shape(self):
        return self.codes.shape


def kv_quantize(x: jax.Array) -> QuantKV:
    """Per-position symmetric absmax int8 quantization of [B, H, S, D]."""
    x = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    codes = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return QuantKV(codes=codes, scale=scale)


def kv_dequantize(q: QuantKV, dtype=jnp.bfloat16) -> jax.Array:
    return (q.codes.astype(jnp.float32) * q.scale).astype(dtype)


def _dus(buf: jax.Array, new: jax.Array, index) -> jax.Array:
    """dynamic_update_slice of [B, H, T, D] into [B, H, S, D] at ``index`` —
    a scalar (all rows share one write offset: the eval decode loop) or a
    per-row [B] vector (each slot has its own offset: continuous batching,
    lm/serve.py)."""
    if getattr(index, "ndim", 0):
        return jax.vmap(
            lambda b, n, i: jax.lax.dynamic_update_slice(b, n, (0, i, 0))
        )(buf, new, index)
    return jax.lax.dynamic_update_slice(buf, new, (0, 0, index, 0))


def kv_update(cache: QuantKV, new: jax.Array, index) -> QuantKV:
    """Write new [B, H, T, D] positions into the quantized cache at index."""
    q = kv_quantize(new)
    codes = _dus(cache.codes, q.codes, index)
    scale = _dus(cache.scale, q.scale, index)
    return QuantKV(codes=codes, scale=scale)


def init_quant_cache(batch: int, heads: int, max_len: int, head_dim: int) -> QuantKV:
    return QuantKV(
        codes=jnp.zeros((batch, heads, max_len, head_dim), jnp.int8),
        scale=jnp.ones((batch, heads, max_len, 1), jnp.float32),
    )


# ---------------------------------------------------------------------------
# FP8 cache (scale-free: e4m3 dynamic range covers post-norm K/V activations)
# ---------------------------------------------------------------------------


class FP8KV(NamedTuple):
    codes: jax.Array   # float8_e4m3fn [B, H, S, D]

    @property
    def shape(self):
        return self.codes.shape


def fp8_update(cache: "FP8KV", new: jax.Array, index) -> "FP8KV":
    # saturate: a bare cast maps |v| >= 465 (e4m3fn max is 448) to NaN, which
    # would permanently poison the cache row and every later softmax over it
    lim = float(jnp.finfo(jnp.float8_e4m3fn).max)
    q = jnp.clip(new.astype(jnp.float32), -lim, lim).astype(jnp.float8_e4m3fn)
    return FP8KV(_dus(cache.codes, q, index))


def fp8_dequantize(cache: "FP8KV", dtype=jnp.bfloat16) -> jax.Array:
    return cache.codes.astype(dtype)


def init_fp8_cache(batch: int, heads: int, max_len: int, head_dim: int) -> "FP8KV":
    return FP8KV(jnp.zeros((batch, heads, max_len, head_dim), jnp.float8_e4m3fn))
