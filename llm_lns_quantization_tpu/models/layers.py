"""Shared transformer building blocks (pure-function JAX, pytree params).

Design: models are plain functions over parameter pytrees — no module
framework. This keeps three things trivial that the reference does with
PyTorch machinery:

* weight quantization = ``jax.tree_util`` map (vs in-place
  ``named_parameters`` rewrite, reference huggingface.py:1740-1762);
* activation quantization = explicit ``actq(site, x)`` calls where the
  reference registered forward hooks on leaf modules (reference
  huggingface.py:672-676) — each model documents its site list;
* sharding = a PartitionSpec pytree mirroring the param pytree (parallel/).

All matmuls take a ``preferred_element_type`` so the MXU accumulates in
float32 regardless of the storage dtype (bfloat16 by default on TPU).
"""

from typing import Optional

import jax
import jax.numpy as jnp

from ..quant.apply import ActQuantizer

# activation formats whose serving semantics are per-row dynamic INT8 —
# with packed int8 weights these take the true s8 x s8 kernel (ops/matmul.py
# w8a8_matmul) instead of the upcast-to-bf16 weight-compression kernel
_INT8_ACT_FORMATS = ("w8a8", "zeroquant", "smoothquant", "int8")


def dense(x, w, b, actq: ActQuantizer, site: str):
    """Linear layer with an activation-quant site on its output.

    The output site corresponds to the forward hook the reference installs on
    every Linear/Conv1D leaf module (huggingface.py:672-676).

    ``w`` may be a plain array (bf16/f32 fake-quant tier) or a packed
    quantized weight (ops.packing.LNSWeight / Int8Weight) — the latter routes
    through the dequant-fused Pallas matmul kernels (real-quant tier).
    """
    from ..ops.packing import (
        FP4KWeight,
        FP4Weight,
        FP8Weight,
        Int4GroupKWeight,
        Int4GroupWeight,
        Int8Weight,
        LNS4KWeight,
        LNS4Weight,
        LNSWeight,
        MXWeight,
        NF4KWeight,
        NF4Weight,
    )

    if isinstance(w, (LNSWeight, Int8Weight, LNS4Weight, LNS4KWeight,
                      MXWeight, FP8Weight, FP4Weight, FP4KWeight, NF4Weight,
                      NF4KWeight, Int4GroupWeight, Int4GroupKWeight)):
        # tp wrappers = the same kernels under custom_partitioning, so a
        # model-axis-sharded packed weight runs the kernel on local shards
        # (megatron column/row parallel) instead of being all-gathered
        from ..ops import tp as qmm

        *lead, K = x.shape
        x2 = x.reshape(-1, K)
        # bias rides into the kernel epilogue (XLA fuses dot+b for the bf16
        # path; the kernels must do the same or pay an extra [M, N] HBM
        # round-trip — measured ~15% of GPT-2 scoring throughput)
        if isinstance(w, LNSWeight):
            y2 = qmm.lns_matmul(
                x2.astype(jnp.bfloat16), w.codes, frac_bits=w.frac_bits,
                out_dtype=x.dtype, bias=b,
            )
        elif isinstance(w, LNS4Weight):
            y2 = qmm.lns4_matmul(
                x2.astype(jnp.bfloat16), w.packed, out_dtype=x.dtype, bias=b
            )
        elif isinstance(w, LNS4KWeight):
            y2 = qmm.lns4k_matmul(
                x2.astype(jnp.bfloat16), w.packed, out_dtype=x.dtype, bias=b
            )
        elif isinstance(w, FP4KWeight):
            y2 = qmm.fp4k_matmul(
                x2.astype(jnp.bfloat16), w.packed, out_dtype=x.dtype, bias=b
            )
        elif isinstance(w, FP4Weight):
            y2 = qmm.fp4_matmul(
                x2.astype(jnp.bfloat16), w.packed, out_dtype=x.dtype, bias=b
            )
        elif isinstance(w, NF4KWeight):
            y2 = qmm.nf4k_matmul(
                x2.astype(jnp.bfloat16), w.packed, w.bscale,
                block_size=w.block_size, out_dtype=x.dtype, bias=b,
            )
        elif isinstance(w, NF4Weight):
            y2 = qmm.nf4_matmul(
                x2.astype(jnp.bfloat16), w.packed, w.bscale,
                block_size=w.block_size, out_dtype=x.dtype, bias=b,
            )
        elif isinstance(w, Int4GroupKWeight):
            y2 = qmm.int4gk_matmul(
                x2.astype(jnp.bfloat16), w.packed, w.scale, w.zero,
                group_size=w.group_size, out_dtype=x.dtype, bias=b,
            )
        elif isinstance(w, Int4GroupWeight):
            y2 = qmm.int4g_matmul(
                x2.astype(jnp.bfloat16), w.packed, w.scale, w.zero,
                group_size=w.group_size, out_dtype=x.dtype, bias=b,
            )
        elif isinstance(w, FP8Weight):
            y2 = qmm.fp8_matmul(
                x2.astype(jnp.bfloat16), w.codes, exp_bits=w.exp_bits,
                man_bits=w.man_bits, e_bias=w.e_bias, out_dtype=x.dtype,
                bias=b,
            )
        elif isinstance(w, MXWeight):
            y2 = qmm.mx_matmul(
                x2.astype(jnp.bfloat16), w.codes, w.bscale,
                exp_bits=w.exp_bits, man_bits=w.man_bits,
                block_size=w.block_size, out_dtype=x.dtype, bias=b,
            )
        elif actq.config.acts in _INT8_ACT_FORMATS:
            # int8-family activation format + packed int8 weights = the true
            # W8A8 serving path: per-row dynamic activation quant in-kernel,
            # native s8 x s8 MXU dot (2x bf16 MXU throughput on v5e+)
            y2 = qmm.w8a8_matmul(
                x2.astype(jnp.bfloat16), w.codes, w.scale, out_dtype=x.dtype,
                bias=b,
            )
        else:
            y2 = qmm.int8_matmul(
                x2.astype(jnp.bfloat16), w.codes, w.scale, out_dtype=x.dtype,
                bias=b,
            )
        return actq(site, y2.reshape(*lead, w.shape[1]))
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    y = y.astype(x.dtype)
    if b is not None:
        y = (y + b).astype(x.dtype)
    return actq(site, y)


def layer_norm(x, scale, bias, eps=1e-5):
    """LayerNorm — never quantized (the reference excludes nn.LayerNorm from
    its hook walk, huggingface.py:672)."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(dtype)


def rms_norm(x, scale, eps=1e-6):
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps) * scale).astype(dtype)


def update_kv_cache(cache_pair, k, v, cache_index, dtype):
    """Write fresh k/v [B, H, T, D] into a layer's cache pair and return the
    full-length (k, v, new_cache).

    One shared implementation of the block every decoder family used to
    inline: plain bf16 caches, INT8 (``QuantKV``: quantize on write,
    dequantize on read) and FP8 (``FP8KV``) variants. ``cache_index`` may be
    a scalar (eval decode: all rows share an offset) or a per-row [B] vector
    (continuous batching: each slot has its own write offset, lm/serve.py).
    """
    from ..ops.kv_cache import (
        FP8KV,
        QuantKV,
        _dus,
        fp8_dequantize,
        fp8_update,
        kv_dequantize,
        kv_update,
    )

    ck, cv = cache_pair
    if isinstance(ck, QuantKV):
        ck = kv_update(ck, k, cache_index)
        cv = kv_update(cv, v, cache_index)
        return (
            kv_dequantize(ck, dtype=dtype),
            kv_dequantize(cv, dtype=dtype),
            (ck, cv),
        )
    if isinstance(ck, FP8KV):
        ck = fp8_update(ck, k, cache_index)
        cv = fp8_update(cv, v, cache_index)
        return (
            fp8_dequantize(ck, dtype=dtype),
            fp8_dequantize(cv, dtype=dtype),
            (ck, cv),
        )
    ck = _dus(ck, k.astype(ck.dtype), cache_index)
    cv = _dus(cv, v.astype(cv.dtype), cache_index)
    return ck, cv, (ck, cv)


def decode_mask_bias(T, kv_len, cache_index, attn_mask):
    """Additive attention bias for the KV-cache decode step.

    ``cache_index`` scalar or per-row [B]; ``attn_mask`` optional [B, kv_len]
    validity of cache positions (left-padding / continuous-batching slots).
    Returns [*, 1, T, kv_len] broadcastable against [B, H, T, S] scores.
    """
    kv_pos = jnp.arange(kv_len)
    q_pos = jnp.arange(T)
    idx = jnp.asarray(cache_index)
    if idx.ndim:  # per-row offsets -> [B, T, S]
        allowed = kv_pos[None, None, :] <= (
            q_pos[None, :, None] + idx[:, None, None]
        )
    else:
        allowed = (kv_pos[None, :] <= (q_pos[:, None] + idx))[None]
    if attn_mask is not None:
        allowed = allowed & attn_mask[:, None, :].astype(bool)
    return jnp.where(allowed, 0.0, jnp.finfo(jnp.float32).min)[:, None, :, :]


def _flash_eligible(q, k):
    """Fused flash attention needs the TPU backend (Mosaic), square
    causal-pure shapes, and the 128-divisible sequence tiles of the default
    BlockSizes. Tiny test configs and the CPU mesh take the unfused path."""
    if jax.default_backend() == "cpu":
        return False
    B, H, T, D = q.shape
    S = k.shape[2]
    return (
        T == S
        and T % 128 == 0
        and D % 8 == 0
        and q.dtype in (jnp.bfloat16, jnp.float32)
        and q.dtype == k.dtype
    )


def attention_core(q, k, v, *, scale, mask_bias=None, is_causal=False):
    """softmax(q k^T * scale + bias) v for [B, H, T, D] operands.

    On TPU, the pure-causal full-sequence case (the harness's scoring path —
    no cache, no padding mask) runs jax's Pallas flash-attention kernel:
    one fused pass instead of materializing the [B, H, T, S] score tensor in
    HBM, plus the causal block-skip. All other cases (decode with KV cache,
    left-padded generation prefill, cross-attention, rel-pos biases) use the
    reference einsum-softmax-einsum, which XLA fuses adequately at their
    small query lengths.
    """
    if is_causal and mask_bias is None and _flash_eligible(q, k):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            flash_attention,
        )

        # 512-token tiles measured 1.8x over the unfused path at the
        # B8 H12 T1024 D64 scoring shape on v5e; the library default (128)
        # is slower than unfused there (BASELINE.md)
        T = q.shape[2]
        b = next(s for s in (512, 256, 128) if T % s == 0)
        bs = BlockSizes(
            block_q=b, block_k_major=b, block_k=b, block_b=1,
            block_q_major_dkv=b, block_k_major_dkv=b,
            block_k_dkv=b, block_q_dkv=b,
            block_k_major_dq=b, block_k_dq=b, block_q_dq=b,
        )
        return flash_attention(
            q, k, v.astype(q.dtype), causal=True, sm_scale=scale,
            block_sizes=bs,
        )
    if mask_bias is None and is_causal:
        mask_bias = causal_mask_bias(q.shape[2], k.shape[2])
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
    scores = scores * jnp.float32(scale)
    if mask_bias is not None:
        scores = scores + mask_bias
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", probs, v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def causal_attention_scores(q, k, mask_bias):
    """[B,H,T,D] x [B,H,S,D] -> [B,H,T,S] softmax with additive mask bias."""
    depth = q.shape[-1]
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(depth).astype(jnp.float32)
    scores = scores + mask_bias
    return jax.nn.softmax(scores, axis=-1)


def causal_mask_bias(q_len: int, kv_len: int, dtype=jnp.float32, q_offset: int = 0):
    """Additive causal mask: position t attends to kv positions <= t+offset."""
    q_pos = jnp.arange(q_len)[:, None] + q_offset
    kv_pos = jnp.arange(kv_len)[None, :]
    allowed = kv_pos <= q_pos
    return jnp.where(allowed, 0.0, jnp.finfo(jnp.float32).min).astype(dtype)


def rope(x, positions, theta: float = 10000.0):
    """Rotary position embedding over the last dim of [B, T, H, D]."""
    d = x.shape[-1]
    half = d // 2
    freqs = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = positions[:, :, None].astype(jnp.float32) * freqs[None, None, :]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    out = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )
    return out.astype(x.dtype)


def gelu_new(x):
    """GPT-2's tanh-approximated GELU (transformers NewGELUActivation)."""
    x32 = x.astype(jnp.float32)
    y = (
        0.5
        * x32
        * (
            1.0
            + jnp.tanh(
                jnp.sqrt(2.0 / jnp.pi) * (x32 + 0.044715 * jnp.power(x32, 3.0))
            )
        )
    )
    return y.astype(x.dtype)


def cross_entropy_logprobs(logits, targets):
    """log P(target) per position: [B,T,V], [B,T] -> [B,T] (float32)."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gathered = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    return gathered - logz


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def cast_floats(tree, dtype):
    def f(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(f, tree)


def initializer(key, shape, scale: Optional[float] = None, dtype=jnp.float32):
    scale = scale if scale is not None else 0.02
    return jax.random.normal(key, shape, dtype) * scale
