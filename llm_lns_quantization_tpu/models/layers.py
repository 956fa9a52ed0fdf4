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


def dense(x, w, b, actq: ActQuantizer, site: str):
    """Linear layer with an activation-quant site on its output.

    The output site corresponds to the forward hook the reference installs on
    every Linear/Conv1D leaf module (huggingface.py:672-676).

    ``w`` may be a plain array (bf16/f32 fake-quant tier) or a packed
    quantized weight (ops.packing.LNSWeight / Int8Weight) — the latter routes
    through the dequant-fused Pallas matmul kernels (real-quant tier).
    """
    from ..ops.packing import Int8Weight, LNS4Weight, LNSWeight

    if isinstance(w, (LNSWeight, Int8Weight, LNS4Weight)):
        from ..ops import matmul as qmm

        *lead, K = x.shape
        x2 = x.reshape(-1, K)
        if isinstance(w, LNSWeight):
            y2 = qmm.lns_matmul(
                x2.astype(jnp.bfloat16), w.codes, frac_bits=w.frac_bits,
                out_dtype=x.dtype,
            )
        elif isinstance(w, LNS4Weight):
            y2 = qmm.lns4_matmul(
                x2.astype(jnp.bfloat16), w.packed, out_dtype=x.dtype
            )
        else:
            y2 = qmm.int8_matmul(
                x2.astype(jnp.bfloat16), w.codes, w.scale, out_dtype=x.dtype
            )
        y = y2.reshape(*lead, w.shape[1])
    else:
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
