"""BLOOM decoder (ALiBi attention, embedding LayerNorm, fused per-head QKV).

BLOOM is one of the reference's evaluated models (its result CSV ships at
reference lm_eval/models/bloom.csv:1-3); architecture follows HF
``modeling_bloom``:

* no positional embeddings — ALiBi: a per-head linear bias on attention
  scores, ``slope_h * key_position``, with the standard power-of-2 slope
  schedule (HF ``build_alibi_tensor``). HF computes key positions from the
  attention-mask cumsum; because softmax is invariant to a per-query-row
  constant and valid (unmasked) keys are always a contiguous run here,
  absolute key indices give identical outputs — so we use ``arange`` and
  keep the bias table position-static, which lets the decode step reuse one
  precomputed [nh, S] table instead of recomputing per step;
* ``word_embeddings_layernorm`` applied to the embedding output (a LayerNorm
  — never quantized, matching the reference's hook exclusion rule,
  huggingface.py:672);
* one fused ``query_key_value`` projection packed **per head** as
  ``[.., nh, 3, hd]`` (q|k|v interleaved within each head — the third fused
  layout in the zoo after GPT-2's global q|k|v and NeoX's per-head slices);
* pre-LN blocks (``apply_residual_connection_post_layernorm`` supported for
  completeness — bloom-560m..176b all ship False), tanh-approximated GELU,
  4x MLP, tied lm_head, final ``ln_f``.

QUANT_SITES per the reference hook rule (leaf modules minus LayerNorm/GELU):
embeddings, fused QKV output, attention dense, both MLP linears, lm_head.
"""

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..quant.apply import NULL_ACT_QUANT, ActQuantizer
from .layers import (
    attention_core,
    cast_floats,
    decode_mask_bias,
    dense,
    gelu_new,
    initializer,
    layer_norm,
    update_kv_cache,
)

QUANT_SITES = (
    "embed",
    "attn_qkv",
    "attn_out",
    "mlp_fc",
    "mlp_out",
    "lm_head",
)


@dataclass(frozen=True)
class BloomConfig:
    vocab_size: int = 250880
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    layer_norm_epsilon: float = 1e-5
    apply_residual_connection_post_layernorm: bool = False
    # ALiBi has no hard positional cap; 2048 matches the reference harness
    # default context (huggingface.py:79 _DEFAULT_MAX_LENGTH)
    max_position_embeddings: int = 2048
    dtype: Any = jnp.bfloat16

    @classmethod
    def bloom_560m(cls, **kw):
        return cls(**kw)

    @classmethod
    def bloom_1b7(cls, **kw):
        base = dict(hidden_size=2048, num_hidden_layers=24,
                    num_attention_heads=16)
        base.update(kw)
        return cls(**base)

    @classmethod
    def bloom_7b1(cls, **kw):
        base = dict(hidden_size=4096, num_hidden_layers=30,
                    num_attention_heads=32)
        base.update(kw)
        return cls(**base)

    @classmethod
    def tiny(cls, **kw):
        base = dict(
            vocab_size=256, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, max_position_embeddings=128,
            dtype=jnp.float32,
        )
        base.update(kw)
        return cls(**base)

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads

    @property
    def intermediate_size(self):
        return 4 * self.hidden_size


def init_params(key, cfg: BloomConfig) -> Dict:
    keys = jax.random.split(key, 1 + cfg.num_hidden_layers)
    H, F = cfg.hidden_size, cfg.intermediate_size
    p = {
        "embed": initializer(keys[0], (cfg.vocab_size, H)),
        "embed_ln": {"g": jnp.ones((H,)), "b": jnp.zeros((H,))},
        "final_ln": {"g": jnp.ones((H,)), "b": jnp.zeros((H,))},
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        ks = jax.random.split(keys[1 + i], 4)
        p["layers"].append(
            {
                "ln_1": {"g": jnp.ones((H,)), "b": jnp.zeros((H,))},
                "ln_2": {"g": jnp.ones((H,)), "b": jnp.zeros((H,))},
                "qkv_w": initializer(ks[0], (H, 3 * H)),
                "qkv_b": jnp.zeros((3 * H,)),
                "dense_w": initializer(ks[1], (H, H)),
                "dense_b": jnp.zeros((H,)),
                "fc_w": initializer(ks[2], (H, F)),
                "fc_b": jnp.zeros((F,)),
                "proj_w": initializer(ks[3], (F, H)),
                "proj_b": jnp.zeros((H,)),
            }
        )
    if cfg.dtype != jnp.float32:
        p = cast_floats(p, cfg.dtype)
    return p


def alibi_slopes(num_heads: int) -> jnp.ndarray:
    """Per-head ALiBi slopes, HF ``build_alibi_tensor`` schedule: a geometric
    sequence from the closest power of two <= nh, interleaved odd steps of
    the doubled-base sequence for the remainder."""
    import math

    closest = 2 ** math.floor(math.log2(num_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(closest) - 3)))
    powers = base ** jnp.arange(1, closest + 1, dtype=jnp.float32)
    if closest != num_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * closest) - 3)))
        extra = extra_base ** jnp.arange(
            1, 2 * (num_heads - closest), 2, dtype=jnp.float32
        )
        powers = jnp.concatenate([powers, extra])
    return powers


def _alibi_bias(cfg: BloomConfig, kv_len: int) -> jnp.ndarray:
    """[1, nh, 1, S] additive score bias: slope_h * key_index."""
    slopes = alibi_slopes(cfg.num_attention_heads)
    pos = jnp.arange(kv_len, dtype=jnp.float32)
    return (slopes[:, None] * pos[None, :])[None, :, None, :]


def _attention(x, lp, cfg: BloomConfig, actq, bias, cache, cache_index):
    B, T, H = x.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim

    qkv = dense(x, lp["qkv_w"], lp["qkv_b"], actq, "attn_qkv")
    # per-head q|k|v interleave (HF BloomAttention._split_heads:
    # view [B, T, nh, 3, hd])
    qkv = qkv.reshape(B, T, nh, 3, hd)
    q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]

    q = q.transpose(0, 2, 1, 3)  # [B, nh, T, D]
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    new_cache = None
    if cache is not None:
        k, v, new_cache = update_kv_cache(cache, k, v, cache_index, x.dtype)

    out = attention_core(
        q, k, v, scale=1.0 / float(hd) ** 0.5, mask_bias=bias
    )
    out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(B, T, H)
    return dense(out, lp["dense_w"], lp["dense_b"], actq, "attn_out"), new_cache


def _mlp(x, lp, actq: ActQuantizer):
    h = dense(x, lp["fc_w"], lp["fc_b"], actq, "mlp_fc")
    h = gelu_new(h)  # HF BloomGelu = tanh-approximated GELU
    return dense(h, lp["proj_w"], lp["proj_b"], actq, "mlp_out")


def forward(
    params,
    cfg: BloomConfig,
    tokens: jnp.ndarray,
    actq: ActQuantizer = NULL_ACT_QUANT,
    cache: Optional[List] = None,
    cache_index: Optional[jnp.ndarray] = None,
    attn_mask: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
):
    """Token ids [B, T] -> logits [B, T, V] (or (logits, cache) in decode).

    ``positions`` is accepted for engine-interface uniformity but unused:
    ALiBi depends only on key indices, which the bias table encodes.
    """
    B, T = tokens.shape
    decode = cache is not None

    if decode:
        kv_len = cache[0][0].shape[2]
        mask_bias = decode_mask_bias(T, kv_len, cache_index, attn_mask)
    else:
        kv_len = T
        allowed = jnp.arange(T)[None, :] <= jnp.arange(T)[:, None]
        mask_bias = jnp.where(allowed, 0.0, jnp.finfo(jnp.float32).min)
        mask_bias = mask_bias[None, None]
        if attn_mask is not None:
            mask_bias = jnp.where(
                attn_mask[:, None, None, :].astype(bool),
                mask_bias,
                jnp.finfo(jnp.float32).min,
            )
    # mask bias [*, 1, T, S] + per-head ALiBi [1, nh, 1, S]
    bias = mask_bias + _alibi_bias(cfg, kv_len)

    x = actq("embed", params["embed"][tokens]).astype(cfg.dtype)
    x = layer_norm(x, params["embed_ln"]["g"], params["embed_ln"]["b"],
                   cfg.layer_norm_epsilon)

    new_cache = [] if decode else None
    for i, lp in enumerate(params["layers"]):
        h1 = layer_norm(x, lp["ln_1"]["g"], lp["ln_1"]["b"],
                        cfg.layer_norm_epsilon)
        res = h1 if cfg.apply_residual_connection_post_layernorm else x
        attn_out, layer_cache = _attention(
            h1, lp, cfg, actq, bias,
            cache[i] if decode else None,
            cache_index if decode else None,
        )
        x = res + attn_out
        h2 = layer_norm(x, lp["ln_2"]["g"], lp["ln_2"]["b"],
                        cfg.layer_norm_epsilon)
        res = h2 if cfg.apply_residual_connection_post_layernorm else x
        x = res + _mlp(h2, lp, actq)
        if decode:
            new_cache.append(layer_cache)

    x = layer_norm(x, params["final_ln"]["g"], params["final_ln"]["b"],
                   cfg.layer_norm_epsilon)
    # tied head (HF BloomForCausalLM ties lm_head to word_embeddings)
    logits = jnp.dot(x, params["embed"].T, preferred_element_type=jnp.float32)
    logits = actq("lm_head", logits)
    return (logits, new_cache) if decode else logits


def init_cache(cfg: BloomConfig, batch: int, max_len: int, kv_quant=False):
    if kv_quant == "fp8":
        from ..ops.kv_cache import init_fp8_cache

        return [
            (
                init_fp8_cache(batch, cfg.num_attention_heads, max_len, cfg.head_dim),
                init_fp8_cache(batch, cfg.num_attention_heads, max_len, cfg.head_dim),
            )
            for _ in range(cfg.num_hidden_layers)
        ]
    if kv_quant:
        from ..ops.kv_cache import init_quant_cache

        return [
            (
                init_quant_cache(batch, cfg.num_attention_heads, max_len, cfg.head_dim),
                init_quant_cache(batch, cfg.num_attention_heads, max_len, cfg.head_dim),
            )
            for _ in range(cfg.num_hidden_layers)
        ]
    shape = (batch, cfg.num_attention_heads, max_len, cfg.head_dim)
    return [
        (jnp.zeros(shape, cfg.dtype), jnp.zeros(shape, cfg.dtype))
        for _ in range(cfg.num_hidden_layers)
    ]
