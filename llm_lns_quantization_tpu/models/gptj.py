"""GPT-J decoder (parallel residual off one shared LayerNorm, interleaved
rotary on a leading sub-dimension, biased lm_head).

GPT-J is one of the reference's result models (its ``lm_eval/models/gptj.csv``
artifact, SURVEY.md §2.3); the architecture follows HF ``modeling_gptj``:

* one ``ln_1`` per block whose output feeds BOTH attention and MLP, summed
  into the residual together: ``x = x + attn(ln1(x)) + mlp(ln1(x))``;
* separate bias-free q/k/v/out projections;
* rotary on the first ``rotary_dim`` dims with the **interleaved**
  (rotate-every-two) convention — even/odd pairs, not NeoX's half-split;
* tanh-approximated GELU (same ``gelu_new`` as GPT-2), and an ``lm_head``
  with a bias (unlike most decoder families).

QUANT_SITES per the reference hook rule (leaf modules minus LayerNorm and
activations, huggingface.py:672-676).
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
    "attn_q",
    "attn_k",
    "attn_v",
    "attn_out",
    "mlp_fc",
    "mlp_out",
    "rope",
    "lm_head",
)


@dataclass(frozen=True)
class GPTJConfig:
    vocab_size: int = 50400
    n_embd: int = 4096
    n_layer: int = 28
    n_head: int = 16
    n_inner: Optional[int] = None  # default 4 * n_embd
    rotary_dim: int = 64
    n_positions: int = 2048
    layer_norm_epsilon: float = 1e-5
    dtype: Any = jnp.bfloat16

    @classmethod
    def gptj_6b(cls, **kw):
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw):
        base = dict(
            vocab_size=256, n_embd=64, n_layer=2, n_head=4, rotary_dim=8,
            n_positions=128, dtype=jnp.float32,
        )
        base.update(kw)
        return cls(**base)

    @property
    def head_dim(self):
        return self.n_embd // self.n_head

    @property
    def inner_dim(self):
        return self.n_inner or 4 * self.n_embd


def init_params(key, cfg: GPTJConfig) -> Dict:
    keys = jax.random.split(key, 2 + cfg.n_layer)
    H, F = cfg.n_embd, cfg.inner_dim
    p = {
        "wte": initializer(keys[0], (cfg.vocab_size, H)),
        "lm_head": {
            "w": initializer(keys[1], (H, cfg.vocab_size)),
            "b": jnp.zeros((cfg.vocab_size,)),
        },
        "ln_f": {"g": jnp.ones((H,)), "b": jnp.zeros((H,))},
        "h": [],
    }
    for i in range(cfg.n_layer):
        ks = jax.random.split(keys[2 + i], 6)
        p["h"].append(
            {
                "ln_1": {"g": jnp.ones((H,)), "b": jnp.zeros((H,))},
                "q_proj": initializer(ks[0], (H, H)),
                "k_proj": initializer(ks[1], (H, H)),
                "v_proj": initializer(ks[2], (H, H)),
                "out_proj": initializer(ks[3], (H, H)),
                "fc_in": {"w": initializer(ks[4], (H, F)), "b": jnp.zeros((F,))},
                "fc_out": {"w": initializer(ks[5], (F, H)), "b": jnp.zeros((H,))},
            }
        )
    if cfg.dtype != jnp.float32:
        p = cast_floats(p, cfg.dtype)
    return p


def _rope_tables(cfg: GPTJConfig, positions, actq: ActQuantizer):
    """cos/sin over the rotary sub-dimension: [B, T, rotary_dim/2] each."""
    half = cfg.rotary_dim // 2
    freqs = 1.0 / (10000.0 ** (jnp.arange(0, half, dtype=jnp.float32) * 2 / cfg.rotary_dim))
    angles = positions[..., None].astype(jnp.float32) * freqs
    return actq("rope", jnp.cos(angles)), actq("rope", jnp.sin(angles))


def _apply_interleaved_rope(x, cos, sin, rot: int):
    """Rotate-every-two on the first ``rot`` dims of [B, T, nh, hd].

    HF GPT-J pairs adjacent dims (x[..., ::2], x[..., 1::2]) and interleaves
    the rotated results back — the duplicate_interleave convention.
    """
    xr, xp = x[..., :rot], x[..., rot:]
    x1 = xr[..., 0::2]
    x2 = xr[..., 1::2]
    c = cos[:, :, None, :].astype(x.dtype)
    s = sin[:, :, None, :].astype(x.dtype)
    r1 = x1 * c - x2 * s
    r2 = x2 * c + x1 * s
    rotated = jnp.stack([r1, r2], axis=-1).reshape(xr.shape)
    return jnp.concatenate([rotated, xp], axis=-1)


def _attention(x, lp, cfg: GPTJConfig, actq, mask_bias, cos, sin, cache,
               cache_index):
    B, T, H = x.shape
    nh, hd = cfg.n_head, cfg.head_dim

    q = dense(x, lp["q_proj"], None, actq, "attn_q").reshape(B, T, nh, hd)
    k = dense(x, lp["k_proj"], None, actq, "attn_k").reshape(B, T, nh, hd)
    v = dense(x, lp["v_proj"], None, actq, "attn_v").reshape(B, T, nh, hd)

    rot = cfg.rotary_dim
    q = _apply_interleaved_rope(q, cos, sin, rot)
    k = _apply_interleaved_rope(k, cos, sin, rot)

    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    new_cache = None
    if cache is not None:
        k, v, new_cache = update_kv_cache(cache, k, v, cache_index, x.dtype)

    out = attention_core(
        q, k, v,
        scale=1.0 / float(hd) ** 0.5,
        mask_bias=mask_bias,
        is_causal=mask_bias is None,
    )
    out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(B, T, H)
    return dense(out, lp["out_proj"], None, actq, "attn_out"), new_cache


def forward(
    params,
    cfg: GPTJConfig,
    tokens: jnp.ndarray,
    actq: ActQuantizer = NULL_ACT_QUANT,
    cache: Optional[List] = None,
    cache_index: Optional[jnp.ndarray] = None,
    attn_mask: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
):
    """Token ids [B, T] -> logits [B, T, V] (or (logits, cache) in decode)."""
    B, T = tokens.shape
    decode = cache is not None

    if decode:
        if positions is None:
            idx = jnp.asarray(cache_index)
            positions = jnp.arange(T)[None, :] + (
                idx[:, None] if idx.ndim else idx
            )
        kv_len = cache[0][0].shape[2]
        mask_bias = decode_mask_bias(T, kv_len, cache_index, attn_mask)
    else:
        if positions is None:
            positions = jnp.arange(T)[None, :]
        # None = pure causal: attention_core builds the mask (or takes the
        # fused flash path on TPU, the harness's scoring hot path)
        mask_bias = None
        if attn_mask is not None:
            allowed = jnp.arange(T)[None, :] <= jnp.arange(T)[:, None]
            mask_bias = jnp.where(allowed, 0.0, jnp.finfo(jnp.float32).min)
            mask_bias = jnp.where(
                attn_mask[:, None, None, :].astype(bool),
                mask_bias[None, None],
                jnp.finfo(jnp.float32).min,
            )

    positions = jnp.broadcast_to(positions, (B, T))
    cos, sin = _rope_tables(cfg, positions, actq)

    x = actq("embed", params["wte"][tokens]).astype(cfg.dtype)

    new_cache = [] if decode else None
    for i, lp in enumerate(params["h"]):
        # one LN output feeds attention AND the MLP (HF GPTJBlock)
        h = layer_norm(x, lp["ln_1"]["g"], lp["ln_1"]["b"],
                       cfg.layer_norm_epsilon)
        attn_out, layer_cache = _attention(
            h, lp, cfg, actq, mask_bias, cos, sin,
            cache[i] if decode else None,
            cache_index if decode else None,
        )
        m = dense(h, lp["fc_in"]["w"], lp["fc_in"]["b"], actq, "mlp_fc")
        m = gelu_new(m)
        m = dense(m, lp["fc_out"]["w"], lp["fc_out"]["b"], actq, "mlp_out")
        x = x + attn_out + m
        if decode:
            new_cache.append(layer_cache)

    x = layer_norm(x, params["ln_f"]["g"], params["ln_f"]["b"],
                   cfg.layer_norm_epsilon)
    logits = jnp.dot(x, params["lm_head"]["w"],
                     preferred_element_type=jnp.float32)
    logits = logits + params["lm_head"]["b"]
    logits = actq("lm_head", logits)
    return (logits, new_cache) if decode else logits


def init_cache(cfg: GPTJConfig, batch: int, max_len: int, kv_quant: bool = False):
    if kv_quant == "fp8":
        from ..ops.kv_cache import init_fp8_cache

        return [
            (
                init_fp8_cache(batch, cfg.n_head, max_len, cfg.head_dim),
                init_fp8_cache(batch, cfg.n_head, max_len, cfg.head_dim),
            )
            for _ in range(cfg.n_layer)
        ]
    if kv_quant:
        from ..ops.kv_cache import init_quant_cache

        return [
            (
                init_quant_cache(batch, cfg.n_head, max_len, cfg.head_dim),
                init_quant_cache(batch, cfg.n_head, max_len, cfg.head_dim),
            )
            for _ in range(cfg.n_layer)
        ]
    shape = (batch, cfg.n_head, max_len, cfg.head_dim)
    return [
        (jnp.zeros(shape, cfg.dtype), jnp.zeros(shape, cfg.dtype))
        for _ in range(cfg.n_layer)
    ]
