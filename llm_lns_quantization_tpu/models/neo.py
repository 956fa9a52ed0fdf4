"""GPT-Neo decoder (alternating global/local attention, unscaled scores).

GPT-Neo (EleutherAI gpt-neo-125m/1.3B/2.7B) is part of the reference's own
regression matrix (reference scripts/regression.py:21-26 sweeps
EleutherAI/gpt-neo-125m) and loads through the same HF-causal adapter
(reference lm_eval/models/huggingface.py). The architecture follows HF
``modeling_gpt_neo``:

* GPT-2-style blocks (ln_1 -> attn -> residual; ln_2 -> mlp -> residual),
  learned absolute positions (wte + wpe), tied lm_head;
* separate bias-free q/k/v projections, biased out_proj (unlike GPT-2's
  fused biased Conv1D);
* **no 1/sqrt(head_dim) attention scaling** (GPT-Neo trains without it);
* attention type alternates per layer between ``global`` (pure causal) and
  ``local`` — a causal sliding window: position t attends to
  (t - window_size, t] with window_size = 256.

QUANT_SITES per the reference hook rule (every leaf module except
LayerNorm/Dropout/activations, huggingface.py:672-676):

  wte, wpe                  (nn.Embedding leaves)
  h.<i>.attn_q/attn_k/attn_v  (bias-free Linear leaves)
  h.<i>.attn_out            (out_proj)
  h.<i>.mlp_fc, mlp_out     (c_fc, c_proj)
  lm_head                   (tied-weight Linear output)
"""

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..quant.apply import NULL_ACT_QUANT, ActQuantizer
from .layers import (
    attention_core,
    cast_floats,
    causal_mask_bias,
    decode_mask_bias,
    dense,
    gelu_new,
    initializer,
    layer_norm,
    update_kv_cache,
)

QUANT_SITES = (
    "wte",
    "wpe",
    "attn_q",
    "attn_k",
    "attn_v",
    "attn_out",
    "mlp_fc",
    "mlp_out",
    "lm_head",
)


@dataclass(frozen=True)
class NeoConfig:
    vocab_size: int = 50257
    n_positions: int = 2048
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    intermediate_size: Optional[int] = None  # default 4 * n_embd
    window_size: int = 256
    # period of the attention-type cycle: layer i is local iff
    # i % attention_period == attention_period - 1 (HF default
    # attention_types [[["global","local"],n/2]] == period 2)
    attention_layers: Tuple[str, ...] = ()
    layer_norm_epsilon: float = 1e-5
    dtype: Any = jnp.float32

    def __post_init__(self):
        if not self.attention_layers:
            object.__setattr__(
                self,
                "attention_layers",
                tuple(
                    "global" if i % 2 == 0 else "local"
                    for i in range(self.n_layer)
                ),
            )
        assert len(self.attention_layers) == self.n_layer

    @classmethod
    def neo_125m(cls, **kw):
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw):
        base = dict(
            vocab_size=256, n_positions=128, n_embd=64, n_layer=2, n_head=4,
            window_size=8,
        )
        base.update(kw)
        return cls(**base)

    @property
    def head_dim(self):
        return self.n_embd // self.n_head

    @property
    def inner_dim(self):
        return self.intermediate_size or 4 * self.n_embd


def init_params(key, cfg: NeoConfig) -> Dict:
    keys = jax.random.split(key, 2 + cfg.n_layer)
    H, F = cfg.n_embd, cfg.inner_dim
    p = {
        "wte": initializer(keys[0], (cfg.vocab_size, H)),
        "wpe": initializer(keys[1], (cfg.n_positions, H), scale=0.01),
        "ln_f": {"g": jnp.ones((H,)), "b": jnp.zeros((H,))},
        "h": [],
    }
    for i in range(cfg.n_layer):
        ks = jax.random.split(keys[2 + i], 6)
        p["h"].append(
            {
                "ln_1": {"g": jnp.ones((H,)), "b": jnp.zeros((H,))},
                "ln_2": {"g": jnp.ones((H,)), "b": jnp.zeros((H,))},
                "q_proj": initializer(ks[0], (H, H)),
                "k_proj": initializer(ks[1], (H, H)),
                "v_proj": initializer(ks[2], (H, H)),
                "out_proj": {
                    "w": initializer(ks[3], (H, H)),
                    "b": jnp.zeros((H,)),
                },
                "c_fc": {"w": initializer(ks[4], (H, F)), "b": jnp.zeros((F,))},
                "c_proj": {"w": initializer(ks[5], (F, H)), "b": jnp.zeros((H,))},
            }
        )
    if cfg.dtype != jnp.float32:
        p = cast_floats(p, cfg.dtype)
    return p


def _local_window_bias(mask_bias_or_none, T, window: int):
    """Causal sliding-window bias for scoring: k in (q - window, q]."""
    q_pos = jnp.arange(T)[:, None]
    kv_pos = jnp.arange(T)[None, :]
    allowed = (kv_pos <= q_pos) & (kv_pos > q_pos - window)
    bias = jnp.where(allowed, 0.0, jnp.finfo(jnp.float32).min)
    if mask_bias_or_none is not None:  # combine with a padding mask
        return jnp.minimum(mask_bias_or_none, bias)
    return bias


def _local_decode_bias(mask_bias, T, kv_len, cache_index, window: int):
    """Decode-mode sliding window over cache positions: the global decode
    bias already enforces k <= q; intersect with k > q - window."""
    kv_pos = jnp.arange(kv_len)
    q_pos = jnp.arange(T)
    idx = jnp.asarray(cache_index)
    if idx.ndim:
        q_abs = q_pos[None, :, None] + idx[:, None, None]  # [B, T, 1]
        near = kv_pos[None, None, :] > q_abs - window
        near = near[:, None, :, :]
    else:
        near = (kv_pos[None, :] > (q_pos[:, None] + idx - window))[None, None]
    return jnp.minimum(
        mask_bias, jnp.where(near, 0.0, jnp.finfo(jnp.float32).min)
    )


def _attention(x, lp, cfg: NeoConfig, actq, mask_bias, cache, cache_index):
    B, T, H = x.shape
    nh, hd = cfg.n_head, cfg.head_dim

    q = dense(x, lp["q_proj"], None, actq, "attn_q").reshape(B, T, nh, hd)
    k = dense(x, lp["k_proj"], None, actq, "attn_k").reshape(B, T, nh, hd)
    v = dense(x, lp["v_proj"], None, actq, "attn_v").reshape(B, T, nh, hd)
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    new_cache = None
    if cache is not None:
        k, v, new_cache = update_kv_cache(cache, k, v, cache_index, x.dtype)

    # GPT-Neo does NOT scale attention scores (HF GPTNeoSelfAttention)
    out = attention_core(
        q, k, v, scale=1.0, mask_bias=mask_bias, is_causal=mask_bias is None
    )
    out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(B, T, H)
    out = dense(out, lp["out_proj"]["w"], lp["out_proj"]["b"], actq, "attn_out")
    return out, new_cache


def forward(
    params,
    cfg: NeoConfig,
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
        global_bias = decode_mask_bias(T, kv_len, cache_index, attn_mask)
        local_bias = _local_decode_bias(
            global_bias, T, kv_len, cache_index, cfg.window_size
        )
    else:
        if positions is None:
            positions = jnp.arange(T)[None, :]
        global_bias = None  # pure causal -> flash path on TPU
        if attn_mask is not None:
            global_bias = jnp.where(
                attn_mask[:, None, None, :].astype(bool),
                causal_mask_bias(T, T)[None, None],
                jnp.finfo(jnp.float32).min,
            )
        local_bias = _local_window_bias(global_bias, T, cfg.window_size)

    x = actq("wte", params["wte"][tokens]) + actq("wpe", params["wpe"][positions])
    x = x.astype(cfg.dtype)

    new_cache = [] if decode else None
    for i, lp in enumerate(params["h"]):
        mask_bias = (
            local_bias if cfg.attention_layers[i] == "local" else global_bias
        )
        h = layer_norm(x, lp["ln_1"]["g"], lp["ln_1"]["b"],
                       cfg.layer_norm_epsilon)
        attn_out, layer_cache = _attention(
            h, lp, cfg, actq, mask_bias,
            cache[i] if decode else None,
            cache_index if decode else None,
        )
        x = x + attn_out
        h = layer_norm(x, lp["ln_2"]["g"], lp["ln_2"]["b"],
                       cfg.layer_norm_epsilon)
        m = dense(h, lp["c_fc"]["w"], lp["c_fc"]["b"], actq, "mlp_fc")
        m = gelu_new(m)
        m = dense(m, lp["c_proj"]["w"], lp["c_proj"]["b"], actq, "mlp_out")
        x = x + m
        if decode:
            new_cache.append(layer_cache)

    x = layer_norm(x, params["ln_f"]["g"], params["ln_f"]["b"],
                   cfg.layer_norm_epsilon)
    logits = jnp.dot(x, params["wte"].T, preferred_element_type=jnp.float32)
    logits = actq("lm_head", logits)
    return (logits, new_cache) if decode else logits


def init_cache(cfg: NeoConfig, batch: int, max_len: int, kv_quant: bool = False):
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
