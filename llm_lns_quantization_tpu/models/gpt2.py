"""GPT-2 in pure-function JAX with explicit quantization sites.

Replaces the reference's HF ``GPT2LMHeadModel`` + forward-hook combination
(reference lm_eval/models/gpt2.py and the hook walk in
lm_eval/models/huggingface.py:672-676). Weight layout matches HF GPT-2
checkpoints (Conv1D convention: weights stored [in, out]) so HF safetensors
load directly (see models/hf_loader.py).

QUANT_SITES — the explicit translation of the reference's hook targeting rule
("every leaf module except containers, LayerNorm, Dropout and pure
activations") for the GPT-2 architecture:

  wte, wpe                 (nn.Embedding leaves)
  h.<i>.attn_qkv           (Conv1D c_attn output)
  h.<i>.attn_out           (Conv1D c_proj output)
  h.<i>.mlp_fc             (Conv1D c_fc output)
  h.<i>.mlp_out            (Conv1D mlp c_proj output)
  lm_head                  (tied-weight Linear output)

LayerNorms are skipped (excluded by isinstance in the reference) and the GELU
is skipped (nn.GELU is in EXCLUDED_ACTIVATIONS).
"""

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..quant.apply import NULL_ACT_QUANT, ActQuantizer
from .layers import (
    attention_core,
    causal_mask_bias,
    decode_mask_bias,
    dense,
    gelu_new,
    initializer,
    layer_norm,
    update_kv_cache,
)

QUANT_SITES = ("wte", "wpe", "attn_qkv", "attn_out", "mlp_fc", "mlp_out", "lm_head")


@dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @classmethod
    def small(cls, **kw):  # 124M — BASELINE.json config #1
        return cls(**kw)

    @classmethod
    def medium(cls, **kw):  # 355M
        base = dict(n_embd=1024, n_layer=24, n_head=16)
        base.update(kw)
        return cls(**base)

    @classmethod
    def xl(cls, **kw):  # 1.5B — serving-regime benchmark preset
        base = dict(n_embd=1600, n_layer=48, n_head=25)
        base.update(kw)
        return cls(**base)

    @classmethod
    def tiny(cls, **kw):  # for tests
        base = dict(vocab_size=256, n_positions=128, n_embd=64, n_layer=2, n_head=4)
        base.update(kw)
        return cls(**base)

    @property
    def head_dim(self):
        return self.n_embd // self.n_head


def init_params(key, cfg: GPT2Config) -> Dict:
    keys = jax.random.split(key, 4 + cfg.n_layer)
    p = {
        "wte": initializer(keys[0], (cfg.vocab_size, cfg.n_embd)),
        "wpe": initializer(keys[1], (cfg.n_positions, cfg.n_embd), scale=0.01),
        "ln_f": {"g": jnp.ones((cfg.n_embd,)), "b": jnp.zeros((cfg.n_embd,))},
        "h": [],
    }
    for i in range(cfg.n_layer):
        k1, k2, k3, k4 = jax.random.split(keys[4 + i], 4)
        p["h"].append(
            {
                "ln_1": {"g": jnp.ones((cfg.n_embd,)), "b": jnp.zeros((cfg.n_embd,))},
                "ln_2": {"g": jnp.ones((cfg.n_embd,)), "b": jnp.zeros((cfg.n_embd,))},
                "attn": {
                    "c_attn_w": initializer(k1, (cfg.n_embd, 3 * cfg.n_embd)),
                    "c_attn_b": jnp.zeros((3 * cfg.n_embd,)),
                    "c_proj_w": initializer(k2, (cfg.n_embd, cfg.n_embd)),
                    "c_proj_b": jnp.zeros((cfg.n_embd,)),
                },
                "mlp": {
                    "c_fc_w": initializer(k3, (cfg.n_embd, 4 * cfg.n_embd)),
                    "c_fc_b": jnp.zeros((4 * cfg.n_embd,)),
                    "c_proj_w": initializer(k4, (4 * cfg.n_embd, cfg.n_embd)),
                    "c_proj_b": jnp.zeros((cfg.n_embd,)),
                },
            }
        )
    if cfg.dtype != jnp.float32:
        from .layers import cast_floats

        p = cast_floats(p, cfg.dtype)
    return p


def _attention(
    x,
    block,
    cfg: GPT2Config,
    actq: ActQuantizer,
    mask_bias,
    cache: Optional[Tuple] = None,
    cache_index: Optional[jnp.ndarray] = None,
):
    B, T, C = x.shape
    qkv = dense(x, block["c_attn_w"], block["c_attn_b"], actq, "attn_qkv")
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, -1, cfg.n_head, cfg.head_dim).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)

    new_cache = None
    if cache is not None:
        k, v, new_cache = update_kv_cache(cache, k, v, cache_index, x.dtype)

    out = attention_core(
        q, k, v,
        scale=1.0 / float(cfg.head_dim) ** 0.5,
        mask_bias=mask_bias,
        is_causal=mask_bias is None,
    )
    out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(B, T, C)
    out = dense(out, block["c_proj_w"], block["c_proj_b"], actq, "attn_out")
    return out, new_cache


def _mlp(x, block, actq: ActQuantizer):
    h = dense(x, block["c_fc_w"], block["c_fc_b"], actq, "mlp_fc")
    h = gelu_new(h)
    return dense(h, block["c_proj_w"], block["c_proj_b"], actq, "mlp_out")


def forward(
    params,
    cfg: GPT2Config,
    tokens: jnp.ndarray,
    actq: ActQuantizer = NULL_ACT_QUANT,
    cache: Optional[List] = None,
    cache_index: Optional[jnp.ndarray] = None,
    attn_mask: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
):
    """Token ids [B, T] -> logits [B, T, V].

    With ``cache`` (list of per-layer (k, v) arrays) and ``cache_index``, runs
    in decode mode: positions offset by cache_index, keys/values written into
    the cache at that index, attention over the full cache. Returns
    (logits, new_cache). ``attn_mask`` [B, kv_len] zeroes out (left-)padding
    key positions; ``positions`` [B, T] overrides position ids (used with
    left-padded generation prompts).
    """
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
            mask_bias = causal_mask_bias(T, T)
            mask_bias = jnp.where(
                attn_mask[:, None, None, :].astype(bool),
                mask_bias[None, None],
                jnp.finfo(jnp.float32).min,
            )

    x = actq("wte", params["wte"][tokens]) + actq("wpe", params["wpe"][positions])
    x = x.astype(cfg.dtype)

    new_cache = [] if decode else None
    for i, block in enumerate(params["h"]):
        h = layer_norm(x, block["ln_1"]["g"], block["ln_1"]["b"], cfg.layer_norm_epsilon)
        attn_out, layer_cache = _attention(
            h,
            block["attn"],
            cfg,
            actq,
            mask_bias,
            cache=cache[i] if decode else None,
            cache_index=cache_index if decode else None,
        )
        x = x + attn_out
        h = layer_norm(x, block["ln_2"]["g"], block["ln_2"]["b"], cfg.layer_norm_epsilon)
        x = x + _mlp(h, block["mlp"], actq)
        if decode:
            new_cache.append(layer_cache)

    x = layer_norm(x, params["ln_f"]["g"], params["ln_f"]["b"], cfg.layer_norm_epsilon)
    logits = jnp.dot(x, params["wte"].T, preferred_element_type=jnp.float32)
    logits = actq("lm_head", logits)
    return (logits, new_cache) if decode else logits


def init_cache(cfg: GPT2Config, batch: int, max_len: int, kv_quant: bool = False):
    """Pre-allocated decode cache: per-layer (k, v) of [B, H, S, D]."""
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
