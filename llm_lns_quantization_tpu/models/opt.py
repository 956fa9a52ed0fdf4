"""OPT decoder (learned positions with +2 offset, pre-LN, ReLU MLP).

OPT-1.3B is BASELINE.json config #2. QUANT_SITES per the reference hook rule:
``nn.LayerNorm`` and ``nn.ReLU`` are both excluded, so sites are the
embeddings, the four attention projections, the two MLP linears, and lm_head
(mirrors GPT-2's site set with separate q/k/v projections).
"""

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..quant.apply import NULL_ACT_QUANT, ActQuantizer
from .layers import attention_core, cast_floats, dense, initializer, layer_norm
from .layers import decode_mask_bias, update_kv_cache

QUANT_SITES = (
    "embed",
    "embed_pos",
    "project_in",
    "project_out",
    "attn_q",
    "attn_k",
    "attn_v",
    "attn_out",
    "mlp_fc1",
    "mlp_fc2",
    "lm_head",
)

_POS_OFFSET = 2  # OPT's learned position table skips the first 2 rows


@dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    max_position_embeddings: int = 2048
    hidden_size: int = 2048
    ffn_dim: int = 8192
    num_hidden_layers: int = 24
    num_attention_heads: int = 32
    layer_norm_eps: float = 1e-5
    # OPT-350m quirks (HF modeling_opt): a narrower embedding dim with
    # project_in/project_out linears, and post-LN residual blocks with no
    # final decoder norm
    word_embed_proj_dim: Optional[int] = None
    do_layer_norm_before: bool = True
    dtype: Any = jnp.bfloat16

    @classmethod
    def opt_1_3b(cls, **kw):
        return cls(**kw)

    @classmethod
    def opt_125m(cls, **kw):
        base = dict(
            hidden_size=768, ffn_dim=3072, num_hidden_layers=12,
            num_attention_heads=12,
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def tiny(cls, **kw):
        base = dict(
            vocab_size=256, max_position_embeddings=128, hidden_size=64,
            ffn_dim=128, num_hidden_layers=2, num_attention_heads=4,
            dtype=jnp.float32,
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def opt_350m(cls, **kw):
        base = dict(
            hidden_size=1024, ffn_dim=4096, num_hidden_layers=24,
            num_attention_heads=16, word_embed_proj_dim=512,
            do_layer_norm_before=False,
        )
        base.update(kw)
        return cls(**base)

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads

    @property
    def proj_dim(self):
        return self.word_embed_proj_dim or self.hidden_size


def init_params(key, cfg: OPTConfig) -> Dict:
    keys = jax.random.split(key, 4 + cfg.num_hidden_layers)
    H, F, E = cfg.hidden_size, cfg.ffn_dim, cfg.proj_dim
    p = {
        "embed": initializer(keys[0], (cfg.vocab_size, E)),
        "embed_pos": initializer(
            keys[1], (cfg.max_position_embeddings + _POS_OFFSET, H), scale=0.01
        ),
        "layers": [],
    }
    if cfg.do_layer_norm_before:
        p["final_ln"] = {"g": jnp.ones((H,)), "b": jnp.zeros((H,))}
    if E != H:
        p["project_in"] = initializer(keys[2], (E, H))
        p["project_out"] = initializer(keys[3], (H, E))
    for i in range(cfg.num_hidden_layers):
        ks = jax.random.split(keys[2 + i], 6)
        p["layers"].append(
            {
                "self_attn_ln": {"g": jnp.ones((H,)), "b": jnp.zeros((H,))},
                "final_ln": {"g": jnp.ones((H,)), "b": jnp.zeros((H,))},
                "q_proj": {"w": initializer(ks[0], (H, H)), "b": jnp.zeros((H,))},
                "k_proj": {"w": initializer(ks[1], (H, H)), "b": jnp.zeros((H,))},
                "v_proj": {"w": initializer(ks[2], (H, H)), "b": jnp.zeros((H,))},
                "out_proj": {"w": initializer(ks[3], (H, H)), "b": jnp.zeros((H,))},
                "fc1": {"w": initializer(ks[4], (H, F)), "b": jnp.zeros((F,))},
                "fc2": {"w": initializer(ks[5], (F, H)), "b": jnp.zeros((H,))},
            }
        )
    if cfg.dtype != jnp.float32:
        p = cast_floats(p, cfg.dtype)
    return p


def _attention(x, lp, cfg: OPTConfig, actq, mask_bias, cache, cache_index):
    B, T, H = x.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim

    def heads(t):
        return t.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)

    q = heads(dense(x, lp["q_proj"]["w"], lp["q_proj"]["b"], actq, "attn_q"))
    k = heads(dense(x, lp["k_proj"]["w"], lp["k_proj"]["b"], actq, "attn_k"))
    v = heads(dense(x, lp["v_proj"]["w"], lp["v_proj"]["b"], actq, "attn_v"))

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
    return dense(out, lp["out_proj"]["w"], lp["out_proj"]["b"], actq, "attn_out"), new_cache


def forward(
    params,
    cfg: OPTConfig,
    tokens: jnp.ndarray,
    actq: ActQuantizer = NULL_ACT_QUANT,
    cache: Optional[List] = None,
    cache_index: Optional[jnp.ndarray] = None,
    attn_mask: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
):
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

    x = actq("embed", params["embed"][tokens])
    if "project_in" in params:
        x = actq(
            "project_in",
            jnp.dot(x, params["project_in"], preferred_element_type=jnp.float32),
        )
    x = x + actq("embed_pos", params["embed_pos"][positions + _POS_OFFSET])
    x = x.astype(cfg.dtype)

    new_cache = [] if decode else None
    pre_ln = cfg.do_layer_norm_before
    for i, lp in enumerate(params["layers"]):
        def ln1(t):
            return layer_norm(t, lp["self_attn_ln"]["g"], lp["self_attn_ln"]["b"], cfg.layer_norm_eps)

        def ln2(t):
            return layer_norm(t, lp["final_ln"]["g"], lp["final_ln"]["b"], cfg.layer_norm_eps)

        attn_out, layer_cache = _attention(
            ln1(x) if pre_ln else x, lp, cfg, actq, mask_bias,
            cache[i] if decode else None,
            cache_index if decode else None,
        )
        x = x + attn_out
        if not pre_ln:  # OPT-350m: post-LN residual blocks
            x = ln1(x)
        h = ln2(x) if pre_ln else x
        h = dense(h, lp["fc1"]["w"], lp["fc1"]["b"], actq, "mlp_fc1")
        h = jax.nn.relu(h)
        x = x + dense(h, lp["fc2"]["w"], lp["fc2"]["b"], actq, "mlp_fc2")
        if not pre_ln:
            x = ln2(x)
        if decode:
            new_cache.append(layer_cache)

    if "final_ln" in params:
        x = layer_norm(x, params["final_ln"]["g"], params["final_ln"]["b"], cfg.layer_norm_eps)
    if "project_out" in params:
        x = actq(
            "project_out",
            jnp.dot(x, params["project_out"], preferred_element_type=jnp.float32),
        ).astype(cfg.dtype)
    logits = jnp.dot(x, params["embed"].T, preferred_element_type=jnp.float32)
    logits = actq("lm_head", logits)
    return (logits, new_cache) if decode else logits


def init_cache(cfg: OPTConfig, batch: int, max_len: int, kv_quant: bool = False):
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
