"""GPT-NeoX / Pythia decoder (fused per-head QKV, partial rotary, parallel
residual).

Pythia-160m is one of the reference's regression-sweep models
(reference scripts/regression.py:21-26); the architecture follows HF
``modeling_gpt_neox``:

* one fused ``query_key_value`` projection whose output packs q|k|v **per
  head** (view ``[B, T, nh, 3*hd]``, slices of ``hd`` — unlike GPT-2's
  global q|k|v concatenation);
* rotary embedding on only the first ``rotary_pct * head_dim`` dims
  (0.25 for Pythia), rotate-half convention, remainder passed through;
* parallel residual (``use_parallel_residual``): ``x = x + attn(ln1(x)) +
  mlp(ln2(x))``; the sequential variant is kept for older NeoX checkpoints;
* untied ``embed_out`` head, exact (erf) GELU.

QUANT_SITES per the reference hook rule (leaf modules minus
LayerNorm/GELU, huggingface.py:672-676): embeddings, the fused QKV output,
attention dense, both MLP linears, lm_head, and the rotary tables (the
tuple-path hook on the rotary module's (cos, sin) output).
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
    "attn_qkv",
    "attn_out",
    "mlp_fc",
    "mlp_out",
    "rope",
    "lm_head",
)


@dataclass(frozen=True)
class NeoXConfig:
    vocab_size: int = 50304
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 2048
    rotary_pct: float = 0.25
    rotary_emb_base: float = 10000.0
    layer_norm_eps: float = 1e-5
    use_parallel_residual: bool = True
    dtype: Any = jnp.bfloat16

    @classmethod
    def pythia_160m(cls, **kw):
        return cls(**kw)

    @classmethod
    def pythia_410m(cls, **kw):
        base = dict(hidden_size=1024, num_hidden_layers=24,
                    num_attention_heads=16, intermediate_size=4096)
        base.update(kw)
        return cls(**base)

    @classmethod
    def tiny(cls, **kw):
        base = dict(
            vocab_size=256, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=128, dtype=jnp.float32,
        )
        base.update(kw)
        return cls(**base)

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads

    @property
    def rotary_ndims(self):
        return int(self.head_dim * self.rotary_pct)


def init_params(key, cfg: NeoXConfig) -> Dict:
    keys = jax.random.split(key, 2 + cfg.num_hidden_layers)
    H, F = cfg.hidden_size, cfg.intermediate_size
    p = {
        "embed_in": initializer(keys[0], (cfg.vocab_size, H)),
        "embed_out": initializer(keys[1], (H, cfg.vocab_size)),
        "final_ln": {"g": jnp.ones((H,)), "b": jnp.zeros((H,))},
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        ks = jax.random.split(keys[2 + i], 4)
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


def _rope_tables(cfg: NeoXConfig, positions, actq: ActQuantizer):
    """cos/sin over the rotary sub-dimension only: [B, T, rot/2] each."""
    half = cfg.rotary_ndims // 2
    freqs = 1.0 / (
        cfg.rotary_emb_base ** (jnp.arange(0, half, dtype=jnp.float32) / half)
    )
    angles = positions[..., None].astype(jnp.float32) * freqs
    return actq("rope", jnp.cos(angles)), actq("rope", jnp.sin(angles))


def _apply_partial_rope(x, cos, sin, rot: int):
    """Rotate the first ``rot`` dims of [B, T, nh, hd]; rest passes through."""
    xr, xp = x[..., :rot], x[..., rot:]
    half = rot // 2
    c = cos[:, :, None, :].astype(x.dtype)
    s = sin[:, :, None, :].astype(x.dtype)
    x1, x2 = xr[..., :half], xr[..., half:]
    rotated = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return jnp.concatenate([rotated, xp], axis=-1)


def _attention(x, lp, cfg: NeoXConfig, actq, mask_bias, cos, sin, cache,
               cache_index):
    B, T, H = x.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim

    qkv = dense(x, lp["qkv_w"], lp["qkv_b"], actq, "attn_qkv")
    # per-head packing (HF GPTNeoXAttention: view [B, T, nh, 3*hd], slice)
    qkv = qkv.reshape(B, T, nh, 3 * hd)
    q, k, v = qkv[..., :hd], qkv[..., hd:2 * hd], qkv[..., 2 * hd:]

    rot = cfg.rotary_ndims
    q = _apply_partial_rope(q, cos, sin, rot)
    k = _apply_partial_rope(k, cos, sin, rot)

    q = q.transpose(0, 2, 1, 3)  # [B, nh, T, D]
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
    return dense(out, lp["dense_w"], lp["dense_b"], actq, "attn_out"), new_cache


def _mlp(x, lp, actq: ActQuantizer):
    h = dense(x, lp["fc_w"], lp["fc_b"], actq, "mlp_fc")
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
    return dense(h, lp["proj_w"], lp["proj_b"], actq, "mlp_out")


def forward(
    params,
    cfg: NeoXConfig,
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

    x = actq("embed", params["embed_in"][tokens]).astype(cfg.dtype)

    new_cache = [] if decode else None
    for i, lp in enumerate(params["layers"]):
        h1 = layer_norm(x, lp["ln_1"]["g"], lp["ln_1"]["b"], cfg.layer_norm_eps)
        attn_out, layer_cache = _attention(
            h1, lp, cfg, actq, mask_bias, cos, sin,
            cache[i] if decode else None,
            cache_index if decode else None,
        )
        if cfg.use_parallel_residual:
            # x + attn(ln1(x)) + mlp(ln2(x))  — HF GPTNeoXLayer
            h2 = layer_norm(x, lp["ln_2"]["g"], lp["ln_2"]["b"],
                            cfg.layer_norm_eps)
            x = x + attn_out + _mlp(h2, lp, actq)
        else:
            x = x + attn_out
            h2 = layer_norm(x, lp["ln_2"]["g"], lp["ln_2"]["b"],
                            cfg.layer_norm_eps)
            x = x + _mlp(h2, lp, actq)
        if decode:
            new_cache.append(layer_cache)

    x = layer_norm(x, params["final_ln"]["g"], params["final_ln"]["b"],
                   cfg.layer_norm_eps)
    logits = jnp.dot(x, params["embed_out"], preferred_element_type=jnp.float32)
    logits = actq("lm_head", logits)
    return (logits, new_cache) if decode else logits


def init_cache(cfg: NeoXConfig, batch: int, max_len: int, kv_quant: bool = False):
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
