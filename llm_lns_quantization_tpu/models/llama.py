"""Llama-family decoder (Llama-2/3 style: RMSNorm, RoPE, SwiGLU, GQA).

TPU-native replacement for the reference's HF ``LlamaForCausalLM`` + hook
stack — Llama-2 is the reference's primary experimental model (its QAT LoRA
adapter ``pouya-haghi/llama2_finetune_pile``, huggingface.py:274).

QUANT_SITES — translation of the reference's hook rule for this architecture.
Note three Llama-specific quirks of the reference's module walk
(huggingface.py:672-676) that we preserve:

* ``LlamaRMSNorm`` is NOT ``nn.LayerNorm``, so unlike GPT-2's norms it IS
  hooked → sites ``input_norm``, ``post_attn_norm``, ``final_norm``;
* ``SiLU`` is not in EXCLUDED_ACTIVATIONS (only ReLU/Tanh/GELU/Sigmoid/
  Softmax/LeakyReLU/PReLU are) → site ``mlp_act``;
* the rotary-embedding module returns a ``(cos, sin)`` tuple — this is what
  the reference's tuple-handling STE path exists for → site ``rope`` applied
  to cos/sin tables.

Remaining sites: ``embed``, ``attn_q/k/v/out``, ``mlp_gate/up/down``,
``lm_head``.
"""

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..quant.apply import NULL_ACT_QUANT, ActQuantizer
from .layers import attention_core, cast_floats, dense, initializer, rms_norm
from .layers import decode_mask_bias, update_kv_cache

QUANT_SITES = (
    "embed",
    "input_norm",
    "attn_q",
    "attn_k",
    "attn_v",
    "rope",
    "attn_out",
    "post_attn_norm",
    "mlp_gate",
    "mlp_up",
    "mlp_act",
    "mlp_down",
    "final_norm",
    "lm_head",
)


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    max_position_embeddings: int = 4096
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    rope_scaling: Optional[dict] = None  # HF-style: linear | dynamic | llama3
    tie_word_embeddings: bool = False
    dtype: Any = jnp.bfloat16

    @classmethod
    def llama2_7b(cls, **kw):  # BASELINE.json config #3
        return cls(**kw)

    @classmethod
    def llama2_13b(cls, **kw):  # BASELINE.json config #4
        base = dict(
            hidden_size=5120,
            intermediate_size=13824,
            num_hidden_layers=40,
            num_attention_heads=40,
            num_key_value_heads=40,
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def llama2_70b(cls, **kw):  # BASELINE.json config #5 (GQA)
        base = dict(
            hidden_size=8192,
            intermediate_size=28672,
            num_hidden_layers=80,
            num_attention_heads=64,
            num_key_value_heads=8,
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def tiny(cls, **kw):  # for tests
        base = dict(
            vocab_size=256,
            max_position_embeddings=128,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            dtype=jnp.float32,
        )
        base.update(kw)
        return cls(**base)

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads


def init_params(key, cfg: LlamaConfig) -> Dict:
    keys = jax.random.split(key, 2 + cfg.num_hidden_layers)
    H, I = cfg.hidden_size, cfg.intermediate_size
    kv_dim = cfg.num_key_value_heads * cfg.head_dim
    p = {
        "embed": initializer(keys[0], (cfg.vocab_size, H)),
        "final_norm": jnp.ones((H,)),
        "layers": [],
    }
    if not cfg.tie_word_embeddings:
        p["lm_head"] = initializer(keys[1], (H, cfg.vocab_size))
    for i in range(cfg.num_hidden_layers):
        ks = jax.random.split(keys[2 + i], 7)
        p["layers"].append(
            {
                "input_norm": jnp.ones((H,)),
                "post_attn_norm": jnp.ones((H,)),
                "q_proj": initializer(ks[0], (H, H)),
                "k_proj": initializer(ks[1], (H, kv_dim)),
                "v_proj": initializer(ks[2], (H, kv_dim)),
                "o_proj": initializer(ks[3], (H, H)),
                "gate_proj": initializer(ks[4], (H, I)),
                "up_proj": initializer(ks[5], (H, I)),
                "down_proj": initializer(ks[6], (I, H)),
            }
        )
    if cfg.dtype != jnp.float32:
        p = cast_floats(p, cfg.dtype)
    return p


def fuse_projections(params) -> Dict:
    """Serving-layout transform (``;fuse``): concatenate q/k/v -> ``qkv_proj``
    [H, H+2*kv_dim] and gate/up -> ``gateup_proj`` [H, 2I] per layer, BEFORE
    weight quantization/packing.

    Cuts the 7 matmul dispatches per block to 4 and reads the shared input
    activation once per fused group — the decode-regime fixed per-dispatch
    cost was the measured blocker for the packed 4-bit tiers (BASELINE.md
    round 2). Concatenation runs along N, so every packed format's grid
    (per-column scales, K-groups, K-blocks) is bitwise unchanged; with
    weight-only quant (enforced by QuantConfig.parse) the fused forward is
    numerically identical to the unfused one.
    """
    out = dict(params)
    layers = []
    for lp in params["layers"]:
        lp = dict(lp)
        lp["qkv_proj"] = jnp.concatenate(
            [lp.pop("q_proj"), lp.pop("k_proj"), lp.pop("v_proj")], axis=1
        )
        lp["gateup_proj"] = jnp.concatenate(
            [lp.pop("gate_proj"), lp.pop("up_proj")], axis=1
        )
        layers.append(lp)
    out["layers"] = layers
    return out


def _rope_freqs(cfg: LlamaConfig):
    """Inverse frequencies, with HF-compatible rope_scaling variants:

    * ``linear``  — positions divided by ``factor``;
    * ``dynamic`` — NTK-aware base rescaling, evaluated at the model's static
      max window (HF recomputes per-sequence-length; under jit the window is
      the static worst case, which matches HF exactly at full context and is
      conservative below it);
    * ``llama3``  — per-frequency piecewise interpolation
      (transformers modeling_rope_utils._compute_llama3_parameters).
    """
    import math

    half = cfg.head_dim // 2
    freqs = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, half, dtype=jnp.float32) / half)
    )
    rs = cfg.rope_scaling
    if not rs:
        return freqs
    typ = rs.get("rope_type", rs.get("type", "default"))
    factor = float(rs.get("factor", 1.0))
    if typ == "default":
        return freqs
    if typ == "linear":
        return freqs / factor
    if typ == "dynamic":
        orig = int(
            rs.get(
                "original_max_position_embeddings", cfg.max_position_embeddings
            )
        )
        seq_len = max(cfg.max_position_embeddings, orig)
        base = cfg.rope_theta * (
            factor * seq_len / orig - (factor - 1)
        ) ** (cfg.head_dim / (cfg.head_dim - 2))
        return 1.0 / (base ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    if typ == "llama3":
        low = float(rs.get("low_freq_factor", 1.0))
        high = float(rs.get("high_freq_factor", 4.0))
        orig = int(rs["original_max_position_embeddings"])
        wavelen = 2.0 * math.pi / freqs
        low_wl = orig / low
        high_wl = orig / high
        smooth = (orig / wavelen - low) / (high - low)
        mid = (1.0 - smooth) * freqs / factor + smooth * freqs
        return jnp.where(
            wavelen > low_wl, freqs / factor,
            jnp.where(wavelen < high_wl, freqs, mid),
        )
    raise ValueError(f"unknown rope_scaling type {typ!r}")


def _rope_tables(cfg: LlamaConfig, positions, actq: ActQuantizer):
    """cos/sin tables for the given positions: [B, T, D/2] each.

    The ``rope`` quant site quantizes these tables — exactly what the
    reference's tuple-path hook does to LlamaRotaryEmbedding's output.
    """
    freqs = _rope_freqs(cfg)
    angles = positions[..., None].astype(jnp.float32) * freqs
    cos = actq("rope", jnp.cos(angles))
    sin = actq("rope", jnp.sin(angles))
    return cos, sin


def _apply_rope(x, cos, sin):
    """Rotate [B, T, H, D] with HF's rotate_half convention."""
    half = x.shape[-1] // 2
    c = cos[:, :, None, :].astype(x.dtype)
    s = sin[:, :, None, :].astype(x.dtype)
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def _attention(x, lp, cfg: LlamaConfig, actq, mask_bias, cos, sin, cache, cache_index):
    B, T, H = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    if "qkv_proj" in lp:
        # fused serving layout (fuse_projections): one matmul, split after.
        # actq is the identity here — QuantConfig.parse rejects fuse with
        # activation quant, so the attn_q/k/v sites lose nothing.
        qdim, kvdim = nh * hd, nkv * hd
        qkv = dense(x, lp["qkv_proj"], None, actq, "attn_q")
        q = qkv[..., :qdim].reshape(B, T, nh, hd)
        k = qkv[..., qdim:qdim + kvdim].reshape(B, T, nkv, hd)
        v = qkv[..., qdim + kvdim:].reshape(B, T, nkv, hd)
    else:
        q = dense(x, lp["q_proj"], None, actq, "attn_q").reshape(B, T, nh, hd)
        k = dense(x, lp["k_proj"], None, actq, "attn_k").reshape(B, T, nkv, hd)
        v = dense(x, lp["v_proj"], None, actq, "attn_v").reshape(B, T, nkv, hd)

    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)

    q = q.transpose(0, 2, 1, 3)  # [B, nh, T, D]
    k = k.transpose(0, 2, 1, 3)  # [B, nkv, T, D]
    v = v.transpose(0, 2, 1, 3)

    new_cache = None
    if cache is not None:
        k, v, new_cache = update_kv_cache(cache, k, v, cache_index, x.dtype)

    # GQA: repeat kv heads to match query heads
    if nkv != nh:
        rep = nh // nkv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)

    out = attention_core(
        q, k, v,
        scale=1.0 / float(hd) ** 0.5,
        mask_bias=mask_bias,
        is_causal=mask_bias is None,
    )
    out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(B, T, H)
    return dense(out, lp["o_proj"], None, actq, "attn_out"), new_cache


def forward(
    params,
    cfg: LlamaConfig,
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

    x = actq("embed", params["embed"][tokens]).astype(cfg.dtype)

    new_cache = [] if decode else None
    for i, lp in enumerate(params["layers"]):
        h = actq("input_norm", rms_norm(x, lp["input_norm"], cfg.rms_norm_eps))
        attn_out, layer_cache = _attention(
            h, lp, cfg, actq, mask_bias, cos, sin,
            cache[i] if decode else None,
            cache_index if decode else None,
        )
        x = x + attn_out
        h = actq("post_attn_norm", rms_norm(x, lp["post_attn_norm"], cfg.rms_norm_eps))
        if "gateup_proj" in lp:
            gu = dense(h, lp["gateup_proj"], None, actq, "mlp_gate")
            gate, up = gu[..., :cfg.intermediate_size], gu[..., cfg.intermediate_size:]
        else:
            gate = dense(h, lp["gate_proj"], None, actq, "mlp_gate")
            up = dense(h, lp["up_proj"], None, actq, "mlp_up")
        act = actq("mlp_act", jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype))
        x = x + dense(act * up, lp["down_proj"], None, actq, "mlp_down")
        if decode:
            new_cache.append(layer_cache)

    x = actq("final_norm", rms_norm(x, params["final_norm"], cfg.rms_norm_eps))
    head = params["embed"].T if cfg.tie_word_embeddings else params["lm_head"]
    logits = jnp.dot(x, head, preferred_element_type=jnp.float32)
    logits = actq("lm_head", logits)
    return (logits, new_cache) if decode else logits


def init_cache(cfg: LlamaConfig, batch: int, max_len: int, kv_quant: bool = False):
    if kv_quant == "fp8":
        from ..ops.kv_cache import init_fp8_cache

        return [
            (
                init_fp8_cache(batch, cfg.num_key_value_heads, max_len, cfg.head_dim),
                init_fp8_cache(batch, cfg.num_key_value_heads, max_len, cfg.head_dim),
            )
            for _ in range(cfg.num_hidden_layers)
        ]
    if kv_quant:
        from ..ops.kv_cache import init_quant_cache

        return [
            (
                init_quant_cache(batch, cfg.num_key_value_heads, max_len, cfg.head_dim),
                init_quant_cache(batch, cfg.num_key_value_heads, max_len, cfg.head_dim),
            )
            for _ in range(cfg.num_hidden_layers)
        ]
    shape = (batch, cfg.num_key_value_heads, max_len, cfg.head_dim)
    return [
        (jnp.zeros(shape, cfg.dtype), jnp.zeros(shape, cfg.dtype))
        for _ in range(cfg.num_hidden_layers)
    ]
