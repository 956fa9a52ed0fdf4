"""T5-family encoder-decoder (T5 v1.0 ReLU / v1.1 gated-GELU, relative
position biases, T5LayerNorm).

TPU-native replacement for the reference's ``hf-seq2seq`` path
(``AutoSeq2SeqLM``, huggingface.py:2131-2291): encoder consumes the context,
decoder scores/generates the continuation.

QUANT_SITES — translation of the reference's hook rule (huggingface.py:
672-676: hook every leaf module except containers, ``nn.LayerNorm``,
Dropout, and EXCLUDED_ACTIVATIONS) onto this architecture, with the same
class-identity quirks the torch walk exhibits:

* ``T5LayerNorm`` is a custom class, NOT ``nn.LayerNorm`` → all norms ARE
  hooked (sites ``ln1/ln2/ln3/final_norm``), same as Llama's RMSNorm;
* v1.0's activation is ``nn.ReLU`` → excluded, NOT hooked; v1.1's is HF's
  custom ``NewGELUActivation`` → not in EXCLUDED_ACTIVATIONS, hooked →
  site ``mlp_act`` fires only for gated-gelu configs;
* ``relative_attention_bias`` is an ``nn.Embedding`` leaf → hooked →
  site ``rel_bias``;
* every Linear (q/k/v/o, cross q/k/v/o, wi/wi_0/wi_1/wo, lm_head) and the
  shared embedding are hooked.
"""

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..quant.apply import NULL_ACT_QUANT, ActQuantizer
from .layers import cast_floats, dense, initializer, rms_norm

QUANT_SITES = (
    "embed",
    "rel_bias",
    "ln1",
    "attn_q",
    "attn_k",
    "attn_v",
    "attn_out",
    "ln2",
    "cross_q",
    "cross_k",
    "cross_v",
    "cross_out",
    "ln3",
    "mlp_wi",
    "mlp_act",
    "mlp_wo",
    "final_norm",
    "lm_head",
)


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 6
    num_decoder_layers: int = 6
    num_heads: int = 8
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    feed_forward_proj: str = "relu"  # or "gated-gelu"
    tie_word_embeddings: bool = True
    decoder_start_token_id: int = 0
    pad_token_id: int = 0
    eos_token_id: int = 1
    dtype: Any = jnp.bfloat16

    @classmethod
    def t5_small(cls, **kw):
        return cls(**kw)

    @classmethod
    def t5_base(cls, **kw):
        base = dict(d_model=768, d_ff=3072, num_layers=12,
                    num_decoder_layers=12, num_heads=12)
        base.update(kw)
        return cls(**base)

    @classmethod
    def t5_large(cls, **kw):
        base = dict(d_model=1024, d_ff=4096, num_layers=24,
                    num_decoder_layers=24, num_heads=16)
        base.update(kw)
        return cls(**base)

    @classmethod
    def flan_t5_xl(cls, **kw):  # v1.1 geometry
        base = dict(d_model=2048, d_ff=5120, num_layers=24,
                    num_decoder_layers=24, num_heads=32,
                    feed_forward_proj="gated-gelu", tie_word_embeddings=False)
        base.update(kw)
        return cls(**base)

    @classmethod
    def tiny(cls, **kw):  # for tests
        base = dict(vocab_size=256, d_model=64, d_kv=16, d_ff=128,
                    num_layers=2, num_decoder_layers=2, num_heads=4)
        base.update(kw)
        return cls(**base)

    @property
    def is_gated(self):
        return self.feed_forward_proj.startswith("gated")

    @property
    def inner_dim(self):
        return self.num_heads * self.d_kv


def _init_layer(key, cfg: T5Config, cross: bool) -> Dict:
    H, I, F = cfg.d_model, cfg.inner_dim, cfg.d_ff
    n = 8 + (4 if cross else 0) + (1 if cfg.is_gated else 0)
    ks = list(jax.random.split(key, n))
    lp = {
        "ln1": jnp.ones((H,)),
        "q": initializer(ks.pop(), (H, I)),
        "k": initializer(ks.pop(), (H, I)),
        "v": initializer(ks.pop(), (H, I)),
        "o": initializer(ks.pop(), (I, H)),
        "ln2": jnp.ones((H,)),
        "wo": initializer(ks.pop(), (F, H)),
    }
    if cross:
        lp["cq"] = initializer(ks.pop(), (H, I))
        lp["ck"] = initializer(ks.pop(), (H, I))
        lp["cv"] = initializer(ks.pop(), (H, I))
        lp["co"] = initializer(ks.pop(), (I, H))
        lp["ln3"] = jnp.ones((H,))
    if cfg.is_gated:
        lp["wi_0"] = initializer(ks.pop(), (H, F))
        lp["wi_1"] = initializer(ks.pop(), (H, F))
    else:
        lp["wi"] = initializer(ks.pop(), (H, F))
    return lp


def init_params(key, cfg: T5Config) -> Dict:
    keys = jax.random.split(key, 4 + cfg.num_layers + cfg.num_decoder_layers)
    p = {
        "shared": initializer(keys[0], (cfg.vocab_size, cfg.d_model)),
        "enc_rel_bias": initializer(
            keys[1], (cfg.relative_attention_num_buckets, cfg.num_heads)
        ),
        "dec_rel_bias": initializer(
            keys[2], (cfg.relative_attention_num_buckets, cfg.num_heads)
        ),
        "enc_final_norm": jnp.ones((cfg.d_model,)),
        "dec_final_norm": jnp.ones((cfg.d_model,)),
        "encoder": [
            _init_layer(keys[4 + i], cfg, cross=False)
            for i in range(cfg.num_layers)
        ],
        "decoder": [
            _init_layer(keys[4 + cfg.num_layers + i], cfg, cross=True)
            for i in range(cfg.num_decoder_layers)
        ],
    }
    if not cfg.tie_word_embeddings:
        p["lm_head"] = initializer(keys[3], (cfg.d_model, cfg.vocab_size))
    if cfg.dtype != jnp.float32:
        p = cast_floats(p, cfg.dtype)
    return p


def _relative_position_bucket(relative_position, bidirectional, num_buckets,
                              max_distance):
    """HF t5.modeling_t5.T5Attention._relative_position_bucket, in lax ops."""
    relative_buckets = jnp.zeros_like(relative_position)
    if bidirectional:
        num_buckets //= 2
        relative_buckets += (relative_position > 0).astype(jnp.int32) * num_buckets
        relative_position = jnp.abs(relative_position)
    else:
        relative_position = -jnp.minimum(relative_position, 0)
    max_exact = num_buckets // 2
    is_small = relative_position < max_exact
    rp_large = max_exact + (
        jnp.log(relative_position.astype(jnp.float32) / max_exact + 1e-20)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    rp_large = jnp.minimum(rp_large, num_buckets - 1)
    relative_buckets += jnp.where(is_small, relative_position, rp_large)
    return relative_buckets


def _position_bias(rel_bias_table, cfg: T5Config, q_pos, k_pos, bidirectional,
                   actq: ActQuantizer):
    """[1, heads, Tq, Tk] additive attention bias from the bucket table.

    ``rel_bias`` quant site = the hook on the nn.Embedding leaf holding the
    bucket table (fires on the gathered bias, matching hook-on-output).
    """
    rel = k_pos[None, :] - q_pos[:, None]  # memory - query
    buckets = _relative_position_bucket(
        rel, bidirectional, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    )
    bias = rel_bias_table[buckets]  # [Tq, Tk, heads]
    bias = actq("rel_bias", bias.astype(jnp.float32))
    return bias.transpose(2, 0, 1)[None]  # [1, heads, Tq, Tk]


def _heads(x, cfg):
    B, T, _ = x.shape
    return x.reshape(B, T, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)


def _attend(q, k, v, bias, out_w, x_dtype, cfg, actq, site):
    # T5 does NOT scale scores by sqrt(d_kv) (scaling is folded into init)
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
    scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(x_dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", probs, v, preferred_element_type=jnp.float32)
    B, _, T, _ = out.shape
    out = out.astype(x_dtype).transpose(0, 2, 1, 3).reshape(B, T, cfg.inner_dim)
    return dense(out, out_w, None, actq, site)


def _ffn(x, lp, cfg: T5Config, actq):
    if cfg.is_gated:
        g = dense(x, lp["wi_0"], None, actq, "mlp_wi")
        u = dense(x, lp["wi_1"], None, actq, "mlp_wi")
        # gelu_new (tanh approximation), matching HF NewGELUActivation
        act = actq("mlp_act", jax.nn.gelu(g.astype(jnp.float32), approximate=True))
        h = act.astype(x.dtype) * u
    else:
        h = dense(x, lp["wi"], None, actq, "mlp_wi")
        h = jax.nn.relu(h)  # nn.ReLU is in EXCLUDED_ACTIVATIONS: no site
    return dense(h, lp["wo"], None, actq, "mlp_wo")


def encode(params, cfg: T5Config, tokens, actq: ActQuantizer = NULL_ACT_QUANT,
           attn_mask=None):
    """Encoder: token ids [B, S] -> hidden states [B, S, H]."""
    B, S = tokens.shape
    x = actq("embed", params["shared"][tokens]).astype(cfg.dtype)
    pos = jnp.arange(S)
    bias = _position_bias(params["enc_rel_bias"], cfg, pos, pos, True, actq)
    if attn_mask is not None:
        bias = bias + jnp.where(
            attn_mask[:, None, None, :].astype(bool), 0.0,
            jnp.finfo(jnp.float32).min,
        )
    eps = cfg.layer_norm_epsilon
    for lp in params["encoder"]:
        h = actq("ln1", rms_norm(x, lp["ln1"], eps))
        q = _heads(dense(h, lp["q"], None, actq, "attn_q"), cfg)
        k = _heads(dense(h, lp["k"], None, actq, "attn_k"), cfg)
        v = _heads(dense(h, lp["v"], None, actq, "attn_v"), cfg)
        x = x + _attend(q, k, v, bias, lp["o"], x.dtype, cfg, actq, "attn_out")
        h = actq("ln2", rms_norm(x, lp["ln2"], eps))
        x = x + _ffn(h, lp, cfg, actq)
    return actq("final_norm", rms_norm(x, params["enc_final_norm"], eps))


def decode(params, cfg: T5Config, dec_tokens, enc_hidden,
           actq: ActQuantizer = NULL_ACT_QUANT, enc_attn_mask=None,
           cache=None, cache_index=None):
    """Decoder: ids [B, T] + encoder states [B, S, H] -> logits [B, T, V].

    With ``cache`` (list of per-layer dicts from ``init_cache``) runs
    incremental decoding: self-attention k/v are written at ``cache_index``
    and cross-attention k/v are computed once (at index 0) and reused.
    Returns (logits, new_cache) in that mode.
    """
    B, T = dec_tokens.shape
    S = enc_hidden.shape[1]
    eps = cfg.layer_norm_epsilon
    x = actq("embed", params["shared"][dec_tokens]).astype(cfg.dtype)

    if cache is not None:
        L = cache[0]["k"].shape[2]
        q_pos = jnp.arange(T) + cache_index
        k_pos = jnp.arange(L)
        self_bias = _position_bias(
            params["dec_rel_bias"], cfg, q_pos, k_pos, False, actq
        )
        allowed = k_pos[None, :] <= q_pos[:, None]
        self_bias = self_bias + jnp.where(allowed, 0.0, jnp.finfo(jnp.float32).min)
    else:
        pos = jnp.arange(T)
        self_bias = _position_bias(params["dec_rel_bias"], cfg, pos, pos, False, actq)
        allowed = pos[None, :] <= pos[:, None]
        self_bias = self_bias + jnp.where(allowed, 0.0, jnp.finfo(jnp.float32).min)

    cross_bias = jnp.zeros((1, cfg.num_heads, T, S), jnp.float32)
    if enc_attn_mask is not None:
        cross_bias = cross_bias + jnp.where(
            enc_attn_mask[:, None, None, :].astype(bool), 0.0,
            jnp.finfo(jnp.float32).min,
        )

    new_cache = [] if cache is not None else None
    for i, lp in enumerate(params["decoder"]):
        h = actq("ln1", rms_norm(x, lp["ln1"], eps))
        q = _heads(dense(h, lp["q"], None, actq, "attn_q"), cfg)
        k = _heads(dense(h, lp["k"], None, actq, "attn_k"), cfg)
        v = _heads(dense(h, lp["v"], None, actq, "attn_v"), cfg)
        if cache is not None:
            ck = jax.lax.dynamic_update_slice(
                cache[i]["k"], k, (0, 0, cache_index, 0)
            )
            cv = jax.lax.dynamic_update_slice(
                cache[i]["v"], v, (0, 0, cache_index, 0)
            )
            k, v = ck, cv
            # cross k/v were precomputed by init_cache(..., enc_hidden=...)
            new_cache.append({"k": ck, "v": cv,
                              "ck": cache[i]["ck"], "cv": cache[i]["cv"]})
        x = x + _attend(q, k, v, self_bias, lp["o"], x.dtype, cfg, actq, "attn_out")
        h = actq("ln2", rms_norm(x, lp["ln2"], eps))
        cq = _heads(dense(h, lp["cq"], None, actq, "cross_q"), cfg)
        if cache is not None:
            xk, xv = new_cache[i]["ck"], new_cache[i]["cv"]
        else:
            xk = _heads(dense(enc_hidden, lp["ck"], None, actq, "cross_k"), cfg)
            xv = _heads(dense(enc_hidden, lp["cv"], None, actq, "cross_v"), cfg)
        x = x + _attend(cq, xk, xv, cross_bias, lp["co"], x.dtype, cfg, actq,
                        "cross_out")
        h = actq("ln3", rms_norm(x, lp["ln3"], eps))
        x = x + _ffn(h, lp, cfg, actq)

    x = actq("final_norm", rms_norm(x, params["dec_final_norm"], eps))
    if cfg.tie_word_embeddings:
        # HF T5 rescales before the tied head (modeling_t5: d_model ** -0.5)
        x = x * (cfg.d_model ** -0.5)
        head = params["shared"].T
    else:
        head = params["lm_head"]
    logits = jnp.dot(x, head, preferred_element_type=jnp.float32)
    logits = actq("lm_head", logits)
    return (logits, new_cache) if cache is not None else logits


def forward(params, cfg: T5Config, enc_tokens, dec_tokens,
            actq: ActQuantizer = NULL_ACT_QUANT, enc_attn_mask=None):
    """Full encoder-decoder pass -> decoder logits [B, T, V]."""
    enc_hidden = encode(params, cfg, enc_tokens, actq, enc_attn_mask)
    return decode(params, cfg, dec_tokens, enc_hidden, actq, enc_attn_mask)


def init_cache(params, cfg: T5Config, batch: int, max_len: int, enc_hidden,
               actq: ActQuantizer = NULL_ACT_QUANT):
    """Decoder cache: zeroed self-attn k/v [B, h, max_len, d] plus the
    cross-attention k/v precomputed once from the encoder states."""
    shape_self = (batch, cfg.num_heads, max_len, cfg.d_kv)
    return [
        {
            "k": jnp.zeros(shape_self, cfg.dtype),
            "v": jnp.zeros(shape_self, cfg.dtype),
            "ck": _heads(dense(enc_hidden, lp["ck"], None, actq, "cross_k"), cfg),
            "cv": _heads(dense(enc_hidden, lp["cv"], None, actq, "cross_v"), cfg),
        }
        for lp in params["decoder"]
    ]
