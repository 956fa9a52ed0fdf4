"""BERT encoder + MLM head (bidirectional attention, post-LN, exact GELU).

Beyond-reference capability: the reference ships a BERT result artifact
(`lm_eval/models/BERT.csv`) but no BERT adapter — encoder-only models cannot
be scored through its causal 3-method LM API. Here the family is first-class
and scored via pseudo-log-likelihood (lm/tpu_mlm.py), closing that gap.

QUANT_SITES per the reference hook rule (every leaf module except
norms/dropout/activations — note the reference's explicit
``"intermediate_act_fn"`` name filter, huggingface.py:672-676, exists
precisely for BERT's GELU submodule): the three embeddings, the four
attention projections, the two MLP linears, the MLM transform dense, and the
decoder head.
"""

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..quant.apply import NULL_ACT_QUANT, ActQuantizer
from .layers import attention_core, cast_floats, dense, initializer, layer_norm

QUANT_SITES = (
    "embed_word",
    "embed_pos",
    "embed_type",
    "attn_q",
    "attn_k",
    "attn_v",
    "attn_out",
    "mlp_fc1",
    "mlp_fc2",
    "mlm_transform",
    "lm_head",
)


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    mask_token_id: int = 103  # bert-base wordpiece [MASK]
    dtype: Any = jnp.bfloat16

    @classmethod
    def base(cls, **kw):
        return cls(**kw)

    @classmethod
    def large(cls, **kw):
        base = dict(
            hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
            intermediate_size=4096,
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def tiny(cls, **kw):
        base = dict(
            vocab_size=256, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=128, mask_token_id=255,
            dtype=jnp.float32,
        )
        base.update(kw)
        return cls(**base)

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads


def init_params(key, cfg: BertConfig) -> Dict:
    keys = jax.random.split(key, 5 + cfg.num_hidden_layers)
    H, F = cfg.hidden_size, cfg.intermediate_size
    p = {
        "embed_word": initializer(keys[0], (cfg.vocab_size, H)),
        "embed_pos": initializer(keys[1], (cfg.max_position_embeddings, H), scale=0.01),
        "embed_type": initializer(keys[2], (cfg.type_vocab_size, H), scale=0.01),
        "embed_ln": {"g": jnp.ones((H,)), "b": jnp.zeros((H,))},
        "mlm_transform": {"w": initializer(keys[3], (H, H)), "b": jnp.zeros((H,))},
        "mlm_ln": {"g": jnp.ones((H,)), "b": jnp.zeros((H,))},
        "mlm_bias": jnp.zeros((cfg.vocab_size,)),
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        ks = jax.random.split(keys[5 + i - 1], 6)
        p["layers"].append(
            {
                "q_proj": {"w": initializer(ks[0], (H, H)), "b": jnp.zeros((H,))},
                "k_proj": {"w": initializer(ks[1], (H, H)), "b": jnp.zeros((H,))},
                "v_proj": {"w": initializer(ks[2], (H, H)), "b": jnp.zeros((H,))},
                "out_proj": {"w": initializer(ks[3], (H, H)), "b": jnp.zeros((H,))},
                "attn_ln": {"g": jnp.ones((H,)), "b": jnp.zeros((H,))},
                "fc1": {"w": initializer(ks[4], (H, F)), "b": jnp.zeros((F,))},
                "fc2": {"w": initializer(ks[5], (F, H)), "b": jnp.zeros((H,))},
                "out_ln": {"g": jnp.ones((H,)), "b": jnp.zeros((H,))},
            }
        )
    if cfg.dtype != jnp.float32:
        p = cast_floats(p, cfg.dtype)
    return p


def forward(
    params,
    cfg: BertConfig,
    tokens: jnp.ndarray,
    actq: ActQuantizer = NULL_ACT_QUANT,
    cache=None,
    cache_index=None,
    attn_mask: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
    token_type: Optional[jnp.ndarray] = None,
):
    """MLM logits [B, T, V]. Bidirectional; ``attn_mask`` hides padding."""
    assert cache is None, "encoder-only model: no KV-cache decode"
    B, T = tokens.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim

    if positions is None:
        positions = jnp.arange(T)[None, :]
    if token_type is None:
        token_type = jnp.zeros_like(tokens)

    mask_bias = None
    if attn_mask is not None:
        mask_bias = jnp.where(
            attn_mask[:, None, None, :].astype(bool),
            0.0,
            jnp.finfo(jnp.float32).min,
        )

    x = (
        actq("embed_word", params["embed_word"][tokens])
        + actq("embed_pos", params["embed_pos"][positions])
        + actq("embed_type", params["embed_type"][token_type])
    )
    x = layer_norm(
        x, params["embed_ln"]["g"], params["embed_ln"]["b"], cfg.layer_norm_eps
    ).astype(cfg.dtype)

    for lp in params["layers"]:
        def heads(t):
            return t.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)

        q = heads(dense(x, lp["q_proj"]["w"], lp["q_proj"]["b"], actq, "attn_q"))
        k = heads(dense(x, lp["k_proj"]["w"], lp["k_proj"]["b"], actq, "attn_k"))
        v = heads(dense(x, lp["v_proj"]["w"], lp["v_proj"]["b"], actq, "attn_v"))
        out = attention_core(
            q, k, v, scale=1.0 / float(hd) ** 0.5, mask_bias=mask_bias,
            is_causal=False,
        )
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(B, T, -1)
        out = dense(out, lp["out_proj"]["w"], lp["out_proj"]["b"], actq, "attn_out")
        x = layer_norm(
            x + out, lp["attn_ln"]["g"], lp["attn_ln"]["b"], cfg.layer_norm_eps
        ).astype(cfg.dtype)

        h = dense(x, lp["fc1"]["w"], lp["fc1"]["b"], actq, "mlp_fc1")
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
        h = dense(h, lp["fc2"]["w"], lp["fc2"]["b"], actq, "mlp_fc2")
        x = layer_norm(
            x + h, lp["out_ln"]["g"], lp["out_ln"]["b"], cfg.layer_norm_eps
        ).astype(cfg.dtype)

    # MLM head: transform -> GELU -> LN -> tied decoder + bias
    h = dense(x, params["mlm_transform"]["w"], params["mlm_transform"]["b"],
              actq, "mlm_transform")
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
    h = layer_norm(
        h, params["mlm_ln"]["g"], params["mlm_ln"]["b"], cfg.layer_norm_eps
    ).astype(cfg.dtype)
    logits = jnp.dot(h, params["embed_word"].T, preferred_element_type=jnp.float32)
    logits = logits + params["mlm_bias"].astype(jnp.float32)
    return actq("lm_head", logits)


def init_cache(cfg: BertConfig, batch: int, max_len: int, kv_quant: bool = False):
    raise NotImplementedError("encoder-only model: no KV-cache decode")
