"""Load HF checkpoints (safetensors / torch .bin) into JAX param pytrees.

Replaces the reference's ``AUTO_MODEL_CLASS.from_pretrained`` path
(huggingface.py:1844-1857) with a direct tensor-name mapping: read
``config.json`` + weight shards from a local directory, place each tensor
into the pytree layout of models/{gpt2,llama,opt}.py. No network access.
"""

import json
import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _read_config(path: str) -> dict:
    with open(os.path.join(path, "config.json"), encoding="utf-8") as f:
        return json.load(f)


def _load_tensors(path: str) -> dict:
    """Read all weight shards in a checkpoint dir into {name: np.ndarray}."""
    tensors = {}
    st_files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if st_files:
        from safetensors import safe_open

        for fname in st_files:
            with safe_open(os.path.join(path, fname), framework="np") as f:
                for name in f.keys():
                    tensors[name] = f.get_tensor(name)
        return tensors
    bin_files = sorted(
        f
        for f in os.listdir(path)
        if f.endswith(".bin") and f.startswith("pytorch_model")
    )
    if bin_files:
        import torch

        for fname in bin_files:
            sd = torch.load(
                os.path.join(path, fname), map_location="cpu", weights_only=True
            )
            for name, t in sd.items():
                tensors[name] = t.float().numpy()
        return tensors
    raise FileNotFoundError(f"no safetensors/bin weight files under {path}")


def _j(x, dtype):
    x = np.asarray(x)
    if x.dtype == np.float16 or x.dtype.kind == "V":  # bf16 comes out as void16
        x = x.view(np.uint16) if x.dtype.kind == "V" else x
    arr = jnp.asarray(x)
    if jnp.issubdtype(arr.dtype, jnp.floating):
        arr = arr.astype(dtype)
    return arr


def load_checkpoint(family: str, path: str, dtype=jnp.bfloat16, **overrides) -> Tuple:
    cfg_json = _read_config(path)
    tensors = _load_tensors(path)
    qcfg_path = os.path.join(path, "quantize_config.json")
    if os.path.exists(qcfg_path) or any(k.endswith(".qweight") for k in tensors):
        with open(qcfg_path, encoding="utf-8") as f:
            qcfg = json.load(f)
        tensors = _dequantize_gptq(tensors, qcfg)
    if family == "gpt2":
        return _load_gpt2(cfg_json, tensors, dtype, overrides)
    if family == "llama":
        return _load_llama(cfg_json, tensors, dtype, overrides)
    if family == "gptj":
        return _load_gptj(cfg_json, tensors, dtype, overrides)
    if family == "neo":
        return _load_neo(cfg_json, tensors, dtype, overrides)
    if family == "neox":
        return _load_neox(cfg_json, tensors, dtype, overrides)
    if family == "bloom":
        return _load_bloom(cfg_json, tensors, dtype, overrides)
    if family == "opt":
        return _load_opt(cfg_json, tensors, dtype, overrides)
    if family == "t5":
        return _load_t5(cfg_json, tensors, dtype, overrides)
    if family == "bert":
        return _load_bert(cfg_json, tensors, dtype, overrides)
    raise ValueError(f"no HF loader for family {family!r}")


def _strip_prefix(tensors, prefixes=("transformer.", "model.")):
    out = {}
    for name, t in tensors.items():
        for p in prefixes:
            if name.startswith(p):
                name = name[len(p):]
                break
        out[name] = t
    return out


def _load_gpt2(cfg_json, tensors, dtype, overrides):
    from .gpt2 import GPT2Config

    cfg = GPT2Config(
        vocab_size=cfg_json["vocab_size"],
        n_positions=cfg_json["n_positions"],
        n_embd=cfg_json["n_embd"],
        n_layer=cfg_json["n_layer"],
        n_head=cfg_json["n_head"],
        layer_norm_epsilon=cfg_json.get("layer_norm_epsilon", 1e-5),
        dtype=dtype,
        **overrides,
    )
    t = _strip_prefix(tensors)
    params = {
        "wte": _j(t["wte.weight"], dtype),
        "wpe": _j(t["wpe.weight"], dtype),
        "ln_f": {"g": _j(t["ln_f.weight"], dtype), "b": _j(t["ln_f.bias"], dtype)},
        "h": [],
    }
    for i in range(cfg.n_layer):
        pre = f"h.{i}."
        params["h"].append(
            {
                "ln_1": {"g": _j(t[pre + "ln_1.weight"], dtype), "b": _j(t[pre + "ln_1.bias"], dtype)},
                "ln_2": {"g": _j(t[pre + "ln_2.weight"], dtype), "b": _j(t[pre + "ln_2.bias"], dtype)},
                "attn": {
                    # HF GPT-2 Conv1D stores [in, out] — same as our layout
                    "c_attn_w": _j(t[pre + "attn.c_attn.weight"], dtype),
                    "c_attn_b": _j(t[pre + "attn.c_attn.bias"], dtype),
                    "c_proj_w": _j(t[pre + "attn.c_proj.weight"], dtype),
                    "c_proj_b": _j(t[pre + "attn.c_proj.bias"], dtype),
                },
                "mlp": {
                    "c_fc_w": _j(t[pre + "mlp.c_fc.weight"], dtype),
                    "c_fc_b": _j(t[pre + "mlp.c_fc.bias"], dtype),
                    "c_proj_w": _j(t[pre + "mlp.c_proj.weight"], dtype),
                    "c_proj_b": _j(t[pre + "mlp.c_proj.bias"], dtype),
                },
            }
        )
    return cfg, params


def _load_neo(cfg_json, tensors, dtype, overrides):
    """GPT-Neo (HF ``GPTNeoForCausalLM``): bias-free q/k/v, biased out_proj,
    alternating global/local attention per ``attention_types``; torch Linear
    weights transposed into our [in, out] layout; lm_head tied to wte."""
    from .neo import NeoConfig

    # attention_types = [[["global","local"], N], ...] -> flat per-layer tuple
    attention_layers = []
    for types, repeat in cfg_json.get("attention_types") or []:
        attention_layers.extend(list(types) * repeat)

    cfg = NeoConfig(
        vocab_size=cfg_json["vocab_size"],
        n_positions=cfg_json["max_position_embeddings"],
        n_embd=cfg_json["hidden_size"],
        n_layer=cfg_json["num_layers"],
        n_head=cfg_json["num_heads"],
        intermediate_size=cfg_json.get("intermediate_size"),
        window_size=cfg_json.get("window_size", 256),
        attention_layers=tuple(attention_layers),
        layer_norm_epsilon=cfg_json.get("layer_norm_epsilon", 1e-5),
        dtype=dtype,
        **overrides,
    )
    t = _strip_prefix(tensors)
    params = {
        "wte": _j(t["wte.weight"], dtype),
        "wpe": _j(t["wpe.weight"], dtype),
        "ln_f": {"g": _j(t["ln_f.weight"], dtype), "b": _j(t["ln_f.bias"], dtype)},
        "h": [],
    }
    for i in range(cfg.n_layer):
        pre = f"h.{i}."
        att = pre + "attn.attention."
        params["h"].append(
            {
                "ln_1": {"g": _j(t[pre + "ln_1.weight"], dtype), "b": _j(t[pre + "ln_1.bias"], dtype)},
                "ln_2": {"g": _j(t[pre + "ln_2.weight"], dtype), "b": _j(t[pre + "ln_2.bias"], dtype)},
                "q_proj": _j(t[att + "q_proj.weight"], dtype).T,
                "k_proj": _j(t[att + "k_proj.weight"], dtype).T,
                "v_proj": _j(t[att + "v_proj.weight"], dtype).T,
                "out_proj": {
                    "w": _j(t[att + "out_proj.weight"], dtype).T,
                    "b": _j(t[att + "out_proj.bias"], dtype),
                },
                "c_fc": {
                    "w": _j(t[pre + "mlp.c_fc.weight"], dtype).T,
                    "b": _j(t[pre + "mlp.c_fc.bias"], dtype),
                },
                "c_proj": {
                    "w": _j(t[pre + "mlp.c_proj.weight"], dtype).T,
                    "b": _j(t[pre + "mlp.c_proj.bias"], dtype),
                },
            }
        )
    return cfg, params


def _load_llama(cfg_json, tensors, dtype, overrides):
    from .llama import LlamaConfig

    cfg = LlamaConfig(
        vocab_size=cfg_json["vocab_size"],
        max_position_embeddings=cfg_json["max_position_embeddings"],
        hidden_size=cfg_json["hidden_size"],
        intermediate_size=cfg_json["intermediate_size"],
        num_hidden_layers=cfg_json["num_hidden_layers"],
        num_attention_heads=cfg_json["num_attention_heads"],
        num_key_value_heads=cfg_json.get(
            "num_key_value_heads", cfg_json["num_attention_heads"]
        ),
        rms_norm_eps=cfg_json.get("rms_norm_eps", 1e-5),
        rope_theta=cfg_json.get("rope_theta", 10000.0),
        rope_scaling=cfg_json.get("rope_scaling"),
        tie_word_embeddings=cfg_json.get("tie_word_embeddings", False),
        dtype=dtype,
        **overrides,
    )
    t = _strip_prefix(tensors)
    params = {
        "embed": _j(t["embed_tokens.weight"], dtype),
        "final_norm": _j(t["norm.weight"], dtype),
        "layers": [],
    }
    if not cfg.tie_word_embeddings:
        # HF stores nn.Linear [out, in]; ours is [in, out]
        params["lm_head"] = _j(t["lm_head.weight"], dtype).T
    for i in range(cfg.num_hidden_layers):
        pre = f"layers.{i}."
        params["layers"].append(
            {
                "input_norm": _j(t[pre + "input_layernorm.weight"], dtype),
                "post_attn_norm": _j(t[pre + "post_attention_layernorm.weight"], dtype),
                "q_proj": _j(t[pre + "self_attn.q_proj.weight"], dtype).T,
                "k_proj": _j(t[pre + "self_attn.k_proj.weight"], dtype).T,
                "v_proj": _j(t[pre + "self_attn.v_proj.weight"], dtype).T,
                "o_proj": _j(t[pre + "self_attn.o_proj.weight"], dtype).T,
                "gate_proj": _j(t[pre + "mlp.gate_proj.weight"], dtype).T,
                "up_proj": _j(t[pre + "mlp.up_proj.weight"], dtype).T,
                "down_proj": _j(t[pre + "mlp.down_proj.weight"], dtype).T,
            }
        )
    return cfg, params


def _load_opt(cfg_json, tensors, dtype, overrides):
    from .opt import OPTConfig

    cfg = OPTConfig(
        vocab_size=cfg_json["vocab_size"],
        max_position_embeddings=cfg_json["max_position_embeddings"],
        hidden_size=cfg_json["hidden_size"],
        ffn_dim=cfg_json["ffn_dim"],
        num_hidden_layers=cfg_json["num_hidden_layers"],
        num_attention_heads=cfg_json["num_attention_heads"],
        word_embed_proj_dim=cfg_json.get("word_embed_proj_dim"),
        do_layer_norm_before=cfg_json.get("do_layer_norm_before", True),
        dtype=dtype,
        **overrides,
    )
    t = _strip_prefix(tensors)
    t = {k.replace("decoder.", ""): v for k, v in t.items()}

    def lin(pre):
        return {"w": _j(t[pre + ".weight"], dtype).T, "b": _j(t[pre + ".bias"], dtype)}

    params = {
        "embed": _j(t["embed_tokens.weight"], dtype),
        "embed_pos": _j(t["embed_positions.weight"], dtype),
        "layers": [],
    }
    if "final_layer_norm.weight" in t:  # absent on opt-350m (post-LN)
        params["final_ln"] = {
            "g": _j(t["final_layer_norm.weight"], dtype),
            "b": _j(t["final_layer_norm.bias"], dtype),
        }
    if "project_in.weight" in t:
        params["project_in"] = _j(t["project_in.weight"], dtype).T
        params["project_out"] = _j(t["project_out.weight"], dtype).T
    for i in range(cfg.num_hidden_layers):
        pre = f"layers.{i}."
        params["layers"].append(
            {
                "self_attn_ln": {
                    "g": _j(t[pre + "self_attn_layer_norm.weight"], dtype),
                    "b": _j(t[pre + "self_attn_layer_norm.bias"], dtype),
                },
                "final_ln": {
                    "g": _j(t[pre + "final_layer_norm.weight"], dtype),
                    "b": _j(t[pre + "final_layer_norm.bias"], dtype),
                },
                "q_proj": lin(pre + "self_attn.q_proj"),
                "k_proj": lin(pre + "self_attn.k_proj"),
                "v_proj": lin(pre + "self_attn.v_proj"),
                "out_proj": lin(pre + "self_attn.out_proj"),
                "fc1": lin(pre + "fc1"),
                "fc2": lin(pre + "fc2"),
            }
        )
    return cfg, params


def _load_gptj(cfg_json, tensors, dtype, overrides):
    """GPT-J (HF ``GPTJForCausalLM``): bias-free q/k/v/out projections, one
    shared ln_1 per block, biased lm_head; torch Linear weights transposed
    into our [in, out] layout."""
    from .gptj import GPTJConfig

    cfg = GPTJConfig(
        vocab_size=cfg_json["vocab_size"],
        n_embd=cfg_json["n_embd"],
        n_layer=cfg_json["n_layer"],
        n_head=cfg_json["n_head"],
        n_inner=cfg_json.get("n_inner"),
        rotary_dim=cfg_json.get("rotary_dim") or cfg_json["n_embd"] // cfg_json["n_head"],
        n_positions=cfg_json["n_positions"],
        layer_norm_epsilon=cfg_json.get("layer_norm_epsilon", 1e-5),
        dtype=dtype,
        **overrides,
    )
    t = _strip_prefix(tensors)

    params = {
        "wte": _j(t["wte.weight"], dtype),
        "lm_head": {
            "w": _j(t["lm_head.weight"], dtype).T,
            "b": _j(t["lm_head.bias"], dtype),
        },
        "ln_f": {
            "g": _j(t["ln_f.weight"], dtype),
            "b": _j(t["ln_f.bias"], dtype),
        },
        "h": [],
    }
    for i in range(cfg.n_layer):
        pre = f"h.{i}."
        params["h"].append(
            {
                "ln_1": {
                    "g": _j(t[pre + "ln_1.weight"], dtype),
                    "b": _j(t[pre + "ln_1.bias"], dtype),
                },
                "q_proj": _j(t[pre + "attn.q_proj.weight"], dtype).T,
                "k_proj": _j(t[pre + "attn.k_proj.weight"], dtype).T,
                "v_proj": _j(t[pre + "attn.v_proj.weight"], dtype).T,
                "out_proj": _j(t[pre + "attn.out_proj.weight"], dtype).T,
                "fc_in": {
                    "w": _j(t[pre + "mlp.fc_in.weight"], dtype).T,
                    "b": _j(t[pre + "mlp.fc_in.bias"], dtype),
                },
                "fc_out": {
                    "w": _j(t[pre + "mlp.fc_out.weight"], dtype).T,
                    "b": _j(t[pre + "mlp.fc_out.bias"], dtype),
                },
            }
        )
    return cfg, params


def _load_neox(cfg_json, tensors, dtype, overrides):
    """GPT-NeoX / Pythia (HF ``GPTNeoXForCausalLM``).

    The fused ``query_key_value`` weight stays in HF's per-head q|k|v
    packing (models/neox.py slices it at runtime); torch Linear weights are
    [out, in], transposed into our [in, out] matmul layout.
    """
    from .neox import NeoXConfig

    cfg = NeoXConfig(
        vocab_size=cfg_json["vocab_size"],
        hidden_size=cfg_json["hidden_size"],
        num_hidden_layers=cfg_json["num_hidden_layers"],
        num_attention_heads=cfg_json["num_attention_heads"],
        intermediate_size=cfg_json["intermediate_size"],
        max_position_embeddings=cfg_json["max_position_embeddings"],
        rotary_pct=cfg_json.get("rotary_pct", 0.25),
        rotary_emb_base=cfg_json.get("rotary_emb_base", 10000.0),
        layer_norm_eps=cfg_json.get("layer_norm_eps", 1e-5),
        use_parallel_residual=cfg_json.get("use_parallel_residual", True),
        dtype=dtype,
        **overrides,
    )
    t = {k.replace("gpt_neox.", ""): v for k, v in tensors.items()}

    params = {
        "embed_in": _j(t["embed_in.weight"], dtype),
        "embed_out": _j(t["embed_out.weight"], dtype).T,
        "final_ln": {
            "g": _j(t["final_layer_norm.weight"], dtype),
            "b": _j(t["final_layer_norm.bias"], dtype),
        },
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        pre = f"layers.{i}."
        params["layers"].append(
            {
                "ln_1": {
                    "g": _j(t[pre + "input_layernorm.weight"], dtype),
                    "b": _j(t[pre + "input_layernorm.bias"], dtype),
                },
                "ln_2": {
                    "g": _j(t[pre + "post_attention_layernorm.weight"], dtype),
                    "b": _j(t[pre + "post_attention_layernorm.bias"], dtype),
                },
                "qkv_w": _j(t[pre + "attention.query_key_value.weight"], dtype).T,
                "qkv_b": _j(t[pre + "attention.query_key_value.bias"], dtype),
                "dense_w": _j(t[pre + "attention.dense.weight"], dtype).T,
                "dense_b": _j(t[pre + "attention.dense.bias"], dtype),
                "fc_w": _j(t[pre + "mlp.dense_h_to_4h.weight"], dtype).T,
                "fc_b": _j(t[pre + "mlp.dense_h_to_4h.bias"], dtype),
                "proj_w": _j(t[pre + "mlp.dense_4h_to_h.weight"], dtype).T,
                "proj_b": _j(t[pre + "mlp.dense_4h_to_h.bias"], dtype),
            }
        )
    return cfg, params


def _load_bloom(cfg_json, tensors, dtype, overrides):
    """BLOOM (HF ``BloomForCausalLM``).

    The fused ``query_key_value`` weight stays in HF's per-head q|k|v
    interleave (models/bloom.py reshapes [.., nh, 3, hd] at runtime); the
    lm_head is tied to ``word_embeddings``. torch Linear weights are
    [out, in], transposed into our [in, out] matmul layout.
    """
    from .bloom import BloomConfig

    cfg = BloomConfig(
        vocab_size=cfg_json["vocab_size"],
        hidden_size=cfg_json.get("hidden_size", cfg_json.get("n_embed")),
        num_hidden_layers=cfg_json.get("num_hidden_layers", cfg_json.get("n_layer")),
        num_attention_heads=cfg_json.get("num_attention_heads", cfg_json.get("n_head")),
        layer_norm_epsilon=cfg_json.get("layer_norm_epsilon", 1e-5),
        apply_residual_connection_post_layernorm=cfg_json.get(
            "apply_residual_connection_post_layernorm", False
        ),
        dtype=dtype,
        **overrides,
    )
    t = _strip_prefix(tensors)

    params = {
        "embed": _j(t["word_embeddings.weight"], dtype),
        "embed_ln": {
            "g": _j(t["word_embeddings_layernorm.weight"], dtype),
            "b": _j(t["word_embeddings_layernorm.bias"], dtype),
        },
        "final_ln": {
            "g": _j(t["ln_f.weight"], dtype),
            "b": _j(t["ln_f.bias"], dtype),
        },
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        pre = f"h.{i}."
        params["layers"].append(
            {
                "ln_1": {
                    "g": _j(t[pre + "input_layernorm.weight"], dtype),
                    "b": _j(t[pre + "input_layernorm.bias"], dtype),
                },
                "ln_2": {
                    "g": _j(t[pre + "post_attention_layernorm.weight"], dtype),
                    "b": _j(t[pre + "post_attention_layernorm.bias"], dtype),
                },
                "qkv_w": _j(t[pre + "self_attention.query_key_value.weight"], dtype).T,
                "qkv_b": _j(t[pre + "self_attention.query_key_value.bias"], dtype),
                "dense_w": _j(t[pre + "self_attention.dense.weight"], dtype).T,
                "dense_b": _j(t[pre + "self_attention.dense.bias"], dtype),
                "fc_w": _j(t[pre + "mlp.dense_h_to_4h.weight"], dtype).T,
                "fc_b": _j(t[pre + "mlp.dense_h_to_4h.bias"], dtype),
                "proj_w": _j(t[pre + "mlp.dense_4h_to_h.weight"], dtype).T,
                "proj_b": _j(t[pre + "mlp.dense_4h_to_h.bias"], dtype),
            }
        )
    return cfg, params


def _load_t5(cfg_json, tensors, dtype, overrides):
    from .t5 import T5Config

    cfg = T5Config(
        vocab_size=cfg_json["vocab_size"],
        d_model=cfg_json["d_model"],
        d_kv=cfg_json["d_kv"],
        d_ff=cfg_json["d_ff"],
        num_layers=cfg_json["num_layers"],
        num_decoder_layers=cfg_json.get(
            "num_decoder_layers", cfg_json["num_layers"]
        ),
        num_heads=cfg_json["num_heads"],
        relative_attention_num_buckets=cfg_json.get(
            "relative_attention_num_buckets", 32
        ),
        relative_attention_max_distance=cfg_json.get(
            "relative_attention_max_distance", 128
        ),
        layer_norm_epsilon=cfg_json.get("layer_norm_epsilon", 1e-6),
        feed_forward_proj=cfg_json.get("feed_forward_proj", "relu"),
        tie_word_embeddings=cfg_json.get("tie_word_embeddings", True),
        decoder_start_token_id=cfg_json.get("decoder_start_token_id", 0),
        pad_token_id=cfg_json.get("pad_token_id", 0),
        eos_token_id=cfg_json.get("eos_token_id", 1),
        dtype=dtype,
        **overrides,
    )
    t = tensors  # T5 names have no strippable prefix

    def stack(side, n_layers, cross):
        layers = []
        for i in range(n_layers):
            pre = f"{side}.block.{i}."
            lp = {
                "ln1": _j(t[pre + "layer.0.layer_norm.weight"], dtype),
                "q": _j(t[pre + "layer.0.SelfAttention.q.weight"], dtype).T,
                "k": _j(t[pre + "layer.0.SelfAttention.k.weight"], dtype).T,
                "v": _j(t[pre + "layer.0.SelfAttention.v.weight"], dtype).T,
                "o": _j(t[pre + "layer.0.SelfAttention.o.weight"], dtype).T,
            }
            ffn_idx = 2 if cross else 1
            if cross:
                lp["ln2"] = _j(t[pre + "layer.1.layer_norm.weight"], dtype)
                lp["cq"] = _j(t[pre + "layer.1.EncDecAttention.q.weight"], dtype).T
                lp["ck"] = _j(t[pre + "layer.1.EncDecAttention.k.weight"], dtype).T
                lp["cv"] = _j(t[pre + "layer.1.EncDecAttention.v.weight"], dtype).T
                lp["co"] = _j(t[pre + "layer.1.EncDecAttention.o.weight"], dtype).T
                lp["ln3"] = _j(t[pre + f"layer.{ffn_idx}.layer_norm.weight"], dtype)
            else:
                lp["ln2"] = _j(t[pre + f"layer.{ffn_idx}.layer_norm.weight"], dtype)
            ff = pre + f"layer.{ffn_idx}.DenseReluDense."
            if cfg.is_gated:
                lp["wi_0"] = _j(t[ff + "wi_0.weight"], dtype).T
                lp["wi_1"] = _j(t[ff + "wi_1.weight"], dtype).T
            else:
                lp["wi"] = _j(t[ff + "wi.weight"], dtype).T
            lp["wo"] = _j(t[ff + "wo.weight"], dtype).T
            layers.append(lp)
        return layers

    # our decoder layers put cross-attn norm in ln2/ln3 order: HF layer.1 is
    # the cross block whose layer_norm precedes it; HF decoder ordering is
    # ln(layer.0) self / ln(layer.1) cross / ln(layer.2) ffn = ln1/ln2/ln3
    params = {
        "shared": _j(t["shared.weight"], dtype),
        "enc_rel_bias": _j(
            t["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"],
            dtype,
        ),
        "dec_rel_bias": _j(
            t["decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"],
            dtype,
        ),
        "enc_final_norm": _j(t["encoder.final_layer_norm.weight"], dtype),
        "dec_final_norm": _j(t["decoder.final_layer_norm.weight"], dtype),
        "encoder": stack("encoder", cfg.num_layers, cross=False),
        "decoder": stack("decoder", cfg.num_decoder_layers, cross=True),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _j(t["lm_head.weight"], dtype).T
    return cfg, params


# ---------------------------------------------------------------------------
# GPTQ checkpoints (reference: AutoGPTQForCausalLM.from_quantized,
# huggingface.py:1859-1874). The packed format is AutoGPTQ's: per Linear,
#   qweight int32 [in/ (32/bits), out]   codes packed along in_features
#   qzeros  int32 [groups, out/(32/bits)] packed zero points
#   scales  f16   [groups, out]
#   g_idx   int32 [in]                    row -> group map (act-order aware)
# Dequant: w[i,j] = scales[g[i],j] * (code[i,j] - (zero[g[i],j] + 1)); the +1
# compensates AutoGPTQ's pack-time `zeros -= 1` (v1 checkpoints). v2
# checkpoints (quantize_config "checkpoint_format": "gptq_v2") drop it.
# ---------------------------------------------------------------------------


def _load_bert(cfg_json, tensors, dtype, overrides):
    """BERT (HF ``BertForMaskedLM``): post-LN encoder, tied MLM decoder.

    HF Linear weights are [out, in] -> transposed to our [in, out]; the MLM
    decoder is tied to the word embeddings, so only ``cls.predictions.bias``
    is read from the head (``decoder.weight``, when present, is the tie).
    """
    from .bert import BertConfig

    cfg = BertConfig(
        vocab_size=cfg_json["vocab_size"],
        hidden_size=cfg_json["hidden_size"],
        num_hidden_layers=cfg_json["num_hidden_layers"],
        num_attention_heads=cfg_json["num_attention_heads"],
        intermediate_size=cfg_json["intermediate_size"],
        max_position_embeddings=cfg_json["max_position_embeddings"],
        type_vocab_size=cfg_json.get("type_vocab_size", 2),
        layer_norm_eps=cfg_json.get("layer_norm_eps", 1e-12),
        mask_token_id=cfg_json.get("mask_token_id") or 103,
        dtype=dtype,
        **overrides,
    )
    t = _strip_prefix(tensors, prefixes=("bert.",))

    def lin(pre):
        return {
            "w": _j(t[pre + ".weight"], dtype).T,
            "b": _j(t[pre + ".bias"], dtype),
        }

    def ln(pre):
        return {"g": _j(t[pre + ".weight"], dtype), "b": _j(t[pre + ".bias"], dtype)}

    params = {
        "embed_word": _j(t["embeddings.word_embeddings.weight"], dtype),
        "embed_pos": _j(t["embeddings.position_embeddings.weight"], dtype),
        "embed_type": _j(t["embeddings.token_type_embeddings.weight"], dtype),
        "embed_ln": ln("embeddings.LayerNorm"),
        "mlm_transform": lin("cls.predictions.transform.dense"),
        "mlm_ln": ln("cls.predictions.transform.LayerNorm"),
        "mlm_bias": _j(t["cls.predictions.bias"], dtype),
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layer.{i}."
        params["layers"].append(
            {
                "q_proj": lin(pre + "attention.self.query"),
                "k_proj": lin(pre + "attention.self.key"),
                "v_proj": lin(pre + "attention.self.value"),
                "out_proj": lin(pre + "attention.output.dense"),
                "attn_ln": ln(pre + "attention.output.LayerNorm"),
                "fc1": lin(pre + "intermediate.dense"),
                "fc2": lin(pre + "output.dense"),
                "out_ln": ln(pre + "output.LayerNorm"),
            }
        )
    return cfg, params


def _gptq_unpack_rows(packed, bits):
    """int32 [n/(32/bits), m] -> int [n, m] (low bits first)."""
    pack = 32 // bits
    mask = (1 << bits) - 1
    shifts = np.arange(pack, dtype=np.int64) * bits
    u = (packed.astype(np.int64)[:, None, :] >> shifts[None, :, None]) & mask
    return u.reshape(-1, packed.shape[1])


def _gptq_unpack_cols(packed, bits):
    """int32 [n, m/(32/bits)] -> int [n, m] (low bits first)."""
    pack = 32 // bits
    mask = (1 << bits) - 1
    shifts = np.arange(pack, dtype=np.int64) * bits
    u = (packed.astype(np.int64)[:, :, None] >> shifts[None, None, :]) & mask
    return u.reshape(packed.shape[0], -1)


def _dequantize_gptq(tensors, qcfg):
    bits = int(qcfg.get("bits", 4))
    if 32 % bits != 0:
        raise ValueError(f"unsupported GPTQ bits={bits}")
    zero_off = 0 if qcfg.get("checkpoint_format") == "gptq_v2" else 1
    bases = {n[: -len(".qweight")] for n in tensors if n.endswith(".qweight")}
    out = {}
    for name, t in tensors.items():
        base, leaf = name.rsplit(".", 1) if "." in name else ("", name)
        if base in bases and leaf in ("qweight", "qzeros", "scales", "g_idx"):
            continue
        out[name] = t
    for base in bases:
        codes = _gptq_unpack_rows(np.asarray(tensors[base + ".qweight"]), bits)
        zeros = _gptq_unpack_cols(np.asarray(tensors[base + ".qzeros"]), bits)
        scales = np.asarray(tensors[base + ".scales"]).astype(np.float32)
        in_features = codes.shape[0]
        if base + ".g_idx" in tensors:
            g_idx = np.asarray(tensors[base + ".g_idx"]).astype(np.int64)
        else:
            group_size = int(qcfg.get("group_size", 128))
            if group_size <= 0:
                group_size = in_features
            g_idx = np.arange(in_features) // group_size
        w = scales[g_idx] * (codes - (zeros[g_idx] + zero_off))
        # store in HF nn.Linear orientation [out, in] so the family mappers'
        # usual .T applies
        out[base + ".weight"] = w.T.astype(np.float32)
    return out
