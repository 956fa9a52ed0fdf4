"""Save a trained GPT-2-family param pytree as a standard HF checkpoint.

The reference only ever *consumed* HF checkpoints
(`lm_eval/models/huggingface.py:1844-1857`); this framework also produces
them — the QAT/pretraining path (`parallel/train.py`,
`scripts/train_checkpoint.py`) exports its result in the canonical
`GPT2LMHeadModel` safetensors layout so (a) our own `models/hf_loader.py`
reloads it through the same `pretrained=<dir>` drop-dir contract used for
real checkpoints, and (b) stock `transformers` can load it unmodified
(verified by tests/test_hf_parity.py::test_export_roundtrip_gpt2).
"""

import json
import os

import numpy as np


def save_gpt2_checkpoint(cfg, params, out_dir: str, eos_token_id: int = 0) -> None:
    """Write ``config.json`` + ``model.safetensors`` (HF GPT-2 tensor names,
    float32). Inverse of hf_loader._load_gpt2; lm_head stays tied to wte
    (omitted from the file, as HF does). ``eos_token_id`` must match the
    tokenizer saved alongside (ByteLevelBPE puts <|endoftext|> at id 0)."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)

    def f32(x):
        return np.asarray(x, dtype=np.float32)

    t = {
        "transformer.wte.weight": f32(params["wte"]),
        "transformer.wpe.weight": f32(params["wpe"]),
        "transformer.ln_f.weight": f32(params["ln_f"]["g"]),
        "transformer.ln_f.bias": f32(params["ln_f"]["b"]),
    }
    for i, blk in enumerate(params["h"]):
        pre = f"transformer.h.{i}."
        t[pre + "ln_1.weight"] = f32(blk["ln_1"]["g"])
        t[pre + "ln_1.bias"] = f32(blk["ln_1"]["b"])
        t[pre + "ln_2.weight"] = f32(blk["ln_2"]["g"])
        t[pre + "ln_2.bias"] = f32(blk["ln_2"]["b"])
        # HF GPT-2 Conv1D stores [in, out] — same as our dense layout
        t[pre + "attn.c_attn.weight"] = f32(blk["attn"]["c_attn_w"])
        t[pre + "attn.c_attn.bias"] = f32(blk["attn"]["c_attn_b"])
        t[pre + "attn.c_proj.weight"] = f32(blk["attn"]["c_proj_w"])
        t[pre + "attn.c_proj.bias"] = f32(blk["attn"]["c_proj_b"])
        t[pre + "mlp.c_fc.weight"] = f32(blk["mlp"]["c_fc_w"])
        t[pre + "mlp.c_fc.bias"] = f32(blk["mlp"]["c_fc_b"])
        t[pre + "mlp.c_proj.weight"] = f32(blk["mlp"]["c_proj_w"])
        t[pre + "mlp.c_proj.bias"] = f32(blk["mlp"]["c_proj_b"])

    save_file(t, os.path.join(out_dir, "model.safetensors"))

    cfg_json = {
        "architectures": ["GPT2LMHeadModel"],
        "model_type": "gpt2",
        "activation_function": "gelu_new",
        "vocab_size": cfg.vocab_size,
        "n_positions": cfg.n_positions,
        "n_ctx": cfg.n_positions,
        "n_embd": cfg.n_embd,
        "n_layer": cfg.n_layer,
        "n_head": cfg.n_head,
        "n_inner": None,
        "layer_norm_epsilon": cfg.layer_norm_epsilon,
        "resid_pdrop": 0.0,
        "embd_pdrop": 0.0,
        "attn_pdrop": 0.0,
        "initializer_range": 0.02,
        "bos_token_id": eos_token_id,
        "eos_token_id": eos_token_id,
        "tie_word_embeddings": True,
        "torch_dtype": "float32",
    }
    with open(os.path.join(out_dir, "config.json"), "w", encoding="utf-8") as f:
        json.dump(cfg_json, f, indent=2)
