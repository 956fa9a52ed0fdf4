"""LoRA adapter loading: merge PEFT checkpoints into base weights.

Parity target: reference block B0 (huggingface.py:273-277) and the
``peft=`` kwarg path (:1877-1893), which attach a LoRA adapter (the
reference's QAT model ``pouya-haghi/llama2_finetune_pile``) to the base
model. For evaluation, attaching and merging are equivalent:
W' = W + (alpha / r) * B @ A. Merging keeps the forward pass unchanged so
every quantization tier applies to the finetuned weights exactly as the
reference's experiments did (quant blocks ran after PEFT attach).

Reads a local PEFT checkpoint directory: ``adapter_config.json`` +
``adapter_model.safetensors`` (or ``adapter_model.bin``).
"""

import json
import os
import re

import jax.numpy as jnp
import numpy as np


def _load_adapter_tensors(path):
    st = os.path.join(path, "adapter_model.safetensors")
    if os.path.exists(st):
        from safetensors import safe_open

        out = {}
        with safe_open(st, framework="np") as f:
            for name in f.keys():
                out[name] = f.get_tensor(name)
        return out
    bin_path = os.path.join(path, "adapter_model.bin")
    if os.path.exists(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.float().numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no adapter weights under {path}")


# PEFT module name -> our param path suffix, per family
_TARGET_MAP = {
    "llama": {
        "q_proj": "q_proj", "k_proj": "k_proj", "v_proj": "v_proj",
        "o_proj": "o_proj", "gate_proj": "gate_proj", "up_proj": "up_proj",
        "down_proj": "down_proj",
    },
    "gpt2": {"c_attn": "attn/c_attn_w", "c_proj": None},  # c_proj ambiguous; handled by position
    "opt": {
        "q_proj": "q_proj/w", "k_proj": "k_proj/w", "v_proj": "v_proj/w",
        "out_proj": "out_proj/w", "fc1": "fc1/w", "fc2": "fc2/w",
    },
}


def merge_lora(params, family: str, adapter_path: str):
    """Return params with the LoRA deltas merged in (W += scale * A^T B^T).

    PEFT stores lora_A [r, in] and lora_B [out, r] in torch Linear layout;
    our weights are [in, out], so the delta is (B @ A)^T = A^T @ B^T.
    """
    with open(os.path.join(adapter_path, "adapter_config.json"), encoding="utf-8") as f:
        acfg = json.load(f)
    scale = float(acfg.get("lora_alpha", 16)) / float(acfg.get("r", 8))
    tensors = _load_adapter_tensors(adapter_path)

    # group A/B by module prefix
    pairs = {}
    for name, arr in tensors.items():
        m = re.match(r"(.*)\.lora_(A|B)\.weight$", name)
        if not m:
            continue
        prefix, which = m.group(1), m.group(2)
        pairs.setdefault(prefix, {})[which] = np.asarray(arr, np.float32)

    deltas = {}  # (layer_idx, our_suffix) -> np delta [in, out]
    for prefix, ab in pairs.items():
        if "A" not in ab or "B" not in ab:
            continue
        lm = re.search(r"layers?\.(\d+)\.", prefix) or re.search(r"\.h\.(\d+)\.", prefix)
        layer_idx = int(lm.group(1)) if lm else None
        module = prefix.rsplit(".", 1)[-1]
        suffix = _TARGET_MAP.get(family, {}).get(module, module)
        if suffix is None:
            continue
        delta = (ab["B"] @ ab["A"]).T * scale  # [in, out]
        deltas[(layer_idx, suffix)] = delta

    layer_key = {"llama": "layers", "opt": "layers", "gpt2": "h"}[family]

    def apply(params):
        import jax

        def leaf_fn(path, leaf):
            name = "/".join(
                str(getattr(k, "key", getattr(k, "idx", k))) for k in path
            )
            lm = re.search(rf"{layer_key}/(\d+)/", name)
            layer_idx = int(lm.group(1)) if lm else None
            for (di, suffix), delta in deltas.items():
                if di == layer_idx and name.endswith(suffix):
                    if leaf.shape == delta.shape:
                        return (leaf.astype(jnp.float32) + delta).astype(leaf.dtype)
            return leaf

        return jax.tree_util.tree_map_with_path(leaf_fn, params)

    return apply(params)
