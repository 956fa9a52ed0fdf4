"""JAX model zoo: architectures, tokenizers, checkpoint loading.

``build_model`` is the single entry point the LM engine uses: it returns a
``ModelBundle`` of (config, params, forward fn, cache init fn) for a model
family + preset or local HF checkpoint, with weight-path quantization already
applied (the reference did this as an in-place rewrite after model load,
huggingface.py:1726-1763).
"""

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax

from ..quant.apply import ActQuantizer, quantize_weights
from ..quant.config import QuantConfig
from . import bert as bert_mod
from . import bloom as bloom_mod
from . import gpt2 as gpt2_mod
from . import gptj as gptj_mod
from . import llama as llama_mod
from . import neo as neo_mod
from . import neox as neox_mod
from . import opt as opt_mod
from . import t5 as t5_mod


@dataclass
class ModelBundle:
    family: str
    cfg: Any
    params: Any
    forward: Callable  # forward(params, cfg, tokens, actq, cache=None, cache_index=None)
    init_cache: Callable  # init_cache(cfg, batch, max_len)
    max_length: int
    quant_sites: tuple
    is_seq2seq: bool = False  # T5-style: forward(params, cfg, enc_tokens, dec_tokens, ...)
    is_encoder: bool = False  # BERT-style: bidirectional, no decode; scored via PLL


_FAMILIES = {
    "bert": (bert_mod, "BertConfig"),
    "bloom": (bloom_mod, "BloomConfig"),
    "gpt2": (gpt2_mod, "GPT2Config"),
    "gptj": (gptj_mod, "GPTJConfig"),
    "llama": (llama_mod, "LlamaConfig"),
    "neo": (neo_mod, "NeoConfig"),
    "neox": (neox_mod, "NeoXConfig"),
    "opt": (opt_mod, "OPTConfig"),
    "t5": (t5_mod, "T5Config"),
}


def build_model(
    family: str = "gpt2",
    preset: str = "tiny",
    checkpoint: Optional[str] = None,
    dtype: Any = None,
    quant: Optional[QuantConfig] = None,
    seed: int = 0,
    config_overrides: Optional[dict] = None,
    peft: Optional[str] = None,
) -> ModelBundle:
    if family not in _FAMILIES:
        raise ValueError(f"unknown model family {family!r}; have {sorted(_FAMILIES)}")
    mod, cfg_name = _FAMILIES[family]
    cfg_cls = getattr(mod, cfg_name)

    kw = dict(config_overrides or {})
    if dtype is not None:
        kw["dtype"] = dtype

    if checkpoint is not None:
        from .hf_loader import load_checkpoint

        cfg, params = load_checkpoint(family, checkpoint, **kw)
    else:
        cfg = getattr(cfg_cls, preset)(**kw)
        params = mod.init_params(jax.random.PRNGKey(seed), cfg)

    if peft is not None:
        # merge the LoRA adapter BEFORE quantization — matching the
        # reference's ordering (PEFT attach at huggingface.py:273-277, quant
        # blocks after)
        from .lora import merge_lora

        params = merge_lora(params, family, peft)

    if quant is not None and quant.skip_act_sites:
        # a typo'd askip: site (e.g. 'askip:lmhead') would silently leave the
        # intended site quantized and benchmark a different config than
        # labeled (ADVICE.md r3)
        unknown = set(quant.skip_act_sites) - set(mod.QUANT_SITES)
        if unknown:
            raise ValueError(
                f"askip: names {sorted(unknown)} are not activation-quant "
                f"sites of family {family!r}; QUANT_SITES = "
                f"{sorted(mod.QUANT_SITES)}")
    if quant is not None and quant.fuse_proj:
        fuse = getattr(mod, "fuse_projections", None)
        if fuse is None:
            raise ValueError(
                f"quant spec requests 'fuse' but family {family!r} has no "
                "fused serving layout (llama only; gpt2's c_attn is already "
                "a fused QKV)")
        params = fuse(params)
    if quant is not None and quant.weights:
        params = quantize_weights(params, quant)

    max_length = (
        getattr(cfg, "n_positions", None)
        or getattr(cfg, "max_position_embeddings", None)
        or 512  # T5: relative positions, no hard cap; HF uses 512 for eval
    )
    return ModelBundle(
        family=family,
        cfg=cfg,
        params=params,
        forward=mod.forward,
        init_cache=mod.init_cache,
        max_length=max_length,
        quant_sites=mod.QUANT_SITES,
        is_seq2seq=(family == "t5"),
        is_encoder=(family == "bert"),
    )


__all__ = ["ModelBundle", "build_model", "ActQuantizer", "QuantConfig"]
