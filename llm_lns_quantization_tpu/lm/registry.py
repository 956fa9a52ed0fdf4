"""LM adapter registry: string name -> LM class.

Equivalent of the reference's lm_eval/models/__init__.py:8-22 MODEL_REGISTRY.
The TPU-native engine (``tpu``, ``tpu-causal``) replaces the reference's
``hf-causal-experimental`` accelerate-sharded adapter; HTTP API adapters
(openai/anthropic/textsynth) keep their reference names.
"""

from typing import Dict, Type

from ..harness.api import LM


def _lazy(modname, clsname):
    def loader():
        import importlib

        mod = importlib.import_module(f"llm_lns_quantization_tpu.lm.{modname}")
        return getattr(mod, clsname)

    return loader


_REGISTRY = {
    "dummy": _lazy("dummy", "DummyLM"),
    "tpu": _lazy("tpu_lm", "TPULM"),
    "tpu-causal": _lazy("tpu_lm", "TPULM"),
    # reference-compatible aliases (the reference's hf-causal-experimental is
    # the adapter the quant experiments lived in; ours is the TPU engine).
    # "hf" and "gpt2" are the reference's legacy HFLM names
    # (models/__init__.py:8-22)
    "hf": _lazy("tpu_lm", "TPULM"),
    "gpt2": _lazy("tpu_lm", "TPULM"),
    "hf-causal": _lazy("tpu_lm", "TPULM"),
    "hf-causal-experimental": _lazy("tpu_lm", "TPULM"),
    "tpu-mlm": _lazy("tpu_mlm", "TPUMLM"),
    "bert": _lazy("tpu_mlm", "TPUMLM"),
    "tpu-seq2seq": _lazy("tpu_seq2seq", "TPUSeq2SeqLM"),
    "hf-seq2seq": _lazy("tpu_seq2seq", "TPUSeq2SeqLM"),
    "openai": _lazy("api_models", "OpenAICompletionsLM"),
    "gpt3": _lazy("api_models", "OpenAICompletionsLM"),
    "anthropic": _lazy("api_models", "AnthropicLM"),
    "textsynth": _lazy("api_models", "TextSynthLM"),
}


def get_model(name: str) -> Type[LM]:
    try:
        return _REGISTRY[name]()
    except KeyError:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(_REGISTRY)}"
        ) from None


def available_models():
    return sorted(_REGISTRY)
