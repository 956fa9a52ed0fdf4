"""TPU-native LM evaluation harness with first-class quantization emulation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
pouya-haghi/LLM-LNS-Quantization (an lm-evaluation-harness v0.3.0 fork that adds
post-training-quantization emulation experiments): a few-shot LM evaluation
harness plus a complete, config-driven quantization layer covering LNS8/LNS4,
dynamic outlier-tiered LNS, FP8/FP4, MX block floating-point, ZeroQuant,
VSQuant, W8A8, SmoothQuant and LLM.int8().

Layout (see SURVEY.md for the reference layer map this mirrors):
  quant/            pure-JAX quantizer library + registry (replaces the
                    reference's comment-toggled blocks in
                    lm_eval/models/huggingface.py:273-1763)
  harness/          LM protocol, request DSL, sqlite cache, evaluator, metrics
  tasks/            task registry + task modules
  models/           JAX transformer definitions with explicit quant sites
  lm/               LM adapters (TPU engine, dummy, HTTP APIs)
  parallel/         device mesh + sharding rules (replaces HF accelerate)
  ops/              Pallas TPU kernels (fused dequant-matmul, int8 KV cache)
  decontamination/  13-gram overlap detection + C++ n-gram kernel
"""

__version__ = "0.1.0"
