"""Reference-compatible ``lm_eval.metrics`` (reference lm_eval/metrics.py)."""

from llm_lns_quantization_tpu.harness.metrics import *  # noqa: F401,F403
from llm_lns_quantization_tpu.harness.metrics import (  # noqa: F401
    bits_per_byte,
    bleu,
    bootstrap_stderr,
    chrf,
    f1_score,
    matthews_corrcoef,
    mean,
    mean_stderr,
    median,
    perplexity,
    ter,
    weighted_mean,
    weighted_perplexity,
)
