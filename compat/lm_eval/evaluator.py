"""Reference-compatible ``lm_eval.evaluator`` (reference lm_eval/evaluator.py:
simple_evaluate :17, evaluate :152, make_table :404)."""

from llm_lns_quantization_tpu.harness.evaluator import (  # noqa: F401
    evaluate,
    make_table,
    simple_evaluate,
)
