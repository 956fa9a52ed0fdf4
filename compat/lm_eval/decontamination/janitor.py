"""Reference-compatible ``lm_eval.decontamination.janitor``."""

from llm_lns_quantization_tpu.decontamination.janitor import (  # noqa: F401
    Janitor,
    form_ngrams,
    word_ngrams,
)
