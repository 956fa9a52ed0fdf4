"""Reference-compatible ``lm_eval.decontamination.decontaminate``."""

from llm_lns_quantization_tpu.decontamination.decontaminate import (  # noqa: F401
    get_train_overlap,
)
