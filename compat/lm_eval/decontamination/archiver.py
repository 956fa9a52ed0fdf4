"""Reference-compatible ``lm_eval.decontamination.archiver``."""

from llm_lns_quantization_tpu.decontamination.archiver import *  # noqa: F401,F403
