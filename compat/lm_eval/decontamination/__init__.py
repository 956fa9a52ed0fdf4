"""Reference-compatible ``lm_eval.decontamination`` package."""
