"""Reference-compatible ``lm_eval.utils`` (reference lm_eval/utils.py)."""

from llm_lns_quantization_tpu.utils import (  # noqa: F401
    MultiChoice,
    Reorderer,
    chunks,
    general_detokenize,
    get_rolling_token_windows,
    group,
    join_iters,
    make_disjoint_window,
    pattern_match,
    simple_parse_args_string,
)
