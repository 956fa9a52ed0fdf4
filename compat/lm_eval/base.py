"""Reference-compatible ``lm_eval.base`` (reference lm_eval/base.py).

``BaseLM`` — the reference's token-level HF engine (base.py:121-472) — maps
to the TPU engine ``TPULM``; the other names are exact-contract equivalents.
"""

from llm_lns_quantization_tpu.harness.api import (  # noqa: F401
    LM,
    REQUEST_RETURN_LENGTHS,
    CacheHook,
    Request,
    RequestFactory,
    rf,
)
from llm_lns_quantization_tpu.harness.cache import (  # noqa: F401
    CachingLM,
    hash_args,
)
from llm_lns_quantization_tpu.harness.task import (  # noqa: F401
    MultipleChoiceTask,
    PerplexityTask,
    Task,
)
from llm_lns_quantization_tpu.lm.tpu_lm import TPULM as BaseLM  # noqa: F401
