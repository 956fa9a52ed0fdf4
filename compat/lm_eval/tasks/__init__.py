"""Reference-compatible ``lm_eval.tasks`` (reference lm_eval/tasks/__init__.py:
TASK_REGISTRY :101-353, ALL_TASKS, get_task_dict :414-426)."""

from llm_lns_quantization_tpu.tasks import (  # noqa: F401
    ALL_TASKS,
    TASK_REGISTRY,
    get_task,
    get_task_dict,
    get_task_name_from_object,
)
