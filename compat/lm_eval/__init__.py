"""Drop-in import-compatibility layer for reference (lm-evaluation-harness
v0.3.0 fork) users.

The reference framework is consumed as ``import lm_eval`` (its setup.py:6-14
installs the ``lm_eval`` package); this shim re-exports the TPU-native
implementations under the same module paths and names so existing driver
scripts — ``lm_eval.evaluator.simple_evaluate(...)``,
``lm_eval.tasks.get_task_dict(...)``, ``lm_eval.models.get_model(...)``,
``from lm_eval.base import rf, Task`` — run unchanged against this framework.
Everything here is a re-export; the implementations live in
``llm_lns_quantization_tpu`` (see README.md and PARITY.md).
"""

from . import base, evaluator, metrics, models, tasks, utils  # noqa: F401
