"""The ``lm_eval`` import-compatibility layer: reference driver scripts
(``import lm_eval``; the reference's setup.py installs that package name)
must run unchanged against this framework.

The shim lives in ``compat/lm_eval`` and installs as ``lm_eval`` via
setup.py's ``package_dir`` — it is deliberately NOT importable from the repo
root, because the oracle-parity suites (test_reference_*.py) import the
REFERENCE checkout's real ``lm_eval`` from /root/reference and a root-level
package would shadow it. These tests therefore import the shim hermetically:
compat/ goes on sys.path only inside the context manager, and any
``lm_eval*`` modules (ours or the reference's) present before are restored
afterwards, so test ordering cannot leak one side's modules into the other.
"""

import contextlib
import json
import sys
from pathlib import Path

import numpy as np

from fixtures import FIXTURE_DOCS

COMPAT = str(Path(__file__).resolve().parent.parent / "compat")


@contextlib.contextmanager
def compat_lm_eval():
    saved = {k: v for k, v in sys.modules.items() if k.split(".")[0] == "lm_eval"}
    for k in saved:
        del sys.modules[k]
    sys.path.insert(0, COMPAT)
    try:
        import lm_eval

        yield lm_eval
    finally:
        sys.path.remove(COMPAT)
        for k in [k for k in sys.modules if k.split(".")[0] == "lm_eval"]:
            del sys.modules[k]
        sys.modules.update(saved)


def test_reference_style_driver_runs(tmp_path):
    # the exact idiom of the reference's README / main.py:69-84
    for task in ("piqa", "boolq"):
        (tmp_path / task).mkdir()
        for split, docs in FIXTURE_DOCS[task].items():
            (tmp_path / task / f"{split}.json").write_text(json.dumps(docs))

    with compat_lm_eval():
        from lm_eval import evaluator, models, tasks

        lm = models.get_model("dummy")()
        task_dict = tasks.get_task_dict(["piqa", "boolq"],
                                        data_dir=str(tmp_path))
        results = evaluator.evaluate(
            lm=lm, task_dict=task_dict, num_fewshot=0, limit=4,
            bootstrap_iters=10,
        )
        assert set(results["results"]) == {"piqa", "boolq"}
        assert np.isfinite(results["results"]["piqa"]["acc"])
        table = evaluator.make_table(results)
        assert "piqa" in table


def test_base_names_match_reference_surface():
    with compat_lm_eval():
        import lm_eval.base as base

        # the names reference code imports from lm_eval.base (base.py:21-998)
        for name in ("LM", "BaseLM", "Task", "MultipleChoiceTask",
                     "PerplexityTask", "rf", "Request", "RequestFactory",
                     "CachingLM", "CacheHook", "hash_args",
                     "REQUEST_RETURN_LENGTHS"):
            assert hasattr(base, name), name
        # rf builds typed requests exactly as the reference DSL
        req = base.rf.loglikelihood("ctx", " cont")
        assert type(req).__name__ == "Request"

        from lm_eval.models import MODEL_REGISTRY
        # every key of the reference's MODEL_REGISTRY (models/__init__.py:8-22)
        for key in ("hf", "hf-causal", "hf-causal-experimental", "hf-seq2seq",
                    "gpt2", "gpt3", "anthropic", "textsynth", "dummy"):
            assert key in MODEL_REGISTRY, key

        from lm_eval.utils import get_rolling_token_windows, pattern_match
        assert pattern_match(["lambada_openai"], ["lambada_openai", "x"]) == [
            "lambada_openai"
        ]
        assert callable(get_rolling_token_windows)

        from lm_eval.metrics import mean, perplexity, weighted_perplexity
        assert mean([1.0, 3.0]) == 2.0 and callable(perplexity)
        assert callable(weighted_perplexity)
