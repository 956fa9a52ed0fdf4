"""GSM8K grade-school math (free-form generation, #### answer extraction).

Parity target: reference lm_eval/tasks/gsm8k.py — same prompt, stop
sequences and answer regex.
"""

import re

from ..harness.api import rf
from ..harness.metrics import mean
from ..harness.task import Task

ANS_RE = re.compile(r"#### (\-?[0-9\.\,]+)")
INVALID_ANS = "[invalid]"


class GradeSchoolMath8K(Task):
    VERSION = 0
    DATASET_PATH = "gsm8k"
    DATASET_NAME = "main"

    def has_training_docs(self):
        return True

    def has_validation_docs(self):
        return False

    def has_test_docs(self):
        return True

    def training_docs(self):
        return self.dataset["train"]

    def test_docs(self):
        return self.dataset["test"]

    def doc_to_text(self, doc):
        return "Question: " + doc["question"] + "\nAnswer:"

    def doc_to_target(self, doc):
        return " " + doc["answer"]

    def construct_requests(self, doc, ctx):
        return rf.greedy_until(ctx, {"until": [":", "Question:", "Question"]})

    def _extract_answer(self, completion):
        match = ANS_RE.search(completion)
        if match:
            return match.group(1).strip().replace(",", "")
        return INVALID_ANS

    def _is_correct(self, completion, answer):
        gold = self._extract_answer(answer)
        assert gold != INVALID_ANS, "No ground truth answer found in the document."
        return self._extract_answer(completion) == gold

    def process_results(self, doc, results):
        completion = results[0]
        return {"acc": self._is_correct(completion, doc["answer"])}

    def aggregation(self):
        return {"acc": mean}

    def higher_is_better(self):
        return {"acc": True}
