"""NQ-Open open-domain QA (greedy generation, normalized exact match).

Parity: reference lm_eval/tasks/nqopen.py.
"""

import re
import string

from ..harness.api import rf
from ..harness.metrics import mean
from ..harness.task import Task


class NQOpen(Task):
    VERSION = 0
    DATASET_PATH = "nq_open"
    DATASET_NAME = None

    def has_training_docs(self):
        return True

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    def training_docs(self):
        return self.dataset["train"]

    def validation_docs(self):
        return self.dataset["validation"]

    def doc_to_text(self, doc):
        return f"Q: {doc['question']}\nA:"

    def should_decontaminate(self):
        return True

    def doc_to_decontamination_query(self, doc):
        return doc["question"]

    def doc_to_target(self, doc):
        return " " + doc["answer"][0]

    def construct_requests(self, doc, ctx):
        return rf.greedy_until(ctx, {"until": ["\n", ".", ","]})

    def _normalize_answer(self, text):
        text = text.strip().lower().translate(str.maketrans("", "", string.punctuation))
        text = re.sub(r"\b(a|an|the)\b", " ", text)
        return " ".join(text.split())

    def process_results(self, doc, results):
        continuation = self._normalize_answer(results[0])
        answers = [self._normalize_answer(answer) for answer in doc["answer"]]
        return {"em": float(continuation in answers)}

    def aggregation(self):
        return {"em": mean}

    def higher_is_better(self):
        return {"em": True}
