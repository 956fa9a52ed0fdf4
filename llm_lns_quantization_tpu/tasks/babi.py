"""bAbI toy reasoning tasks (exact-match generation).

Parity: reference lm_eval/tasks/babi.py.
"""

from ..harness.api import rf
from ..harness.metrics import mean
from ..harness.task import Task


class Babi(Task):
    VERSION = 0
    DATASET_PATH = "Muennighoff/babi"
    DATASET_NAME = None

    def has_training_docs(self):
        return True

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return True

    def training_docs(self):
        return self.dataset["train"]

    def validation_docs(self):
        return self.dataset.get("valid", self.dataset.get("validation"))

    def test_docs(self):
        return self.dataset["test"]

    def doc_to_text(self, doc):
        return doc["passage"] + doc["question"]

    def should_decontaminate(self):
        return False

    def doc_to_decontamination_query(self, doc):
        return f"Passage: {doc['passage']}\nQuestion: {doc['question']}\nAnswer:"

    def doc_to_target(self, doc):
        return " " + doc["answer"]

    def construct_requests(self, doc, ctx):
        # the reference's one legacy list-form until arg (babi.py:69); engines
        # accept both forms, and request-arg parity keeps cache keys aligned
        return rf.greedy_until(ctx, ["\n"])

    def process_results(self, doc, results):
        return {"em": doc["answer"].strip() == results[0].strip()}

    def aggregation(self):
        return {"em": mean}

    def higher_is_better(self):
        return {"em": True}
