"""Adversarial NLI rounds 1-3.

Parity target: reference lm_eval/tasks/anli.py:26-142.
"""

import numpy as np

from ..harness.api import rf
from ..harness.metrics import mean
from ..harness.task import Task


class ANLIBase(Task):
    VERSION = 0
    DATASET_PATH = "anli"
    DATASET_NAME = None
    SPLIT = None

    def has_training_docs(self):
        return True

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return True

    def training_docs(self):
        if self._training_docs is None:
            self._training_docs = list(self.dataset["train_r" + str(self.SPLIT)])
        return self._training_docs

    def validation_docs(self):
        return self.dataset["dev_r" + str(self.SPLIT)]

    def test_docs(self):
        return self.dataset["test_r" + str(self.SPLIT)]

    def doc_to_text(self, doc):
        return (
            doc["premise"]
            + "\nQuestion: "
            + doc["hypothesis"]
            + " True, False, or Neither?\nAnswer:"
        )

    def should_decontaminate(self):
        return True

    def doc_to_decontamination_query(self, doc):
        return doc["premise"]

    def doc_to_target(self, doc):
        # 0 = entailment (True), 1 = neutral (Neither), 2 = contradiction (False)
        return " " + ["True", "Neither", "False"][doc["label"]]

    def construct_requests(self, doc, ctx):
        ll_true, _ = rf.loglikelihood(ctx, " True")
        ll_neither, _ = rf.loglikelihood(ctx, " Neither")
        ll_false, _ = rf.loglikelihood(ctx, " False")
        return ll_true, ll_neither, ll_false

    def process_results(self, doc, results):
        return {"acc": np.argmax(results) == doc["label"]}

    def aggregation(self):
        return {"acc": mean}

    def higher_is_better(self):
        return {"acc": True}


class ANLIRound1(ANLIBase):
    SPLIT = 1


class ANLIRound2(ANLIBase):
    SPLIT = 2


class ANLIRound3(ANLIBase):
    SPLIT = 3
