"""PubMedQA yes/no/maybe biomedical QA.

Parity: reference lm_eval/tasks/pubmedqa.py.
"""

import numpy as np

from ..harness.api import rf
from ..harness.metrics import mean
from ..harness.task import Task


class Pubmed_QA(Task):
    VERSION = 0
    DATASET_PATH = "bigbio/pubmed_qa"
    DATASET_NAME = "pubmed_qa_labeled_fold0_source"

    def has_training_docs(self):
        return True

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return True

    def training_docs(self):
        if self._training_docs is None:
            self._training_docs = self.dataset["train"]
        return self._training_docs

    def validation_docs(self):
        return self.dataset["validation"]

    def test_docs(self):
        return self.dataset["test"]

    def doc_to_text(self, doc):
        ctxs = "\n".join(doc["CONTEXTS"])
        return "Abstract: {}\nQuestion: {}\nAnswer:".format(ctxs, doc["QUESTION"])

    def should_decontaminate(self):
        return True

    def doc_to_decontamination_query(self, doc):
        return doc["QUESTION"] + " " + "\n".join(doc["CONTEXTS"])

    def doc_to_target(self, doc):
        return " {}".format(doc["final_decision"])

    def construct_requests(self, doc, ctx):
        ll_yes, _ = rf.loglikelihood(ctx, " yes")
        ll_no, _ = rf.loglikelihood(ctx, " no")
        ll_maybe, _ = rf.loglikelihood(ctx, " maybe")
        return ll_yes, ll_no, ll_maybe

    def process_results(self, doc, results):
        gold = doc["final_decision"]
        pred = np.argmax(results)
        return {"acc": ["yes", "no", "maybe"][pred] == gold}

    def aggregation(self):
        return {"acc": mean}

    def higher_is_better(self):
        return {"acc": True}
