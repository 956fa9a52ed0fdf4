"""TriviaQA (rc.nocontext) — greedy generation scored by alias exact match.

Parity target: reference lm_eval/tasks/triviaqa.py (VERSION 3).
"""

import string

from ..harness.api import rf
from ..harness.metrics import mean
from ..harness.task import Task


class TriviaQA(Task):
    VERSION = 3
    DATASET_PATH = "trivia_qa"
    DATASET_NAME = "rc.nocontext"

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
        return f"Question: {doc['question']}\nAnswer:"

    def should_decontaminate(self):
        return True

    def doc_to_decontamination_query(self, doc):
        return doc["question"]

    def doc_to_target(self, doc):
        return " " + doc["answer"]["value"]

    def construct_requests(self, doc, ctx):
        return rf.greedy_until(ctx, {"until": ["\n", ".", ","]})

    def process_results(self, doc, results):
        continuation = (
            results[0].strip().lower().translate(str.maketrans("", "", string.punctuation))
        )
        list_of_candidates = [
            alias.lower().translate(str.maketrans("", "", string.punctuation))
            for alias in doc["answer"]["aliases"]
        ]
        return {"em": float(continuation in list_of_candidates)}

    def aggregation(self):
        return {"em": mean}

    def higher_is_better(self):
        return {"em": True}
