"""Template: add a new task.

Equivalent of the reference's templates/new_task.py — copy into
llm_lns_quantization_tpu/tasks/, fill in the TODOs, register it in
tasks/__init__.py.
"""

from llm_lns_quantization_tpu.harness.api import rf
from llm_lns_quantization_tpu.harness.metrics import mean
from llm_lns_quantization_tpu.harness.task import Task


class NewTask(Task):
    VERSION = 0
    # HF datasets path, or rely on --data_dir offline JSON fixtures
    DATASET_PATH = "TODO"
    DATASET_NAME = None

    def has_training_docs(self):
        return True  # TODO

    def has_validation_docs(self):
        return True  # TODO

    def has_test_docs(self):
        return False  # TODO

    def training_docs(self):
        if self._training_docs is None:
            self._training_docs = list(map(self._process_doc, self.dataset["train"]))
        return self._training_docs

    def validation_docs(self):
        return map(self._process_doc, self.dataset["validation"])

    def _process_doc(self, doc):
        # TODO: normalize the raw doc into prompt-ready fields
        return doc

    def doc_to_text(self, doc):
        # TODO: the prompt (no trailing space — the space belongs to the target)
        return doc["question"]

    def doc_to_target(self, doc):
        # TODO: target continuation, leading space included
        return " " + doc["answer"]

    def construct_requests(self, doc, ctx):
        ll, is_greedy = rf.loglikelihood(ctx, self.doc_to_target(doc))
        return ll, is_greedy

    def process_results(self, doc, results):
        ll, is_greedy = results
        return {"acc": int(is_greedy)}

    def aggregation(self):
        return {"acc": mean}

    def higher_is_better(self):
        return {"acc": True}
