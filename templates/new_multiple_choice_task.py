"""Template: add a new multiple-choice task.

Equivalent of the reference's templates/new_multiple_choice_task.py.
MultipleChoiceTask provides request construction (one loglikelihood per
choice) and acc / length-normalized acc_norm scoring — only doc plumbing is
needed.
"""

from llm_lns_quantization_tpu.harness.task import MultipleChoiceTask


class NewMultipleChoiceTask(MultipleChoiceTask):
    VERSION = 0
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
        return {
            # TODO: query/choices/gold from the raw doc schema
            "query": doc["question"],
            "choices": doc["choices"],
            "gold": doc["label"],
        }

    def doc_to_text(self, doc):
        return doc["query"]
