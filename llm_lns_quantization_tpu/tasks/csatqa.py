"""CSAT-QA: Korean college entrance exam MC (6 sections).

Parity: reference lm_eval/tasks/csatqa.py.
"""

from ..harness.task import MultipleChoiceTask

_SECTIONS = ["WR", "GR", "RCS", "RCSS", "RCH", "LI"]


class CSATQA(MultipleChoiceTask):
    VERSION = 0
    DATASET_PATH = "EleutherAI/csatqa"
    DATASET_NAME = None

    def has_training_docs(self):
        return False

    def has_validation_docs(self):
        return False

    def has_test_docs(self):
        return True

    def test_docs(self):
        return map(self._process_doc, self.dataset["test"])

    def _process_doc(self, doc):
        instruction = f"""다음을 읽고 정답으로 알맞은 것을 고르시요.
### Context: {doc["context"]}
### Question: {doc["question"]}
### Options:
(1) {doc['option#1']}\n(2) {doc["option#2"]}\n(3) {doc["option#3"]}\n(4) {doc['option#4']}\n(5) {doc['option#5']}
### Answer: 주어진 문제의 정답은"""
        return {
            "query": instruction,
            "choices": ["(1)", "(2)", "(3)", "(4)", "(5)"],
            "gold": int(doc["gold"]) - 1,
        }

    def doc_to_text(self, doc):
        return doc["query"]


def create_task(section):
    return type(f"CSATQA_{section}", (CSATQA,), {"DATASET_NAME": section})


def create_all_tasks():
    return {f"csatqa_{s.lower()}": create_task(s) for s in _SECTIONS}
