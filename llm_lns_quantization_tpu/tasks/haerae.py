"""HAE-RAE Bench: Korean knowledge/language MC (6 sections).

Parity: reference lm_eval/tasks/haerae.py.
"""

from ..harness.task import MultipleChoiceTask

_SECTIONS = ["HI", "KGK", "LW", "RC", "RW", "SN"]


class Haerae(MultipleChoiceTask):
    VERSION = 0
    DATASET_PATH = "amphora/haerae_bench"
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
        choices = [doc["o1"], doc["o2"], doc["o3"], doc["o4"]]
        if doc.get("o5") is not None:
            choices.append(doc["o5"])
        return {
            "query": doc["query"],
            "choices": choices,
            "gold": int(doc["gold"]) - 1,
        }

    def doc_to_text(self, doc):
        return doc["query"]


def create_task(section):
    return type(f"Haerae_{section}", (Haerae,), {"DATASET_NAME": section})


def create_all_tasks():
    return {f"haerae_{s.lower()}": create_task(s) for s in _SECTIONS}
