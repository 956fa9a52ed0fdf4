"""XStoryCloze: StoryCloze translated to 10 non-English languages.

Parity: reference lm_eval/tasks/xstorycloze.py.
"""

from .storycloze import StoryCloze

_LANG = ["en", "ru", "zh", "es", "ar", "hi", "id", "te", "sw", "eu", "my"]


def create_task(lang):
    class XStoryCloze(StoryCloze):
        DATASET_PATH = "juletxara/xstory_cloze"
        DATASET_NAME = lang

        def has_training_docs(self):
            return True

        def has_validation_docs(self):
            return True

        def has_test_docs(self):
            return False

        def training_docs(self):
            return self.dataset["train"]

        def validation_docs(self):
            return self.dataset.get("eval", self.dataset.get("validation"))

    XStoryCloze.__name__ = f"XStoryCloze_{lang}"
    return XStoryCloze


def create_all_tasks():
    return {f"xstory_cloze_{lang}": create_task(lang) for lang in _LANG}
