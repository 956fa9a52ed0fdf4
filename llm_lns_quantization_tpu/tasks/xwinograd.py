"""XWinograd: multilingual Winograd schemas (en/fr/jp/pt/ru/zh).

Parity: reference lm_eval/tasks/xwinograd.py.
"""

from .winogrande import Winogrande

_LANG = ["en", "fr", "jp", "pt", "ru", "zh"]


def create_task(lang):
    class XWinograd(Winogrande):
        DATASET_PATH = "Muennighoff/xwinograd"
        DATASET_NAME = lang

        def has_training_docs(self):
            return False

        def has_validation_docs(self):
            return False

        def has_test_docs(self):
            return True

        def training_docs(self):
            pass

        def validation_docs(self):
            pass

        def test_docs(self):
            return self.dataset["test"]

    XWinograd.__name__ = f"XWinograd_{lang}"
    return XWinograd


def create_all_tasks():
    return {f"xwinograd_{lang}": create_task(lang) for lang in _LANG}
