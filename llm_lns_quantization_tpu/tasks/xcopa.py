"""XCOPA: cross-lingual COPA in 11 languages.

Parity: reference lm_eval/tasks/xcopa.py (per-language causal connectors).
"""

from .superglue import Copa

_LANGS = {
    "et": ("sest", "seetõttu"),
    "ht": ("poukisa", "donk sa"),
    "it": ("perché", "quindi"),
    "id": ("karena", "maka"),
    "qu": ("imataq", "chaymi"),
    "sw": ("kwa sababu", "kwa hiyo"),
    "zh": ("因为", "所以"),
    "ta": ("காரணமாக", "எனவே"),
    "th": ("เพราะ", "ดังนั้น"),
    "tr": ("çünkü", "bu yüzden"),
    "vi": ("bởi vì", "vì vậy"),
}


class XCopa(Copa):
    VERSION = 0
    DATASET_PATH = "xcopa"
    DATASET_NAME = None
    CAUSE = "because"
    EFFECT = "therefore"

    def has_training_docs(self):
        return False

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return True

    def validation_docs(self):
        return self.dataset["validation"]

    def test_docs(self):
        return self.dataset["test"]

    def doc_to_text(self, doc):
        connector = {"cause": self.CAUSE, "effect": self.EFFECT}[doc["question"]]
        return doc["premise"].strip()[:-1] + f" {connector}"


def create_task(lang):
    cause, effect = _LANGS[lang]
    cls = type(
        f"XCopa_{lang}",
        (XCopa,),
        {"DATASET_NAME": lang, "CAUSE": cause, "EFFECT": effect},
    )
    return cls


def create_all_tasks():
    return {f"xcopa_{lang}": create_task(lang) for lang in _LANGS}
