"""MGSM: multilingual grade-school math (chain-of-thought generation).

Parity: reference lm_eval/tasks/mgsm.py (last-integer answer extraction,
per-language Question/Answer markers).
"""

import re

from ..harness.api import rf
from ..harness.metrics import mean
from ..harness.task import Task

ANS_RE = re.compile(r"(\-?\d+)")
INVALID_ANS = "[invalid]"

# lang -> (question marker, answer marker)
_LANGS = {
    "en": ("Question:", "Step-by-Step Answer:"),
    "es": ("Pregunta:", "Respuesta paso a paso:"),
    "fr": ("Question :", "Réponse étape par étape :"),
    "de": ("Frage:", "Schritt-für-Schritt-Antwort:"),
    "ru": ("Задача:", "Пошаговоерешение:"),
    "zh": ("问题:", "逐步解答:"),
    "ja": ("問題:", "ステップごとの答え:"),
    "th": ("โจทย์:", "คำตอบทีละขั้นตอน:"),
    "sw": ("Swali:", "Jibu la Hatua kwa Hatua:"),
    "bn": ("প্রশ্ন:", "ধাপে ধাপে উত্তর:"),
    "te": ("ప్రశ్న:", "దశలవారీగా సమాధానం:"),
}


class MGSM(Task):
    VERSION = 0
    DATASET_PATH = "juletxara/mgsm"
    DATASET_NAME = None
    QUESTION = "Question:"
    ANSWER = "Step-by-Step Answer:"

    def has_training_docs(self):
        return True

    def has_validation_docs(self):
        return False

    def has_test_docs(self):
        return True

    def training_docs(self):
        return self.dataset["train"]

    def test_docs(self):
        return self.dataset["test"]

    def doc_to_text(self, doc):
        # train docs carry the CoT answer inline; test docs only the number
        if doc["answer"] is not None:
            return doc["question"] + "\n" + self.ANSWER
        return self.QUESTION + " " + doc["question"] + "\n" + self.ANSWER

    def doc_to_target(self, doc):
        if doc["answer"] is not None:
            return " " + doc["answer"][len(self.ANSWER) + 1:]
        return " " + str(doc["answer_number"])

    def construct_requests(self, doc, ctx):
        return rf.greedy_until(ctx, {"until": ["\n", ":", self.QUESTION]})

    def _extract_answer(self, completion):
        match = re.findall(ANS_RE, completion)
        if match:
            return int(match[-1])
        return INVALID_ANS

    def _is_correct(self, completion, answer):
        assert answer != INVALID_ANS, "No ground truth answer found in the document."
        return self._extract_answer(completion) == answer

    def process_results(self, doc, results):
        return {"acc": self._is_correct(results[0], doc["answer_number"])}

    def aggregation(self):
        return {"acc": mean}

    def higher_is_better(self):
        return {"acc": True}


def create_task(lang):
    q, a = _LANGS[lang]
    return type(
        f"MGSM_{lang}", (MGSM,), {"DATASET_NAME": lang, "QUESTION": q, "ANSWER": a}
    )


def create_all_tasks():
    return {f"mgsm_{lang}": create_task(lang) for lang in _LANGS}
