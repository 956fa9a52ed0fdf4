"""XNLI cross-lingual NLI, 15 languages (XGLM/mGPT [MASK] prompt format).

Parity: reference lm_eval/tasks/xnli.py — full-sequence rolling likelihood
over the three verbalized completions, few-shot prompts use the resolved
mask.
"""

import numpy as np

from ..harness.api import rf
from ..harness.metrics import mean
from ..harness.task import Task

# lang -> (question word, entailment, neutral, contradiction)
_LANGS = {
    "en": ("right", "Yes", "Also", "No"),
    "de": ("richtig", "Ja", "Auch", "Nein"),
    "ar": ("صحيح", "نعم", "لذا", "رقم"),
    "bg": ("правилно", "да", "така", "не"),
    "el": ("σωστός", "Ναί", "Έτσι", "όχι"),
    "es": ("correcto", "Sí", "Asi que", "No"),
    "fr": ("correct", "Oui", "Aussi", "Non"),
    "hi": ("सही", "हाँ", "इसलिए", "नहीं"),
    "ru": ("правильно", "Да", "Так", "Нет"),
    "sw": ("sahihi", "Ndiyo", "Hivyo", "Hapana"),
    "th": ("ถูกต้อง", "ใช่", "ดังนั้น", "ไม่"),
    "tr": ("doğru", "Evet", "Böylece", "Hayır"),
    "ur": ("صحیح", "جی ہاں", "اس لئے", "نہیں"),
    "vi": ("đúng", "Vâng", "Vì vậy", "Không"),
    "zh": ("正确", "是的", "所以", "不是的"),
}


class XNLIBase(Task):
    VERSION = 0
    DATASET_PATH = "xnli"
    DATASET_NAME = None
    QUESTION_WORD = None
    ENTAILMENT_LABEL = None
    NEUTRAL_LABEL = None
    CONTRADICTION_LABEL = None

    def has_training_docs(self):
        return True

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return True

    def training_docs(self):
        return self.dataset["train"]

    def validation_docs(self):
        return self.dataset["validation"]

    def test_docs(self):
        return self.dataset["test"]

    def doc_to_text(self, doc):
        # [MASK] resolves to one of the three verbalizers per request
        return (
            doc["premise"] + ", " + self.QUESTION_WORD + "? [MASK], " + doc["hypothesis"]
        )

    def doc_to_target(self, doc):
        return " " + [
            self.ENTAILMENT_LABEL, self.NEUTRAL_LABEL, self.CONTRADICTION_LABEL
        ][doc["label"]]

    def doc_to_fewshot_prompt(self, doc):
        return self.doc_to_text(doc).replace("[MASK]", self.doc_to_target(doc)[1:])

    def fewshot_context(self, doc, num_fewshot, rnd=None, description=None):
        assert rnd is not None
        description = description + "\n\n" if description else ""
        if num_fewshot == 0:
            labeled_examples = ""
        else:
            if self.has_training_docs():
                fewshotex = self.fewshot_examples(k=num_fewshot, rnd=rnd)
            else:
                if self._fewshot_docs is None:
                    self._fewshot_docs = list(
                        self.validation_docs()
                        if self.has_validation_docs()
                        else self.test_docs()
                    )
                fewshotex = rnd.sample(self._fewshot_docs, num_fewshot + 1)
                fewshotex = [x for x in fewshotex if x != doc][:num_fewshot]
            labeled_examples = (
                "\n\n".join(self.doc_to_fewshot_prompt(d) for d in fewshotex) + "\n\n"
            )
        return description + labeled_examples + self.doc_to_text(doc)

    def construct_requests(self, doc, ctx):
        ll_true = rf.loglikelihood_rolling(ctx.replace("[MASK]", self.ENTAILMENT_LABEL))
        ll_neither = rf.loglikelihood_rolling(ctx.replace("[MASK]", self.NEUTRAL_LABEL))
        ll_false = rf.loglikelihood_rolling(
            ctx.replace("[MASK]", self.CONTRADICTION_LABEL)
        )
        return ll_true, ll_neither, ll_false

    def process_results(self, doc, results):
        return {"acc": np.argmax(results) == doc["label"]}

    def aggregation(self):
        return {"acc": mean}

    def higher_is_better(self):
        return {"acc": True}


def create_task(lang):
    q, ent, neu, con = _LANGS[lang]
    return type(
        f"XNLI_{lang}",
        (XNLIBase,),
        {
            "DATASET_NAME": lang,
            "QUESTION_WORD": q,
            "ENTAILMENT_LABEL": ent,
            "NEUTRAL_LABEL": neu,
            "CONTRADICTION_LABEL": con,
        },
    )


def create_all_tasks():
    return {f"xnli_{lang}": create_task(lang) for lang in _LANGS}
