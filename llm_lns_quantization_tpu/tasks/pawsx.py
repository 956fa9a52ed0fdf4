"""PAWS-X cross-lingual paraphrase identification (mGPT [MASK] prompt).

Parity: reference lm_eval/tasks/pawsx.py (including its asymmetric fr
verbalizers, which we reproduce as-is).
"""

from ..harness.api import rf
from ..harness.metrics import mean
from ..harness.task import Task

# lang -> (yes, no, question word)
_LANGS = {
    "en": ("Yes", "No", "right"),
    "de": ("Ja", "Nein", "richtig"),
    "fr": ("Oui", "No", "right"),
    "es": ("Sí", "No", "verdad"),
    "ja": ("はい", "いいえ", "ですね"),
    "ko": ("예", "아니요", "맞죠"),
    "zh": ("是", "不是", "对吧"),
}


class PAWSXBase(Task):
    VERSION = 0
    DATASET_PATH = "paws-x"
    DATASET_NAME = None
    YES = None
    NO = None
    QUESTION_WORD = None

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
        return (
            doc["sentence1"] + ", " + self.QUESTION_WORD + "? [MASK], " + doc["sentence2"]
        )

    def doc_to_target(self, doc):
        # label 1 = paraphrase (Yes), 0 = not (No); reference indexes [YES, NO]
        return " " + [self.YES, self.NO][doc["label"]]

    def doc_to_fewshot_prompt(self, doc):
        return self.doc_to_text(doc).replace("[MASK]", self.doc_to_target(doc)[1:])

    def fewshot_context(self, doc, num_fewshot, rnd=None, description=None):
        assert rnd is not None
        description = description + "\n\n" if description else ""
        if num_fewshot == 0:
            labeled_examples = ""
        else:
            fewshotex = self.fewshot_examples(k=num_fewshot, rnd=rnd)
            labeled_examples = (
                "\n\n".join(self.doc_to_fewshot_prompt(d) for d in fewshotex) + "\n\n"
            )
        return description + labeled_examples + self.doc_to_text(doc)

    def construct_requests(self, doc, ctx):
        ll_yes = rf.loglikelihood_rolling(ctx.replace("[MASK]", self.YES))
        ll_no = rf.loglikelihood_rolling(ctx.replace("[MASK]", self.NO))
        return ll_yes, ll_no

    def process_results(self, doc, results):
        ll_yes, ll_no = results
        return {"acc": (ll_yes > ll_no) == doc["label"]}

    def aggregation(self):
        return {"acc": mean}

    def higher_is_better(self):
        return {"acc": True}


def create_task(lang):
    yes, no, q = _LANGS[lang]
    return type(
        f"PAWSX_{lang}",
        (PAWSXBase,),
        {"DATASET_NAME": lang, "YES": yes, "NO": no, "QUESTION_WORD": q},
    )


def create_all_tasks():
    return {f"pawsx_{lang}": create_task(lang) for lang in _LANGS}
