"""GLUE benchmark tasks (CoLA, SST-2, MNLI±, QNLI, WNLI, RTE, MRPC, QQP).

Parity target: reference lm_eval/tasks/glue.py — prompt formats, label
verbalizers and prediction rules are identical; the class plumbing is
factored through a small verbalized-choice base instead of per-task
copy-paste.
"""

import numpy as np

from ..harness.api import rf
from ..harness.metrics import f1_score, matthews_corrcoef, mean, yesno
from ..harness.task import Task
from ..utils import general_detokenize


class _GlueTask(Task):
    """train + validation splits, standard bookkeeping."""

    DATASET_PATH = "glue"

    def has_training_docs(self):
        return True

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    def training_docs(self):
        if self._training_docs is None:
            self._training_docs = list(self.dataset["train"])
        return self._training_docs

    def validation_docs(self):
        return self.dataset["validation"]


class _VerbalizedChoice(_GlueTask):
    """Score one loglikelihood per verbalizer; predict by the task rule."""

    VERBALIZERS = ()  # continuation strings, e.g. (" yes", " no")

    def construct_requests(self, doc, ctx):
        return [rf.loglikelihood(ctx, v)[0] for v in self.VERBALIZERS]


class CoLA(_VerbalizedChoice):
    VERSION = 0
    DATASET_NAME = "cola"
    VERBALIZERS = (" yes", " no")

    def doc_to_text(self, doc):
        return "{}\nQuestion: Does this sentence make sense?\nAnswer:".format(
            doc["sentence"]
        )

    def should_decontaminate(self):
        return True

    def doc_to_decontamination_query(self, doc):
        return doc["sentence"]

    def doc_to_target(self, doc):
        return " {}".format({1: "yes", 0: "no"}[doc["label"]])

    def process_results(self, doc, results):
        ll_true, ll_false = results
        return {"mcc": (doc["label"], ll_true > ll_false)}

    def higher_is_better(self):
        return {"mcc": True}

    def aggregation(self):
        return {"mcc": matthews_corrcoef}


class SST(_VerbalizedChoice):
    VERSION = 0
    DATASET_NAME = "sst2"
    VERBALIZERS = (" positive", " negative")

    def doc_to_text(self, doc):
        return "{}\nQuestion: Is this sentence positive or negative?\nAnswer:".format(
            general_detokenize(doc["sentence"]),
        )

    def doc_to_target(self, doc):
        return " {}".format({1: "positive", 0: "negative"}[doc["label"]])

    def process_results(self, doc, results):
        ll_positive, ll_negative = results
        return {"acc": (ll_positive > ll_negative) == doc["label"]}

    def higher_is_better(self):
        return {"acc": True}

    def aggregation(self):
        return {"acc": mean}


class MNLI(_VerbalizedChoice):
    VERSION = 0
    DATASET_NAME = "mnli"
    # label order: 0=entailment(True), 1=neutral(Neither), 2=contradiction(False);
    # request order matches the reference: True, Neither, False
    VERBALIZERS = (" True", " Neither", " False")

    def validation_docs(self):
        return self.dataset["validation_matched"]

    def test_docs(self):
        if self.has_test_docs():
            return self.dataset["test_matched"]

    def doc_to_text(self, doc):
        return "{}\nQuestion: {} True, False or Neither?\nAnswer:".format(
            doc["premise"],
            doc["hypothesis"].strip()
            + ("" if doc["hypothesis"].strip().endswith(".") else "."),
        )

    def doc_to_target(self, doc):
        return " {}".format({0: "True", 1: "Neither", 2: "False"}[doc["label"]])

    def process_results(self, doc, results):
        return {"acc": np.argmax(results) == doc["label"]}

    def higher_is_better(self):
        return {"acc": True}

    def aggregation(self):
        return {"acc": mean}


class MNLIMismatched(MNLI):
    VERSION = 0

    def validation_docs(self):
        return self.dataset["validation_mismatched"]

    def test_docs(self):
        if self.has_test_docs():
            return self.dataset["test_mismatched"]


class QNLI(_VerbalizedChoice):
    VERSION = 0
    DATASET_NAME = "qnli"
    VERBALIZERS = (" yes", " no")

    def doc_to_text(self, doc):
        return "{}\n{}\nQuestion: Does this response answer the question?\nAnswer:".format(
            doc["question"], doc["sentence"],
        )

    def doc_to_target(self, doc):
        # 0 = entailment (answers the question), 1 = not entailment
        return " {}".format({0: "yes", 1: "no"}[doc["label"]])

    def process_results(self, doc, results):
        ll_yes, ll_no = results
        return {"acc": (ll_no > ll_yes) == doc["label"]}

    def higher_is_better(self):
        return {"acc": True}

    def aggregation(self):
        return {"acc": mean}


class WNLI(_VerbalizedChoice):
    VERSION = 1
    DATASET_NAME = "wnli"
    VERBALIZERS = (" True", " False")

    def doc_to_text(self, doc):
        return "{}\nQuestion: {} True or False?\nAnswer:".format(
            doc["sentence1"], doc["sentence2"],
        )

    def doc_to_target(self, doc):
        # 1 = entailment (True)
        return " {}".format({0: "False", 1: "True"}[doc["label"]])

    def process_results(self, doc, results):
        ll_true, ll_false = results
        return {"acc": (ll_true > ll_false) == doc["label"]}

    def higher_is_better(self):
        return {"acc": True}

    def aggregation(self):
        return {"acc": mean}


class RTE(_VerbalizedChoice):
    VERSION = 0
    DATASET_NAME = "rte"
    VERBALIZERS = (" True", " False")

    def doc_to_text(self, doc):
        return "{}\nQuestion: {} True or False?\nAnswer:".format(
            doc["sentence1"], doc["sentence2"],
        )

    def doc_to_target(self, doc):
        # 0 = entailment (True), 1 = not entailment (False)
        return " {}".format({0: "True", 1: "False"}[doc["label"]])

    def process_results(self, doc, results):
        ll_true, ll_false = results
        return {"acc": (ll_false > ll_true) == doc["label"]}

    def higher_is_better(self):
        return {"acc": True}

    def aggregation(self):
        return {"acc": mean}


class MRPC(_VerbalizedChoice):
    VERSION = 0
    DATASET_NAME = "mrpc"
    VERBALIZERS = (" yes", " no")

    def doc_to_text(self, doc):
        return (
            "Sentence 1: {}\nSentence 2: {}\nQuestion: Do both sentences "
            "mean the same thing?\nAnswer:".format(
                general_detokenize(doc["sentence1"]),
                general_detokenize(doc["sentence2"]),
            )
        )

    def doc_to_target(self, doc):
        return " {}".format(yesno(doc["label"]))

    def process_results(self, doc, results):
        ll_yes, ll_no = results
        gold = doc["label"]
        pred = ll_yes > ll_no
        return {"acc": pred == gold, "f1": (gold, pred)}

    def higher_is_better(self):
        return {"acc": True, "f1": True}

    def aggregation(self):
        return {"acc": mean, "f1": f1_score}


class QQP(_VerbalizedChoice):
    VERSION = 0
    DATASET_NAME = "qqp"
    VERBALIZERS = (" yes", " no")

    def doc_to_text(self, doc):
        return (
            "Question 1: {}\nQuestion 2: {}\nQuestion: Do both questions "
            "ask the same thing?\nAnswer:".format(
                doc["question1"], doc["question2"],
            )
        )

    def doc_to_target(self, doc):
        return " {}".format(yesno(doc["label"]))

    def process_results(self, doc, results):
        ll_yes, ll_no = results
        gold = doc["label"]
        pred = ll_yes > ll_no
        return {"acc": pred == gold, "f1": (gold, pred)}

    def higher_is_better(self):
        return {"acc": True, "f1": True}

    def aggregation(self):
        return {"acc": mean, "f1": f1_score}
