"""QuAC question answering in context (eval unimplemented upstream).

Parity: reference lm_eval/tasks/quac.py — the reference also raises
NotImplementedError for requests/metrics; kept for registry parity.

``quac_gen`` (this repo, non-default key) completes the evaluation the
reference never defined: greedy generation with a newline stop, scored
with SQuAD-style normalized exact match and token F1 against the gold
answer (QuAC's own official metric family). See PARITY.md "quac /
naturalqs decision".
"""

from ..harness.api import rf
from ..harness.metrics import mean, squad_exact, squad_f1
from ..harness.task import Task


class QuAC(Task):
    VERSION = 0
    DATASET_PATH = "quac"
    DATASET_NAME = None

    def has_training_docs(self):
        return True

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    def training_docs(self):
        if self._training_docs is None:
            self._training_docs = list(map(self._process_doc, self.dataset["train"]))
        return self._training_docs

    def validation_docs(self):
        return map(self._process_doc, self.dataset["validation"])

    def _process_doc(self, doc):
        # copy: mutating the source doc would compound the title suffix when
        # docs are iterated more than once (determinism contract test)
        doc = dict(doc)
        doc["title"] = doc["title"] + " - " + doc["section_title"]
        return doc

    def doc_to_text(self, doc):
        return (
            "TITLE: " + doc["title"] + "\n"
            + "PARAGRAPH: " + doc["paragraph"] + "\n\n"
            + "Q: " + doc["question"] + "\n\n"
            + "A: "
        )

    def should_decontaminate(self):
        return True

    def doc_to_decontamination_query(self, doc):
        return doc["paragraph"]

    def doc_to_target(self, doc):
        return doc["answer"]

    def construct_requests(self, doc, ctx):
        raise NotImplementedError("Evaluation not implemented")

    def process_results(self, doc, results):
        raise NotImplementedError("Evaluation not implemented")

    def aggregation(self):
        raise NotImplementedError("Evaluation not implemented")

    def higher_is_better(self):
        raise NotImplementedError("Evaluation not implemented")


class QuACGen(QuAC):
    """Completed-evaluation QuAC (registry key ``quac_gen``).

    The prompt surface is inherited unchanged from the parity-faithful
    ``quac``; only the request/metric layer is new. ``CANNOTANSWER`` golds
    are scored like any other answer string (the model must literally
    produce it), matching the official QuAC scorer's treatment of
    no-answer as a span.
    """

    VERSION = 0

    def construct_requests(self, doc, ctx):
        return rf.greedy_until(ctx, {"until": ["\n"]})

    def process_results(self, doc, results):
        pred = results[0]
        golds = doc["answer"] if isinstance(doc["answer"], list) else [doc["answer"]]
        return {
            "em": max(float(squad_exact(g, pred)) for g in golds),
            "f1": max(float(squad_f1(g, pred)) for g in golds),
        }

    def aggregation(self):
        return {"em": mean, "f1": mean}

    def higher_is_better(self):
        return {"em": True, "f1": True}
