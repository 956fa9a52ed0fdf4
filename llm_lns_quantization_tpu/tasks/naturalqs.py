"""Natural Questions (long-answer formatting; eval unimplemented upstream).

Parity: reference lm_eval/tasks/naturalqs.py — the reference also raises
NotImplementedError for evaluation; kept for registry parity and few-shot
context reuse.

``naturalqs_gen`` (this repo, non-default key) completes the evaluation:
greedy generation scored with SQuAD-style EM/F1 against the annotated
short answers (or the YES/NO annotation), the standard short-answer NQ
metric family. Docs with no short answer and no yes/no annotation are
excluded from scoring (there is no gold text to compare against). See
PARITY.md "quac / naturalqs decision".
"""

from itertools import islice

from ..harness.api import rf
from ..harness.metrics import mean, squad_exact, squad_f1
from ..harness.task import Task


class NaturalQs(Task):
    VERSION = 0
    DATASET_PATH = "natural_questions"
    DATASET_NAME = None

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

    def fewshot_examples(self, k, rnd):
        # cap the enormous train split before sampling
        if self._training_docs is None:
            self._training_docs = list(islice(self.training_docs(), 0, 100000))
        return rnd.sample(self._training_docs, k)

    def doc_to_text(self, doc):
        return "Q: " + doc["question"]["text"] + "\n\n" + "A:"

    def should_decontaminate(self):
        return True

    def doc_to_decontamination_query(self, doc):
        return doc["question"]["text"]

    def doc_to_target(self, doc):
        long_answer_start = doc["annotations"]["long_answer"][0]["start_token"]
        long_answer_end = doc["annotations"]["long_answer"][0]["end_token"]
        long_answer_span = doc["document"]["tokens"]["token"][
            long_answer_start:long_answer_end
        ]
        long_answer_is_html = doc["document"]["tokens"]["is_html"][
            long_answer_start:long_answer_end
        ]
        long_answer_chars = [
            tok
            for (tok, is_html) in zip(long_answer_span, long_answer_is_html)
            if not is_html
        ]
        return " ".join(long_answer_chars)

    def construct_requests(self, doc, ctx):
        raise NotImplementedError("Evaluation not implemented")

    def process_results(self, doc, results):
        raise NotImplementedError("Evaluation not implemented")

    def aggregation(self):
        raise NotImplementedError("Evaluation not implemented")

    def higher_is_better(self):
        raise NotImplementedError("Evaluation not implemented")


def _short_answer_golds(doc):
    """Gold strings for short-answer scoring: annotated short-answer texts
    plus the YES/NO annotation when present. Empty list = unscorable doc."""
    golds = []
    ann = doc["annotations"]
    for sa in ann.get("short_answers", []):
        golds.extend(t for t in sa.get("text", []) if t)
    for yn in ann.get("yes_no_answer", []):
        if yn in ("YES", "NO"):
            golds.append(yn.capitalize())
    return golds


class NaturalQsGen(NaturalQs):
    """Completed-evaluation Natural Questions (registry key
    ``naturalqs_gen``): short-answer EM/F1 over greedy generations.

    The prompt (``Q: …\\n\\nA:``) is inherited from the parity-faithful
    ``naturalqs``; the target for few-shot examples is the first short
    answer rather than the long-answer span (generating a whole long-answer
    passage under a greedy decode is not a measurable contract).
    """

    VERSION = 0

    def training_docs(self):
        if self._training_docs is None:
            self._training_docs = [
                d for d in islice(self.dataset["train"], 0, 100000)
                if _short_answer_golds(d)
            ]
        return self._training_docs

    def fewshot_examples(self, k, rnd):
        return rnd.sample(self.training_docs(), k)

    def validation_docs(self):
        return (d for d in self.dataset["validation"] if _short_answer_golds(d))

    def doc_to_target(self, doc):
        return " " + _short_answer_golds(doc)[0]

    def construct_requests(self, doc, ctx):
        return rf.greedy_until(ctx, {"until": ["\n"]})

    def process_results(self, doc, results):
        pred = results[0]
        golds = _short_answer_golds(doc)
        return {
            "em": max(float(squad_exact(g, pred)) for g in golds),
            "f1": max(float(squad_f1(g, pred)) for g in golds),
        }

    def aggregation(self):
        return {"em": mean, "f1": mean}

    def higher_is_better(self):
        return {"em": True, "f1": True}
