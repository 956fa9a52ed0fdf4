"""SCROLLS long-sequence benchmark (7 tasks).

Parity: reference lm_eval/tasks/scrolls.py. The reference downloads the
tau/scrolls metric script from the hub; here the metrics (multi-reference
SQuAD-style F1, ROUGE-1/2/L) are implemented locally so the suite runs
offline. Local ROUGE matches rouge_score's default up to Porter stemming
(not applied here).
"""

import re
from abc import abstractmethod
from functools import reduce

import numpy as np

from ..harness.api import rf
from ..harness.metrics import _normalize_answer, mean, squad_f1
from ..harness.task import Task


# ---------------------------------------------------------------------------
# local metric implementations
# ---------------------------------------------------------------------------


def _f1_over_refs(samples):
    """Mean over docs of max-over-references token F1."""
    vals = []
    for prediction, references in samples:
        vals.append(max(squad_f1(ref, prediction) for ref in references))
    return 100.0 * mean(vals)


def _rouge_n_score(pred_tokens, ref_tokens, n):
    def ngrams(toks):
        return [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    from collections import Counter

    p, r = Counter(ngrams(pred_tokens)), Counter(ngrams(ref_tokens))
    overlap = sum((p & r).values())
    if not p or not r:
        return 0.0
    prec = overlap / max(1, sum(p.values()))
    rec = overlap / max(1, sum(r.values()))
    return 2 * prec * rec / (prec + rec) if prec + rec else 0.0


def _lcs_len(a, b):
    dp = [0] * (len(b) + 1)
    for x in a:
        prev = 0
        for j, y in enumerate(b, 1):
            cur = dp[j]
            dp[j] = prev + 1 if x == y else max(dp[j], dp[j - 1])
            prev = cur
    return dp[-1]


def _rouge_l_score(pred_tokens, ref_tokens):
    if not pred_tokens or not ref_tokens:
        return 0.0
    lcs = _lcs_len(pred_tokens, ref_tokens)
    prec = lcs / len(pred_tokens)
    rec = lcs / len(ref_tokens)
    return 2 * prec * rec / (prec + rec) if prec + rec else 0.0


def _rouge(kind):
    def compute(samples):
        vals = []
        for prediction, references in samples:
            pt = _normalize_answer(prediction).split()
            scores = []
            for ref in references:
                rt = _normalize_answer(ref).split()
                if kind == "rougeL":
                    scores.append(_rouge_l_score(pt, rt))
                else:
                    scores.append(_rouge_n_score(pt, rt, int(kind[-1])))
            vals.append(max(scores) if scores else 0.0)
        return 100.0 * mean(vals)

    return compute


# ---------------------------------------------------------------------------
# tasks
# ---------------------------------------------------------------------------


def _process_doc_prepended_question(doc):
    # the question is prepended to the input, separated by "\n\n"
    input_ = doc["input"]
    split = input_.find("\n\n")
    return {
        "id": doc["id"],
        "pid": doc["pid"],
        "input": input_,
        "outputs": doc["outputs"],
        "question": input_[0:split],
        "text": input_[split + 2:],
    }


def _drop_duplicates_in_input(rows):
    """Merge rows sharing an id into one row with an ``outputs`` list."""
    out = []
    id_to_idx = {}
    for row in rows:
        if "outputs" in row:
            out.append(row)
            continue
        if row["id"] in id_to_idx:
            out[id_to_idx[row["id"]]]["outputs"].append(row["output"])
            continue
        id_to_idx[row["id"]] = len(out)
        new_row = {k: v for k, v in row.items() if k != "output"}
        new_row["outputs"] = [row["output"]]
        out.append(new_row)
    return out


class _SCROLLSTask(Task):
    VERSION = 0
    DATASET_PATH = "tau/scrolls"
    DATASET_NAME = None

    def has_training_docs(self):
        return True

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    def training_docs(self):
        for doc in self.dataset["train"]:
            yield from self._process_doc(doc)

    def validation_docs(self):
        for doc in self.dataset["validation"]:
            yield from self._process_doc(doc)

    def should_decontaminate(self):
        return True

    def doc_to_decontamination_query(self, doc):
        return doc["input"]

    def download(self, *args, **kwargs):
        super().download(*args, **kwargs)
        if isinstance(self.dataset, dict):
            self.dataset.pop("test", None)
            for split in list(self.dataset):
                self.dataset[split] = _drop_duplicates_in_input(
                    list(self.dataset[split])
                )

    def doc_to_target(self, doc):
        return " " + ", ".join(doc["outputs"])

    def doc_to_text(self, doc):
        return f"{doc['text']}\n\nQuestion: {doc['question']}\nAnswer:"

    def higher_is_better(self):
        return {x: True for x in self._scrolls_metrics().keys()}

    @abstractmethod
    def _scrolls_metrics(self):
        ...


class _SCROLLSMultipleChoiceTask(_SCROLLSTask):
    def _scrolls_metrics(self):
        return None

    def aggregation(self):
        return {"em": mean, "acc": mean, "acc_norm": mean}

    def higher_is_better(self):
        return {"em": True, "acc": True, "acc_norm": True}

    def process_results(self, doc, results):
        gold = doc["gold"]
        acc = 1.0 if np.argmax(results) == gold else 0.0
        completion_len = np.array([float(len(i)) for i in doc["choices"]])
        acc_norm = 1.0 if np.argmax(results / completion_len) == gold else 0.0
        return {"acc": acc, "acc_norm": acc_norm, "em": acc_norm * 100.0}

    def construct_requests(self, doc, ctx):
        return [
            rf.loglikelihood(ctx, " {}".format(choice))[0] for choice in doc["choices"]
        ]


class _SCROLLSSummaryTask(_SCROLLSTask):
    def _process_doc(self, doc):
        return [doc]

    def _scrolls_metrics(self):
        return {"rouge1": "rouge1", "rouge2": "rouge2", "rougeL": "rougeL"}

    def aggregation(self):
        return {k: _rouge(k) for k in self._scrolls_metrics()}

    def process_results(self, doc, results):
        return {
            "rouge1": (results[0], doc["outputs"]),
            "rouge2": (results[0], doc["outputs"]),
            "rougeL": (results[0], doc["outputs"]),
        }

    def construct_requests(self, doc, ctx):
        return [rf.greedy_until(ctx, {"until": ["\n"]})]

    def doc_to_text(self, doc):
        return (
            f"{doc['input']}\n\nQuestion: What is a summary of the preceding "
            "text?\nAnswer:"
        )


class Qasper(_SCROLLSTask):
    DATASET_NAME = "qasper"

    def _process_doc(self, doc):
        doc = _process_doc_prepended_question(doc)
        doc["is_yes_no"] = reduce(
            lambda prev, cur: prev and _normalize_answer(cur) in ["yes", "no"],
            doc["outputs"],
            True,
        )
        return [doc]

    def _scrolls_metrics(self):
        return {"f1": "f1"}

    def aggregation(self):
        return {"f1": _f1_over_refs}

    def process_results(self, doc, results):
        if doc["is_yes_no"]:
            prediction = " yes" if results[0] > results[1] else " no"
        elif len(results[0].strip()) == 0:
            prediction = "Unanswerable"
        else:
            prediction = results[0]
        return {"f1": (prediction, doc["outputs"])}

    def construct_requests(self, doc, ctx):
        if doc["is_yes_no"]:
            ll_yes, _ = rf.loglikelihood(ctx, " yes")
            ll_no, _ = rf.loglikelihood(ctx, " no")
            return [ll_yes, ll_no]
        return [rf.greedy_until(ctx, {"until": ["\n"]})]


class QuALITY(_SCROLLSMultipleChoiceTask):
    DATASET_NAME = "quality"
    _multiple_choice_pattern = re.compile(r" *\([A-D]\) *")

    @staticmethod
    def _normalize(text):
        return " ".join(text.split()).strip()

    def _process_doc(self, doc):
        doc = _process_doc_prepended_question(doc)
        split = doc["text"].find("\n\n", doc["text"].find("(D)"))
        choices_text = doc["text"][:split]
        doc["text"] = doc["text"][split:].strip()
        doc["choices"] = [
            QuALITY._normalize(choice)
            for choice in re.split(QuALITY._multiple_choice_pattern, choices_text)[1:]
        ]
        doc["gold"] = doc["choices"].index(QuALITY._normalize(doc["outputs"][0]))
        return [doc]


class NarrativeQA(_SCROLLSTask):
    DATASET_NAME = "narrative_qa"

    def _process_doc(self, doc):
        return [_process_doc_prepended_question(doc)]

    def _scrolls_metrics(self):
        return {"f1": "f1"}

    def aggregation(self):
        return {"f1": _f1_over_refs}

    def process_results(self, doc, results):
        return {"f1": (results[0], doc["outputs"])}

    def construct_requests(self, doc, ctx):
        return [rf.greedy_until(ctx, {"until": ["\n"]})]


class ContractNLI(_SCROLLSMultipleChoiceTask):
    DATASET_NAME = "contract_nli"
    CHOICES = ["Not mentioned", "Entailment", "Contradiction"]

    def _process_doc(self, doc):
        doc = _process_doc_prepended_question(doc)
        doc["choices"] = ContractNLI.CHOICES
        doc["gold"] = ContractNLI.CHOICES.index(doc["outputs"][0])
        return [doc]

    def doc_to_text(self, doc):
        return f"{doc['text']}\n\nHypothesis: {doc['question']}\nConclusion:"


class GovReport(_SCROLLSSummaryTask):
    DATASET_NAME = "gov_report"


class SummScreenFD(_SCROLLSSummaryTask):
    DATASET_NAME = "summ_screen_fd"


class QMSum(_SCROLLSSummaryTask):
    DATASET_NAME = "qmsum"

    def _process_doc(self, doc):
        return [_process_doc_prepended_question(doc)]

    def doc_to_text(self, doc):
        return f"{doc['text']}\n\nQuestion: {doc['question']}\nAnswer:"


def construct_tasks():
    return {
        "scrolls_qasper": Qasper,
        "scrolls_quality": QuALITY,
        "scrolls_narrativeqa": NarrativeQA,
        "scrolls_contractnli": ContractNLI,
        "scrolls_govreport": GovReport,
        "scrolls_summscreenfd": SummScreenFD,
        "scrolls_qmsum": QMSum,
    }
