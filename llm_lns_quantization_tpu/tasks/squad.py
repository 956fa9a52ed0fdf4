"""SQuAD 2.0 (generation + unanswerable detection).

Parity: reference lm_eval/tasks/squad.py. The reference delegates scoring to
``datasets.load_metric("squad_v2")`` (a hub download); the same metric is
implemented locally here (SQuAD v2 official semantics: no-answer threshold
1.0, per-question best-over-gold exact/F1, HasAns/NoAns splits).
"""

from math import exp

from ..harness.api import rf
from ..harness.metrics import _normalize_answer, squad_exact, squad_f1
from ..harness.task import Task


def _squad_metric(predictions, references, no_ans_threshold=1.0):
    """Local squad_v2-compatible compute() over (prediction, reference) pairs."""
    exact_scores, f1_scores = [], []
    has_ans_exact, has_ans_f1 = [], []
    no_ans_exact, no_ans_f1 = [], []
    for pred, ref in zip(predictions, references):
        gold_answers = [a for a in ref["answers"]["text"] if _normalize_answer(a)]
        has_answer = bool(gold_answers)
        pred_text = pred["prediction_text"]
        predicts_no_answer = pred["no_answer_probability"] > no_ans_threshold
        if has_answer:
            if predicts_no_answer:
                em = f1 = 0.0
            else:
                em = max(squad_exact(g, pred_text) for g in gold_answers)
                f1 = max(squad_f1(g, pred_text) for g in gold_answers)
            has_ans_exact.append(em)
            has_ans_f1.append(f1)
        else:
            em = f1 = float(
                predicts_no_answer or _normalize_answer(pred_text) == ""
            )
            no_ans_exact.append(em)
            no_ans_f1.append(f1)
        exact_scores.append(em)
        f1_scores.append(f1)

    def avg(xs):
        return 100.0 * sum(xs) / len(xs) if xs else 0.0

    return {
        "exact": avg(exact_scores),
        "f1": avg(f1_scores),
        "HasAns_exact": avg(has_ans_exact),
        "HasAns_f1": avg(has_ans_f1),
        "NoAns_exact": avg(no_ans_exact),
        "NoAns_f1": avg(no_ans_f1),
        "best_exact": avg(exact_scores),
        "best_f1": avg(f1_scores),
    }


def _squad_agg(key, items):
    predictions, references = zip(*items)
    return _squad_metric(predictions, references).get(key, 0)


class SQuAD2(Task):
    VERSION = 1
    DATASET_PATH = "squad_v2"
    DATASET_NAME = None

    def has_training_docs(self):
        return True

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    def training_docs(self):
        return self.dataset["train"]

    def validation_docs(self):
        return self.dataset["validation"]

    def doc_to_text(self, doc):
        return (
            "Title: " + doc["title"] + "\n\n"
            + "Background: " + doc["context"] + "\n\n"
            + "Question: " + doc["question"] + "\n\n"
            + "Answer:"
        )

    def should_decontaminate(self):
        return True

    def doc_to_decontamination_query(self, doc):
        return doc["context"]

    def doc_to_target(self, doc):
        answer_list = doc["answers"]["text"]
        answer = answer_list[0] if len(answer_list) > 0 else "unanswerable"
        return " " + answer

    def construct_requests(self, doc, ctx):
        continuation = rf.greedy_until(ctx, {"until": ["\n"]})
        is_unanswerable = rf.loglikelihood(ctx, " " + "unanswerable")
        return continuation, is_unanswerable

    def process_results(self, doc, results):
        continuation, (logprob_unanswerable, _) = results
        predictions = {
            "id": doc["id"],
            "prediction_text": continuation,
            "no_answer_probability": exp(logprob_unanswerable),
        }
        references = {"id": doc["id"], "answers": doc["answers"]}
        pair = (predictions, references)
        return {
            "exact": pair,
            "f1": pair,
            "HasAns_exact": pair,
            "HasAns_f1": pair,
            "NoAns_exact": pair,
            "NoAns_f1": pair,
            "best_exact": pair,
            "best_f1": pair,
        }

    def aggregation(self):
        from functools import partial

        return {
            k: partial(_squad_agg, k)
            for k in [
                "exact", "f1", "HasAns_exact", "HasAns_f1",
                "NoAns_exact", "NoAns_f1", "best_exact", "best_f1",
            ]
        }

    def higher_is_better(self):
        return {
            k: True
            for k in [
                "exact", "f1", "HasAns_exact", "HasAns_f1",
                "NoAns_exact", "NoAns_f1", "best_exact", "best_f1",
            ]
        }
