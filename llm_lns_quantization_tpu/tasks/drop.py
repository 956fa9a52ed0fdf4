"""DROP discrete reasoning over paragraphs.

Parity: reference lm_eval/tasks/drop.py, which follows the official allennlp
DROP evaluator (bag-of-token alignment via the Hungarian algorithm, number
matching, article/punct normalization).
"""

import re
import string

import numpy as np

from ..harness.api import rf
from ..harness.metrics import mean
from ..harness.task import Task

_ARTICLES = re.compile(r"\b(a|an|the)\b", re.UNICODE)


class DROP(Task):
    VERSION = 1
    DATASET_PATH = "EleutherAI/drop"
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
        return {
            "id": doc["query_id"],
            "passage": doc["passage"],
            "question": doc["question"],
            "answers": self.get_answers(doc),
        }

    @classmethod
    def get_answers(cls, qa):
        def _flatten_validated_answers(validated_answers):
            valid_answers = []
            for i in range(len(validated_answers["number"])):
                valid_answers.append(
                    {
                        "number": validated_answers["number"][i],
                        "date": validated_answers["date"][i],
                        "spans": validated_answers["spans"][i],
                    }
                )
            return valid_answers

        answers = []
        answers_set = set()
        candidates = [qa["answer"]] + _flatten_validated_answers(qa["validated_answers"])
        for candidate in candidates:
            answer = cls.parse_answer(candidate)
            if answer in answers_set:
                continue
            answers_set.add(answer)
            answers.append(answer)
        return answers

    @classmethod
    def parse_answer(cls, answer):
        if answer["number"] != "":
            return (str(answer["number"]),)
        if answer["spans"] != []:
            return tuple(answer["spans"])
        return (
            " ".join(
                [answer["date"]["day"], answer["date"]["month"], answer["date"]["year"]]
            ).strip(),
        )

    def doc_to_text(self, doc):
        return f"Passage: {doc['passage']}\nQuestion: {doc['question']}\nAnswer:"

    def should_decontaminate(self):
        return True

    def doc_to_decontamination_query(self, doc):
        return doc["passage"] + " " + doc["question"]

    def doc_to_target(self, doc):
        return " " + ", ".join(doc["answers"][0])

    def construct_requests(self, doc, ctx):
        return [rf.greedy_until(ctx, {"until": ["."]})]

    def process_results(self, doc, results):
        preds, golds = results, doc["answers"]
        max_em = 0
        max_f1 = 0
        for gold_answer in golds:
            exact_match, f1_score = self.get_metrics(preds, gold_answer)
            if gold_answer[0].strip():
                max_em = max(max_em, exact_match)
                max_f1 = max(max_f1, f1_score)
        return {"em": max_em, "f1": max_f1}

    # ---- official DROP metric machinery ----

    def get_metrics(self, predicted, gold):
        predicted_bags = self._answer_to_bags(predicted)
        gold_bags = self._answer_to_bags(gold)
        if set(predicted_bags[0]) == set(gold_bags[0]) and len(predicted_bags[0]) == len(
            gold_bags[0]
        ):
            exact_match = 1.0
        else:
            exact_match = 0.0
        f1_per_bag = self._align_bags(predicted_bags[1], gold_bags[1])
        f1 = round(np.mean(f1_per_bag), 2)
        return exact_match, f1

    def _answer_to_bags(self, answer):
        raw_spans = answer if isinstance(answer, (list, tuple)) else [answer]
        normalized_spans = []
        token_bags = []
        for raw_span in raw_spans:
            normalized_span = self._normalize(raw_span)
            normalized_spans.append(normalized_span)
            token_bags.append(set(normalized_span.split()))
        return normalized_spans, token_bags

    def _align_bags(self, predicted, gold):
        """Optimal 1-1 alignment between gold and predicted answer bags."""
        from scipy.optimize import linear_sum_assignment

        scores = np.zeros([len(gold), len(predicted)])
        for gold_index, gold_item in enumerate(gold):
            for pred_index, pred_item in enumerate(predicted):
                if self._match_numbers_if_present(gold_item, pred_item):
                    scores[gold_index, pred_index] = self._compute_f1(pred_item, gold_item)
        row_ind, col_ind = linear_sum_assignment(-scores)
        max_scores = np.zeros([max(len(gold), len(predicted))])
        for row, column in zip(row_ind, col_ind):
            max_scores[row] = max(max_scores[row], scores[row, column])
        return max_scores

    def _compute_f1(self, predicted_bag, gold_bag):
        intersection = len(gold_bag.intersection(predicted_bag))
        precision = intersection / float(len(predicted_bag)) if predicted_bag else 1.0
        recall = intersection / float(len(gold_bag)) if gold_bag else 1.0
        return (
            (2 * precision * recall) / (precision + recall)
            if not (precision == 0.0 and recall == 0.0)
            else 0.0
        )

    def _match_numbers_if_present(self, gold_bag, predicted_bag):
        gold_numbers = {w for w in gold_bag if self._is_number(w)}
        predicted_numbers = {w for w in predicted_bag if self._is_number(w)}
        return (not gold_numbers) or bool(gold_numbers.intersection(predicted_numbers))

    def _is_number(self, text):
        try:
            float(text)
            return True
        except ValueError:
            return False

    def _remove_articles(self, text):
        return _ARTICLES.sub(" ", text)

    def _white_space_fix(self, text):
        return " ".join(text.split())

    def _remove_punc(self, text):
        if not self._is_number(text):
            exclude = set(string.punctuation)
            return "".join(ch for ch in text if ch not in exclude)
        return text

    def _fix_number(self, text):
        return str(float(text)) if self._is_number(text) else text

    def _tokenize(self, text):
        return re.split(" |-", text)

    def _normalize(self, answer):
        tokens = [
            self._white_space_fix(
                self._remove_articles(self._fix_number(self._remove_punc(token.lower())))
            )
            for token in self._tokenize(answer)
        ]
        tokens = [token for token in tokens if token.strip()]
        return " ".join(tokens).strip()

    def aggregation(self):
        return {"em": mean, "f1": mean}

    def higher_is_better(self):
        return {"em": True, "f1": True}
