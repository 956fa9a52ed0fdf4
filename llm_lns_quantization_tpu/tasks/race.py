"""RACE reading comprehension (one doc per article, GPT-3 style).

Parity target: reference lm_eval/tasks/race.py — questions grouped per
article (the HF dataset splits them), preceding problems rendered as
question/answer context, last problem scored over 4 options.
"""

import collections

import numpy as np

from ..harness.api import rf
from ..harness.metrics import mean
from ..harness.task import Task


class RACE(Task):
    VERSION = 1
    DATASET_PATH = "race"
    DATASET_NAME = "high"

    letter_to_num = {"A": 0, "B": 1, "C": 2, "D": 3}

    def __init__(self, **kwargs):
        self._collate_cache = {}
        super().__init__(**kwargs)

    def has_training_docs(self):
        return True

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return True

    def _collate_data(self, split):
        """Group HF's per-question rows back into one doc per article."""
        if split in self._collate_cache:
            return self._collate_cache[split]
        if split not in self.dataset:
            return []
        by_article = collections.defaultdict(list)
        for item in self.dataset[split]:
            by_article[item["article"]].append(item)
        res = []
        for article, items in by_article.items():
            problems = [
                {
                    "question": y["question"],
                    "answer": y["answer"],
                    "options": y["options"],
                }
                for y in items
            ]
            res.append({"article": article, "problems": problems})
        self._collate_cache[split] = res
        return res

    def training_docs(self):
        return self._collate_data("train")

    def validation_docs(self):
        return self._collate_data("validation")

    def test_docs(self):
        return self._collate_data("test")

    @classmethod
    def get_answer_option(cls, problem):
        return problem["options"][cls.letter_to_num[problem["answer"]]]

    @classmethod
    def last_problem(cls, doc):
        return doc["problems"][-1]

    def doc_to_text(self, doc):
        text = "Article: " + doc["article"] + "\n\n"
        for problem in doc["problems"][:-1]:
            if problem["question"][-6:] == "  _  .":
                # cloze-style question: splice the answer into the blank
                text += problem["question"][-5:] + self.get_answer_option(problem) + "\n"
            else:
                question = "Question: " + problem["question"] + "\n"
                answer = "Answer: " + self.get_answer_option(problem) + "\n"
                text += question + answer
        text += self.last_problem(doc)["question"]
        return text

    def should_decontaminate(self):
        return True

    def doc_to_decontamination_query(self, doc):
        return doc["article"]

    def doc_to_target(self, doc):
        return " " + self.get_answer_option(self.last_problem(doc))

    def construct_requests(self, doc, ctx):
        problem = self.last_problem(doc)
        return [
            rf.loglikelihood(ctx, " " + problem["options"][i])[0] for i in range(4)
        ]

    def process_results(self, doc, results):
        gold = self.letter_to_num[self.last_problem(doc)["answer"]]
        return {"acc": int(np.argmax(results) == gold)}

    def aggregation(self):
        return {"acc": mean}

    def higher_is_better(self):
        return {"acc": True}
