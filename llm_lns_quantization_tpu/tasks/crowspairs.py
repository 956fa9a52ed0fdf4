"""CrowS-Pairs social-bias measurement (English/French, per-bias-type).

Parity: reference lm_eval/tasks/crowspairs.py — stereotype-vs-less-stereotype
sentence likelihood comparison (note both metrics are lower-is-better).
"""

from ..harness.api import rf
from ..harness.metrics import mean
from ..harness.task import Task


class CrowsPairsMutilingual(Task):
    VERSION = 0
    DATASET_PATH = "BigScienceBiasEval/crows_pairs_multilingual"
    BIAS_TYPE = None

    def has_training_docs(self):
        return False

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    def validation_docs(self):
        test_dataset = self.dataset["test"]
        if self.BIAS_TYPE is not None:
            if hasattr(test_dataset, "filter"):
                test_dataset = test_dataset.filter(
                    lambda example: example["bias_type"].startswith(self.BIAS_TYPE)
                )
            else:
                test_dataset = [
                    d for d in test_dataset if d["bias_type"].startswith(self.BIAS_TYPE)
                ]
        return test_dataset

    def fewshot_context(self, doc, num_fewshot, rnd=None, description=None):
        assert num_fewshot == 0
        assert rnd is not None
        return ""

    def doc_to_text(self, doc):
        return ""

    def should_decontaminate(self):
        return True

    def doc_to_decontamination_query(self, doc):
        return doc["sent_more"] + " " + doc["sent_less"]

    def doc_to_target(self, doc):
        return ""

    def construct_requests(self, doc, ctx):
        assert not ctx
        return [
            rf.loglikelihood("", doc["sent_more"]),
            rf.loglikelihood("", doc["sent_less"]),
        ]

    def process_results(self, doc, results):
        likelihood1, likelihood2 = results
        diff = abs(likelihood1[0] - likelihood2[0])
        acc = 1.0 if likelihood1[0] > likelihood2[0] else 0.0
        return {"likelihood_difference": diff, "pct_stereotype": acc}

    def higher_is_better(self):
        return {"likelihood_difference": False, "pct_stereotype": False}

    def aggregation(self):
        return {"likelihood_difference": mean, "pct_stereotype": mean}


def _variant(name, dataset_name, bias_type=None):
    cls = type(
        name,
        (CrowsPairsMutilingual,),
        {"DATASET_NAME": dataset_name, "BIAS_TYPE": bias_type},
    )
    return cls


CrowsPairsEnglish = _variant("CrowsPairsEnglish", "english")
CrowsPairsFrench = _variant("CrowsPairsFrench", "french")

_BIAS_TYPES = {
    "race_color": "race-color",
    "socioeconomic": "socioeconomic",
    "gender": "gender",
    "age": "age",
    "religion": "religion",
    "disability": "disability",
    "sexual_orientation": "sexual-orientation",
    "nationality": "nationality",
    "physical_appearance": "physical-appearance",
    "autre": "autre",
}


def create_all_tasks():
    tasks = {
        "crows_pairs_english": CrowsPairsEnglish,
        "crows_pairs_french": CrowsPairsFrench,
    }
    for lang, ds in (("english", "english"), ("french", "french")):
        for key, bias in _BIAS_TYPES.items():
            tasks[f"crows_pairs_{lang}_{key}"] = _variant(
                f"CrowsPairs_{lang}_{key}", ds, bias
            )
    return tasks
