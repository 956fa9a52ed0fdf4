"""MMLU (Hendrycks Test): 57-subject multiple-choice benchmark.

Parity target: reference lm_eval/tasks/hendrycks_test.py — same A/B/C/D
letter-choice scoring, per-subject description, and in-order dev-split
few-shot sampling (the original evaluate.py convention).
"""

from ..harness.task import MultipleChoiceTask

SUBJECTS = [
    "abstract_algebra", "anatomy", "astronomy", "business_ethics",
    "clinical_knowledge", "college_biology", "college_chemistry",
    "college_computer_science", "college_mathematics", "college_medicine",
    "college_physics", "computer_security", "conceptual_physics",
    "econometrics", "electrical_engineering", "elementary_mathematics",
    "formal_logic", "global_facts", "high_school_biology",
    "high_school_chemistry", "high_school_computer_science",
    "high_school_european_history", "high_school_geography",
    "high_school_government_and_politics", "high_school_macroeconomics",
    "high_school_mathematics", "high_school_microeconomics",
    "high_school_physics", "high_school_psychology", "high_school_statistics",
    "high_school_us_history", "high_school_world_history", "human_aging",
    "human_sexuality", "international_law", "jurisprudence",
    "logical_fallacies", "machine_learning", "management", "marketing",
    "medical_genetics", "miscellaneous", "moral_disputes", "moral_scenarios",
    "nutrition", "philosophy", "prehistory", "professional_accounting",
    "professional_law", "professional_medicine", "professional_psychology",
    "public_relations", "security_studies", "sociology", "us_foreign_policy",
    "virology", "world_religions",
]


def create_all_tasks():
    """{hendrycksTest-<subject>: task class} for all 57 subjects."""
    return {f"hendrycksTest-{sub}": create_task(sub) for sub in SUBJECTS}


def create_task(subject):
    class HendrycksTest(GeneralHendrycksTest):
        DATASET_NAME = subject

        def __init__(self, **kwargs):
            super().__init__(subject, **kwargs)

    HendrycksTest.__name__ = f"HendrycksTest_{subject}"
    return HendrycksTest


class GeneralHendrycksTest(MultipleChoiceTask):
    VERSION = 1
    DATASET_PATH = "cais/mmlu"
    DATASET_NAME = None

    def __init__(self, subject, **kwargs):
        self.DATASET_NAME = subject
        super().__init__(**kwargs)

    def has_training_docs(self):
        return True

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return True

    def validation_docs(self):
        return map(self._process_doc, self.dataset["validation"])

    def test_docs(self):
        return map(self._process_doc, self.dataset["test"])

    def _format_subject(self, subject):
        return " ".join(subject.split("_"))

    def fewshot_context(self, doc, num_fewshot, **kwargs):
        subject = self.DATASET_NAME
        kwargs["description"] = (
            "The following are multiple choice questions (with answers) "
            f"about {self._format_subject(subject)}."
        )
        return super().fewshot_context(doc=doc, num_fewshot=num_fewshot, **kwargs)

    def _process_doc(self, doc):
        keys = ["A", "B", "C", "D"]
        question = doc["question"].strip()
        choices = "".join(
            f"{key}. {choice}\n" for key, choice in zip(keys, doc["choices"])
        )
        return {
            "query": f"{question}\n{choices}Answer:",
            "choices": keys,
            "gold": doc["answer"],
        }

    def fewshot_examples(self, k, rnd):
        # few-shot exemplars come from the dev split, in original order (the
        # auxiliary train split is out-of-distribution)
        if self._fewshot_docs is None:
            self._fewshot_docs = list(
                map(self._process_doc, self.dataset["dev"])
            )
        return self._fewshot_docs[:k]

    def doc_to_text(self, doc):
        return doc["query"]

    def should_decontaminate(self):
        return True

    def doc_to_decontamination_query(self, doc):
        return doc["query"]
