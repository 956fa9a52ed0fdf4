"""BIG-bench JSON tasks (the 19 BIG-bench-hard subsets shipped as resources).

Parity: reference lm_eval/tasks/bigbench.py — JSON-driven task definition
(multiple_choice_grade via per-choice loglikelihood with deterministic
tie-breaking; exact_str_match via regex/stop-string postprocessing), with
the same seeded choice permutation and few-shot packing. The task JSON files
under tasks/bigbench_resources are the public BIG-bench data.
"""

import functools
import hashlib
import json
import os
import re

import numpy as np

from ..harness.api import rf
from ..harness.metrics import mean
from ..harness.task import Task

_DEFAULT_REGEX = r"[^\.\?\!\;\n]+"


class BigBenchJsonTask(Task):
    VERSION = 0

    def __init__(self, json_path, **kwargs):
        self._random_seed = 42
        with open(json_path) as file:
            self._task_json = json.load(file)
        self._has_multi_choice = "multiple_choice_grade" in self._task_json["metrics"]
        self._has_generative = "exact_str_match" in self._task_json["metrics"]
        self.output_regex = self._task_json.get("output_regex", None)
        self.stop_string = self._task_json.get("stop_string", None)
        if self.output_regex is None and self.stop_string is None:
            self.output_regex = _DEFAULT_REGEX
        self.max_length = 128
        self._training_docs = None
        self._fewshot_docs = None

    def download(self, *a, **kw):  # data lives in the task JSON
        pass

    def has_training_docs(self):
        return False

    def has_validation_docs(self):
        return False

    def has_test_docs(self):
        return True

    def test_docs(self):
        return _get_unique_examples(self._task_json["examples"])

    def doc_to_text(self, doc):
        example_input_prefix = self._task_json.get("example_input_prefix", "\nQ: ")
        res = f"{example_input_prefix}{doc['input']}"
        rng = np.random.RandomState(seed=self._random_seed)
        choice_prefix = self._task_json.get("choice_prefix", "\n  choice: ")
        append_choices = self._task_json.get("append_choices_to_input", True)
        if "target_scores" in doc and append_choices:
            choice_dict = doc["target_scores"]
            permuted_choices = rng.permutation(sorted(list(choice_dict.keys())))
            res = f"{res}{choice_prefix}{choice_prefix.join(permuted_choices)}"
        example_output_prefix = self._task_json.get("example_output_prefix", "\nA: ")
        return f"{res}{example_output_prefix}"

    def doc_to_target(self, doc):
        return max(doc["target_scores"].items(), key=lambda x: x[1])[0]

    def _doc_to_queries(self, doc):
        if "target_scores" in doc:
            return list(doc["target_scores"].keys())
        return doc["target"] if isinstance(doc["target"], list) else [doc["target"]]

    def construct_requests(self, doc, ctx):
        requests = []
        if self._has_multi_choice:
            queries = self._doc_to_queries(doc)
            requests += [
                rf.loglikelihood(ctx, continuation)[0] for continuation in queries
            ]
        if self._has_generative:
            requests.append(
                rf.greedy_until(ctx, {"until": [], "max_length": self.max_length})
            )
        return requests

    def process_results(self, doc, results):
        res = {}
        for metric in self._task_json["metrics"]:
            if metric == "multiple_choice_grade":
                likelihoods = results[:-1] if self._has_generative else results
                queries = self._doc_to_queries(doc)
                highest_score_index = _argmax(likelihoods)
                highest_score_key = queries[highest_score_index]
                res["multiple_choice_grade"] = doc["target_scores"][highest_score_key]
            elif metric == "exact_str_match":
                postprocessed = _postprocess_output(
                    results[-1],
                    max_length=self.max_length,
                    stop_string=self.stop_string,
                    output_regex=self.output_regex,
                )
                res["exact_str_match"] = int(postprocessed == doc["target"])
            else:
                raise NotImplementedError(f"Metric {metric} isn't implemented")
        return res

    def aggregation(self):
        return {"multiple_choice_grade": mean, "exact_str_match": mean}

    def higher_is_better(self):
        return {"multiple_choice_grade": True, "exact_str_match": True}

    @functools.lru_cache()
    def _doc_to_few_shot_context(self, shots):
        rng = np.random.RandomState(seed=self._random_seed)
        res = {}
        samples = self.test_docs()
        separator = self._task_json.get("few_shot_example_separator", "\n")
        for sample in rng.choice(samples, len(samples), replace=False):
            valid_samples = [x for x in samples if x != sample]
            shot_examples = list(rng.choice(valid_samples, shots, replace=False))
            if self._has_multi_choice:
                context = separator.join(
                    [
                        self.doc_to_text(example)
                        + rng.choice(_get_valid_answers(example["target_scores"]))
                        for example in shot_examples
                    ]
                )
            else:
                context = separator.join(
                    [
                        self.doc_to_text(example) + example["target"]
                        for example in shot_examples
                    ]
                )
            res[json.dumps(sample)] = context + separator + self.doc_to_text(sample)
        return res

    def fewshot_context(self, doc, num_fewshot, **kwargs):
        if num_fewshot == 0:
            res = self.doc_to_text(doc)
        else:
            res = self._doc_to_few_shot_context(shots=num_fewshot)[json.dumps(doc)]
        return f"{self._task_json.get('task_prefix', '')}{res}"


def _get_valid_answers(scores):
    max_value = max(scores.values())
    return [key for key, value in scores.items() if value == max_value]


def _get_unique_examples(examples):
    seen_examples, res = set(), []
    for example in examples:
        example_string = json.dumps(example)
        if example_string not in seen_examples:
            res.append(example)
            seen_examples.add(example_string)
    return res


def _argmax(array):
    """Deterministic tie-broken argmax (hash of the score array)."""
    array = np.asarray(array)
    max_indices = np.arange(len(array))[array == np.max(array)]
    idx = int(hashlib.sha256(array.tobytes()).hexdigest(), 16) % len(max_indices)
    return max_indices[idx]


def _postprocess_output(text, max_length, stop_string, output_regex):
    if isinstance(text, list):
        return [
            _postprocess_output(mo, max_length, stop_string, output_regex)
            for mo in text
        ]
    if not isinstance(text, str):
        text = str(text, "utf-8")
    if max_length:
        text = text[:max_length]
    if stop_string:
        index = text.find(stop_string)
        if index > 0:
            text = text[: index + len(stop_string)]
    if output_regex:
        _text = text
        text = next(iter(re.findall(output_regex, text)), "")
        assert not type(text) is tuple, (
            f"Regex {output_regex} returned multiple matching groups for {_text!r};"
            ' use non-capturing groups ("(?:...)").'
        )
    return text


def create_task_from_path(json_path):
    class WrappedTask(BigBenchJsonTask):
        def __init__(self, **kwargs):
            super().__init__(json_path, **kwargs)

    return WrappedTask


def create_all_tasks():
    resources_dir = os.path.join(os.path.dirname(__file__), "bigbench_resources")
    supported_tasks = sorted(
        os.path.splitext(x)[0]
        for x in os.listdir(resources_dir)
        if x.endswith(".json")
    )
    return {
        f"bigbench_{task_name}": create_task_from_path(
            os.path.join(resources_dir, f"{task_name}.json")
        )
        for task_name in supported_tasks
    }
