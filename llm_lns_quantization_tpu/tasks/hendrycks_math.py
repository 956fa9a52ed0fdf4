"""MATH (Hendrycks) competition-math generation tasks, 7 subjects.

Parity: reference lm_eval/tasks/hendrycks_math.py — \\boxed answer
extraction and the full LaTeX string-normalization equivalence check.
"""

from ..harness.api import rf
from ..harness.metrics import mean
from ..harness.task import Task


class Math(Task):
    DATASET_PATH = "EleutherAI/hendrycks_math"
    DATASET_NAME = None

    def has_training_docs(self):
        return True

    def has_validation_docs(self):
        return False

    def has_test_docs(self):
        return True

    def training_docs(self):
        return map(self._process_doc, self.dataset["train"])

    def test_docs(self):
        return map(self._process_doc, self.dataset["test"])

    def _process_doc(self, doc):
        doc["answer"] = self.remove_boxed(self.last_boxed_only_string(doc["solution"]))
        return doc

    def doc_to_text(self, doc):
        return "Problem: " + doc["problem"] + "\nAnswer:"

    def should_decontaminate(self):
        return True

    def doc_to_decontamination_query(self, doc):
        return doc["problem"]

    def doc_to_target(self, doc):
        return " " + doc["solution"]

    def construct_requests(self, doc, ctx):
        return rf.greedy_until(ctx, {"until": ["\n"]})

    def process_results(self, doc, results):
        indices = [pos for pos, char in enumerate(results[0]) if char == "$"]
        if len(indices) <= 1:
            answer = results[0]
        else:
            answer = results[0][indices[0] + 1 : indices[-1]]
        correct = self.is_equiv(
            answer, self.remove_boxed(self.last_boxed_only_string(doc["solution"]))
        )
        return {"acc": int(correct)}

    def aggregation(self):
        return {"acc": mean}

    def higher_is_better(self):
        return {"acc": True}

    # ---- LaTeX answer equivalence (Hendrycks et al. reference rules) ----

    def is_equiv(self, str1, str2, verbose=False):
        if str1 is None and str2 is None:
            return True
        if str1 is None or str2 is None:
            return False
        try:
            ss1 = self.strip_string(str1)
            ss2 = self.strip_string(str2)
            return ss1 == ss2
        except Exception:
            return str1 == str2

    def remove_boxed(self, s):
        if "\\boxed " in s:
            left = "\\boxed "
            assert s[: len(left)] == left
            return s[len(left):]
        left = "\\boxed{"
        assert s[: len(left)] == left
        assert s[-1] == "}"
        return s[len(left): -1]

    def last_boxed_only_string(self, string):
        idx = string.rfind("\\boxed")
        if "\\boxed " in string:
            return "\\boxed " + string.split("\\boxed ")[-1].split("$")[0]
        if idx < 0:
            idx = string.rfind("\\fbox")
            if idx < 0:
                return None
        i = idx
        right_brace_idx = None
        num_left_braces_open = 0
        while i < len(string):
            if string[i] == "{":
                num_left_braces_open += 1
            if string[i] == "}":
                num_left_braces_open -= 1
                if num_left_braces_open == 0:
                    right_brace_idx = i
                    break
            i += 1
        if right_brace_idx is None:
            return None
        return string[idx : right_brace_idx + 1]

    def fix_fracs(self, string):
        substrs = string.split("\\frac")
        new_str = substrs[0]
        if len(substrs) > 1:
            for substr in substrs[1:]:
                new_str += "\\frac"
                if substr[0] == "{":
                    new_str += substr
                else:
                    if len(substr) < 2:
                        return string
                    a, b = substr[0], substr[1]
                    if b != "{":
                        new_str += "{" + a + "}{" + b + "}" + substr[2:]
                    else:
                        new_str += "{" + a + "}" + b + substr[2:]
        return new_str

    def fix_a_slash_b(self, string):
        if len(string.split("/")) != 2:
            return string
        a, b = string.split("/")
        try:
            a = int(a)
            b = int(b)
            assert string == "{}/{}".format(a, b)
            return "\\frac{" + str(a) + "}{" + str(b) + "}"
        except (AssertionError, ValueError):
            return string

    def remove_right_units(self, string):
        # units are on the right, e.g. "5 \\text{ cm}"
        if "\\text{ " in string:
            splits = string.split("\\text{ ")
            assert len(splits) == 2
            return splits[0]
        return string

    def fix_sqrt(self, string):
        if "\\sqrt" not in string:
            return string
        splits = string.split("\\sqrt")
        new_string = splits[0]
        for split in splits[1:]:
            if split[0] != "{":
                new_string += "\\sqrt{" + split[0] + "}" + split[1:]
            else:
                new_string += "\\sqrt" + split
        return new_string

    def strip_string(self, string):
        string = string.replace("\n", "")
        string = string.replace("\\!", "")
        string = string.replace("\\\\", "\\")
        string = string.replace("tfrac", "frac")
        string = string.replace("dfrac", "frac")
        string = string.replace("\\left", "")
        string = string.replace("\\right", "")
        string = string.replace("^{\\circ}", "")
        string = string.replace("^\\circ", "")
        string = string.replace("\\$", "")
        string = self.remove_right_units(string)
        string = string.replace("\\%", "")
        string = string.replace(r"\%", "")
        string = string.replace(" .", " 0.")
        string = string.replace("{.", "{0.")
        if len(string) == 0:
            return string
        if string[0] == ".":
            string = "0" + string
        if len(string.split("=")) == 2:
            if len(string.split("=")[0]) <= 2:
                string = string.split("=")[1]
        string = self.fix_sqrt(string)
        string = string.replace(" ", "")
        string = self.fix_fracs(string)
        if string == "0.5":
            string = "\\frac{1}{2}"
        return self.fix_a_slash_b(string)


class MathAlgebra(Math):
    VERSION = 1
    DATASET_NAME = "algebra"


class MathCountingAndProbability(Math):
    VERSION = 1
    DATASET_NAME = "counting_and_probability"


class MathGeometry(Math):
    VERSION = 1
    DATASET_NAME = "geometry"


class MathIntermediateAlgebra(Math):
    VERSION = 1
    DATASET_NAME = "intermediate_algebra"


class MathNumberTheory(Math):
    VERSION = 1
    DATASET_NAME = "number_theory"


class MathPrealgebra(Math):
    VERSION = 1
    DATASET_NAME = "prealgebra"


class MathPrecalculus(Math):
    VERSION = 1
    DATASET_NAME = "precalculus"
