"""Schema contracts for datasets the reference loaded via custom scripts.

The reference ships hand-written HF loading scripts for 12 datasets
(/root/reference/lm_eval/datasets/*/): those scripts' ``datasets.Features``
declarations define the exact raw document schema its tasks consume. This
repo replaced them with hub ``DATASET_PATH``s plus offline ``--data_dir``
fixtures; the prompt-parity suite ran on shared fixture docs, so nothing
previously verified that the fixtures (and therefore the tasks' assumed
schema) match the loaders' declared features.

This test closes that gap offline: it executes each reference loader's
``_info()`` per builder config (no network — features are declared inline),
then asserts every fixture doc for the corresponding task

- has no key the loader would not produce, and
- matches the declared feature structurally (Value -> scalar, List ->
  list, dict -> dict with declared subkeys), recursively, on the
  normalized Features tree — which is exactly the access-time shape
  ``load_dataset`` yields (Sequence({...}) normalizes to dict-of-Lists).

Reference: SURVEY.md section 2.1 "Custom dataset loaders"
(lm_eval/datasets/, 1,802 LoC).
"""

import importlib.util
import inspect
import os

import pytest

import sys

sys.path.insert(0, os.path.dirname(__file__))
from fixtures import FIXTURE_DOCS  # noqa: E402

REFERENCE = "/root/reference/lm_eval/datasets"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE),
    reason="reference checkout not present; schema oracles unavailable",
)

# (loader dir, builder config name) -> fixture/task names bound to it.
# Multiple task keys may share one raw schema (headqa_en/es; quac/quac_gen;
# ethics_utilitarianism + _original read the same 'utilitarianism' config).
LOADER_TASKS = {
    ("asdiv", "asdiv"): ["math_asdiv"],
    ("coqa", "coqa"): ["coqa"],
    ("drop", "drop"): ["drop"],
    ("headqa", "es"): ["headqa", "headqa_es"],
    ("headqa", "en"): ["headqa_en"],
    ("hendrycks_ethics", "commonsense"): ["ethics_cm"],
    ("hendrycks_ethics", "deontology"): ["ethics_deontology"],
    ("hendrycks_ethics", "justice"): ["ethics_justice"],
    ("hendrycks_ethics", "utilitarianism"): [
        "ethics_utilitarianism",
        "ethics_utilitarianism_original",
    ],
    ("hendrycks_ethics", "virtue"): ["ethics_virtue"],
    ("hendrycks_math", "algebra"): ["math_algebra"],
    ("hendrycks_math", "counting_and_probability"): ["math_counting_and_prob"],
    ("hendrycks_math", "geometry"): ["math_geometry"],
    ("hendrycks_math", "intermediate_algebra"): ["math_intermediate_algebra"],
    ("hendrycks_math", "number_theory"): ["math_num_theory"],
    ("hendrycks_math", "prealgebra"): ["math_prealgebra"],
    ("hendrycks_math", "precalculus"): ["math_precalc"],
    ("logiqa", "logiqa"): ["logiqa"],
    ("mutual", "mutual"): ["mutual"],
    ("mutual", "mutual_plus"): ["mutual_plus"],
    ("quac", "quac"): ["quac", "quac_gen"],
    ("sat_analogies", "sat_analogies"): ["sat"],
    ("unscramble", "mid_word_1_anagrams"): ["anagrams1"],
    ("unscramble", "mid_word_2_anagrams"): ["anagrams2"],
    ("unscramble", "cycle_letters_in_word"): ["cycle_letters"],
    ("unscramble", "random_insertion_in_word"): ["random_insertion"],
    ("unscramble", "reversed_words"): ["reversed_words"],
    # every pile_* task reads the single {'text'} schema of its config
    **{("pile", f"pile_{sub}"): [f"pile_{sub}"] for sub in (
        "arxiv", "books3", "bookcorpus2", "dm-mathematics", "enron",
        "europarl", "freelaw", "github", "gutenberg", "hackernews",
        "nih-exporter", "opensubtitles", "openwebtext2", "philpapers",
        "pile-cc", "pubmed-abstracts", "pubmed-central", "stackexchange",
        "ubuntu-irc", "wikipedia", "youtubesubtitles",
    )},
    # the reference loader itself misspells this config ("upsto",
    # lm_eval/datasets/pile/pile.py:68) and its task reads that name; the
    # repo's registry key is the corrected pile_uspto (docstring notes the
    # [sic]) but the raw schema contract is the same single text column
    ("pile", "pile_upsto"): ["pile_uspto"],
}


def _load_builder(loader):
    import datasets

    path = os.path.join(REFERENCE, loader, f"{loader}.py")
    spec = importlib.util.spec_from_file_location(f"refloader_{loader}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    builders = [
        c
        for _, c in inspect.getmembers(mod, inspect.isclass)
        if issubclass(c, datasets.GeneratorBasedBuilder)
        and c.__module__ == mod.__name__
    ]
    assert len(builders) == 1, f"{loader}: expected one builder class"
    return builders[0]


def _features_for(loader, config_name):
    cls = _load_builder(loader)
    (cfg,) = [c for c in cls.BUILDER_CONFIGS if c.name == config_name]
    obj = cls.__new__(cls)  # _info only reads self.config
    obj.config = cfg
    return obj._info().features


def _check_value(feature, value, path):
    """Structural conformance of one fixture value to one declared feature.

    ``datasets.Features`` normalizes declarations into exactly the
    access-time shapes (``Sequence({...})`` -> dict of ``List``s, nested
    dicts inside a Sequence -> ``List``-of-dicts, ``[X]`` -> ``List(X)``),
    so the walk below mirrors what ``load_dataset`` would actually yield.
    """
    import datasets
    from datasets.features.features import LargeList
    from datasets.features.features import List as FeatureList

    if isinstance(feature, datasets.Value):
        assert not isinstance(value, (list, dict)), (
            f"{path}: declared scalar {feature}, fixture has {type(value).__name__}"
        )
    elif isinstance(feature, datasets.ClassLabel):
        assert isinstance(value, (int, str)), (
            f"{path}: declared ClassLabel, fixture has {type(value).__name__}"
        )
    elif isinstance(feature, (FeatureList, LargeList)):
        assert isinstance(value, list), (
            f"{path}: declared {feature}, fixture has {type(value).__name__}"
        )
        for i, item in enumerate(value):
            _check_value(feature.feature, item, f"{path}[{i}]")
    elif isinstance(feature, dict):
        assert isinstance(value, dict), (
            f"{path}: declared dict, fixture has {type(value).__name__}"
        )
        extra = set(value) - set(feature)
        assert not extra, f"{path}: undeclared subkeys {sorted(extra)}"
        for k, v in value.items():
            _check_value(feature[k], v, f"{path}.{k}")
    # any other feature kind (Audio/Image/...) does not occur in these loaders


@pytest.mark.parametrize(
    "loader,config_name",
    sorted(LOADER_TASKS),
    ids=[f"{l}-{c}" for l, c in sorted(LOADER_TASKS)],
)
def test_fixture_docs_match_reference_loader_schema(loader, config_name):
    features = _features_for(loader, config_name)
    for task_name in LOADER_TASKS[(loader, config_name)]:
        assert task_name in FIXTURE_DOCS, f"no fixture for {task_name}"
        for split, docs in FIXTURE_DOCS[task_name].items():
            for i, doc in enumerate(docs):
                where = f"{task_name}/{split}[{i}]"
                extra = set(doc) - set(features)
                assert not extra, (
                    f"{where}: fixture keys {sorted(extra)} not in the "
                    f"reference loader's declared features "
                    f"{sorted(features)}"
                )
                for key, value in doc.items():
                    _check_value(features[key], value, f"{where}.{key}")


def test_all_reference_loaders_covered():
    """Every custom loader dir in the reference is bound to at least one
    fixture-backed task above (bigbench_resources is JSON data, not a
    loading script)."""
    dirs = {
        d
        for d in os.listdir(REFERENCE)
        if os.path.isdir(os.path.join(REFERENCE, d))
        and d != "bigbench_resources"
        and not d.startswith("__")
    }
    covered = {loader for loader, _ in LOADER_TASKS}
    assert dirs == covered, (
        f"uncovered loaders: {sorted(dirs - covered)}; "
        f"stale entries: {sorted(covered - dirs)}"
    )
