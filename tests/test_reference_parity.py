"""Prompt-format parity vs the reference's own task classes, task by task.

The self-bootstrapped goldens (test_tasks_golden.py) freeze OUR behavior;
this suite proves that behavior matches the REFERENCE by importing its task
code read-only as an oracle (public untrusted content: we execute its
task-construction logic on our fixture docs, nothing more) and comparing,
per document:

  - doc_to_text / doc_to_target
  - construct_requests (request type + args, the cache-key contract)
  - fewshot_context at 0 and 1 shots (description assembly + the seeded
    sampling order, reference base.py:679-745)
  - should_decontaminate / doc_to_decontamination_query

The reference side runs on the same raw-schema fixture docs via a no-init
instance (its Task.__init__ would hit the HF hub). Skipped wholesale when
/root/reference is not present (the framework stands alone without it).

Known reference-side defects we deliberately do NOT reproduce (each would
KeyError on any real decontamination run of the reference):
  - crows_pairs*: doc_to_decontamination_query reads blimp's
    sentence_good/sentence_bad keys (reference crowspairs.py:105); ours uses
    the dataset's sent_more/sent_less.
  - pubmedqa: doc_to_decontamination_query reads doc["question"] but the
    dataset schema is QUESTION (reference pubmedqa.py:72); ours uses QUESTION.
"""

import functools
import json
import os
import random
import sys
import types
import zlib

import pytest

from fixtures import FIXTURE_DOCS, make_task

REFERENCE_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_ROOT, "lm_eval")),
    reason="reference checkout not available",
)

# prompt-only stubs on both sides (construct_requests raises), plus this
# repo's own completed-evaluation extension tasks that have no reference
# counterpart to compare against (covered by their golden files instead)
STUB_TASKS = {"quac", "naturalqs", "quac_gen", "naturalqs_gen"}

# tasks where the reference's doc_to_decontamination_query is broken (see
# module docstring) — decontamination-query comparison only is skipped
BROKEN_REF_DECONTAMINATION = {"pubmedqa"}


def _decontamination_exempt(name):
    return name in BROKEN_REF_DECONTAMINATION or name.startswith("crows_pairs_")


class ListDataset(list):
    """Mini HF-dataset shim over a plain list (filter/map used by some
    reference tasks, e.g. crowspairs bias-type slices)."""

    def filter(self, fn):
        return ListDataset([d for d in self if fn(d)])

    def map(self, fn):
        return ListDataset([fn(d) for d in self])


@functools.lru_cache(maxsize=1)
def load_reference_registry():
    """Import the reference package with stubs for its absent pip deps."""
    for name in ("sqlitedict", "jsonlines", "pytablewriter", "tqdm_multiprocess"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["sqlitedict"].SqliteDict = dict

    if "pycountry" not in sys.modules:
        # functional stub: alpha_2 -> language name from our frozen table
        # (values originally sourced from pycountry's ISO data)
        from llm_lns_quantization_tpu.tasks.translation import _LANG_NAMES

        pc = types.ModuleType("pycountry")

        class _Langs:
            @staticmethod
            def get(**kw):
                code = next(iter(kw.values()))
                name = _LANG_NAMES.get(code)
                return types.SimpleNamespace(name=name) if name else None

        pc.languages = _Langs()
        sys.modules["pycountry"] = pc

    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")
        om.OmegaConf = type("OC", (), {})
        sys.modules["omegaconf"] = om

    import datasets

    if not hasattr(datasets, "load_metric"):
        datasets.load_metric = lambda *a, **k: None

    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    import lm_eval.tasks as ref_tasks_mod
    from lm_eval.tasks import cbt, sat, storycloze

    registry = dict(ref_tasks_mod.TASK_REGISTRY)
    # present in the reference tree but commented out of its registry;
    # implemented (and registered) here, so compare against the classes
    registry.update({
        "cbt-cn": cbt.CBTCN,
        "cbt-ne": cbt.CBTNE,
        "storycloze_2016": storycloze.StoryCloze2016,
        "storycloze_2018": storycloze.StoryCloze2018,
        "sat": sat.SATAnalogies,
    })
    return registry


def make_ref_task(name, docs_by_split):
    """Reference task on fixture docs, bypassing its downloading __init__."""
    cls = load_reference_registry()[name]
    inst = cls.__new__(cls)
    inst._training_docs = None
    inst._fewshot_docs = None
    inst.dataset = {k: ListDataset(v) for k, v in docs_by_split.items()}

    if getattr(inst, "DATASET_NAME", None) is None:
        # subclass factories set DATASET_NAME in the __init__ we bypassed
        import llm_lns_quantization_tpu.tasks as our_tasks

        ours_cls = our_tasks.TASK_REGISTRY.get(name)
        if ours_cls is not None and getattr(ours_cls, "DATASET_NAME", None):
            inst.DATASET_NAME = ours_cls.DATASET_NAME

    if name == "race":
        # reference RACE calls datasets.load_dataset inside _collate_data
        import datasets as hfds

        inst.cache = {}
        orig = hfds.load_dataset
        hfds.load_dataset = lambda path=None, name=None, **kw: inst.dataset
        try:
            for split in list(inst.dataset):
                inst._collate_data(split)
        finally:
            hfds.load_dataset = orig

    if name.split("-")[0] in ("wmt14", "wmt16", "wmt20", "iwslt17"):
        # reference translation tasks download via sacrebleu in __init__
        ds, pair = name.split("-", 1)
        inst.sacrebleu_dataset = ds
        inst.sacrebleu_language_pair = pair
        docs = docs_by_split.get("test") or docs_by_split.get("validation")
        inst.src_data = [d["src"] for d in docs]
        inst.ref_data = [d["ref"] for d in docs]
    return inst


def norm_reqs(reqs):
    if reqs is None:
        return None
    if not isinstance(reqs, (list, tuple)):
        reqs = [reqs]
    return [(r.request_type, r.args) for r in reqs]


def scoring_docs(task):
    return list(task.test_docs() if task.has_test_docs()
                else task.validation_docs())


@pytest.mark.parametrize(
    "task_name", sorted(n for n in FIXTURE_DOCS if n not in STUB_TASKS)
)
def test_prompt_parity_vs_reference(task_name):
    registry = load_reference_registry()
    assert task_name in registry, (
        "task registered here but absent from the reference registry")

    ours = make_task(task_name)
    ref = make_ref_task(task_name, FIXTURE_DOCS[task_name])

    ref_docs = scoring_docs(ref)
    our_docs = scoring_docs(ours)
    assert len(ref_docs) == len(our_docs), "scoring doc count differs"

    for rd, od in zip(ref_docs, our_docs):
        rt, ot = ref.doc_to_text(rd), ours.doc_to_text(od)
        assert rt == ot, f"doc_to_text\n ref={rt!r}\n got={ot!r}"
        rtg, otg = ref.doc_to_target(rd), ours.doc_to_target(od)
        assert rtg == otg, f"doc_to_target\n ref={rtg!r}\n got={otg!r}"

        rr = norm_reqs(ref.construct_requests(rd, rt))
        orq = norm_reqs(ours.construct_requests(od, ot))
        assert rr == orq, f"requests\n ref={rr!r}\n got={orq!r}"

        rc = ref.fewshot_context(rd, 0, rnd=random.Random(42))
        oc = ours.fewshot_context(od, 0, rnd=random.Random(42))
        assert rc == oc, f"fewshot_context(0)\n ref={rc!r}\n got={oc!r}"

        assert ref.should_decontaminate() == ours.should_decontaminate()
        if ref.should_decontaminate() and not _decontamination_exempt(task_name):
            rq = ref.doc_to_decontamination_query(rd)
            oq = ours.doc_to_decontamination_query(od)
            assert rq == oq, f"decontamination query\n ref={rq!r}\n got={oq!r}"

        try:
            rc1 = ref.fewshot_context(rd, 1, rnd=random.Random(42))
        except Exception:
            rc1 = None  # zero-shot-only on the reference side
        if rc1 is not None:
            oc1 = ours.fewshot_context(od, 1, rnd=random.Random(42))
            assert rc1 == oc1, f"fewshot_context(1)\n ref={rc1!r}\n got={oc1!r}"


# ---------------------------------------------------------------------------
# metric wiring parity: identical fake LM results through both sides'
# process_results, then both sides' aggregation over the collected values
# ---------------------------------------------------------------------------

# reference-side aggregation delegates to HF datasets.load_metric (scrolls
# ROUGE/F1, squad_v2) — a hub fetch, impossible offline; per-doc
# process_results parity still runs for these, aggregation is compared by
# our own metric unit tests instead
AGGREGATION_OFFLINE_GATED = {
    "scrolls_govreport", "scrolls_narrativeqa", "scrolls_qasper",
    "scrolls_qmsum", "scrolls_summscreenfd", "squad2",
}

# the reference's process_results RAISES ImportError for zh/ja without
# jieba/nagisa; since round 5 ours segments with a built-in script-class
# fallback instead (tasks/translation.py — a deliberate extension), so
# results parity against the reference oracle is unevaluable offline for
# both pairs (tests/conftest.py pins the segmenters to the fallback)
RESULTS_GATED = {"wmt20-en-ja", "wmt20-en-zh"}


def req_list(reqs):
    """Flatten construct_requests output to the per-value request list the
    evaluator produces (reference evaluator.py:268-292)."""
    if reqs is None:
        return []
    if not isinstance(reqs, (list, tuple)):
        reqs = [reqs]
    return list(reqs)


def fake_results(reqs):
    """Deterministic fake LM outputs honoring Request index destructuring."""
    out = []
    for i, r in enumerate(reqs):
        full = {
            "loglikelihood": (-(0.25 + 0.13 * i), i % 2 == 0),
            "loglikelihood_rolling": -(1.5 + 0.17 * i),
            "greedy_until": f"fake response {i}",
        }[r.request_type]
        idx = getattr(r, "index", None)
        out.append(full if idx is None else full[idx])
    return out


def assert_value_equal(a, b, path):
    import numpy as np

    if isinstance(a, dict) and isinstance(b, dict):
        assert set(a) == set(b), f"{path}: keys {set(a)} vs {set(b)}"
        for k in a:
            assert_value_equal(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        assert len(a) == len(b), f"{path}: len {len(a)} vs {len(b)}"
        for i, (x, y) in enumerate(zip(a, b)):
            assert_value_equal(x, y, f"{path}[{i}]")
    elif isinstance(a, (int, float, np.floating, bool)) and isinstance(
        b, (int, float, np.floating, bool)
    ):
        assert np.allclose(
            float(a), float(b), rtol=1e-9, atol=1e-12, equal_nan=True
        ), f"{path}: {a} vs {b}"
    else:
        assert a == b, f"{path}: {a!r} vs {b!r}"


# ---------------------------------------------------------------------------
# evaluator-level end-to-end parity: the reference's evaluate() vs ours with
# the same deterministic fake LM (responses a pure function of request args,
# immune to internal request reordering on either side)
# ---------------------------------------------------------------------------

EVAL_TASKS = ["piqa", "boolq", "wikitext", "babi", "record", "coqa", "gsm8k",
              "hellaswag", "arc_easy", "wmt16-en-de", "drop", "truthfulqa_mc",
              "hendrycksTest-anatomy", "lambada_openai", "winogrande",
              "triviaqa", "anli_r1", "toxigen", "crows_pairs_english",
              "pile_arxiv", "ethics_utilitarianism", "mc_taco", "wsc273",
              "mutual", "webqs"]

ZERO_SHOT_ONLY_EVAL = {"wikitext", "truthfulqa_mc", "pile_arxiv",
                       "crows_pairs_english"}


class SeededFakeLM:
    def _h(self, args):
        return zlib.crc32(json.dumps(args, sort_keys=True, default=str).encode())

    def loglikelihood(self, requests):
        return [(-(self._h(a) % 1000) / 100.0 - 0.01, self._h(a) % 2 == 0)
                for a in requests]

    def loglikelihood_rolling(self, requests):
        return [-(self._h(a) % 1000) / 50.0 - 0.01 for a in requests]

    def greedy_until(self, requests):
        return [f"resp {self._h(a) % 97}" for a in requests]


@pytest.mark.parametrize("num_fewshot", [0, 1])
def test_evaluate_end_to_end_parity_vs_reference(num_fewshot, monkeypatch, capsys):
    load_reference_registry()
    import lm_eval.evaluator as ref_evaluator
    import lm_eval.metrics as ref_metrics

    from llm_lns_quantization_tpu.harness import evaluator as our_evaluator
    from llm_lns_quantization_tpu.harness import metrics as our_metrics

    # stderr math has its own tests (bootstrap ~= analytic in test_harness);
    # here compare pure metric values — the reference's stderr path also
    # div-zeroes under bootstrap_iters=0
    monkeypatch.setattr(ref_metrics, "stderr_for_metric",
                        lambda metric, bootstrap_iters: None)
    monkeypatch.setattr(our_metrics, "stderr_for_metric",
                        lambda metric, bootstrap_iters: None)

    names = [n for n in EVAL_TASKS
             if not (num_fewshot and n in ZERO_SHOT_ONLY_EVAL)]
    ref_tasks = {n: make_ref_task(n, FIXTURE_DOCS[n]) for n in names}
    our_tasks = {n: make_task(n) for n in names}

    r = ref_evaluator.evaluate(
        lm=SeededFakeLM(), task_dict=ref_tasks, num_fewshot=num_fewshot,
        limit=None, bootstrap_iters=0)
    o = our_evaluator.evaluate(
        lm=SeededFakeLM(), task_dict=our_tasks, num_fewshot=num_fewshot,
        limit=None, bootstrap_iters=0)
    capsys.readouterr()  # the reference evaluate prints every prompt

    for n in names:
        assert_value_equal(r["results"][n], o["results"][n], f"{n}.results")
        assert r["versions"][n] == o["versions"][n], f"{n}.version"


@pytest.mark.parametrize(
    "task_name",
    sorted(n for n in FIXTURE_DOCS if n not in STUB_TASKS | RESULTS_GATED),
)
def test_results_and_aggregation_parity_vs_reference(task_name):
    ours = make_task(task_name)
    ref = make_ref_task(task_name, FIXTURE_DOCS[task_name])

    agg_ref, agg_our = {}, {}
    for rd, od in zip(scoring_docs(ref), scoring_docs(ours)):
        ctx = ref.doc_to_text(rd)
        vals = fake_results(req_list(ref.construct_requests(rd, ctx)))
        rres = ref.process_results(rd, list(vals))
        ores = ours.process_results(od, list(vals))
        assert_value_equal(rres, ores, f"{task_name}.process_results")
        for k, v in rres.items():
            agg_ref.setdefault(k, []).append(v)
        for k, v in ores.items():
            agg_our.setdefault(k, []).append(v)

    assert ref.higher_is_better() == ours.higher_is_better()
    if task_name in AGGREGATION_OFFLINE_GATED:
        return
    ragg, oagg = ref.aggregation(), ours.aggregation()
    for k in agg_ref:
        assert k in ragg and k in oagg, f"aggregation key {k} missing"
        assert_value_equal(
            ragg[k](agg_ref[k]), oagg[k](agg_our[k]), f"{task_name}.agg.{k}"
        )


# ---------------------------------------------------------------------------
# utility-level cross-checks: rolling windows and the decontamination janitor
# against the reference's own implementations on randomized inputs
# ---------------------------------------------------------------------------


def test_rolling_token_windows_parity_vs_reference():
    load_reference_registry()
    import lm_eval.utils as ref_utils

    from llm_lns_quantization_tpu import utils as our_utils

    rng = random.Random(7)
    for _ in range(200):
        n = rng.randrange(0, 40)
        tokens = [rng.randrange(3, 999) for _ in range(n)]
        max_len = rng.randrange(2, 12)
        ctx_len = rng.randrange(1, max_len + 1)
        ref_w = list(ref_utils.get_rolling_token_windows(
            tokens, prefix_token=1, max_seq_len=max_len, context_len=ctx_len))
        our_w = list(our_utils.get_rolling_token_windows(
            tokens, prefix_token=1, max_seq_len=max_len, context_len=ctx_len))
        assert ref_w == our_w, (tokens, max_len, ctx_len)
        assert ([ref_utils.make_disjoint_window(p) for p in ref_w]
                == [our_utils.make_disjoint_window(p) for p in our_w])


def test_janitor_parity_vs_reference():
    load_reference_registry()
    sys.path.append(os.path.join(REFERENCE_ROOT, "lm_eval", "decontamination"))
    from lm_eval.decontamination.janitor import Janitor as RefJanitor

    from llm_lns_quantization_tpu.decontamination.janitor import Janitor

    rng = random.Random(11)
    words = ("alpha", "beta;", "Gamma,", "delta", "EPSILON", "zeta!", "eta",
             "theta?", "iota", "kappa's", "12.5", "mu-nu", "\n", "  ")
    corpus = " ".join(rng.choice(words) for _ in range(2000))
    contaminant = "gamma delta epsilon zeta"

    for n, window, min_slice, cutoff in [(2, 10, 5, 10), (3, 30, 10, 2),
                                         (1, 0, 1, 100)]:
        ref_j = RefJanitor(ngram_n=n, window_to_remove=window,
                           minimum_slice_length=min_slice,
                           too_dirty_cutoff=cutoff)
        our_j = Janitor(ngram_n=n, window_to_remove=window,
                        minimum_slice_length=min_slice,
                        too_dirty_cutoff=cutoff)
        ref_j.register_contaminant_python(contaminant)
        our_j.register_contaminant_python(contaminant)
        assert ref_j.dirt_ngrams == our_j.dirt_ngrams
        assert ref_j.normalize_string(corpus) == our_j.normalize_string(corpus)
        assert ref_j.clean_python(corpus) == our_j.clean_python(corpus)
