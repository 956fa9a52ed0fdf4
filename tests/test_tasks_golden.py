"""Golden-file regression tests: request hashes + result dicts per task.

The reference's highest-value test pattern (tests/test_version_stable.py:
sha256 of the sorted-JSON request list per task + full result-dict goldens
under a fake LM, 698 files in tests/testdata/). Catches silent prompt /
doc-processing / metric drift. Files are self-bootstrapping: first run
writes them, later runs must match exactly.

Run with fixtures (offline); goldens live in tests/testdata/.
"""

import hashlib
import json
import os
import random

import pytest

from llm_lns_quantization_tpu.harness import evaluate
from llm_lns_quantization_tpu.lm.dummy import DummyLM

from fixtures import FIXTURE_DOCS, fixture_task_dict

TESTDATA = os.path.join(os.path.dirname(__file__), "testdata")
os.makedirs(TESTDATA, exist_ok=True)


def assert_target_hashed(dat, target_path):
    hash_ = hashlib.sha256(
        json.dumps(dat, sort_keys=True).encode("utf-8")
    ).hexdigest()
    if os.path.exists(target_path):
        with open(target_path) as f:
            assert f.read().strip() == hash_, (
                f"request hash changed for {target_path} — prompts or doc "
                f"processing drifted"
            )
    else:
        with open(target_path, "w") as f:
            f.write(hash_)


class SeededLM(DummyLM):
    """Deterministic responses keyed off request content."""

    def loglikelihood(self, requests):
        return [
            (
                -abs(random.Random(json.dumps([ctx, cont])).random()),
                bool(random.Random(json.dumps([cont, ctx])).random() > 0.5),
            )
            for ctx, cont in requests
        ]

    def loglikelihood_rolling(self, requests):
        return [-abs(random.Random(json.dumps(list(r))).random()) for r in requests]

    def greedy_until(self, requests):
        return ["golden continuation" for _ in requests]


@pytest.mark.parametrize("task_name", sorted(FIXTURE_DOCS))
@pytest.mark.parametrize("num_fewshot", [0, 1])
def test_requests_and_results_stable(task_name, num_fewshot):
    if task_name in ("quac", "naturalqs"):
        # PERMANENT (reference parity): the reference ships these two tasks
        # with construct_requests raising NotImplementedError (prompt-only
        # write_out stubs); the completed quac_gen/naturalqs_gen variants
        # run in this sweep instead.
        pytest.skip("construct_requests raises NotImplementedError — the "
                    "reference ships these tasks as prompt-only stubs "
                    "(doc_to_text/doc_to_target for write_out), same here")
    from llm_lns_quantization_tpu.harness.task import PerplexityTask

    zero_shot_only = {"wikitext", "prost", "truthfulqa_mc", "truthfulqa_gen",
                      "cbt-cn", "cbt-ne", "math_asdiv"}
    task_cls = type(fixture_task_dict([task_name])[task_name])
    if num_fewshot == 1 and (
        task_name in zero_shot_only
        or task_name.startswith(("crows_pairs_", "blimp_", "pile_"))
        or issubclass(task_cls, PerplexityTask)
    ):
        pytest.skip("task is zero-shot only")

    task_dict = fixture_task_dict([task_name])
    task = task_dict[task_name]

    # -------- request golden: rebuild all requests deterministically --------
    rnd = random.Random()
    rnd.seed(42)
    docs = list(
        task.test_docs() if task.has_test_docs() else task.validation_docs()
    )
    rnd2 = random.Random()
    rnd2.seed(42)
    rnd2.shuffle(docs)
    reqs = []
    for doc in docs:
        ctx = task.fewshot_context(doc=doc, num_fewshot=num_fewshot, rnd=rnd)
        rs = task.construct_requests(doc, ctx)
        if not isinstance(rs, (list, tuple)):
            rs = [rs]
        reqs.append([list(map(str, r.args)) for r in rs])

    assert_target_hashed(
        reqs,
        os.path.join(TESTDATA, f"{task_name}-v{task.VERSION}-fs{num_fewshot}-reqs.sha256"),
    )

    # -------- result golden: full evaluate() under the seeded fake LM --------
    res = evaluate(
        lm=SeededLM(),
        task_dict=fixture_task_dict([task_name]),
        num_fewshot=num_fewshot,
        limit=None,
        bootstrap_iters=10,
    )["results"]

    golden_path = os.path.join(
        TESTDATA, f"{task_name}-v{task.VERSION}-fs{num_fewshot}-res.json"
    )
    if os.path.exists(golden_path):
        with open(golden_path) as f:
            golden = json.load(f)
        assert sorted(golden[task_name]) == sorted(res[task_name])
        for metric, value in golden[task_name].items():
            assert res[task_name][metric] == pytest.approx(value, rel=1e-5, nan_ok=True)
    else:
        with open(golden_path, "w") as f:
            json.dump(res, f, indent=1, sort_keys=True)


@pytest.mark.parametrize("task_name", sorted(FIXTURE_DOCS))
def test_task_contract(task_name):
    if task_name in ("quac", "naturalqs"):
        pytest.skip("aggregation unimplemented (reference parity)")
    """Task interface contract (reference tests/test_tasks.py:7-50):
    has_*_docs sanity, aggregation/higher_is_better key agreement, VERSION,
    and determinism of doc iteration + request construction."""
    t1 = fixture_task_dict([task_name])[task_name]
    t2 = fixture_task_dict([task_name])[task_name]

    assert t1.has_training_docs() in (True, False)
    assert t1.has_validation_docs() in (True, False)
    assert t1.has_test_docs() in (True, False)
    assert isinstance(t1.VERSION, int)
    assert set(t1.aggregation().keys()) == set(t1.higher_is_better().keys())
    assert all(isinstance(v, bool) for v in t1.higher_is_better().values())

    def docs(t):
        return list(t.test_docs() if t.has_test_docs() else t.validation_docs())

    d1, d2 = docs(t1), docs(t2)
    assert d1 == d2

    rnd1, rnd2 = random.Random(7), random.Random(7)
    for doc1, doc2 in zip(d1, d2):
        ctx1 = t1.fewshot_context(doc=doc1, num_fewshot=0, rnd=rnd1)
        ctx2 = t2.fewshot_context(doc=doc2, num_fewshot=0, rnd=rnd2)
        assert ctx1 == ctx2
        r1 = t1.construct_requests(doc1, ctx1)
        r2 = t2.construct_requests(doc2, ctx2)
        if not isinstance(r1, (list, tuple)):
            r1, r2 = [r1], [r2]
        assert [r.args for r in r1] == [r.args for r in r2]


BIGBENCH_TASKS = sorted(
    n for n in __import__(
        "llm_lns_quantization_tpu.tasks", fromlist=["TASK_REGISTRY"]
    ).TASK_REGISTRY if n.startswith("bigbench_")
)


@pytest.mark.parametrize("task_name", BIGBENCH_TASKS)
def test_bigbench_requests_and_results_stable(task_name):
    """BIG-bench tasks carry their data in bundled JSON resources (no
    fixtures needed); golden-hash the first docs' requests and the limited
    evaluate() results, like the fixture tasks."""
    from llm_lns_quantization_tpu.tasks import get_task

    task = get_task(task_name)()
    docs = list(task.test_docs())[:8]
    rnd = random.Random()
    rnd.seed(42)
    reqs = []
    for doc in docs:
        ctx = task.fewshot_context(doc=doc, num_fewshot=0, rnd=rnd)
        rs = task.construct_requests(doc, ctx)
        if not isinstance(rs, (list, tuple)):
            rs = [rs]
        reqs.append([list(map(str, r.args)) for r in rs])
    assert_target_hashed(
        reqs,
        os.path.join(TESTDATA, f"{task_name}-v{task.VERSION}-fs0-reqs.sha256"),
    )

    res = evaluate(
        lm=SeededLM(),
        task_dict={task_name: get_task(task_name)()},
        num_fewshot=0,
        limit=8,
        bootstrap_iters=10,
    )["results"]
    golden_path = os.path.join(TESTDATA, f"{task_name}-v{task.VERSION}-fs0-res.json")
    if os.path.exists(golden_path):
        with open(golden_path) as f:
            golden = json.load(f)
        assert sorted(golden[task_name]) == sorted(res[task_name])
        for metric, value in golden[task_name].items():
            assert res[task_name][metric] == pytest.approx(
                value, rel=1e-5, nan_ok=True
            )
    else:
        with open(golden_path, "w") as f:
            json.dump(res, f, indent=1, sort_keys=True)
