"""Harness core tests: utils contracts, evaluator with DummyLM, caching.

Mirrors the reference's two highest-value test patterns (SURVEY.md §4):
tests/test_evaluator.py (fake LM + cache round-trip equality) and the rolling
-window doctest cases embedded in base.py:51-77.
"""

import random

import numpy as np
import pytest

from llm_lns_quantization_tpu import utils
from llm_lns_quantization_tpu.harness import (
    CachingLM,
    SqliteKV,
    evaluate,
    make_table,
    rf,
)
from llm_lns_quantization_tpu.lm.dummy import DummyLM

from fixtures import FIXTURE_DOCS, fixture_task_dict


# ---------------------------------------------------------------------------
# utils
# ---------------------------------------------------------------------------


def test_rolling_token_windows_reference_case():
    """The exact worked example from reference base.py:59-77."""
    windows = list(
        utils.get_rolling_token_windows(
            token_list=list(range(10)), prefix_token=-1, max_seq_len=4, context_len=1
        )
    )
    assert windows == [
        ([-1, 0, 1, 2], [0, 1, 2, 3]),
        ([3, 4, 5, 6], [4, 5, 6, 7]),
        ([5, 6, 7, 8], [8, 9]),
    ]
    # every token predicted exactly once
    preds = [t for _, p in windows for t in p]
    assert preds == list(range(10))


@pytest.mark.parametrize("n_tokens,max_seq_len", [(1, 4), (4, 4), (5, 4), (33, 8), (100, 7)])
def test_rolling_windows_cover_every_token_once(n_tokens, max_seq_len):
    windows = list(
        utils.get_rolling_token_windows(
            token_list=list(range(n_tokens)),
            prefix_token=-1,
            max_seq_len=max_seq_len,
            context_len=1,
        )
    )
    preds = [t for _, p in windows for t in p]
    assert preds == list(range(n_tokens))
    for inp, pred in windows:
        assert len(inp) <= max_seq_len
        # disjoint-window invariant: context end aligns with pred start
        a, b = utils.make_disjoint_window((inp, pred))
        assert len(a) + len(b) == len(inp) + 1


def test_make_disjoint_window():
    assert utils.make_disjoint_window(([1, 2, 3, 4, 5], [4, 5, 6])) == ([1, 2, 3], [4, 5, 6])
    assert utils.make_disjoint_window(([1, 2, 3, 4, 5], [6])) == ([1, 2, 3, 4, 5], [6])


def test_reorderer_restores_order():
    arr = ["bb", "a", "ccc", "a"]
    re_ord = utils.Reorderer(arr, lambda x: (-len(x), x))
    reordered = re_ord.get_reordered()
    assert reordered == ["ccc", "bb", "a"]  # duplicates grouped
    out = re_ord.get_original([len(x) for x in reordered])
    assert out == [2, 1, 3, 1]


def test_chunks_with_scheduler():
    sched = lambda i: 2 if i < 4 else 3
    got = list(utils.chunks(range(10), fn=sched))
    assert got == [[0, 1], [2, 3], [4, 5, 6], [7, 8, 9]]


def test_parse_args_string():
    d = utils.simple_parse_args_string("a=1,b=true,c=x/y,d=0.5,e=none")
    assert d == {"a": 1, "b": True, "c": "x/y", "d": 0.5, "e": None}
    assert utils.simple_parse_args_string("") == {}


def test_pattern_match():
    assert utils.pattern_match(["lambada_*"], ["lambada_openai", "lambada_standard", "piqa"]) == [
        "lambada_openai",
        "lambada_standard",
    ]


# ---------------------------------------------------------------------------
# evaluator + caching (reference tests/test_evaluator.py semantics)
# ---------------------------------------------------------------------------


class SeededLM(DummyLM):
    """Deterministic fake LM that also asserts the prompt space-convention
    (reference test_evaluator.py:22-27: context never ends with a space —
    the boundary space belongs to the continuation)."""

    def loglikelihood(self, requests):
        res = []
        for ctx, cont in requests:
            assert isinstance(ctx, str) and isinstance(cont, str)
            if ctx:
                assert ctx[-1] != " ", f"context ends with space: {ctx!r}"
            rnd = random.Random(hash((ctx, cont)) % 2**31)
            res.append((-abs(rnd.random()), False))
        return res

    def loglikelihood_rolling(self, requests):
        return [-abs(random.Random(hash(s) % 2**31).random()) for (s,) in requests]


@pytest.mark.parametrize("task_name", sorted(FIXTURE_DOCS))
def test_evaluate_task_with_dummy_lm(task_name, tmp_path):
    """Run every registered task end-to-end on fixtures through a cached fake
    LM twice; results must be identical (proves cache correctness)."""
    if task_name in ("quac", "naturalqs"):
        # PERMANENT: the reference itself ships these two tasks with
        # construct_requests raising NotImplementedError (prompt-only
        # write_out stubs, lm_eval/tasks/quac.py / naturalqs.py); completed
        # quac_gen/naturalqs_gen variants run alongside and ARE covered.
        pytest.skip("prompt-only stub tasks (reference parity)")
    task_dict = fixture_task_dict([task_name])
    lm = CachingLM(SeededLM(), str(tmp_path / "cache.db"))

    def run():
        return evaluate(
            lm=lm, task_dict=task_dict, num_fewshot=0, limit=None, bootstrap_iters=10
        )

    r1 = run()
    r2 = run()  # fully cache-served
    def _nan_eq(a, b):
        import math

        if isinstance(a, dict) and isinstance(b, dict):
            return a.keys() == b.keys() and all(
                _nan_eq(a[k], b[k]) for k in a
            )
        if isinstance(a, float) and isinstance(b, float):
            return (math.isnan(a) and math.isnan(b)) or a == b
        return a == b

    assert _nan_eq(r1["results"], r2["results"])
    assert task_name in r1["results"]
    assert r1["results"][task_name], "task produced no metrics"


def test_fewshot_context_deterministic():
    task = fixture_task_dict(["piqa"])["piqa"]
    rnd1, rnd2 = random.Random(42), random.Random(42)
    doc = list(task.validation_docs())[0]
    c1 = task.fewshot_context(doc=doc, num_fewshot=1, rnd=rnd1)
    c2 = task.fewshot_context(doc=doc, num_fewshot=1, rnd=rnd2)
    assert c1 == c2
    assert c1.endswith(task.doc_to_text(doc))


def test_description_appears_in_context():
    task = fixture_task_dict(["piqa"])["piqa"]
    doc = list(task.validation_docs())[0]
    ctx = task.fewshot_context(
        doc=doc, num_fewshot=0, rnd=random.Random(0), description="My description"
    )
    assert ctx.startswith("My description\n\n")


def test_sqlitekv_roundtrip(tmp_path):
    db = SqliteKV(str(tmp_path / "kv.db"))
    db["k"] = (1.5, True)
    db.commit()
    assert "k" in db
    assert db["k"] == (1.5, True)
    assert len(db) == 1
    db2 = SqliteKV(str(tmp_path / "kv.db"))
    assert db2["k"] == (1.5, True)


def test_request_destructuring():
    req = rf.loglikelihood("ctx", "cont")
    a, b = req
    assert a.index == 0 and b.index == 1
    with pytest.raises(IndexError):
        list(rf.greedy_until("ctx", {"until": ["\n"]}))


def test_make_table_renders():
    res = {
        "results": {"piqa": {"acc": 0.5, "acc_stderr": 0.1}},
        "versions": {"piqa": 0},
    }
    table = make_table(res)
    assert "piqa" in table and "0.5000" in table and "±" in table


def test_metrics():
    from llm_lns_quantization_tpu.harness import metrics

    assert metrics.mean([1, 2, 3]) == 2
    assert abs(metrics.weighted_perplexity([(-1.0, 1), (-1.0, 1)]) - 2.718281828) < 1e-6
    # bootstrap stderr approximates the analytic stderr of the mean
    # (reference tests/test_misc.py:6-12)
    rnd = random.Random(0)
    xs = [rnd.random() for _ in range(500)]
    boot = metrics.bootstrap_stderr(metrics.mean, xs, iters=2000)
    assert abs(boot - metrics.mean_stderr(xs)) < 1e-2


def test_tracer_phases():
    from llm_lns_quantization_tpu.harness.tracing import Tracer

    t = Tracer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    t.add("items", 5)
    s = t.summary()
    assert s["counts"]["a"] == 2 and s["counts"]["items"] == 5
    assert s["phase_seconds"]["a"] >= 0


def test_activation_stats_collector():
    import jax.numpy as jnp

    from llm_lns_quantization_tpu.harness.tracing import ActivationStats
    from llm_lns_quantization_tpu.models import build_model

    stats = ActivationStats()
    b = build_model(family="gpt2", preset="tiny", seed=0)
    tokens = jnp.asarray([[1, 2, 3, 4]])
    b.forward(b.params, b.cfg, tokens, stats)
    summary = stats.summary()
    # one entry per quant site that fired
    assert "attn_qkv" in summary and "lm_head" in summary
    assert summary["attn_qkv"]["calls"] == b.cfg.n_layer
    assert summary["lm_head"]["std"] > 0


def test_write_out_info_files(tmp_path):
    """--write_out parity (reference evaluator.py:245-292, 322-332, 379-399):
    per-task JSON with every rendered prompt, per-request logits, truth and
    per-doc metrics, written under output_base_path."""
    import json

    res = evaluate(
        lm=DummyLM(),
        task_dict=fixture_task_dict(["piqa"]),
        num_fewshot=1,
        bootstrap_iters=2,
        write_out=True,
        output_base_path=str(tmp_path),
    )
    assert "piqa" in res["results"]
    path = tmp_path / "piqa_write_out_info.json"
    assert path.exists()
    info = json.loads(path.read_text())
    assert len(info) > 0
    doc = info[0]
    assert any(k.startswith("prompt_") for k in doc)
    assert any(k.startswith("logit_") for k in doc)
    assert "truth" in doc
    assert "acc" in doc


def test_json_task_through_cli_path(tmp_path):
    """``--tasks json=split:key:/path`` (reference lm_eval/tasks/json.py +
    utils.py:88-118): the inline task name must survive MultiChoice validation
    and pattern_match, and run rolling perplexity end-to-end through
    simple_evaluate on a local JSON corpus."""
    import json

    from llm_lns_quantization_tpu import tasks as task_lib
    from llm_lns_quantization_tpu.harness.evaluator import simple_evaluate

    path = tmp_path / "corpus.json"
    docs = [{"text": "the quick brown fox jumps over the lazy dog. " * 8},
            {"text": "pack my box with five dozen liquor jugs. " * 8}]
    path.write_text(json.dumps({"validation": docs}))

    name = f"json=validation:text:{path}"
    assert name in utils.MultiChoice(task_lib.ALL_TASKS)
    matched = utils.pattern_match([name], task_lib.ALL_TASKS)
    assert matched == [name]

    out = simple_evaluate(
        model="tpu",
        model_args="family=gpt2,preset=tiny,dtype=float32,batch_size=2,seed=3",
        tasks=matched,
        num_fewshot=0,
        no_cache=True,
        bootstrap_iters=0,
    )
    res = out["results"][name]
    for k in ("word_perplexity", "byte_perplexity", "bits_per_byte"):
        assert np.isfinite(res[k]) and res[k] > 0


def test_stderr_for_metric_zero_iters_skips_bootstrap():
    """bootstrap_iters=0 means 'no stderrs' (the eval_formats sweep computes
    its own per-doc CIs); bootstrappable metrics must return None instead of
    dividing by zero in the chunked bootstrap (round-4 lambada regression)."""
    from llm_lns_quantization_tpu.harness import metrics

    assert metrics.stderr_for_metric(metrics.perplexity, 0) is None
    assert metrics.stderr_for_metric(metrics.median, 0) is None
    fn = metrics.stderr_for_metric(metrics.perplexity, 100)
    assert fn is not None and fn([-1.0, -2.0, -1.5]) > 0
