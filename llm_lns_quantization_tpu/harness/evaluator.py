"""Evaluation orchestration: build LM + tasks, run requests, aggregate.

Mirrors the reference's lm_eval/evaluator.py: ``simple_evaluate``
(:17-145) wires model construction, sqlite caching and task selection;
``evaluate`` (:152-401) gathers typed requests per task doc, dispatches them
batched per request type, routes results back through ``process_results`` and
aggregates with bootstrap standard errors; ``make_table`` (:404-434) renders
the result dict (markdown here is hand-rolled — no pytablewriter dependency).
"""

import collections
import itertools
import random

import numpy as np

from . import metrics as metrics_mod
from .api import LM
from .cache import CachingLM

decontaminate_suffix = "_decontaminate"

_HF_FAMILY = {
    "gpt2": "gpt2",
    "llama": "llama",
    "opt": "opt",
    "gpt_neo": "neo",
    "gptj": "gptj",
    "gpt_neox": "neox",
    "bloom": "bloom",
    "t5": "t5",
    "bert": "bert",
}


def _is_hf_model(model) -> bool:
    try:
        import transformers

        return isinstance(model, transformers.PreTrainedModel)
    except ImportError:
        return False


def _lm_from_hf_model(model, batch_size=None, quant=None):
    """Export an in-memory HF model and load it through the TPU engine."""
    import tempfile

    model_type = getattr(model.config, "model_type", None)
    family = _HF_FAMILY.get(model_type)
    if family is None:
        raise ValueError(
            f"unsupported in-memory HF model type {model_type!r}; "
            f"supported: {sorted(_HF_FAMILY)}"
        )
    if family == "t5":
        from ..lm.tpu_seq2seq import TPUSeq2SeqLM as engine_cls
    elif family == "bert":
        from ..lm.tpu_mlm import TPUMLM as engine_cls
    else:
        from ..lm.tpu_lm import TPULM as engine_cls
    tmp = tempfile.mkdtemp(prefix="hf_export_")
    model.save_pretrained(tmp, safe_serialization=True)
    tok = getattr(model.config, "_name_or_path", None) or "byte"
    try:
        return engine_cls(
            family=family, pretrained=tmp, tokenizer=tok,
            batch_size=int(batch_size) if batch_size else 8, quant=quant,
        )
    except Exception:
        # tokenizer not resolvable locally — fall back to the byte tokenizer
        return engine_cls(
            family=family, pretrained=tmp, tokenizer="byte",
            batch_size=int(batch_size) if batch_size else 8, quant=quant,
        )


def simple_evaluate(
    model,
    model_args=None,
    tasks=(),
    num_fewshot=0,
    batch_size=None,
    max_batch_size=None,
    device=None,
    no_cache=False,
    limit=None,
    bootstrap_iters=100000,
    description_dict=None,
    check_integrity=False,
    decontamination_ngrams_path=None,
    write_out=False,
    output_base_path=None,
    quant=None,
    data_dir=None,
):
    """Instantiate and evaluate a model on a list of tasks.

    ``model`` is a registry name (see lm.registry) or an LM instance;
    ``quant`` is a quantization spec string (see quant.config.QuantConfig.parse)
    — the first-class replacement for the reference's comment-block toggling.
    """
    from .. import lm as lm_registry
    from ..tasks import get_task_dict

    random.seed(1234)
    np.random.seed(1234)

    assert tasks, "No tasks specified"

    if quant is not None:
        # validate the spec up front — even for backends that ignore it —
        # so a typo'd format name fails loudly instead of silently running
        # an unquantized eval
        from ..quant.config import QuantConfig

        QuantConfig.parse(quant)

    if isinstance(model, str):
        if model_args is None:
            model_args = ""
        extra = {
            "batch_size": batch_size,
            "max_batch_size": max_batch_size,
            "device": device,
        }
        if quant is not None:
            extra["quant"] = quant
        lm = lm_registry.get_model(model).create_from_arg_string(model_args, extra)
    elif _is_hf_model(model):
        # in-memory HF model (reference evaluator.py:86-93): export it and
        # load through the TPU engine (model_type -> family)
        lm = _lm_from_hf_model(model, batch_size=batch_size, quant=quant)
        no_cache = True
    else:
        assert isinstance(model, LM)
        lm = model

    # is this a local JAX engine? (pure-API adapters and DummyLM have no
    # bundle; for those, never touch jax — process_count() would force
    # backend init on a path that does not need an accelerator at all)
    is_jax_engine = getattr(lm, "bundle", None) is not None

    if not no_cache and isinstance(model, str):
        cache_key = (
            model
            + "_"
            + (model_args or "").replace("=", "-").replace(",", "_").replace("/", "-")
        )
        lm = CachingLM(lm, "lm_cache/" + cache_key + ".db")

    # multi-host pod: each host scores its host-cyclic request slice, results
    # all-gathered (parallel/multihost.py). Single process: no-op. Wraps
    # OUTSIDE the cache so every host shards the same full request list —
    # per-host caches legitimately diverge mid-run (add_partial writes local
    # slices), and a cache-derived miss list would mispair on merge.
    if is_jax_engine:
        try:
            import jax

            n_proc = jax.process_count()
        except Exception:  # backend unavailable
            n_proc = 1
        if n_proc > 1:
            from ..parallel.multihost import MultihostLM

            lm = MultihostLM(lm)

    task_dict = get_task_dict(list(tasks), data_dir=data_dir)

    if check_integrity:
        from .. import utils

        # run the golden-file tests for just these tasks
        import pathlib
        import sys

        import pytest

        root = pathlib.Path(__file__).resolve().parents[2]
        args = [
            str(root / "tests" / "test_tasks_golden.py"),
            f"--rootdir={root}",
            "-k",
            " or ".join(tasks),
        ]
        sys.path.append(str(root))
        if pytest.main(args):
            raise ValueError(f"integrity tests failed for tasks {tasks}")

    results = evaluate(
        lm=lm,
        task_dict=task_dict,
        num_fewshot=num_fewshot,
        limit=limit,
        bootstrap_iters=bootstrap_iters,
        description_dict=description_dict,
        decontamination_ngrams_path=decontamination_ngrams_path,
        write_out=write_out,
        output_base_path=output_base_path,
    )

    model_name = model if isinstance(model, str) else type(model).__name__
    results["config"] = {
        "model": model_name,
        "model_args": model_args,
        "num_fewshot": num_fewshot,
        "batch_size": batch_size,
        "batch_sizes": list(getattr(lm, "batch_sizes", {}).values()),
        "device": device,
        "no_cache": no_cache,
        "limit": limit,
        "bootstrap_iters": bootstrap_iters,
        "description_dict": description_dict,
        "quant": quant,
    }
    return results


def evaluate(
    lm,
    task_dict,
    provide_description=None,
    num_fewshot=0,
    limit=None,
    bootstrap_iters=100000,
    description_dict=None,
    decontamination_ngrams_path=None,
    write_out=False,
    output_base_path=None,
):
    """Run the request-driven evaluation loop over instantiated tasks."""
    # deprecated kwarg accepted for reference API compatibility
    # (reference evaluator.py:155,190-196: never implemented, warns if passed)
    assert not provide_description
    if provide_description is not None:
        print(
            "WARNING: provide_description is deprecated and will be removed "
            "in a future version in favor of description_dict"
        )

    decontaminate = decontamination_ngrams_path is not None

    task_dict_items = [
        (name, task)
        for name, task in task_dict.items()
        if (task.has_validation_docs() or task.has_test_docs())
    ]

    results = collections.defaultdict(dict)
    versions = collections.defaultdict(dict)
    requests = collections.defaultdict(list)
    requests_origin = collections.defaultdict(list)
    overlaps = collections.defaultdict(list)

    docs = {}
    write_out_info = {}
    docs_for_decontamination = collections.defaultdict(list)

    for task_name, task in task_dict_items:
        versions[task_name] = task.VERSION
        # prefer the test split, fall back to validation (reference
        # evaluator.py:230-239); decontamination caching keys off the split
        if task.has_test_docs():
            task_doc_func = task.test_docs
            task_set = "test"
        elif task.has_validation_docs():
            task_set = "val"
            task_doc_func = task.validation_docs
        else:
            raise RuntimeError("Task has neither test_docs nor validation_docs")

        # deterministic shuffle (seed 42) before the limit cut, so a limited
        # run samples rather than takes a sorted prefix
        task_docs = list(task_doc_func())
        rnd = random.Random()
        rnd.seed(42)
        rnd.shuffle(task_docs)

        if write_out:
            prompt_details = []

        description = (
            description_dict[task_name]
            if description_dict and task_name in description_dict
            else ""
        )
        task_limit = None
        if limit is not None:
            task_limit = int(len(task_docs) * limit) if limit < 1.0 else int(limit)

        for doc_id, doc in enumerate(itertools.islice(task_docs, 0, task_limit)):
            if decontaminate and task.should_decontaminate():
                docs_for_decontamination[(task_name, task_set)].append(
                    task.doc_to_decontamination_query(doc)
                )
            docs[(task_name, doc_id)] = doc
            ctx = task.fewshot_context(
                doc=doc, num_fewshot=num_fewshot, rnd=rnd, description=description
            )
            reqs = task.construct_requests(doc, ctx)
            if write_out:
                prompt_details.append({"doc_id": doc_id})
            if not isinstance(reqs, (list, tuple)):
                reqs = [reqs]
            for i, req in enumerate(reqs):
                requests[req.request_type].append(req)
                requests_origin[req.request_type].append((i, task_name, doc, doc_id))
                if write_out:
                    prompt_details[-1][f"prompt_{i}"] = "".join(
                        map(lambda x: "".join(map(str, x)), req.args)
                    )

        if write_out:
            write_out_info[task_name] = prompt_details

    if decontaminate:
        from ..decontamination.decontaminate import get_train_overlap

        overlaps = get_train_overlap(
            docs_for_decontamination, decontamination_ngrams_path, limit
        )

    process_res_queue = collections.defaultdict(list)

    from . import tracing

    for reqtype, reqs in requests.items():
        with tracing.maybe_phase(f"requests/{reqtype}"):
            resps = getattr(lm, reqtype)([req.args for req in reqs])
        resps = [x if req.index is None else x[req.index] for x, req in zip(resps, reqs)]
        for resp, (i, task_name, doc, doc_id) in zip(resps, requests_origin[reqtype]):
            process_res_queue[(task_name, doc_id)].append((i, resp))
            if write_out:
                from .task import MultipleChoiceTask

                write_out_info[task_name][doc_id][f"logit_{i}"] = resp
                task = task_dict[task_name]
                if isinstance(task, MultipleChoiceTask):
                    write_out_info[task_name][doc_id]["truth"] = doc.get("gold")
                else:
                    write_out_info[task_name][doc_id]["truth"] = task.doc_to_target(doc)

    vals = collections.defaultdict(list)

    for (task_name, doc_id), responses in process_res_queue.items():
        responses.sort(key=lambda x: x[0])
        responses = [x[1] for x in responses]
        task = task_dict[task_name]
        doc = docs[(task_name, doc_id)]
        doc_metrics = task.process_results(doc, responses)
        for metric, value in doc_metrics.items():
            vals[(task_name, metric)].append(value)
            if write_out:
                write_out_info[task_name][doc_id][metric] = str(value)
            if decontaminate and task_name in overlaps:
                if doc_id not in overlaps[task_name]:
                    vals[(task_name, metric + decontaminate_suffix)].append(value)

    for (task_name, metric), items in vals.items():
        task = task_dict[task_name]
        real_metric = metric
        if metric.endswith(decontaminate_suffix):
            real_metric = metric.replace(decontaminate_suffix, "")
        results[task_name][metric] = task.aggregation()[real_metric](items)

        # bleu/chrf/ter bootstraps are expensive; cap them (reference :366-374)
        stderr = metrics_mod.stderr_for_metric(
            metric=task.aggregation()[real_metric],
            bootstrap_iters=min(bootstrap_iters, 1000)
            if metric in ["bleu", "chrf", "ter"]
            else bootstrap_iters,
        )
        if stderr is not None and len(items) > 1:
            results[task_name][metric + "_stderr"] = stderr(items)

    if write_out:
        import json
        import pathlib

        output_base_path = (
            pathlib.Path(output_base_path)
            if output_base_path is not None
            else pathlib.Path(".")
        )
        output_base_path.mkdir(parents=True, exist_ok=True)
        for task_name, _ in task_dict_items:
            # json=<split>:<key>:<path> task names embed a filesystem path;
            # keep the write-out file a single path component
            fname = task_name.replace("/", "_") + "_write_out_info.json"
            with open(
                output_base_path.joinpath(fname),
                "w",
                encoding="utf8",
            ) as fp:
                json.dump(write_out_info[task_name], fp, indent=4, ensure_ascii=False)

    return {"results": dict(results), "versions": dict(versions)}


def make_table(result_dict):
    """Render the result dict as a GitHub-flavored markdown table."""
    headers = ["Task", "Version", "Metric", "Value", "", "Stderr"]
    rows = []
    for k, dic in result_dict["results"].items():
        version = result_dict["versions"].get(k, "")
        for m, v in sorted(dic.items()):
            if m.endswith("_stderr"):
                continue
            if m + "_stderr" in dic:
                se = dic[m + "_stderr"]
                rows.append([k, str(version), m, "%.4f" % v, "±", "%.4f" % se])
            else:
                rows.append([k, str(version), m, "%.4f" % v, "", ""])
            k = ""
            version = ""
    widths = [
        max(len(h), *(len(r[i]) for r in rows)) if rows else len(h)
        for i, h in enumerate(headers)
    ]
    def fmt(row):
        return "|" + "|".join(c.ljust(w) for c, w in zip(row, widths)) + "|"

    lines = [fmt(headers), "|" + "|".join("-" * w for w in widths) + "|"]
    lines += [fmt(r) for r in rows]
    return "\n".join(lines) + "\n"
