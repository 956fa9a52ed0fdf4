"""Task registry: string name -> Task class.

Equivalent of the reference's lm_eval/tasks/__init__.py:101-353 TASK_REGISTRY
and :414-426 get_task_dict. Tier-1 tasks (the reference's own
scripts/regression.py:21-26 regression set plus LAMBADA variants and SciQ)
are in; further tiers land module by module.
"""

from typing import Dict, List, Union

from ..harness.task import Task
from . import arc, hellaswag, lambada, openbookqa, piqa, sciq, superglue, winogrande, wikitext

TASK_REGISTRY = {
    "wikitext": wikitext.WikiText,
    "lambada_standard": lambada.LambadaStandard,
    "lambada_openai": lambada.LambadaOpenAI,
    "hellaswag": hellaswag.HellaSwag,
    "piqa": piqa.PiQA,
    "arc_easy": arc.ARCEasy,
    "arc_challenge": arc.ARCChallenge,
    "openbookqa": openbookqa.OpenBookQA,
    "winogrande": winogrande.Winogrande,
    "boolq": superglue.BoolQ,
    "sciq": sciq.SciQ,
}

ALL_TASKS = sorted(TASK_REGISTRY)


def get_task(task_name: str):
    try:
        return TASK_REGISTRY[task_name]
    except KeyError:
        raise KeyError(f"missing task {task_name!r}; available: {ALL_TASKS}") from None


def get_task_name_from_object(task_object):
    for name, class_ in TASK_REGISTRY.items():
        if class_ is task_object:
            return name
    return (
        task_object.EVAL_HARNESS_NAME
        if hasattr(task_object, "EVAL_HARNESS_NAME")
        else type(task_object).__name__
    )


def get_task_dict(
    task_name_list: List[Union[str, Task]], data_dir: str = None
) -> Dict[str, Task]:
    """Instantiate tasks by name. ``data_dir`` (offline mode) points at a
    directory of ``<task_name>/{split}.json[l]`` fixture files; without it
    tasks load through HF datasets (reference behavior)."""
    import os

    task_name_dict = {
        task_name: get_task(task_name)(
            data_dir=os.path.join(data_dir, task_name) if data_dir else None
        )
        for task_name in task_name_list
        if isinstance(task_name, str)
    }
    task_name_from_object_dict = {
        get_task_name_from_object(task_object): task_object
        for task_object in task_name_list
        if not isinstance(task_object, str)
    }
    assert set(task_name_dict.keys()).isdisjoint(set(task_name_from_object_dict.keys()))
    return {**task_name_dict, **task_name_from_object_dict}
