"""Task registry: string name -> Task class.

Equivalent of the reference's lm_eval/tasks/__init__.py:101-353 TASK_REGISTRY
and :414-426 get_task_dict, using the same registry names so model/task
selection strings are drop-in compatible.
"""

from typing import Dict, List, Union

from ..harness.task import Task
from . import (
    anli,
    arc,
    arithmetic,
    asdiv,
    babi,
    bigbench,
    ceval,
    cmmlu,
    csatqa,
    blimp,
    cbt,
    coqa,
    crowspairs,
    drop,
    glue,
    gsm8k,
    haerae,
    headqa,
    hellaswag,
    hendrycks_ethics,
    hendrycks_math,
    hendrycks_test,
    lambada,
    lambada_cloze,
    lambada_multilingual,
    logiqa,
    mathqa,
    mc_taco,
    mutual,
    naturalqs,
    nqopen,
    openbookqa,
    pawsx,
    pile,
    piqa,
    prost,
    pubmedqa,
    qa4mre,
    qasper,
    quac,
    race,
    sat,
    sciq,
    scrolls,
    squad,
    storycloze,
    superglue,
    swag,
    toxigen,
    translation,
    triviaqa,
    truthfulqa,
    unscramble,
    webqs,
    wikitext,
    winogrande,
    wsc273,
    xcopa,
    xnli,
    xstorycloze,
    xwinograd,
)
from . import mgsm as mgsm_mod

TASK_REGISTRY = {
    # GLUE
    "cola": glue.CoLA,
    "mnli": glue.MNLI,
    "mnli_mismatched": glue.MNLIMismatched,
    "mrpc": glue.MRPC,
    "rte": glue.RTE,
    "qnli": glue.QNLI,
    "qqp": glue.QQP,
    "sst": glue.SST,
    "wnli": glue.WNLI,
    # SuperGLUE
    "boolq": superglue.BoolQ,
    "cb": superglue.CommitmentBank,
    "copa": superglue.Copa,
    "multirc": superglue.MultiRC,
    "record": superglue.ReCoRD,
    "wic": superglue.WordsInContext,
    "wsc": superglue.SGWinogradSchemaChallenge,
    # LAMBADA
    "lambada_openai": lambada.LambadaOpenAI,
    "lambada_standard": lambada.LambadaStandard,
    "lambada_openai_cloze": lambada_cloze.LambadaOpenAICloze,
    "lambada_standard_cloze": lambada_cloze.LambadaStandardCloze,
    # perplexity
    "wikitext": wikitext.WikiText,
    # commonsense / MC
    "piqa": piqa.PiQA,
    "sciq": sciq.SciQ,
    "triviaqa": triviaqa.TriviaQA,
    "arc_easy": arc.ARCEasy,
    "arc_challenge": arc.ARCChallenge,
    "hellaswag": hellaswag.HellaSwag,
    "swag": swag.SWAG,
    "openbookqa": openbookqa.OpenBookQA,
    "race": race.RACE,
    "webqs": webqs.WebQs,
    "wsc273": wsc273.WinogradSchemaChallenge273,
    "winogrande": winogrande.Winogrande,
    # NLI
    "anli_r1": anli.ANLIRound1,
    "anli_r2": anli.ANLIRound2,
    "anli_r3": anli.ANLIRound3,
    # truthfulness
    "truthfulqa_mc": truthfulqa.TruthfulQAMultipleChoice,
    "truthfulqa_gen": truthfulqa.TruthfulQAGeneration,
    # math / reasoning
    "gsm8k": gsm8k.GradeSchoolMath8K,
    "arithmetic_2da": arithmetic.Arithmetic2DPlus,
    "arithmetic_2ds": arithmetic.Arithmetic2DMinus,
    "arithmetic_3da": arithmetic.Arithmetic3DPlus,
    "arithmetic_3ds": arithmetic.Arithmetic3DMinus,
    "arithmetic_4da": arithmetic.Arithmetic4DPlus,
    "arithmetic_4ds": arithmetic.Arithmetic4DMinus,
    "arithmetic_5da": arithmetic.Arithmetic5DPlus,
    "arithmetic_5ds": arithmetic.Arithmetic5DMinus,
    "arithmetic_2dm": arithmetic.Arithmetic2DMultiplication,
    "arithmetic_1dc": arithmetic.Arithmetic1DComposite,
    # reading comprehension / QA
    "babi": babi.Babi,
    "naturalqs": naturalqs.NaturalQs,
    "naturalqs_gen": naturalqs.NaturalQsGen,
    "nq_open": nqopen.NQOpen,
    "qasper": qasper.QASPER,
    "quac": quac.QuAC,
    "quac_gen": quac.QuACGen,
    "coqa": coqa.CoQA,
    "drop": drop.DROP,
    "squad2": squad.SQuAD2,
    "logiqa": logiqa.LogiQA,
    "mathqa": mathqa.MathQA,
    "headqa": headqa.HeadQAEs,  # (deprecated alias kept for compat)
    "headqa_es": headqa.HeadQAEs,
    "headqa_en": headqa.HeadQAEn,
    "pubmedqa": pubmedqa.Pubmed_QA,
    "mc_taco": mc_taco.MCTACO,
    "prost": prost.PROST,
    "qa4mre_2011": qa4mre.QA4MRE_2011,
    "qa4mre_2012": qa4mre.QA4MRE_2012,
    "qa4mre_2013": qa4mre.QA4MRE_2013,
    "mutual": mutual.MuTual,
    "mutual_plus": mutual.MuTualPlus,
    "sat": sat.SATAnalogies,
    "cbt-cn": cbt.CBTCN,
    "cbt-ne": cbt.CBTNE,
    "storycloze_2016": storycloze.StoryCloze2016,
    "storycloze_2018": storycloze.StoryCloze2018,
    "toxigen": toxigen.ToxiGen,
    # ethics
    "ethics_cm": hendrycks_ethics.EthicsCM,
    "ethics_deontology": hendrycks_ethics.EthicsDeontology,
    "ethics_justice": hendrycks_ethics.EthicsJustice,
    "ethics_utilitarianism_original": hendrycks_ethics.EthicsUtilitarianismOriginal,
    "ethics_utilitarianism": hendrycks_ethics.EthicsUtilitarianism,
    "ethics_virtue": hendrycks_ethics.EthicsVirtue,
    # MATH
    "math_algebra": hendrycks_math.MathAlgebra,
    "math_counting_and_prob": hendrycks_math.MathCountingAndProbability,
    "math_geometry": hendrycks_math.MathGeometry,
    "math_intermediate_algebra": hendrycks_math.MathIntermediateAlgebra,
    "math_num_theory": hendrycks_math.MathNumberTheory,
    "math_prealgebra": hendrycks_math.MathPrealgebra,
    "math_precalc": hendrycks_math.MathPrecalculus,
    "math_asdiv": asdiv.Asdiv,
    # unscramble
    "anagrams1": unscramble.Anagrams1,
    "anagrams2": unscramble.Anagrams2,
    "cycle_letters": unscramble.CycleLetters,
    "random_insertion": unscramble.RandomInsertion,
    "reversed_words": unscramble.ReversedWords,
    # dynamically generated families
    **hendrycks_test.create_all_tasks(),   # hendrycksTest-* (57)
    **blimp.create_all_tasks(),            # blimp_* (67)
    **pile.create_all_tasks(),             # pile_* (22)
    **crowspairs.create_all_tasks(),       # crows_pairs_* (22)
    **xcopa.create_all_tasks(),            # xcopa_* (11)
    **xnli.create_all_tasks(),             # xnli_* (15)
    **xstorycloze.create_all_tasks(),      # xstory_cloze_* (11)
    **xwinograd.create_all_tasks(),        # xwinograd_* (6)
    **pawsx.create_all_tasks(),            # pawsx_* (7)
    **mgsm_mod.create_all_tasks(),         # mgsm_* (11)
    **lambada_multilingual.construct_tasks(),  # lambada_openai_mt_* (5)
    **translation.create_tasks_from_benchmarks(
        translation.SELECTED_TRANSLATION_BENCHMARKS
    ),                                     # wmt*/iwslt17 pairs
    **ceval.create_all_tasks(),            # Ceval-valid-* (52)
    **cmmlu.create_all_tasks(),            # cmmlu-* (67)
    **csatqa.create_all_tasks(),           # csatqa_* (6)
    **haerae.create_all_tasks(),           # haerae_* (6)
    **bigbench.create_all_tasks(),         # bigbench_* (19)
    **scrolls.construct_tasks(),           # scrolls_* (7)
}

ALL_TASKS = sorted(TASK_REGISTRY)


def get_task(task_name: str):
    try:
        return TASK_REGISTRY[task_name]
    except KeyError:
        raise KeyError(f"missing task {task_name!r}") from None


def _is_json_task(task_name: str) -> bool:
    return task_name == "json" or task_name.startswith("json=")


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

    task_name_dict = {}
    for task_name in task_name_list:
        if not isinstance(task_name, str):
            continue
        if _is_json_task(task_name):
            from .json_task import create_task_from_argstring

            task_name_dict[task_name] = create_task_from_argstring(task_name)
            continue
        task_name_dict[task_name] = get_task(task_name)(
            data_dir=os.path.join(data_dir, task_name) if data_dir else None
        )
    task_name_from_object_dict = {
        get_task_name_from_object(task_object): task_object
        for task_object in task_name_list
        if not isinstance(task_object, str)
    }
    assert set(task_name_dict.keys()).isdisjoint(set(task_name_from_object_dict.keys()))
    return {**task_name_dict, **task_name_from_object_dict}
