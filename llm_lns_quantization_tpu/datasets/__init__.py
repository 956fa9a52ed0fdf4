"""HF ``datasets`` builders for the 12 custom-loader task families.

The reference ships one hand-written GeneratorBasedBuilder script per
dataset (``/root/reference/lm_eval/datasets/*/*.py``, ~1.8k LoC of
boilerplate); this module provides the same 12 builders — same config
names, same declared ``Features`` (oracle-checked against the reference
scripts by tests/test_dataset_schema_contracts.py), same source-file
parsing — behind ONE declarative spec table and a builder factory.

On this machine there is no network, so the download path is dormant:
``--data_dir`` fixtures remain the default (harness/task.py tries local
splits first). On a networked deployment, ``hub_builder(DATASET_PATH)``
resolves a task's hub path to its local builder class and
``harness/task.py`` uses it before falling back to the hub, restoring the
reference's from-source download path for coqa/drop/pile/quac/headqa/
unscramble/asdiv/mutual/logiqa/hendrycks_ethics/hendrycks_math/
sat_analogies.

Reference: lm_eval/datasets/{asdiv/asdiv.py,coqa/coqa.py,drop/drop.py,
headqa/headqa.py,hendrycks_ethics/hendrycks_ethics.py,
hendrycks_math/hendrycks_math.py,logiqa/logiqa.py,mutual/mutual.py,
pile/pile.py,quac/quac.py,sat_analogies/sat_analogies.py,
unscramble/unscramble.py}; SURVEY.md section 2.1 "custom dataset loaders".
"""

import csv
import json
import os
import pathlib
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Callable, Optional, Tuple

# ---------------------------------------------------------------------------
# Spec table + factory
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BuilderSpec:
    """Everything one dataset builder needs, declaratively."""

    name: str
    description: str
    homepage: str
    configs: Tuple[str, ...]
    features: Callable          # config_name -> datasets.Features
    splits: Callable            # (config_name, dl_manager) -> [(split, kw)]
    parse: Callable             # (config_name, **gen_kwargs) -> iter (k, doc)
    version: str = "0.0.1"
    manual: Optional[str] = None  # manual-download instructions (sat)


_SPECS = {}
_CLASSES = {}


def _spec(**kw):
    s = BuilderSpec(**kw)
    _SPECS[s.name] = s
    return s


def builder_names():
    return sorted(_SPECS)


def get_builder(name: str):
    """Materialize (and cache) the GeneratorBasedBuilder class for a spec.

    Lazy: importing this package must not import ``datasets`` (the eval
    path never needs it when --data_dir fixtures are used)."""
    if name in _CLASSES:
        return _CLASSES[name]
    import datasets

    spec = _SPECS[name]

    class _Builder(datasets.GeneratorBasedBuilder):
        VERSION = datasets.Version(spec.version)
        BUILDER_CONFIGS = [
            datasets.BuilderConfig(
                name=c, version=datasets.Version(spec.version), description=c
            )
            for c in spec.configs
        ]

        def _info(self):
            return datasets.DatasetInfo(
                description=spec.description,
                features=spec.features(self.config.name),
                homepage=spec.homepage,
                license="",
                citation="",
            )

        def _split_generators(self, dl_manager):
            return [
                datasets.SplitGenerator(name=split, gen_kwargs=kw)
                for split, kw in spec.splits(self.config.name, dl_manager)
            ]

        def _generate_examples(self, **kw):
            return spec.parse(self.config.name, **kw)

    if spec.manual:
        _Builder.manual_download_instructions = property(
            lambda self: spec.manual
        )
    _Builder.__name__ = _Builder.__qualname__ = spec.name
    _CLASSES[name] = _Builder
    return _Builder


# task DATASET_PATHs (hub ids) served by a local builder when the hub is
# reachable but the hand-rolled from-source path is preferred — the same
# 12 datasets the reference loaded via scripts
HUB_ALIASES = {
    "EleutherAI/asdiv": "asdiv",
    "EleutherAI/coqa": "coqa",
    "EleutherAI/drop": "drop",
    "head_qa": "headqa",
    "hendrycks/ethics": "hendrycks_ethics",
    "EleutherAI/hendrycks_math": "hendrycks_math",
    "lucasmccabe/logiqa": "logiqa",
    "EleutherAI/mutual": "mutual",
    "EleutherAI/pile": "pile",
    "quac": "quac",
    "sat_analogies": "sat_analogies",
    "unscramble": "unscramble",
}


def hub_builder(dataset_path):
    """Builder class for a task's DATASET_PATH, or None if not ours."""
    name = HUB_ALIASES.get(dataset_path)
    return get_builder(name) if name else None


def _V(t="string"):
    import datasets

    return datasets.Value(t)


def _Seq(inner=None):
    import datasets

    return datasets.features.Sequence(
        _V() if inner is None else inner
    )


def _F(d):
    import datasets

    return datasets.Features(d)


# ---------------------------------------------------------------------------
# asdiv — XML math word problems, validation split only
# ---------------------------------------------------------------------------

_ASDIV_SHA = "55790e5270bb91ccfa5053194b25732534696b50"
_ASDIV_URL = (
    f"https://github.com/chaochun/nlu-asdiv-dataset/archive/{_ASDIV_SHA}.zip"
)


def _asdiv_splits(cfg, dl):
    import datasets

    root = dl.download_and_extract(_ASDIV_URL)
    path = os.path.join(
        root, f"nlu-asdiv-dataset-{_ASDIV_SHA}", "dataset", "ASDiv.xml"
    )
    return [(datasets.Split.VALIDATION, {"filepath": path})]


def _asdiv_parse(cfg, filepath):
    root = ET.parse(filepath).getroot()
    for key, prob in enumerate(root.iter("Problem")):
        yield key, {
            "body": prob.find("Body").text,
            "question": prob.find("Question").text,
            "solution_type": prob.find("Solution-Type").text,
            "answer": prob.find("Answer").text,
            "formula": prob.find("Formula").text,
        }


_spec(
    name="asdiv",
    description="ASDiv: diverse English math word problems.",
    homepage="https://github.com/chaochun/nlu-asdiv-dataset",
    configs=("asdiv",),
    features=lambda cfg: _F(
        {
            "body": _V(),
            "question": _V(),
            "solution_type": _V(),
            "answer": _V(),
            "formula": _V(),
        }
    ),
    splits=_asdiv_splits,
    parse=_asdiv_parse,
)


# ---------------------------------------------------------------------------
# coqa — conversational QA with the additional_answers feature
# ---------------------------------------------------------------------------

_COQA_URLS = {
    "train": "https://nlp.stanford.edu/data/coqa/coqa-train-v1.0.json",
    "validation": "https://nlp.stanford.edu/data/coqa/coqa-dev-v1.0.json",
}


def _coqa_answer_feature():
    return {
        "span_start": _V("int32"),
        "span_end": _V("int32"),
        "span_text": _V(),
        "input_text": _V(),
        "turn_id": _V("int32"),
    }


def _coqa_features(cfg):
    return _F(
        {
            "id": _V(),
            "source": _V(),
            "story": _V(),
            "questions": _Seq(
                {"input_text": _V(), "turn_id": _V("int32")}
            ),
            "answers": _Seq(_coqa_answer_feature()),
            "additional_answers": {
                k: _Seq(_coqa_answer_feature()) for k in ("0", "1", "2")
            },
        }
    )


def _coqa_splits(cfg, dl):
    import datasets

    paths = dl.download_and_extract(_COQA_URLS)
    return [
        (datasets.Split.TRAIN, {"filepath": paths["train"], "split": "train"}),
        (
            datasets.Split.VALIDATION,
            {"filepath": paths["validation"], "split": "validation"},
        ),
    ]


def _cols(rows, keys):
    """list-of-dicts -> dict-of-lists: the normalized example shape
    ``Sequence({...})`` features require from ``_generate_examples`` on
    datasets >= 5 (which also IS the access-time shape tasks consume; the
    reference's scripts yield list-of-dicts, which that version rejects)."""
    return {k: [r[k] for r in rows] for k in keys}


_COQA_ANS_KEYS = ("span_start", "span_end", "span_text", "input_text",
                  "turn_id")

# the train set carries no additional_answers; same empty shape as validation
_COQA_EMPTY_ROW = {
    "span_start": -1,
    "span_end": -1,
    "span_text": "",
    "input_text": "",
    "turn_id": -1,
}


def _coqa_parse(cfg, filepath, split):
    with open(filepath, encoding="utf-8") as f:
        data = json.load(f)
    for row in data["data"]:
        if split == "train":
            extra = {
                k: _cols([_COQA_EMPTY_ROW], _COQA_ANS_KEYS)
                for k in ("0", "1", "2")
            }
        else:
            extra = {
                k: _cols(row["additional_answers"][k], _COQA_ANS_KEYS)
                for k in ("0", "1", "2")
            }
        yield row["id"], {
            "id": row["id"],
            "source": row["source"],
            "story": row["story"],
            "questions": _cols(row["questions"], ("input_text", "turn_id")),
            "answers": _cols(row["answers"], _COQA_ANS_KEYS),
            "additional_answers": extra,
        }


_spec(
    name="coqa",
    description="CoQA: conversational question answering.",
    homepage="https://stanfordnlp.github.io/coqa/",
    configs=("coqa",),
    features=_coqa_features,
    splits=_coqa_splits,
    parse=_coqa_parse,
)


# ---------------------------------------------------------------------------
# drop — discrete reasoning over paragraphs
# ---------------------------------------------------------------------------

_DROP_URL = (
    "https://s3-us-west-2.amazonaws.com/allennlp/datasets/drop/"
    "drop_dataset.zip"
)


def _drop_answer_feature():
    return {
        "number": _V(),
        "date": {"day": _V(), "month": _V(), "year": _V()},
        "spans": _Seq(),
        "worker_id": _V(),
        "hit_id": _V(),
    }


def _drop_features(cfg):
    return _F(
        {
            "section_id": _V(),
            "passage": _V(),
            "question": _V(),
            "query_id": _V(),
            "answer": _drop_answer_feature(),
            "validated_answers": _Seq(_drop_answer_feature()),
        }
    )


def _drop_splits(cfg, dl):
    import datasets

    root = dl.download_and_extract(_DROP_URL)
    base = os.path.join(root, "drop_dataset")
    return [
        (
            datasets.Split.TRAIN,
            {"filepath": os.path.join(base, "drop_dataset_train.json")},
        ),
        (
            datasets.Split.VALIDATION,
            {"filepath": os.path.join(base, "drop_dataset_dev.json")},
        ),
    ]


def _drop_answer(a):
    return {
        "number": a.get("number", ""),
        "date": {
            "day": a.get("date", {}).get("day", ""),
            "month": a.get("date", {}).get("month", ""),
            "year": a.get("date", {}).get("year", ""),
        },
        "spans": a.get("spans", []),
        "worker_id": a.get("worker_id", ""),
        "hit_id": a.get("hit_id", ""),
    }


_DROP_EMPTY_VALIDATED = [
    {
        "number": "",
        "date": {"day": "", "month": "", "year": ""},
        "spans": [],
        "worker_id": "",
        "hit_id": "",
    }
]
_DROP_ANS_KEYS = ("number", "date", "spans", "worker_id", "hit_id")


def _drop_parse(cfg, filepath):
    with open(filepath, encoding="utf-8") as f:
        data = json.load(f)
    key = 0
    for section_id, example in data.items():
        for qa in example["qa_pairs"]:
            validated = _cols(
                [_drop_answer(v) for v in qa["validated_answers"]]
                if "validated_answers" in qa
                else _DROP_EMPTY_VALIDATED,
                _DROP_ANS_KEYS,
            )
            yield key, {
                "section_id": section_id,
                "passage": example["passage"],
                "question": qa["question"],
                "query_id": qa["query_id"],
                "answer": _drop_answer(qa["answer"]),
                "validated_answers": validated,
            }
            key += 1


_spec(
    name="drop",
    description="DROP: discrete reasoning over paragraphs.",
    homepage="https://allenai.org/data/drop",
    configs=("drop",),
    features=_drop_features,
    splits=_drop_splits,
    parse=_drop_parse,
)


# ---------------------------------------------------------------------------
# headqa — Spanish/English healthcare exams (one archive, two language dirs)
# ---------------------------------------------------------------------------

_HEADQA_URL = (
    "https://drive.google.com/uc?export=download&confirm=t"
    "&id=1a_95N5zQQoUCq8IBNVZgziHbeM-QxG2t"
)
_HEADQA_DIRS = {"es": "HEAD", "en": "HEAD_EN"}


def _headqa_features(cfg):
    return _F(
        {
            "name": _V(),
            "year": _V(),
            "category": _V(),
            "qid": _V("int32"),
            "qtext": _V(),
            "ra": _V("int32"),
            "answers": [{"aid": _V("int32"), "atext": _V()}],
        }
    )


def _headqa_splits(cfg, dl):
    import datasets

    root = dl.download_and_extract(_HEADQA_URL)
    d = _HEADQA_DIRS[cfg]
    base = os.path.join(root, d)
    return [
        (
            split,
            {"filepath": os.path.join(base, f"{stem}_{d}.json")},
        )
        for split, stem in (
            (datasets.Split.TRAIN, "train"),
            (datasets.Split.TEST, "test"),
            (datasets.Split.VALIDATION, "dev"),
        )
    ]


def _headqa_parse(cfg, filepath):
    with open(filepath, encoding="utf-8") as f:
        head_qa = json.load(f)
    for exam_id, exam in enumerate(head_qa["exams"]):
        content = head_qa["exams"][exam]
        for q in content["data"]:
            qid = int(q["qid"].strip())
            yield f"{exam_id}_{qid}", {
                "name": content["name"].strip(),
                "year": content["year"].strip(),
                "category": content["category"].strip(),
                "qid": qid,
                "qtext": q["qtext"].strip(),
                "ra": int(q["ra"].strip()),
                "answers": [
                    {"aid": a["aid"], "atext": a["atext"].strip()}
                    for a in q["answers"]
                ],
            }


_spec(
    name="headqa",
    description="HEAD-QA: healthcare multiple-choice exams.",
    homepage="https://aghie.github.io/head-qa/",
    configs=("es", "en"),
    features=_headqa_features,
    splits=_headqa_splits,
    parse=_headqa_parse,
)


# ---------------------------------------------------------------------------
# hendrycks_ethics — 5 subsets, CSV-backed, grouped-scenario ids
# ---------------------------------------------------------------------------

_ETHICS_URL = "https://people.eecs.berkeley.edu/~hendrycks/ethics.tar"
_ETHICS_PREFIX = {
    "commonsense": "cm",
    "deontology": "deontology",
    "justice": "justice",
    "utilitarianism": "util",
    "virtue": "virtue",
}
# scenarios come in groups (deontology/justice 4, virtue 5); group_id tags them
_ETHICS_GROUP = {"deontology": 4, "justice": 4, "virtue": 5}


def _ethics_features(cfg):
    if cfg == "commonsense":
        return _F(
            {
                "label": _V("int32"),
                "input": _V(),
                "is_short": _V("bool"),
                "edited": _V("bool"),
            }
        )
    if cfg == "deontology":
        return _F(
            {
                "group_id": _V("int32"),
                "label": _V("int32"),
                "scenario": _V(),
                "excuse": _V(),
            }
        )
    if cfg == "justice":
        return _F(
            {"group_id": _V("int32"), "label": _V("int32"), "scenario": _V()}
        )
    if cfg == "utilitarianism":
        return _F({"activity": _V(), "baseline": _V(), "rating": _V()})
    if cfg == "virtue":
        return _F(
            {
                "group_id": _V("int32"),
                "label": _V("int32"),
                "scenario": _V(),
                "trait": _V(),
            }
        )
    raise KeyError(cfg)


def _ethics_splits(cfg, dl):
    import datasets

    root = dl.download_and_extract(_ETHICS_URL)
    pre = _ETHICS_PREFIX[cfg]
    return [
        (
            split,
            {
                "filepath": os.path.join(
                    root, "ethics", cfg, f"{pre}_{stem}.csv"
                )
            },
        )
        for split, stem in (
            (datasets.Split.TRAIN, "train"),
            (datasets.Split.TEST, "test"),
        )
    ]


def _ethics_parse(cfg, filepath):
    with open(filepath, newline="") as f:
        if cfg == "utilitarianism":
            rows = csv.DictReader(f, fieldnames=["activity", "baseline"])
        else:
            rows = csv.DictReader(f)
        group = _ETHICS_GROUP.get(cfg)
        for key, row in enumerate(rows):
            group_id = key // group if group else 0
            if cfg == "commonsense":
                yield key, {
                    "label": row["label"],
                    "input": row["input"],
                    "is_short": row["is_short"],
                    "edited": row["edited"],
                }
            elif cfg == "deontology":
                yield key, {
                    "group_id": group_id,
                    "label": row["label"],
                    "scenario": row["scenario"],
                    "excuse": row["excuse"],
                }
            elif cfg == "justice":
                yield key, {
                    "group_id": group_id,
                    "label": row["label"],
                    "scenario": row["scenario"],
                }
            elif cfg == "virtue":
                scenario, trait = row["scenario"].split(" [SEP] ")
                yield key, {
                    "group_id": group_id,
                    "label": row["label"],
                    "scenario": scenario,
                    "trait": trait,
                }
            else:  # utilitarianism: unrated activity/baseline pairs
                yield key, {
                    "activity": row["activity"],
                    "baseline": row["baseline"],
                    "rating": "",
                }


_spec(
    name="hendrycks_ethics",
    description="ETHICS: justice, deontology, commonsense, utilitarianism, "
    "virtue.",
    homepage="https://github.com/hendrycks/ethics",
    configs=(
        "commonsense",
        "deontology",
        "justice",
        "utilitarianism",
        "virtue",
    ),
    features=_ethics_features,
    splits=_ethics_splits,
    parse=_ethics_parse,
)


# ---------------------------------------------------------------------------
# hendrycks_math — 7 subject configs, one JSON file per problem
# ---------------------------------------------------------------------------

_MATH_URL = "https://people.eecs.berkeley.edu/~hendrycks/MATH.tar"
_MATH_SUBJECTS = (
    "algebra",
    "counting_and_probability",
    "geometry",
    "intermediate_algebra",
    "number_theory",
    "prealgebra",
    "precalculus",
)


def _math_splits(cfg, dl):
    import datasets

    root = dl.download_and_extract(_MATH_URL)
    return [
        (
            split,
            {"basepath": os.path.join(root, "MATH", stem, cfg)},
        )
        for split, stem in (
            (datasets.Split.TRAIN, "train"),
            (datasets.Split.TEST, "test"),
        )
    ]


def _math_parse(cfg, basepath):
    for key, file in enumerate(sorted(pathlib.Path(basepath).iterdir())):
        with open(file, encoding="utf-8") as f:
            data = json.load(f)
        yield key, {
            "problem": data["problem"],
            "level": data["level"],
            "type": data["type"],
            "solution": data["solution"],
        }


_spec(
    name="hendrycks_math",
    description="MATH: competition math problems with step solutions.",
    homepage="https://github.com/hendrycks/math",
    configs=_MATH_SUBJECTS,
    features=lambda cfg: _F(
        {"problem": _V(), "level": _V(), "type": _V(), "solution": _V()}
    ),
    splits=_math_splits,
    parse=_math_parse,
)


# ---------------------------------------------------------------------------
# logiqa — blank-line-separated 8-line records in plain text
# ---------------------------------------------------------------------------

_LOGIQA_BASE = (
    "https://raw.githubusercontent.com/lgw863/LogiQA-dataset/master"
)
_LOGIQA_FILES = {
    "train": "Train.txt",
    "validation": "Eval.txt",
    "test": "Test.txt",
}


def _logiqa_splits(cfg, dl):
    import datasets

    paths = dl.download_and_extract(
        {k: f"{_LOGIQA_BASE}/{v}" for k, v in _LOGIQA_FILES.items()}
    )
    return [
        (datasets.Split.TRAIN, {"filepath": paths["train"]}),
        (datasets.Split.TEST, {"filepath": paths["test"]}),
        (datasets.Split.VALIDATION, {"filepath": paths["validation"]}),
    ]


def _logiqa_parse(cfg, filepath):
    def norm(text):
        return text.replace(".", ". ").strip()

    with open(filepath, encoding="utf-8") as f:
        blocks = f.read().strip().split("\n\n")
    for key, block in enumerate(blocks):
        lines = block.split("\n")
        yield key, {
            "label": lines[0].strip(),
            "context": norm(lines[1]),
            "question": norm(lines[2]),
            # options carry a 2-char "A." style prefix
            "options": [norm(opt[2:]) for opt in lines[3:]],
        }


_spec(
    name="logiqa",
    description="LogiQA: logical reasoning multiple choice.",
    homepage="https://github.com/lgw863/LogiQA-dataset",
    configs=("logiqa",),
    features=lambda cfg: _F(
        {
            "label": _V(),
            "context": _V(),
            "question": _V(),
            "options": _Seq(),
        }
    ),
    splits=_logiqa_splits,
    parse=_logiqa_parse,
)


# ---------------------------------------------------------------------------
# mutual — one JSON object per .txt file, dirs per split
# ---------------------------------------------------------------------------

_MUTUAL_URL = "https://github.com/Nealcly/MuTual/archive/master.zip"


def _mutual_splits(cfg, dl):
    import datasets

    root = dl.download_and_extract(_MUTUAL_URL)
    base = os.path.join(root, "MuTual-master", "data", cfg)
    return [
        (datasets.Split.TRAIN, {"basepath": os.path.join(base, "train")}),
        (datasets.Split.TEST, {"basepath": os.path.join(base, "test")}),
        (datasets.Split.VALIDATION, {"basepath": os.path.join(base, "dev")}),
    ]


def _mutual_parse(cfg, basepath):
    key = 0
    for file in sorted(pathlib.Path(basepath).iterdir()):
        if file.suffix != ".txt":
            continue
        text = file.read_text(encoding="utf-8")
        if not text:  # the archive contains the occasional empty file
            continue
        data = json.loads(text)
        yield key, {
            "answers": data["answers"],
            "options": data["options"],
            "article": data["article"],
            "id": data["id"],
        }
        key += 1


_spec(
    name="mutual",
    description="MuTual: multi-turn dialogue reasoning.",
    homepage="https://github.com/Nealcly/MuTual",
    configs=("mutual", "mutual_plus"),
    features=lambda cfg: _F(
        {
            "answers": _V(),
            "options": _Seq(),
            "article": _V(),
            "id": _V(),
        }
    ),
    splits=_mutual_splits,
    parse=_mutual_parse,
)


# ---------------------------------------------------------------------------
# pile — 22 component configs filtered out of the shared val/test shards
# ---------------------------------------------------------------------------

_PILE_URLS = {
    "validation": "https://the-eye.eu/public/AI/pile/val.jsonl.zst",
    "test": "https://the-eye.eu/public/AI/pile/test.jsonl.zst",
}
_PILE_SETS = {
    "pile_arxiv": "ArXiv",
    "pile_books3": "Books3",
    "pile_bookcorpus2": "BookCorpus2",
    "pile_dm-mathematics": "DM Mathematics",
    "pile_enron": "Enron Emails",
    "pile_europarl": "EuroParl",
    "pile_freelaw": "FreeLaw",
    "pile_github": "Github",
    "pile_gutenberg": "Gutenberg (PG-19)",
    "pile_hackernews": "HackerNews",
    "pile_nih-exporter": "NIH ExPorter",
    "pile_opensubtitles": "OpenSubtitles",
    "pile_openwebtext2": "OpenWebText2",
    "pile_philpapers": "PhilPapers",
    "pile_pile-cc": "Pile-CC",
    "pile_pubmed-abstracts": "PubMed Abstracts",
    "pile_pubmed-central": "PubMed Central",
    "pile_stackexchange": "StackExchange",
    "pile_upsto": "USPTO Backgrounds",
    "pile_ubuntu-irc": "Ubuntu IRC",
    "pile_wikipedia": "Wikipedia (en)",
    "pile_youtubesubtitles": "YoutubeSubtitles",
}


def _pile_splits(cfg, dl):
    import datasets

    paths = dl.download_and_extract(_PILE_URLS)
    return [
        (datasets.Split.TEST, {"filepath": paths["test"]}),
        (datasets.Split.VALIDATION, {"filepath": paths["validation"]}),
    ]


def _pile_parse(cfg, filepath):
    want = _PILE_SETS[cfg]
    with open(filepath, encoding="utf-8") as f:
        for key, line in enumerate(f):
            data = json.loads(line)
            if data["meta"]["pile_set_name"] == want:
                yield key, {"text": data["text"]}


_spec(
    name="pile",
    description="The Pile: per-component language modelling splits.",
    homepage="https://pile.eleuther.ai/",
    configs=tuple(_PILE_SETS),
    features=lambda cfg: _F({"text": _V()}),
    splits=_pile_splits,
    parse=_pile_parse,
)


# ---------------------------------------------------------------------------
# quac — flattened (question, first-answer) pairs per dialogue paragraph
# ---------------------------------------------------------------------------

_QUAC_URLS = {
    "train": "https://s3.amazonaws.com/my89public/quac/train_v0.2.json",
    "validation": "https://s3.amazonaws.com/my89public/quac/val_v0.2.json",
}


def _quac_splits(cfg, dl):
    import datasets

    paths = dl.download_and_extract(_QUAC_URLS)
    return [
        (datasets.Split.TRAIN, {"filepath": paths["train"]}),
        (datasets.Split.VALIDATION, {"filepath": paths["validation"]}),
    ]


def _quac_parse(cfg, filepath):
    with open(filepath, encoding="utf-8") as f:
        data = json.load(f)["data"]
    key = 0
    for row in data:
        para = row["paragraphs"][0]
        context = para["context"].replace("CANNOTANSWER", "")
        for qa in para["qas"]:
            yield key, {
                "title": row["title"],
                "section_title": row["section_title"],
                "paragraph": context,
                "question": qa["question"],
                "answer": qa["answers"][0]["text"],
            }
            key += 1


_spec(
    name="quac",
    description="QuAC: question answering in context.",
    homepage="https://quac.ai/",
    configs=("quac",),
    features=lambda cfg: _F(
        {
            "title": _V(),
            "section_title": _V(),
            "paragraph": _V(),
            "question": _V(),
            "answer": _V(),
        }
    ),
    splits=_quac_splits,
    parse=_quac_parse,
)


# ---------------------------------------------------------------------------
# sat_analogies — manual download (email the author), record blocks
# ---------------------------------------------------------------------------

_SAT_MANUAL = (
    "SAT Analogy Questions requires a manual download: request the data "
    "from Peter Turney (https://www.apperceptual.com), then pass the "
    "folder containing SAT-package-V3.txt as data_dir."
)


def _sat_splits(cfg, dl):
    import datasets

    data_dir = os.path.abspath(os.path.expanduser(dl.manual_dir))
    path = os.path.join(data_dir, "SAT-package-V3.txt")
    if not os.path.exists(path):
        raise FileNotFoundError(f"{path} not found. {_SAT_MANUAL}")
    return [(datasets.Split.VALIDATION, {"filepath": path})]


def _sat_parse(cfg, filepath):
    records, record = [], []
    with open(filepath, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line and record:
                records.append(record)
                record = []
            elif line.startswith("#"):
                continue  # comments
            elif line:
                record.append(line)
    if record:
        records.append(record)
    for key, rec in enumerate(records):
        # last 8 lines: source, stem, 5 choices, solution letter
        yield key, {
            "source": rec[-8],
            "stem": rec[-7],
            "choices": rec[-6:-1],
            "solution": rec[-1],
        }


_spec(
    name="sat_analogies",
    description="SAT analogy questions (manual download).",
    homepage="https://aclweb.org/aclwiki/SAT_Analogy_Questions_"
    "(State_of_the_art)",
    configs=("sat_analogies",),
    features=lambda cfg: _F(
        {
            "source": _V(),
            "stem": _V(),
            "choices": _Seq(),
            "solution": _V(),
        }
    ),
    splits=_sat_splits,
    parse=_sat_parse,
    manual=_SAT_MANUAL,
)


# ---------------------------------------------------------------------------
# unscramble — 5 GPT-3 character-manipulation files, one jsonl.gz each
# ---------------------------------------------------------------------------

_UNSCRAMBLE_BASE = "https://raw.githubusercontent.com/openai/gpt-3/master/data"
_UNSCRAMBLE_TASKS = (
    "mid_word_1_anagrams",
    "mid_word_2_anagrams",
    "cycle_letters_in_word",
    "random_insertion_in_word",
    "reversed_words",
)


def _unscramble_splits(cfg, dl):
    import datasets

    path = dl.download_and_extract(f"{_UNSCRAMBLE_BASE}/{cfg}.jsonl.gz")
    return [(datasets.Split.VALIDATION, {"filepath": path})]


def _unscramble_parse(cfg, filepath):
    with open(filepath, encoding="utf-8") as f:
        for key, line in enumerate(f):
            data = json.loads(line)
            yield key, {
                "context": data["context"],
                "completion": data["completion"],
            }


_spec(
    name="unscramble",
    description="Unscramble: GPT-3 character manipulation tasks.",
    homepage="https://github.com/openai/gpt-3/tree/master/data",
    configs=_UNSCRAMBLE_TASKS,
    features=lambda cfg: _F({"context": _V(), "completion": _V()}),
    splits=_unscramble_splits,
    parse=_unscramble_parse,
)


__all__ = [
    "BuilderSpec",
    "HUB_ALIASES",
    "builder_names",
    "get_builder",
    "hub_builder",
]
