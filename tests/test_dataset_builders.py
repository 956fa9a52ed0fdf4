"""The 12 custom dataset builders vs the reference's loader scripts.

Three layers of offline evidence (VERDICT r4 item 7 — the builders restore
the reference's from-source download path, dormant here for lack of
network):

1. **Oracle equality**: every builder's config list and declared
   ``Features`` must equal the reference script's, executed as the oracle
   (same mechanism as test_dataset_schema_contracts.py).
2. **Parse contracts**: each spec's ``parse`` function is run on a
   synthesized source file in the reference's raw format; the produced
   docs must encode cleanly under the declared Features
   (``features.encode_example``) — proving the parser and the schema
   agree without any download.
3. **Task wiring**: ``harness.task.Task.download`` resolves the 12 hub
   DATASET_PATHs to these builders (HUB_ALIASES covers each).

Reference: /root/reference/lm_eval/datasets/*/ (12 builder scripts).
"""

import gzip
import importlib.util
import inspect
import json
import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llm_lns_quantization_tpu import datasets as lds  # noqa: E402
from llm_lns_quantization_tpu.datasets import _SPECS  # noqa: E402

REFERENCE = "/root/reference/lm_eval/datasets"

requires_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE),
    reason="reference checkout not present; feature oracles unavailable",
)


def _ref_builder(dirname):
    path = os.path.join(REFERENCE, dirname, dirname + ".py")
    spec = importlib.util.spec_from_file_location("refds_" + dirname, path)
    mod = importlib.util.module_from_spec(spec)
    # datasets' builder __init__ re-resolves its defining module by name
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    import datasets as hfd

    for _, obj in inspect.getmembers(mod, inspect.isclass):
        if (
            issubclass(obj, hfd.GeneratorBasedBuilder)
            and obj is not hfd.GeneratorBasedBuilder
        ):
            return obj
    raise AssertionError(f"no builder class in {path}")


def test_all_twelve_builders_present():
    assert lds.builder_names() == [
        "asdiv", "coqa", "drop", "headqa", "hendrycks_ethics",
        "hendrycks_math", "logiqa", "mutual", "pile", "quac",
        "sat_analogies", "unscramble",
    ]


@requires_reference
@pytest.mark.parametrize("name", sorted(_SPECS))
def test_builder_matches_reference_oracle(name):
    ours_cls = lds.get_builder(name)
    ref_cls = _ref_builder(name)
    ref_cfgs = [c.name for c in ref_cls.BUILDER_CONFIGS]
    assert [c.name for c in ours_cls.BUILDER_CONFIGS] == ref_cfgs
    for cfg in ref_cfgs:
        with tempfile.TemporaryDirectory() as td:
            r = ref_cls(config_name=cfg, cache_dir=td)._info().features
            o = ours_cls(config_name=cfg, cache_dir=td)._info().features
            assert o == r, f"{name}/{cfg} features diverge from reference"


def test_hub_aliases_cover_task_paths():
    """Every alias resolves; the 12 task families' DATASET_PATHs are all
    served (they are exactly the HUB_ALIASES keys, used by Task.download)."""
    for path, name in lds.HUB_ALIASES.items():
        assert lds.get_builder(name) is not None, path
    assert len(lds.HUB_ALIASES) == 12


def _encode_all(name, cfg, docs):
    """Every parsed doc must materialize under the declared Features —
    the same Arrow cast ``load_dataset`` applies (list-of-dicts for
    Sequence-of-dict fields is normalized there, not in encode_example)."""
    import datasets as hfd

    with tempfile.TemporaryDirectory() as td:
        feats = (
            lds.get_builder(name)(config_name=cfg, cache_dir=td)
            ._info()
            .features
        )
    assert docs, f"{name}/{cfg}: parser produced no docs"
    for _, doc in docs:
        assert set(doc) == set(feats)
    ds = hfd.Dataset.from_list([d for _, d in docs], features=feats)
    assert len(ds) == len(docs)


def test_parse_asdiv(tmp_path):
    xml = """<Machine-Reading-Corpus-File><ProblemSet>
      <Problem ID="nluds-0001" Grade="1" Source="http://x">
        <Body>Seven red apples are in the basket.</Body>
        <Question>How many apples are there?</Question>
        <Solution-Type>Addition</Solution-Type>
        <Answer>7 (apples)</Answer>
        <Formula>7=7</Formula>
      </Problem></ProblemSet></Machine-Reading-Corpus-File>"""
    p = tmp_path / "ASDiv.xml"
    p.write_text(xml)
    docs = list(_SPECS["asdiv"].parse("asdiv", filepath=str(p)))
    assert docs[0][1]["answer"] == "7 (apples)"
    _encode_all("asdiv", "asdiv", docs)


def test_parse_coqa(tmp_path):
    ans = {"span_start": 0, "span_end": 5, "span_text": "white",
           "input_text": "white", "turn_id": 1}
    raw = {"data": [{
        "id": "3zotg", "source": "wikipedia", "story": "The cat is white.",
        "questions": [{"input_text": "What color?", "turn_id": 1}],
        "answers": [ans],
        "additional_answers": {"0": [ans], "1": [ans], "2": [ans]},
    }]}
    p = tmp_path / "coqa-dev.json"
    p.write_text(json.dumps(raw))
    docs = list(_SPECS["coqa"].parse("coqa", filepath=str(p),
                                     split="validation"))
    # normalized (dict-of-lists) shape, as datasets>=5 requires and tasks see
    assert docs[0][1]["additional_answers"]["2"]["span_text"] == ["white"]
    assert docs[0][1]["questions"]["input_text"] == ["What color?"]
    _encode_all("coqa", "coqa", docs)
    # train split: additional_answers filled with the empty shape
    tdocs = list(_SPECS["coqa"].parse("coqa", filepath=str(p), split="train"))
    assert tdocs[0][1]["additional_answers"]["0"]["turn_id"] == [-1]
    _encode_all("coqa", "coqa", tdocs)


def test_parse_drop(tmp_path):
    raw = {"nfl_1": {
        "passage": "The Bears won 21-14.",
        "qa_pairs": [{
            "question": "Who won?", "query_id": "q1",
            "answer": {"number": "", "date": {}, "spans": ["Bears"],
                       "worker_id": "w", "hit_id": "h"},
        }],
    }}
    p = tmp_path / "drop_dataset_dev.json"
    p.write_text(json.dumps(raw))
    docs = list(_SPECS["drop"].parse("drop", filepath=str(p)))
    d = docs[0][1]
    assert d["answer"]["spans"] == ["Bears"]
    # absent validated_answers filled with the one-element empty shape
    # (normalized dict-of-lists; date stays a list of date-dicts)
    assert d["validated_answers"]["number"] == [""]
    assert d["validated_answers"]["date"] == [
        {"day": "", "month": "", "year": ""}
    ]
    _encode_all("drop", "drop", docs)


def test_parse_headqa(tmp_path):
    raw = {"exams": {"exam1": {
        "name": "Cuaderno_2013", "year": "2013", "category": "medicine",
        "data": [{
            "qid": " 1 ", "qtext": "Which organ? ", "ra": "2",
            "answers": [{"aid": 1, "atext": "heart "},
                        {"aid": 2, "atext": "liver"}],
        }],
    }}}
    p = tmp_path / "train_HEAD.json"
    p.write_text(json.dumps(raw))
    docs = list(_SPECS["headqa"].parse("es", filepath=str(p)))
    d = docs[0][1]
    assert d["qid"] == 1 and d["ra"] == 2
    assert d["answers"][1]["atext"] == "liver"
    _encode_all("headqa", "es", docs)


def test_parse_ethics(tmp_path):
    # commonsense: header csv
    p = tmp_path / "cm_test.csv"
    p.write_text("label,input,is_short,edited\n1,I kicked the dog.,True,False\n")
    docs = list(_SPECS["hendrycks_ethics"].parse("commonsense",
                                                 filepath=str(p)))
    assert docs[0][1]["label"] == "1"
    _encode_all("hendrycks_ethics", "commonsense", docs)
    # virtue: [SEP]-joined scenario/trait, groups of 5
    p2 = tmp_path / "virtue_test.csv"
    rows = "\n".join(
        f"{i % 2},scenario {i} [SEP] trait{i}" for i in range(10)
    )
    p2.write_text("label,scenario\n" + rows + "\n")
    vdocs = list(_SPECS["hendrycks_ethics"].parse("virtue", filepath=str(p2)))
    assert vdocs[0][1]["trait"] == "trait0"
    assert vdocs[4][1]["group_id"] == 0 and vdocs[5][1]["group_id"] == 1
    _encode_all("hendrycks_ethics", "virtue", vdocs)
    # utilitarianism: headerless activity/baseline pairs
    p3 = tmp_path / "util_test.csv"
    p3.write_text('"I ate an apple.","I ate a worm."\n')
    udocs = list(_SPECS["hendrycks_ethics"].parse("utilitarianism",
                                                  filepath=str(p3)))
    assert udocs[0][1] == {"activity": "I ate an apple.",
                           "baseline": "I ate a worm.", "rating": ""}
    _encode_all("hendrycks_ethics", "utilitarianism", udocs)


def test_parse_math(tmp_path):
    d = tmp_path / "algebra"
    d.mkdir()
    for i in range(2):
        (d / f"{i}.json").write_text(json.dumps({
            "problem": f"Solve x+{i}=2.", "level": "Level 1",
            "type": "Algebra", "solution": f"x={2 - i}",
        }))
    docs = list(_SPECS["hendrycks_math"].parse("algebra", basepath=str(d)))
    assert len(docs) == 2 and docs[1][1]["solution"] == "x=1"
    _encode_all("hendrycks_math", "algebra", docs)


def test_parse_logiqa(tmp_path):
    block = "\n".join([
        "b", "The town is north of the river.Both banks flood.",
        "Which must be true?",
        "A.The town floods.", "B.The river is dry.",
        "C.Nothing.", "D.All of the above.",
    ])
    p = tmp_path / "Eval.txt"
    p.write_text(block + "\n\n" + block)
    docs = list(_SPECS["logiqa"].parse("logiqa", filepath=str(p)))
    assert len(docs) == 2
    d = docs[0][1]
    assert d["label"] == "b"
    # '.' -> '. ' normalization and the 2-char option prefix strip
    assert d["context"] == "The town is north of the river. Both banks flood."
    assert d["options"][0] == "The town floods."
    _encode_all("logiqa", "logiqa", docs)


def test_parse_mutual(tmp_path):
    (tmp_path / "dev_1.txt").write_text(json.dumps({
        "answers": "B", "options": ["m: no", "f: yes"],
        "article": "m: hi f: hello", "id": "dev_1",
    }))
    (tmp_path / "empty.txt").write_text("")  # archive quirk: skipped
    (tmp_path / "notes.md").write_text("ignored")
    docs = list(_SPECS["mutual"].parse("mutual", basepath=str(tmp_path)))
    assert len(docs) == 1 and docs[0][1]["answers"] == "B"
    _encode_all("mutual", "mutual", docs)


def test_parse_pile(tmp_path):
    lines = [
        {"text": "arxiv paper", "meta": {"pile_set_name": "ArXiv"}},
        {"text": "enron mail", "meta": {"pile_set_name": "Enron Emails"}},
    ]
    p = tmp_path / "val.jsonl"
    p.write_text("\n".join(json.dumps(x) for x in lines) + "\n")
    docs = list(_SPECS["pile"].parse("pile_arxiv", filepath=str(p)))
    assert [d for _, d in docs] == [{"text": "arxiv paper"}]
    _encode_all("pile", "pile_arxiv", docs)


def test_parse_quac(tmp_path):
    raw = {"data": [{
        "title": "T", "section_title": "S",
        "paragraphs": [{
            "context": "Some context. CANNOTANSWER",
            "qas": [{"question": "Q1?",
                     "answers": [{"text": "A1"}, {"text": "A1b"}]}],
        }],
    }]}
    p = tmp_path / "val_v0.2.json"
    p.write_text(json.dumps(raw))
    docs = list(_SPECS["quac"].parse("quac", filepath=str(p)))
    d = docs[0][1]
    assert d["paragraph"] == "Some context. "  # sentinel stripped
    assert d["answer"] == "A1"  # first answer only
    _encode_all("quac", "quac", docs)


def test_parse_sat(tmp_path):
    txt = "\n".join([
        "# comment line", "",
        "preamble ignored",
        "190 FROM REAL SATs",
        "lull:trust", "balk:fortitude", "betray:loyalty",
        "cajole:compliance", "hinder:destination", "soothe:passion",
        "b",
    ])
    p = tmp_path / "SAT-package-V3.txt"
    p.write_text(txt)
    docs = list(_SPECS["sat_analogies"].parse("sat_analogies",
                                              filepath=str(p)))
    d = docs[0][1]
    assert d["stem"] == "lull:trust" and d["solution"] == "b"
    assert len(d["choices"]) == 5
    _encode_all("sat_analogies", "sat_analogies", docs)


def test_parse_unscramble(tmp_path):
    p = tmp_path / "reversed_words.jsonl"
    p.write_text(json.dumps({"context": "Please unscramble: tac =",
                             "completion": " cat"}) + "\n")
    docs = list(_SPECS["unscramble"].parse("reversed_words",
                                           filepath=str(p)))
    assert docs[0][1]["completion"] == " cat"
    _encode_all("unscramble", "reversed_words", docs)


def test_coqa_end_to_end_prepare(tmp_path):
    """Full builder machinery offline: download stubbed to a local file,
    download_and_prepare writes Arrow, and the access-time docs have the
    dict-of-lists shape the tasks (and fixtures) consume."""
    import datasets as hfd

    ans = {"span_start": 0, "span_end": 5, "span_text": "white",
           "input_text": "white", "turn_id": 1}
    raw = {"data": [{
        "id": "3zotg", "source": "wikipedia", "story": "The cat is white.",
        "questions": [{"input_text": "What color?", "turn_id": 1}],
        "answers": [ans],
        "additional_answers": {"0": [ans], "1": [ans], "2": [ans]},
    }]}
    src = tmp_path / "coqa.json"
    src.write_text(json.dumps(raw))

    class StubDL(hfd.DownloadManager):
        def download_and_extract(self, urls):
            if isinstance(urls, dict):
                return {k: str(src) for k in urls}
            return str(src)

    b = lds.get_builder("coqa")(
        config_name="coqa", cache_dir=str(tmp_path / "cache")
    )
    b.download_and_prepare(dl_manager=StubDL())
    ds = b.as_dataset()
    doc = ds["validation"][0]
    assert doc["questions"] == {"input_text": ["What color?"],
                                "turn_id": [1]}
    assert doc["answers"]["span_text"] == ["white"]


def test_task_download_resolves_local_builder(monkeypatch, tmp_path):
    """Task.download routes hub DATASET_PATHs through the local builders
    (network dormant: we fake download_and_prepare/as_dataset)."""
    from llm_lns_quantization_tpu.harness import task as task_mod

    calls = {}

    class FakeBuilder:
        def __init__(self, config_name=None, cache_dir=None, data_dir=None):
            calls["config"] = config_name

        def download_and_prepare(self, download_mode=None):
            calls["prepared"] = True

        def as_dataset(self):
            return {"validation": [{"text": "x"}]}

    monkeypatch.setattr(
        "llm_lns_quantization_tpu.datasets.get_builder",
        lambda name: FakeBuilder,
    )

    class T(task_mod.Task):
        DATASET_PATH = "EleutherAI/pile"
        DATASET_NAME = "pile_arxiv"

        def has_training_docs(self):
            return False

        def has_validation_docs(self):
            return True

        def has_test_docs(self):
            return False

        def validation_docs(self):
            return self.dataset["validation"]

        def doc_to_text(self, doc):
            return doc["text"]

        def doc_to_target(self, doc):
            return ""

        def construct_requests(self, doc, ctx):
            return []

        def process_results(self, doc, results):
            return {}

        def aggregation(self):
            return {}

        def higher_is_better(self):
            return {}

    t = T()
    assert calls == {"config": "pile_arxiv", "prepared": True}
    assert t.dataset["validation"][0]["text"] == "x"
