"""Translation benchmarks (WMT14/16/20, IWSLT17) scored with BLEU/chrF/TER.

Parity: reference lm_eval/tasks/translation.py, which sources test sets from
sacrebleu's dataset registry. Offline runs use ``data_dir`` jsonl fixtures
with {"src": ..., "ref": ...} docs; online runs use sacrebleu's downloader.
zh/ja references are segmented with jieba/nagisa when installed (the
reference gates the same way).
"""

from typing import List

from ..harness import metrics
from ..harness.api import rf
from ..harness.task import Task

# the reference's selected benchmark subsets (lm_eval/tasks/__init__.py and
# translation.py's gpt3_translation_benchmarks + selected_translation_benchmarks)
GPT3_TRANSLATION_BENCHMARKS = {
    "wmt14": ["en-fr", "fr-en"],
    "wmt16": ["en-ro", "ro-en", "de-en", "en-de"],
}

SELECTED_TRANSLATION_BENCHMARKS = {
    **GPT3_TRANSLATION_BENCHMARKS,
    # the full wmt20 pair list, frozen from
    # sacrebleu.get_langpairs_for_testset("wmt20") — the expression the
    # reference evaluates at import (lm_eval/tasks/__init__.py:83-87)
    "wmt20": ["cs-en", "de-en", "de-fr", "en-cs", "en-de", "en-iu", "en-ja",
              "en-km", "en-pl", "en-ps", "en-ru", "en-ta", "en-zh", "fr-de",
              "iu-en", "ja-en", "km-en", "pl-en", "ps-en", "ru-en", "ta-en",
              "zh-en"],
    "iwslt17": ["en-ar", "ar-en"],
}

_LANG_NAMES = {
    "en": "English", "fr": "French", "de": "German", "ro": "Romanian",
    "ru": "Russian", "zh": "Chinese", "ja": "Japanese", "ar": "Arabic",
    "cs": "Czech", "fi": "Finnish", "es": "Spanish", "it": "Italian",
    "nl": "Dutch", "ko": "Korean", "pl": "Polish", "lt": "Lithuanian",
    "ta": "Tamil", "km": "Khmer", "ps": "Pashto", "iu": "Inuktitut",
}


def code_to_language(code: str) -> str:
    return _LANG_NAMES.get(code, code)


def _char_class(ch: str) -> str:
    """Coarse script class for the no-dependency CJK segmentation fallback."""
    o = ord(ch)
    if 0x3040 <= o <= 0x309F:
        return "hira"
    if 0x30A0 <= o <= 0x30FF or 0xFF66 <= o <= 0xFF9D:
        # incl. halfwidth katakana, which would otherwise split as "other"
        return "kata"
    if 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF:
        return "han"
    if ch.isspace():
        return "sp"
    if ch.isascii():
        return "ascii"
    return "other"


def _class_segment(text: str, han_per_char: bool = False) -> List[str]:
    """Split on script-class transitions (optionally every han char its own
    token — the common zh-BLEU convention). A coarse stand-in for the
    jieba/nagisa morphological segmenters when they are not installed:
    segmentation granularity differs from theirs, so absolute BLEU is not
    comparable with nagisa/jieba-segmented literature numbers, but
    references and hypotheses are segmented identically within a run."""
    out, cur, cls = [], "", None
    for ch in text:
        c = _char_class(ch)
        if c == "sp":
            if cur:
                out.append(cur)
            cur, cls = "", None
            continue
        if (han_per_char and c == "han") or (cls is not None and c != cls):
            if cur:
                out.append(cur)
            cur = ""
        cur += ch
        cls = None if (han_per_char and c == "han") else c
        if han_per_char and c == "han":
            out.append(cur)
            cur = ""
    if cur:
        out.append(cur)
    return out


def zh_split(zh_text: List[str]) -> List[str]:
    try:
        import jieba
    except ImportError:  # offline fallback: per-han-char segmentation
        return [" ".join(_class_segment(t.strip(), han_per_char=True))
                for t in zh_text]

    return [" ".join(jieba.cut(txt.strip())) for txt in zh_text]


def ja_split(ja_text: List[str]) -> List[str]:
    try:
        import nagisa
    except ImportError:  # offline fallback: script-class segmentation
        return [" ".join(_class_segment(t.strip())) for t in ja_text]

    return [" ".join(nagisa.tagging(txt.strip()).words) for txt in ja_text]


NO_SPACE_LANG = {"zh": zh_split, "ja": ja_split}


class GeneralTranslationTask(Task):
    VERSION = 0

    def __init__(self, sacrebleu_dataset, sacrebleu_language_pair=None, **kwargs):
        self.sacrebleu_dataset = sacrebleu_dataset
        self.sacrebleu_language_pair = sacrebleu_language_pair
        self.src_data = self.ref_data = None
        super().__init__(**kwargs)

    def download(self, data_dir=None, cache_dir=None, download_mode=None):
        if self._custom_docs is not None or (data_dir is not None):
            super().download(data_dir, cache_dir, download_mode)
            docs = None
            if isinstance(getattr(self, "dataset", None), dict):
                docs = self.dataset.get("test") or self.dataset.get("validation")
            if docs:
                self.src_data = [d["src"] for d in docs]
                self.ref_data = [d["ref"] for d in docs]
                return
        from sacrebleu import sacrebleu

        src_file, ref_file = sacrebleu.download_test_set(
            self.sacrebleu_dataset, self.sacrebleu_language_pair
        )
        self.src_data, self.ref_data = [
            [line.rstrip() for line in sacrebleu.smart_open(file)]
            for file in (src_file, ref_file)
        ]

    def has_training_docs(self):
        return False

    def has_validation_docs(self):
        return False

    def has_test_docs(self):
        return True

    def test_docs(self):
        return [
            {"src": src, "ref": ref}
            for src, ref in zip(self.src_data, self.ref_data)
        ]

    def doc_to_text(self, doc):
        language_codes = self.sacrebleu_language_pair.split("-")
        src_lang = code_to_language(language_codes[0])
        tar_lang = code_to_language(language_codes[1])
        return f"{src_lang} phrase: " + doc["src"] + f"\n{tar_lang} phrase:"

    def should_decontaminate(self):
        return True

    def doc_to_decontamination_query(self, doc):
        return doc["src"]

    def doc_to_target(self, doc):
        return " " + doc["ref"] if isinstance(doc["ref"], str) else doc["ref"][0]

    def construct_requests(self, doc, ctx):
        return rf.greedy_until(ctx, {"until": ["\n"]})

    def process_results(self, doc, results):
        tar_lang_code = self.sacrebleu_language_pair.split("-")[-1]
        if tar_lang_code in NO_SPACE_LANG:
            doc["ref"] = NO_SPACE_LANG[tar_lang_code]([doc["ref"]])[0]
            results = NO_SPACE_LANG[tar_lang_code](results)
        ref_pred = (doc["ref"], results)
        return {"bleu": ref_pred, "chrf": ref_pred, "ter": ref_pred}

    def aggregation(self):
        return {"bleu": metrics.bleu, "chrf": metrics.chrf, "ter": metrics.ter}

    def higher_is_better(self):
        return {"bleu": True, "chrf": True, "ter": False}


def create_translation_task(dataset, language_pair, version=0):
    class TranslationTask(GeneralTranslationTask):
        VERSION = version

        def __init__(self, **kwargs):
            super().__init__(dataset, language_pair, **kwargs)

    TranslationTask.__name__ = f"Translation_{dataset}_{language_pair}"
    return TranslationTask


def create_tasks_from_benchmarks(benchmark_dict):
    def version_of(dataset, language_pair):
        if language_pair[-2:] in ["zh", "ja"]:
            return 1  # jieba/nagisa segmentation
        return 0

    return {
        f"{dataset}-{language_pair}": create_translation_task(
            dataset, language_pair, version_of(dataset, language_pair)
        )
        for dataset, language_pairs in benchmark_dict.items()
        for language_pair in language_pairs
    }
