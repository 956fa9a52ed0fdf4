"""Pile per-subset perplexity tasks (22 subsets).

Parity target: reference lm_eval/tasks/pile.py. The reference loads through
a custom HF datasets script (lm_eval/datasets/pile/pile.py) pointing at
the-eye mirrors; offline runs use ``data_dir`` JSONL fixtures like every
other task here. Preserves the reference's ``pile_upsto`` [sic] registry
typo for drop-in compatibility.
"""

from ..harness.task import PerplexityTask

PILE_SUBSETS = [
    "pile_arxiv", "pile_books3", "pile_bookcorpus2", "pile_dm-mathematics",
    "pile_enron", "pile_europarl", "pile_freelaw", "pile_github",
    "pile_gutenberg", "pile_hackernews", "pile_nih-exporter",
    "pile_opensubtitles", "pile_openwebtext2", "pile_philpapers",
    "pile_pile-cc", "pile_pubmed-abstracts", "pile_pubmed-central",
    "pile_stackexchange", "pile_uspto", "pile_ubuntu-irc", "pile_wikipedia",
    "pile_youtubesubtitles",
]


class PilePerplexityTask(PerplexityTask):
    VERSION = 1
    DATASET_PATH = "EleutherAI/pile"
    DATASET_NAME = None

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return True

    def validation_docs(self):
        for doc in self.dataset["validation"]:
            yield doc["text"] if isinstance(doc, dict) else doc

    def test_docs(self):
        for doc in self.dataset["test"]:
            yield doc["text"] if isinstance(doc, dict) else doc


def create_pile_task(subset: str):
    class PileSubset(PilePerplexityTask):
        DATASET_NAME = subset

    PileSubset.__name__ = f"Pile_{subset.replace('pile_', '').replace('-', '_')}"
    return PileSubset


def create_all_tasks():
    return {name: create_pile_task(name) for name in PILE_SUBSETS}
