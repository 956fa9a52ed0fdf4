"""Eval-time train/test overlap detection.

Parity target: reference lm_eval/decontamination/decontaminate.py:36-169.
Algorithm (GPT-3 Appendix C): build per-task {ngram -> doc_ids} lookups from
the eval docs, merge them, stream the training corpus's pre-sorted 13-gram
shards (*.sorted.zst, produced by scripts/clean_training_data) against the
merged lookup, and return {task_name: contaminated doc_ids}. Lookups and
overlaps are pickled under ``data_dir`` so reruns are incremental.
"""

import collections
import glob
import json
import os
import pickle

from .archiver import ZStdTextReader
from .janitor import Janitor, word_ngrams


def get_train_overlap(docs_by_task_set, ngrams_path, limit, data_dir="data"):
    info_dict_path = os.path.join(ngrams_path, "info.json")
    with open(info_dict_path, "r", encoding="utf-8") as f:
        info_dict = json.load(f)
    ngrams_n_size = info_dict["ngram_size"]

    janitor = Janitor()

    def overlaps_dump_path(task_name, task_set):
        return os.path.join(
            data_dir, task_name,
            f"{task_set}_{ngrams_n_size}grams_limit{limit}.overlaps",
        )

    lookups = {}
    duplicates = {}
    sets_to_decontaminate = len(docs_by_task_set.keys())

    for (task_name, task_set), docs in docs_by_task_set.items():
        os.makedirs(os.path.join(data_dir, task_name), exist_ok=True)

        dump_path = overlaps_dump_path(task_name, task_set)
        if os.path.exists(dump_path):
            with open(dump_path, "rb") as f:
                duplicates[(task_name, task_set)] = pickle.load(f)
            sets_to_decontaminate -= 1
            continue
        duplicates[(task_name, task_set)] = set()

        lookup_path = os.path.join(
            data_dir, task_name,
            f"{task_set}_{ngrams_n_size}grams_limit{limit}.lookup",
        )
        if os.path.exists(lookup_path):
            with open(lookup_path, "rb") as f:
                lookups[(task_name, task_set)] = pickle.load(f)
        else:
            lookup = collections.defaultdict(set)
            for doc_id, document in enumerate(docs):
                for ngram in word_ngrams(
                    janitor.normalize_string(document), ngrams_n_size
                ):
                    lookup[ngram].add(doc_id)
            with open(lookup_path, "wb") as f:
                pickle.dump(lookup, f)
            lookups[(task_name, task_set)] = lookup

    if sets_to_decontaminate > 0:
        merged_lookup = collections.defaultdict(list)
        for (task_name, task_set), lookup in lookups.items():
            for ngram, doc_ids in lookup.items():
                merged_lookup[ngram].append((task_name, task_set, doc_ids))

        files = glob.glob(os.path.join(ngrams_path, "*.sorted.zst"))
        for file in files:
            reader = ZStdTextReader(file)
            current_ngram = ""
            for line in reader.read_tqdm():
                ngram, _document_id = line.rsplit(" ", 1)
                if ngram != current_ngram:  # shards are sorted: match once
                    current_ngram = ngram
                    if ngram in merged_lookup:
                        for task_name, task_set, doc_ids in merged_lookup[ngram]:
                            duplicates[(task_name, task_set)].update(doc_ids)
                        del merged_lookup[ngram]

        for (task_name, task_set), doc_ids in duplicates.items():
            with open(overlaps_dump_path(task_name, task_set), "wb") as f:
                pickle.dump(doc_ids, f)

    return {task_name: doc_ids for (task_name, task_set), doc_ids in duplicates.items()}
