"""Stage 3: filter sorted buckets to ngrams seen in > 10 unique documents.

Parity target: reference scripts/clean_training_data/
process_sorted_buckets.py (streaming single-pass unique-doc counting over
pre-sorted buckets; >10-doc cutoff is the GPT-3 Appendix C
``too_dirty_cutoff``). Multiprocessing uses stdlib instead of
tqdm_multiprocess.

Usage: python process_sorted_buckets.py -dir <workdir>/output [-move <dir>] [-procs 4]
"""

import argparse
import glob
import multiprocessing
import os
import re
import shutil
import sys
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from llm_lns_quantization_tpu.decontamination.archiver import TextArchive, TextReader


def process_bucket(args):
    bucket_file_path, processed_directory, move_dir = args
    bucket_id = re.sub(r"\D", "", os.path.basename(bucket_file_path))
    done_file = os.path.join(
        processed_directory, f"ngram_bucket_processing_{bucket_id}.done"
    )
    if os.path.exists(done_file):
        return bucket_file_path

    bucket = TextReader(bucket_file_path)
    output_file_path = bucket_file_path + ".processed"
    output_archive = TextArchive(output_file_path, mode="wb")

    current_ngram = ""
    current_ngram_document_ids = set()
    for line in bucket.read():
        ngram, document_id = line.rsplit(" ", 1)
        if ngram != current_ngram:
            if len(current_ngram_document_ids) > 10:
                output_archive.add_data(
                    f"{current_ngram} {len(current_ngram_document_ids)}"
                )
            current_ngram = ngram
            current_ngram_document_ids = set()
        current_ngram_document_ids.add(document_id)

    if len(current_ngram_document_ids) > 10:
        output_archive.add_data(f"{current_ngram} {len(current_ngram_document_ids)}")

    output_archive.commit()
    Path(done_file).touch()
    if move_dir:
        shutil.move(output_file_path, move_dir)
    return bucket_file_path


def process_sorted_buckets(working_directory, move_dir, process_count):
    bucket_file_paths = sorted(
        glob.glob(os.path.join(working_directory, "*.bkt.txt.sorted"))
    )
    processed_directory = os.path.join(working_directory, "processed")
    os.makedirs(processed_directory, exist_ok=True)

    tasks = [(p, processed_directory, move_dir) for p in bucket_file_paths]
    if process_count > 1 and len(tasks) > 1:
        with multiprocessing.Pool(process_count) as pool:
            for _ in pool.imap_unordered(process_bucket, tasks):
                pass
    else:
        for t in tasks:
            process_bucket(t)


def main():
    parser = argparse.ArgumentParser(
        description="Process 13-grams from sorted buckets."
    )
    parser.add_argument("-dir", "--working_directory", default="")
    parser.add_argument("-move", "--move_dir", default="")
    parser.add_argument("-procs", "--process_count", type=int, default=4)
    args = parser.parse_args()
    process_sorted_buckets(args.working_directory, args.move_dir, args.process_count)
    print("done")


if __name__ == "__main__":
    main()
