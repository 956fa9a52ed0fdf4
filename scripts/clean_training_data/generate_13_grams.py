"""Stage 1: corpus -> bucketed 13-grams.

Parity target: reference scripts/clean_training_data/generate_13_grams.py.
Streams every document of a corpus (directory of *.jsonl.zst archives),
normalizes with the Janitor, emits "<ngram> <document_id>" lines bucketed by
ngram hash into ``bucket_count`` files, with offset-checkpointed resume
(truncate-on-restart, reference :86-114) and SIGINT-safe shutdown (:46-49).

One deliberate fix vs the reference: bucketing uses crc32 instead of the
builtin ``hash`` — python string hashing is salted per process, so the
reference's checkpoint/resume would scatter ngrams across different buckets
after a restart, breaking the sorted-shard uniqueness assumption downstream.

Usage: python generate_13_grams.py -dir <workdir> [-n 13] [-buckets 500]
       (<workdir>/corpus/*.jsonl.zst holds the training corpus)
"""

import argparse
import glob
import json
import os
import pickle
import signal
import sys
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from llm_lns_quantization_tpu.decontamination.archiver import Reader, TextArchive
from llm_lns_quantization_tpu.decontamination.janitor import Janitor, word_ngrams

terminate = False


def handler(signal_received, frame):
    global terminate
    terminate = True


def yield_corpus(corpus_dir, checkpoint_offset=0):
    files = sorted(glob.glob(os.path.join(corpus_dir, "*.jsonl.zst")))
    if not files:
        raise FileNotFoundError(f"no *.jsonl.zst archives under {corpus_dir}")
    offset = 0
    reader = Reader()
    for file in files:
        for document in reader.read(file):
            yield offset, document
            offset += 1


class Buckets:
    """Disk-backed hash buckets with offset checkpointing.

    On restart, each bucket file is truncated back to its last checkpointed
    offset so partially-written batches are dropped (reference :86-114).
    """

    def __init__(self, directory, num_buckets):
        self.bucket_files = [
            os.path.join(directory, f"ngrams_{i}.bkt.txt") for i in range(num_buckets)
        ]
        self.buckets = list(map(TextArchive, self.bucket_files))
        self.checkpoint_file = os.path.join(directory, "bucket_offsets.ckpt")

        if os.path.exists(self.checkpoint_file):
            with open(self.checkpoint_file, "rb") as f:
                self.bucket_offsets = pickle.load(f)
        else:
            self.bucket_offsets = [0 for _ in range(len(self.buckets))]

        for i, offset in enumerate(self.bucket_offsets):
            bucket = self.buckets[i]
            bucket.fh.seek(offset)
            bucket.fh.truncate()

    def add_data(self, key, value):
        i = zlib.crc32(key.encode("utf-8")) % len(self.buckets)
        self.buckets[i].add_data(value)

    def save_checkpoint(self):
        for bucket in self.buckets:
            bucket.fh.flush()
        bucket_offsets = [bucket.fh.tell() for bucket in self.buckets]
        with open(self.checkpoint_file, "wb") as f:
            pickle.dump(bucket_offsets, f)

    def close_buckets(self):
        for bucket in self.buckets:
            bucket.commit()


def do_ngrams_in_buckets(n_value, working_directory, bucket_count,
                         checkpoint_every=10000):
    corpus_dir = os.path.join(working_directory, "corpus")
    output_directory = os.path.join(working_directory, "output")
    os.makedirs(output_directory, exist_ok=True)

    done_file = os.path.join(output_directory, "ngram_buckets.done")
    if os.path.exists(done_file):
        print("ngrams already generated and bucketed, skipping")
        return

    checkpoint_file = os.path.join(working_directory, "doc_offset.ckpt")
    checkpoint_offset = 0
    if os.path.exists(checkpoint_file):
        with open(checkpoint_file, "rb") as f:
            checkpoint_offset = pickle.load(f)
        print(f"resuming at document {checkpoint_offset}")

    buckets = Buckets(output_directory, bucket_count)
    janitor = Janitor()

    batch_counter = 0
    for offset, document in yield_corpus(corpus_dir):
        if offset < checkpoint_offset:
            continue
        ngrams = word_ngrams(janitor.normalize_string(document), n_value)
        for ngram in ngrams:
            buckets.add_data(ngram, f"{ngram} {offset}")
        batch_counter += 1
        if batch_counter >= checkpoint_every or terminate:
            batch_counter = 0
            buckets.save_checkpoint()
            with open(checkpoint_file, "wb") as f:
                pickle.dump(offset + 1, f)
            if terminate:
                buckets.close_buckets()
                return

    buckets.close_buckets()
    open(done_file, "w").close()
    print("done")


def main():
    parser = argparse.ArgumentParser(description="Generate bucketed n-grams.")
    parser.add_argument("-dir", "--working_directory", default="")
    parser.add_argument("-n", "--n_value", type=int, default=13)
    parser.add_argument("-buckets", "--bucket_count", type=int, default=500)
    args = parser.parse_args()

    signal.signal(signal.SIGINT, handler)
    do_ngrams_in_buckets(args.n_value, args.working_directory, args.bucket_count)

    info_dict = {"title": "dataset ngrams", "ngram_size": args.n_value}
    info_path = os.path.join(args.working_directory, "output", "info.json")
    with open(info_path, "w", encoding="utf-8") as f:
        json.dump(info_dict, f)


if __name__ == "__main__":
    main()
