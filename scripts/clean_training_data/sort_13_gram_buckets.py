"""Stage 2: gnu-sort each ngram bucket file.

Parity target: reference scripts/clean_training_data/sort_13_gram_buckets.py
(subprocess gnu sort per bucket; sorted order lets stage 3 count unique
documents per ngram with a single pass).

Usage: python sort_13_gram_buckets.py -dir <workdir>
"""

import argparse
import glob
import os
import signal
import subprocess

terminate = False


def handler(signal_received, frame):
    global terminate
    terminate = True


def sort_13_gram_buckets(working_directory):
    output_directory = os.path.join(working_directory, "output")
    bucket_file_paths = glob.glob(
        os.path.join(output_directory, "ngrams_*.bkt.txt")
    )

    for bucket_file_path in sorted(bucket_file_paths):
        sorted_file_path = bucket_file_path + ".sorted"
        subprocess.run(
            ["sort", bucket_file_path, "-o", sorted_file_path],
            check=True,
            env={**os.environ, "LC_ALL": "C"},
        )
        os.remove(bucket_file_path)
        if terminate:
            return


def main():
    parser = argparse.ArgumentParser(description="sort ngram buckets")
    parser.add_argument("-dir", "--working_directory", default="")
    args = parser.parse_args()
    signal.signal(signal.SIGINT, handler)
    sort_13_gram_buckets(args.working_directory)
    print("done")


if __name__ == "__main__":
    main()
