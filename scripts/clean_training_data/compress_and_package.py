"""Stage 4: zstd-compress processed/sorted shards and write info.json.

Parity target: reference scripts/clean_training_data/compress_and_package.py
(zstd each *.sorted shard, emit ``info.json`` with the ngram size so
decontaminate.get_train_overlap can consume the directory).

Usage: python compress_and_package.py -dir <workdir> -output <dest> [-procs 2]
"""

import argparse
import glob
import json
import multiprocessing
import os
import subprocess


def compress_file(args):
    file_path, output_directory = args
    compressed_path = os.path.join(
        output_directory, os.path.basename(file_path) + ".zst"
    )
    with open(compressed_path, "wb") as out:
        subprocess.run(["zstd", "-q", "-c", file_path], stdout=out, check=True)
    return compressed_path


def compress_fallback(args):
    """Pure-python zstd if the zstd binary is unavailable."""
    import zstandard

    file_path, output_directory = args
    compressed_path = os.path.join(
        output_directory, os.path.basename(file_path) + ".zst"
    )
    cctx = zstandard.ZstdCompressor()
    with open(file_path, "rb") as src, open(compressed_path, "wb") as dst:
        cctx.copy_stream(src, dst)
    return compressed_path


def compress_and_move(working_directory, output_directory, process_count, ngram_size=13):
    os.makedirs(output_directory, exist_ok=True)

    files = sorted(glob.glob(os.path.join(working_directory, "*.sorted"))) + sorted(
        glob.glob(os.path.join(working_directory, "*.processed"))
    )

    have_zstd_bin = (
        subprocess.run(
            ["which", "zstd"], capture_output=True
        ).returncode
        == 0
    )
    worker = compress_file if have_zstd_bin else compress_fallback
    tasks = [(f, output_directory) for f in files]
    if process_count > 1 and len(tasks) > 1:
        with multiprocessing.Pool(process_count) as pool:
            for _ in pool.imap_unordered(worker, tasks):
                pass
    else:
        for t in tasks:
            worker(t)

    info_dict = {"title": "dataset ngrams", "ngram_size": ngram_size}
    with open(os.path.join(output_directory, "info.json"), "w") as f:
        json.dump(info_dict, f)


def main():
    parser = argparse.ArgumentParser(description="Compress and package ngrams.")
    parser.add_argument("-dir", "--working_directory", required=True)
    parser.add_argument("-output", "--output_directory", required=True)
    parser.add_argument("-procs", "--process_count", type=int, default=2)
    parser.add_argument("-n", "--ngram_size", type=int, default=13)
    args = parser.parse_args()
    compress_and_move(
        args.working_directory, args.output_directory, args.process_count,
        args.ngram_size,
    )
    print("done")


if __name__ == "__main__":
    main()
