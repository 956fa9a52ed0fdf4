"""zstd-compressed jsonl archives + text readers for the n-gram pipeline.

Parity target: reference lm_eval/decontamination/archiver.py:21-161
(Archive / Reader / TextArchive / TextReader / ZStdTextReader). The
``jsonlines`` dependency is replaced with stdlib json-per-line.
"""

import datetime
import io
import json
import mmap
import os


def json_serial(obj):
    """JSON serializer for objects not serializable by default."""
    if isinstance(obj, (datetime.datetime,)):
        return obj.isoformat()
    raise TypeError(f"Type {type(obj)} not serializable")


class Archive:
    """Writes (text, metadata) documents into a zstd-compressed jsonl file."""

    def __init__(self, file_path: str, compression_level: int = 3):
        import zstandard

        self.file_path = file_path
        dir_name = os.path.dirname(file_path)
        if dir_name:
            os.makedirs(dir_name, exist_ok=True)
        self.fh = open(self.file_path, "wb")
        self.cctx = zstandard.ZstdCompressor(level=compression_level)
        self.compressor = self.cctx.stream_writer(self.fh)

    def add_data(self, data, meta=None) -> None:
        line = json.dumps({"text": data, "meta": meta or {}}, default=json_serial)
        self.compressor.write(line.encode("UTF-8") + b"\n")

    def commit(self) -> None:
        import zstandard

        self.compressor.flush(zstandard.FLUSH_FRAME)
        self.fh.flush()
        self.fh.close()


class Reader:
    """Reads (text, [meta]) documents back from a zstd jsonl archive."""

    def read(self, file_path: str, get_meta: bool = False, autojoin_paragraphs=True,
             para_joiner="\n\n"):
        import zstandard

        with open(file_path, "rb") as fh:
            dctx = zstandard.ZstdDecompressor()
            reader = io.BufferedReader(dctx.stream_reader(fh))
            for line in io.TextIOWrapper(reader, encoding="utf-8"):
                if not line.strip():
                    continue
                ob = json.loads(line)
                if isinstance(ob, str):
                    assert not get_meta
                    yield ob
                    continue
                text = ob["text"]
                if autojoin_paragraphs and isinstance(text, list):
                    text = para_joiner.join(text)
                if get_meta:
                    yield text, (ob["meta"] if "meta" in ob else {})
                else:
                    yield text


class TextArchive:
    """Plain-text line archive (one record per line)."""

    def __init__(self, file_path: str, mode: str = "rb+"):
        self.file_path = file_path
        dir_name = os.path.dirname(file_path)
        if dir_name:
            os.makedirs(dir_name, exist_ok=True)
        if not os.path.exists(file_path):
            open(file_path, "w").close()
        self.fh = open(self.file_path, mode)

    def add_data(self, data: str) -> None:
        self.fh.write(data.encode("UTF-8") + b"\n")

    def commit(self) -> None:
        self.fh.flush()
        self.fh.close()


class TextReader:
    """Memory-mapped line reader with tqdm-free progress accounting.

    Mirrors the reference's rolling read-size tracking so the n-gram pipeline
    can checkpoint by file offset (reference archiver.py:89-127).
    """

    def __init__(self, file_path: str):
        self.file_path = file_path

    def read_tqdm(self, update_frequency: int = 10000):
        current_file_position = 0
        with open(self.file_path, "r", encoding="utf-8") as fh, mmap.mmap(
            fh.fileno(), 0, prot=mmap.PROT_READ
        ) as mmap_obj:
            for i, line in enumerate(iter(mmap_obj.readline, b"")):
                line = line.decode("utf-8")
                line_length = len(line)
                current_file_position += line_length
                yield line[:-1]

    def read_and_tell(self):
        current_file_position = 0
        with open(self.file_path, "r", encoding="utf8") as fh, mmap.mmap(
            fh.fileno(), 0, prot=mmap.PROT_READ
        ) as mmap_obj:
            for line in iter(mmap_obj.readline, b""):
                line = line.decode("utf-8")
                current_file_position += len(line)
                yield line[:-1], current_file_position

    def read(self):
        with open(self.file_path, "r", encoding="utf8") as fh, mmap.mmap(
            fh.fileno(), 0, prot=mmap.PROT_READ
        ) as mmap_obj:
            for line in iter(mmap_obj.readline, b""):
                yield line.decode("utf-8")[:-1]

    def read_slow(self):
        with open(self.file_path, "r", encoding="utf8") as fh:
            while True:
                line = fh.readline()
                if line == "":
                    break
                yield line[:-1]


class ZStdTextReader:
    """Streaming line reader over a zstd-compressed text file."""

    def __init__(self, file: str):
        self.file = file

    def read_tqdm(self):
        import zstandard

        with open(self.file, "rb") as fh:
            dctx = zstandard.ZstdDecompressor()
            reader = io.BufferedReader(dctx.stream_reader(fh))
            wrapper = io.TextIOWrapper(reader, encoding="utf-8")
            for line in wrapper:
                yield line[:-1]
