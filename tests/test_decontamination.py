"""Decontamination tests: janitor behavior, C++/Python parity, overlap scan.

The reference ships 12 janitor unit tests (tests/test_janitor.py) but its
C++-vs-Python parity test is commented out (janitor.py:238-253); here parity
is enforced whenever the C++ module is importable.
"""

import json
import os
import string

import pytest

from llm_lns_quantization_tpu.decontamination import (
    JANITOR_CPP,
    Janitor,
    word_ngrams,
)
from llm_lns_quantization_tpu.decontamination.archiver import (
    Archive,
    Reader,
    TextArchive,
    TextReader,
    ZStdTextReader,
)
from llm_lns_quantization_tpu.decontamination.decontaminate import get_train_overlap


def test_word_ngrams():
    assert list(word_ngrams("a b c d", 2)) == ["a b", "b c", "c d"]
    assert list(word_ngrams("a b", 3)) == []


def test_janitor_normalization():
    j = Janitor()
    assert j.normalize_string("Hello, World!") == "hello world"


def test_janitor_registers_and_cleans():
    j = Janitor(ngram_n=3, window_to_remove=5, minimum_slice_length=3)
    j.register_contaminant_python("the dirty phrase here")
    source = "aaaa bbbb cccc the dirty phrase here dddd eeee ffff gggg hhhh"
    chunks = j.clean_python(source)
    # contaminated window removed, clean tails kept
    assert all("dirty phrase" not in c for c in chunks)
    assert any(c.strip() for c in chunks)


def test_janitor_too_dirty_returns_empty():
    j = Janitor(ngram_n=1, too_dirty_cutoff=2, window_to_remove=0)
    j.register_contaminant_python("bad")
    source = "bad " * 10
    assert j.clean_python(source) == []


@pytest.mark.skipif(not JANITOR_CPP, reason="C++ janitor module not built")
def test_cpp_python_parity():
    """The parity test the reference left commented out (janitor.py:238-253)."""
    source = (
        """   ,, I'm a very !dirty,, ,,  dirty boy. Clean me daddy. \n\nhe he"""
        """ he hehe heh.  lastword  """ * 2
    )
    contaminant = "dirty boy. Clean he he"

    jan_python = Janitor()
    jan_cpp = Janitor()
    jan_python.register_contaminant_python(contaminant)
    jan_cpp.register_contaminant_cpp(contaminant)
    assert jan_python.dirt_ngrams == jan_cpp.dirt_ngrams
    assert jan_python.clean_python(source) == jan_cpp.clean_cpp(source)


@pytest.mark.skipif(not JANITOR_CPP, reason="C++ janitor module not built")
def test_cpp_ngram_indices_cover_source():
    import janitor_cc

    src = "Alpha beta GAMMA, delta epsilon"
    for ngram, start, end in janitor_cc.clean_ngram_with_indices(
        src, string.punctuation, 2
    ):
        assert 0 <= start <= end < len(src)
        # normalized ngram words appear (lowercased) in the covered span
        span = src[start : end + 1].lower()
        assert ngram.split()[0][:4] in span


def test_archive_roundtrip(tmp_path):
    pytest.importorskip("zstandard")
    path = str(tmp_path / "docs.jsonl.zst")
    ar = Archive(path)
    ar.add_data("hello world", meta={"id": 1})
    ar.add_data("second doc", meta={"id": 2})
    ar.commit()
    docs = list(Reader().read(path, get_meta=True))
    assert docs == [("hello world", {"id": 1}), ("second doc", {"id": 2})]


def test_text_archive_and_reader(tmp_path):
    path = str(tmp_path / "lines.txt")
    ta = TextArchive(path)
    ta.add_data("line one")
    ta.add_data("line two")
    ta.commit()
    assert list(TextReader(path).read()) == ["line one", "line two"]
    tells = list(TextReader(path).read_and_tell())
    assert tells[0][0] == "line one" and tells[-1][1] == os.path.getsize(path)


def test_get_train_overlap_end_to_end(tmp_path):
    """Miniature of the full pipeline: sorted ngram shard -> overlap dict."""
    zstandard = pytest.importorskip("zstandard")

    ngrams_dir = tmp_path / "ngrams"
    ngrams_dir.mkdir()
    n = 3
    with open(ngrams_dir / "info.json", "w") as f:
        json.dump({"ngram_size": n}, f)

    # training corpus contains one eval doc's ngram
    eval_docs = {
        ("taskA", "test"): [
            "the quick brown fox jumps over the lazy dog today",
            "completely unrelated sentence with different words entirely",
        ]
    }
    j = Janitor()
    train_line = "the quick brown fox jumps is in training data"
    grams = sorted(
        f"{g} 0" for g in word_ngrams(j.normalize_string(train_line), n)
    )
    cctx = zstandard.ZstdCompressor()
    with open(ngrams_dir / "ngrams_0.sorted.zst", "wb") as f:
        f.write(cctx.compress(("\n".join(grams) + "\n").encode()))

    overlaps = get_train_overlap(
        eval_docs, str(ngrams_dir), limit=None, data_dir=str(tmp_path / "data")
    )
    assert overlaps["taskA"] == {0}  # only doc 0 overlaps

    # second call is served from the pickled overlap cache
    overlaps2 = get_train_overlap(
        eval_docs, str(ngrams_dir), limit=None, data_dir=str(tmp_path / "data")
    )
    assert overlaps2["taskA"] == {0}
