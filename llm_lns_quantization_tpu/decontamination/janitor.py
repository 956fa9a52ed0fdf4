"""13-gram contamination janitor (GPT-3 Appendix C method).

Parity target: reference lm_eval/decontamination/janitor.py. Constants
(ngram_n=13, window_to_remove=200, too_dirty_cutoff=10,
minimum_slice_length=200) are the GPT-3 paper values (reference
janitor.py:109-116).

The hot kernel (normalize + n-gram emission over 100MB+ corpora) has a C++
implementation in native/janitor_cc.cpp exporting the same two functions as
the reference's pybind11 module (``clean_ngram``,
``clean_ngram_with_indices`` — reference scripts/clean_training_data/
janitor_util.cpp:195-205), built with the plain CPython C API (this image has
no pybind11). Python fallback is selected at import, like reference
janitor.py:10-17.

Known reference quirk preserved: the C++ path caps individual grams at 10
characters (janitor_util.cpp:34), the Python path does not; we reproduce both
behaviors in their respective paths.
"""

import pickle
import re
import string

try:
    import janitor_cc  # built from native/janitor_cc.cpp

    JANITOR_CPP = True
except Exception:
    JANITOR_CPP = False


def form_ngrams(sequence, n):
    """Sliding n-tuples over an iterator (nltk-style)."""
    history = []
    while n > 1:
        try:
            next_item = next(sequence)
        except StopIteration:
            return
        history.append(next_item)
        n -= 1
    for item in sequence:
        history.append(item)
        yield tuple(history)
        del history[0]


def word_ngrams(s, n):
    """Space-joined word n-grams of a string."""
    tokens = s.split()
    ngram_seqs = form_ngrams(iter(tokens), n)
    return (" ".join(ngram) for ngram in ngram_seqs)


def split_indices(s):
    """(word, (start_idx, end_idx)) for each whitespace-split word."""
    return ((m.group(0), (m.start(), m.end() - 1)) for m in re.finditer(r"\S+", s))


def word_ngrams_indices(s, n):
    """(ngram_string, (start_idx, end_idx)) pairs."""
    tokens_with_indices = split_indices(s)
    ngram_seqs_with_indices = form_ngrams(tokens_with_indices, n)
    ngram_indices_pairs = (
        zip(*ngram_with_indices) for ngram_with_indices in ngram_seqs_with_indices
    )
    return (
        (" ".join(ngram_seq), (indices[0][0], indices[-1][1]))
        for ngram_seq, indices in ngram_indices_pairs
    )


class Janitor:
    def __init__(
        self,
        ngram_n=13,
        window_to_remove=200,
        too_dirty_cutoff=10,
        minimum_slice_length=200,
        delete_chars=string.punctuation,
    ):
        self.ngram_n = ngram_n
        self.window_to_remove = window_to_remove
        self.too_dirty_cutoff = too_dirty_cutoff
        self.minimum_slice_length = minimum_slice_length
        self.delete_chars = delete_chars
        self.dirt_ngrams = set()
        # lowercase + delete punctuation in one translate pass
        self.translation_table = str.maketrans(
            string.ascii_lowercase + string.ascii_uppercase,
            string.ascii_lowercase * 2,
            self.delete_chars,
        )

    # ---------------- I/O ----------------

    def save_contamination_ngrams(self, filename):
        with open(filename, "wb") as fp:
            pickle.dump(self.dirt_ngrams, fp)

    def load_contamination_ngrams(self, filename):
        with open(filename, "rb") as fp:
            self.dirt_ngrams = pickle.load(fp)

    # ---------------- public API ----------------

    def register_contaminant(self, dirt_string):
        """Register a contaminant (e.g. an eval doc): its ngrams mark dirt."""
        if JANITOR_CPP:
            return self.register_contaminant_cpp(dirt_string)
        return self.register_contaminant_python(dirt_string)

    def clean(self, dirty_string):
        """Remove registered ngrams (±window) from a training document.

        Returns clean chunks, or [] if the doc matched >= too_dirty_cutoff
        ngrams.
        """
        if JANITOR_CPP:
            return self.clean_cpp(dirty_string)
        return self.clean_python(dirty_string)

    def _split_chunks(self, dirty_string, dirty_parts):
        clean_chunks = []
        splice_idx = 0
        end = -1
        for i, (ngram, start, end) in enumerate(dirty_parts):
            if i >= self.too_dirty_cutoff:
                return []
            start = max(0, start - self.window_to_remove)
            end = min(len(dirty_string), end + self.window_to_remove)
            if start - splice_idx > self.minimum_slice_length:
                clean_chunks.append(dirty_string[splice_idx:start])
            splice_idx = end
        if end < len(dirty_string) - self.minimum_slice_length:
            clean_chunks.append(dirty_string[end + 1:])
        return clean_chunks

    # ---------------- C++ path ----------------

    def register_contaminant_cpp(self, dirt_string):
        self.dirt_ngrams.update(
            janitor_cc.clean_ngram(dirt_string, self.delete_chars, self.ngram_n)
        )

    def clean_cpp(self, dirty_string):
        contamination_indices = janitor_cc.clean_ngram_with_indices(
            dirty_string, self.delete_chars, self.ngram_n
        )
        return self._split_chunks(dirty_string, contamination_indices)

    # ---------------- Python path ----------------

    def normalize_string(self, s):
        return s.translate(self.translation_table)

    def register_contaminant_python(self, dirt_string):
        self.dirt_ngrams.update(
            word_ngrams(self.normalize_string(dirt_string), self.ngram_n)
        )

    def clean_python(self, dirty_string):
        contamination_indices = (
            (None, *idx_pair)
            for dirty_ngram, idx_pair in word_ngrams_indices(dirty_string, self.ngram_n)
            if self.normalize_string(dirty_ngram) in self.dirt_ngrams
        )
        return self._split_chunks(dirty_string, contamination_indices)
