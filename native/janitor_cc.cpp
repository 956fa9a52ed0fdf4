// janitor_cc: fast n-gram normalization kernel for decontamination.
//
// CPython-C-API re-implementation of the two functions the reference exports
// through pybind11 (reference scripts/clean_training_data/janitor_util.cpp):
//
//   clean_ngram(input: str, ignore_chars: str, n: int) -> list[str]
//   clean_ngram_with_indices(input, ignore_chars, n)
//       -> list[tuple[str, int, int]]
//
// Semantics (matching the reference kernel):
//   * tokens split on python string.whitespace (" \t\n\r\x0b\x0c")
//   * characters in `ignore_chars` are deleted, A-Z lowercased
//   * a single gram is capped at 10 characters (janitor_util.cpp:34 caps the
//     gram and starts a new one when exceeded)
//   * emitted ngrams are the grams joined by single spaces
//
// Build (no pybind11 in this image):
//   c++ -O3 -Wall -shared -std=c++17 -fPIC \
//       $(python3-config --includes) native/janitor_cc.cpp \
//       -o janitor_cc$(python3-config --extension-suffix)
// or: python setup.py build_ext --inplace

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <string>
#include <vector>

namespace {

inline bool is_whitespace(char ch) noexcept {
  return ch == 32 || (9 <= ch && ch <= 13);
}

struct Gram {
  std::string text;
  size_t start;  // index of first char in original string
  size_t end;    // index of last char in original string
};

// Tokenize + normalize: lowercase, drop ignored chars, cap grams at 10 chars.
std::vector<Gram> tokenize(const std::string &input, const bool ignore[256]) {
  std::vector<Gram> grams;
  std::string cur;
  size_t cur_start = 0;
  size_t cur_end = 0;
  bool in_gram = false;

  grams.reserve(input.size() / 6);  // ~avg word length heuristic
  auto flush = [&](size_t) {
    if (in_gram && !cur.empty()) {
      grams.push_back({std::move(cur), cur_start, cur_end});
      cur = std::string();
    } else {
      cur.clear();
    }
    in_gram = false;
  };

  for (size_t i = 0; i < input.size(); i++) {
    char c = input[i];
    if (is_whitespace(c)) {
      flush(i);
      continue;
    }
    if (!in_gram) {
      in_gram = true;
      cur_start = i;
    }
    cur_end = i;
    unsigned char uc = static_cast<unsigned char>(c);
    if (ignore[uc]) continue;  // deleted character (still extends the span)
    if ('A' <= c && c <= 'Z') c = c - 'A' + 'a';
    if (cur.size() >= 10) {
      // cap gram length at 10 chars: close this gram, start a new one here
      grams.push_back({std::move(cur), cur_start, i - 1});
      cur = std::string();
      cur_start = i;
    }
    cur += c;
  }
  flush(input.size());
  return grams;
}

void build_ignore_table(const std::string &ignore_chars, bool table[256]) {
  for (int i = 0; i < 256; i++) table[i] = false;
  for (unsigned char c : ignore_chars) table[c] = true;
}

struct Args {
  std::string input;
  std::string ignore_chars;
  Py_ssize_t n;
  bool ok;
};

Args parse_args(PyObject *args) {
  Args out;
  out.ok = false;
  const char *input = nullptr;
  Py_ssize_t input_len = 0;
  const char *ignore = nullptr;
  Py_ssize_t ignore_len = 0;
  Py_ssize_t n = 0;
  if (!PyArg_ParseTuple(args, "s#s#n", &input, &input_len, &ignore,
                        &ignore_len, &n)) {
    return out;
  }
  if (n <= 0) {
    PyErr_SetString(PyExc_ValueError, "ngram_n must be positive");
    return out;
  }
  out.input.assign(input, static_cast<size_t>(input_len));
  out.ignore_chars.assign(ignore, static_cast<size_t>(ignore_len));
  out.n = n;
  out.ok = true;
  return out;
}

// Shared driver: emit ngrams; with_indices controls the output element type.
PyObject *emit_ngrams(PyObject *args, bool with_indices) {
  Args a = parse_args(args);
  if (!a.ok) return nullptr;

  bool ignore[256];
  build_ignore_table(a.ignore_chars, ignore);

  std::vector<Gram> grams;
  Py_BEGIN_ALLOW_THREADS
  grams = tokenize(a.input, ignore);
  Py_END_ALLOW_THREADS

  const size_t n = static_cast<size_t>(a.n);
  const Py_ssize_t count =
      grams.size() >= n ? static_cast<Py_ssize_t>(grams.size() - n + 1) : 0;
  PyObject *list = PyList_New(count);  // preallocated: no append churn
  if (!list) return nullptr;

  std::string joined;
  joined.reserve(11 * n);
  for (Py_ssize_t i = 0; i < count; i++) {
    joined.clear();
    for (size_t j = 0; j < n; j++) {
      if (j) joined += ' ';
      joined += grams[i + j].text;
    }
    PyObject *item = nullptr;
    if (with_indices) {
      item = Py_BuildValue("(s#nn)", joined.data(),
                           static_cast<Py_ssize_t>(joined.size()),
                           static_cast<Py_ssize_t>(grams[i].start),
                           static_cast<Py_ssize_t>(grams[i + n - 1].end));
    } else {
      item = PyUnicode_FromStringAndSize(
          joined.data(), static_cast<Py_ssize_t>(joined.size()));
    }
    if (!item) {
      Py_DECREF(list);
      return nullptr;
    }
    PyList_SET_ITEM(list, i, item);  // steals the reference
  }
  return list;
}

PyObject *clean_ngram(PyObject *, PyObject *args) {
  return emit_ngrams(args, /*with_indices=*/false);
}

PyObject *clean_ngram_with_indices(PyObject *, PyObject *args) {
  return emit_ngrams(args, /*with_indices=*/true);
}

PyMethodDef methods[] = {
    {"clean_ngram", clean_ngram, METH_VARARGS,
     "Create a list of normalized ngrams from a string"},
    {"clean_ngram_with_indices", clean_ngram_with_indices, METH_VARARGS,
     "Create a list of (ngram, start, end) tuples from a string"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "janitor_cc",
    "Fast n-gram normalization for decontamination", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_janitor_cc(void) { return PyModule_Create(&moduledef); }
