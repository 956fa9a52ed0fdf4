"""Decontamination: 13-gram train/test overlap detection (GPT-3 Appx C)."""

from .janitor import JANITOR_CPP, Janitor, word_ngrams, word_ngrams_indices

__all__ = ["JANITOR_CPP", "Janitor", "word_ngrams", "word_ngrams_indices"]
