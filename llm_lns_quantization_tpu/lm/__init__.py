"""LM adapters: TPU-native engine, fake backend, HTTP API backends."""

from .registry import available_models, get_model
from .serve import ContinuousBatcher

__all__ = ["available_models", "get_model", "ContinuousBatcher"]
