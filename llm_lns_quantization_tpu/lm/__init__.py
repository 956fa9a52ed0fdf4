"""LM adapters: TPU-native engine, fake backend, HTTP API backends."""

from .registry import available_models, get_model

__all__ = ["available_models", "get_model"]
