"""Quantization-emulation layer: formats, config/registry, and application."""

from . import formats
from .apply import ActQuantizer, NULL_ACT_QUANT, quantize_weights, ste
from .config import FORMAT_REGISTRY, QuantConfig, get_format

__all__ = [
    "formats",
    "ActQuantizer",
    "NULL_ACT_QUANT",
    "quantize_weights",
    "ste",
    "FORMAT_REGISTRY",
    "QuantConfig",
    "get_format",
]
