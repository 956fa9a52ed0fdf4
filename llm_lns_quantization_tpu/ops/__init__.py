"""Pallas TPU kernels and quantized-storage formats (the real-quant tier)."""

from .kv_cache import QuantKV, init_quant_cache, kv_dequantize, kv_quantize, kv_update
from .matmul import int8_matmul, lns4_matmul, lns_matmul, mx_matmul, w8a8_matmul
from .packing import (
    Int8Weight,
    LNS4Weight,
    LNSWeight,
    MXWeight,
    pack_int8,
    pack_lns,
    pack_lns4,
    pack_mx,
    unpack_int8,
    unpack_lns,
    unpack_lns4,
    unpack_mx,
)

__all__ = [
    "QuantKV",
    "init_quant_cache",
    "kv_dequantize",
    "kv_quantize",
    "kv_update",
    "int8_matmul",
    "w8a8_matmul",
    "lns4_matmul",
    "lns_matmul",
    "Int8Weight",
    "LNS4Weight",
    "LNSWeight",
    "MXWeight",
    "mx_matmul",
    "pack_mx",
    "unpack_mx",
    "pack_int8",
    "pack_lns",
    "pack_lns4",
    "unpack_int8",
    "unpack_lns",
    "unpack_lns4",
]
